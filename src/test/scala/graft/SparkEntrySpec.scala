package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // RocksDB keyed-state backend: the store that scales streaming state
    // past executor heap (SURVEY.md §9); exercised by every streaming spec.
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // Same extensions Verify/Bench run with, so query specs exercise the
    // plans the driver actually grades (custom TopKPerKey physical operator,
    // rank-1→max_by rewrite, SQL-registered vector functions).
    .withExtensions(new graft.expressions.GraftExtensions())
    .getOrCreate()
}

class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching column names with its oracle alias set") {
    // Each declared query must run and produce >0 rows on the smoke fixture.
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("q1 aggregates are grouped correctly") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys.size == rows.length, "duplicate group keys")
    assert(rows.map(_.getAs[Long]("count_order")).forall(_ > 0))
  }

  test("a1 per-user summary covers every user exactly once") {
    val df = SparkEntry.queries("a1_user_summary")(spark, sf)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(df.count() == users)
  }
}
