package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopK
import graft.plans.{FinalTopKPerKeyExec, PartialTopKPerKeyExec}

/** The custom TopKPerKey physical operator (LogicalPlan + Strategy +
  * two-phase SparkPlan): result parity with the row_number window form,
  * plan shape (partial heap below the exchange, final heap above, NO sort),
  * and the vanilla-session fallback.
  */
class TopKPerKeySpec extends AnyFunSuite {
  // Shared session carries GraftExtensions (see SparkTestSession), so
  // TopK.perKey plans the custom operator here.
  lazy val spark = SparkTestSession.spark

  private def fixture(s: SparkSession) = {
    import s.implicits._
    val rnd = new scala.util.Random(42)
    // 37 keys × ~54 rows, 10% null scores, tie-heavy score domain (0..19)
    // so the id tiebreak is load-bearing; one singleton key (fewer rows
    // than k) and one absent-from-top key.
    val rows = (1 to 2000).map { i =>
      (s"g${rnd.nextInt(37)}", if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(20).toDouble), i.toLong)
    } :+ (("solo", Some(3.0), 9999L))
    rows.toDF("key", "score", "id")
  }

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("key", "rank").collect().toSeq

  test("custom plan: partial heap below the key exchange, final above, no SortExec") {
    val topk = TopK.perKey(fixture(spark), Seq("key"), Seq("score" -> false, "id" -> true), 5)
    val plan = topk.queryExecution.executedPlan match {
      // AQE wraps the real plan; its children are invisible to collect*
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collectFirst { case e: FinalTopKPerKeyExec => e }.isDefined, plan.toString)
    assert(plan.collectFirst { case e: PartialTopKPerKeyExec => e }.isDefined, plan.toString)
    assert(plan.collectFirst { case e: SortExec => e }.isEmpty,
      s"bounded-heap top-k must not sort:\n$plan")
    // the partial must sit BELOW the shuffle (map-side pruning: ≤ k rows
    // per key per input partition enter the exchange)
    val exchange = plan.collectFirst { case e: ShuffleExchangeExec => e }
    assert(exchange.isDefined, plan.toString)
    assert(exchange.get.collectFirst { case e: PartialTopKPerKeyExec => e }.isDefined,
      s"partial heap must be below the exchange:\n$plan")
  }

  test("result parity with the row_number window form (ties, nulls, short groups)") {
    val df = fixture(spark)
    for (k <- Seq(1, 5, 100)) {
      val custom = TopK.perKey(df, Seq("key"), Seq("score" -> false, "id" -> true), k)
      assert(sortedRows(custom) == sortedRows(windowForm(df, k)), s"k=$k")
    }
  }

  test("ascending order and multi-column keys") {
    val df = fixture(spark).withColumn("key2", (col("id") % 3).cast("int"))
    val custom = TopK.perKey(df, Seq("key", "key2"), Seq("score" -> true, "id" -> true), 3)
    val w = Window.partitionBy("key", "key2").orderBy(col("score").asc, col("id").asc)
    val expected = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
    assert(custom.orderBy("key", "key2", "rank").collect().toSeq ==
      expected.orderBy("key", "key2", "rank").collect().toSeq)
  }

  test("empty input yields empty output") {
    val df = fixture(spark).filter(col("id") < 0)
    assert(TopK.perKey(df, Seq("key"), Seq("score" -> false, "id" -> true), 5).count() == 0)
  }

  test("composes under further transforms (filter + agg over the rank column)") {
    val df = fixture(spark)
    val agg = TopK.perKey(df, Seq("key"), Seq("score" -> false, "id" -> true), 5)
      .filter(col("rank") <= 3)
      .groupBy("key").agg(count(lit(1)).as("n"), max("rank").as("r"))
    val viaWindow = windowForm(df, 5)
      .filter(col("rank") <= 3)
      .groupBy("key").agg(count(lit(1)).as("n"), max("rank").as("r"))
    assert(agg.orderBy("key").collect().toSeq == viaWindow.orderBy("key").collect().toSeq)
  }

  test("vanilla session (no extensions) falls back to the window plan, same result") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-topk-vanilla")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val df = fixture(s)
      val topk = TopK.perKey(df, Seq("key"), Seq("score" -> false, "id" -> true), 5)
      val plan = topk.queryExecution.executedPlan
      assert(plan.collectFirst { case e: FinalTopKPerKeyExec => e }.isEmpty)
      assert(sortedRows(topk) == sortedRows(windowForm(df, 5)))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
