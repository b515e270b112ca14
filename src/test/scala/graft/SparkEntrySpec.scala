package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  // Same local-fs/checkpoint perf shims Verify/Bench run with (no-fork
  // chmod + NIO checkpoint manager) so the suites exercise the code paths
  // the driver grades — here against the RocksDB provider below, which
  // routes its uploads through the same CheckpointFileManager API.
  lazy val spark: SparkSession = graft.stream.LocalFsPerf.tune(SparkSession.builder()
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
    .withExtensions(new graft.expressions.GraftExtensions()))
    .getOrCreate()
}

class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every Rehearse gate entry names a real query") {
    // a query rename must not silently hollow out the ~sf1 scale gate
    graft.tools.Rehearse.Gate.foreach { case (name, maxSec) =>
      assert(SparkEntry.queries.contains(name), s"gate names unknown query $name")
      assert(maxSec > 0)
    }
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

  test("every query has an oracle twin (none silently downgraded to rows-only)") {
    // the driver records only a weaker rows>0 check for queries missing an
    // oracle — a forgotten twin must fail HERE, not soften the gate
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracleSql: $unoracled")
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

  test("d4 SCD2 history rows are contiguous, alternating, single-current") {
    import org.apache.spark.sql.functions._
    val hist = SparkEntry.queries("d4_scd2_history")(spark, sf).cache()
    try {
      // exactly one open (is_current) version per user
      val open = hist.groupBy("user_id")
        .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
      assert(open.filter(col("n_open") =!= 1).isEmpty, "users with != 1 open version")
      // ranges stitch: version k's valid_to == version k+1's valid_from,
      // and consecutive statuses actually changed (no no-op versions)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("version")
      val bad = hist
        .withColumn("next_from", lead("valid_from", 1).over(w))
        .withColumn("next_status", lead("status", 1).over(w))
        .filter(col("next_from").isNotNull &&
          (col("valid_to") =!= col("next_from") || col("status") === col("next_status")))
      assert(bad.isEmpty, "non-contiguous or non-changing SCD2 versions")
    } finally hist.unpersist()
  }

  test("d5 CDC apply partitions every user into live xor deleted") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("d5_cdc_apply")(spark, sf)
    val perBucket = Tables.events(spark, sf)
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(countDistinct("user_id").as("n_users"))
    val joined = out.join(perBucket, "bucket")
      .filter(col("n_live") + col("n_deleted") =!= col("n_users"))
    assert(joined.isEmpty, "n_live + n_deleted != distinct users in bucket")
  }

  test("sp4 group split is leak-proof: no group is counted in two splits") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("sp4_group_split")(spark, sf).cache()
    try {
      val totalGroups = Tables.documents(spark, sf)
        .select("source").distinct().count()
      // if any source landed in two splits, per-split distinct counts
      // would double-count it and this sum would exceed the total
      val summed = out.agg(sum("n_groups")).head().getLong(0)
      assert(summed == totalGroups, s"group leak across splits: $summed vs $totalGroups")
      val docs = out.agg(sum("n_docs")).head().getLong(0)
      assert(docs == Tables.documents(spark, sf).count())
    } finally out.unpersist()
  }

  test("st9 streaming dedup emits each duplicated event exactly once") {
    val rows = SparkEntry.queries("st9_stream_dedup")(spark, sf).collect()
    // the inbox holds every event TWICE; a leak would double n vs n_distinct
    assert(rows.nonEmpty && rows.forall(r =>
      r.getAs[Long]("n") == r.getAs[Long]("n_distinct")))
  }

  test("tp2 curriculum selects a best-first prefix crossing half the budget") {
    val rows = SparkEntry.queries("tp2_curriculum")(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("score_bin").desc).collect()
    val sel = rows.map(_.getAs[Boolean]("selected"))
    // selected bins are a contiguous best-first prefix…
    assert(sel.zip(sel.tail).forall { case (a, b) => a || !b }, "non-prefix selection")
    // …whose token mass reaches at least half the corpus budget
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val selTok = rows.filter(_.getAs[Boolean]("selected")).map(_.getAs[Long]("n_tokens")).sum
    assert(selTok * 2 >= total, s"selected $selTok of $total tokens misses the budget")
  }

  test("sp5 tempered rates upweight rare sources vs proportional sampling") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("sp5_temperature_mixture")(spark, sf).collect()
    // α=0.5 tempering: smaller sources get HIGHER keep rates than larger
    // ones (monotone non-increasing rate in source size, ties aside)
    val byN = rows.sortBy(_.getAs[Long]("n_total"))
    val rates = byN.map(_.getAs[Double]("rate_pct"))
    val ns = byN.map(_.getAs[Long]("n_total"))
    ns.indices.tail.foreach { i =>
      if (ns(i) > ns(i - 1))
        assert(rates(i) <= rates(i - 1) + 1e-9,
          s"larger source ${ns(i)} got higher rate ${rates(i)} than ${rates(i - 1)}")
    }
    // corr sanity: a15's correlation is a valid coefficient
    val corr = SparkEntry.queries("a15_cov_corr")(spark, sf).collect()
    assert(corr.forall(r => math.abs(r.getAs[Double]("corr_xy")) <= 1.0 + 1e-9))
  }

  test("sp6 PPS sample favors heavy docs and is retry-reproducible") {
    import org.apache.spark.sql.functions._
    val sample = SparkEntry.queries("sp6_pps_sample")(spark, sf)
    val sMean = sample.agg(avg("n_chars")).head.getDouble(0)
    val cMean = Tables.documents(spark, sf).agg(avg("n_chars")).head.getDouble(0)
    // inclusion probability ∝ n_chars ⇒ the sample must be heavier than
    // the corpus (the property uniform sampling would NOT show)
    assert(sMean > cMean,
      s"PPS sample mean n_chars $sMean not above corpus mean $cMean")
    // hash-keyed draw: a rerun (task retry / job restart) is bit-identical
    val a = sample.collect().map(_.toSeq)
    val b = SparkEntry.queries("sp6_pps_sample")(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b), "PPS sample changed across reruns")
  }

  test("dd12 incremental dedup discriminates all three admission statuses") {
    val rows = SparkEntry.queries("dd12_incremental_dedup")(spark, sf).collect()
    val byStatus = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // the injected re-crawls must hit the exact tier, the fixture's
    // near-dups the LSH tier, and the rest must pass through untouched
    assert(byStatus.getOrElse("exact_dup", 0) > 0, s"exact tier never fired: $byStatus")
    assert(byStatus.getOrElse("new", 0) > 0, s"everything was flagged: $byStatus")
    // every injected re-crawl id is an exact dup (its source is indexed)
    val injected = rows.filter(_.getLong(0) >= 300000)
    assert(injected.nonEmpty && injected.forall(_.getString(1) == "exact_dup"))
  }

  test("ta8 BPE pairs are 2-char and ranked by descending count") {
    val rows = SparkEntry.queries("ta8_bpe_pairs")(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0).length == 2))
    val counts = rows.map(_.getAs[Long]("n"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, "not descending")
  }
}
