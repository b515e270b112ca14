package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-18 diagnostic: how much of a rep-sweep `df.count()` is Catalyst
  * RE-planning? `Dataset.count()` constructs a NEW QueryExecution on every
  * call (grouping agg over the logical plan), so each timed rep re-pays
  * analysis + optimization + physical planning of the whole tree even
  * though Bench pre-planned `df` itself — the bench's "repeats measure
  * steady execution with a warm plan" comment is only true of the CHILD
  * plan, not the timed action. This probe times, at steady state:
  *   (a) `df.count()` per rep           — fresh QueryExecution per call
  *   (b) pre-built `df.groupBy().count()` Dataset re-collected per rep
  *       — one QueryExecution, physical plan reused across reps
  * Identical physical plans (b is literally count()'s own construction),
  * identical work on the cluster; the difference is pure driver planning.
  */
object CountPlanProbe {
  def main(args: Array[String]): Unit = {
    graft.dedup.Dedup.warmOnConstruct = true
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def size(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(size).sum else f.length()
    val profile = graft.BenchProfile.tier(size(new java.io.File(dir)), 32)
    val spark = graft.stream.LocalFsPerf.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", profile.shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", profile.aqe.toString)
      .config("spark.shuffle.compress", profile.compress.toString)
      .config("spark.shuffle.spill.compress", profile.compress.toString)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q5_local_supplier_volume", "dq5_profile", "a13_heavy_hitters",
      "f13_json_extract", "u1_measure_unpivot", "j9_bloom_prune_join",
      "sp10_temperature_mixture", "d3_set_ops", "w8_cumulative_users",
      "rr1_hybrid_rrf", "ret1_cohort_retention", "j10_interval_overlap")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, dir)
      df.queryExecution.executedPlan // pre-plan, as Bench does
      val cdf = df.groupBy().count() // count()'s own plan, built ONCE
      cdf.queryExecution.executedPlan
      graft.dedup.Dedup.awaitWarms()
      // JIT/codegen warm both paths
      (1 to 3).foreach { _ => df.count(); cdf.collect() }
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
      // stage-submission counter: proves which variants re-run map stages
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          stages.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      def stagesOf(body: => Unit): Int = {
        Thread.sleep(300) // let prior listener events drain
        val s0 = stages.get(); body
        Thread.sleep(300)
        stages.get() - s0
      }
      val a = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      val b = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); cdf.collect(); (System.nanoTime() - t0) / 1e9
      }
      val c = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        cdf.queryExecution.executedPlan.clone().executeCollect()
        (System.nanoTime() - t0) / 1e9
      }
      val sa = stagesOf(df.count())
      val sb = stagesOf(cdf.collect())
      val sc = stagesOf(cdf.queryExecution.executedPlan.clone().executeCollect())
      println(f"$name%-28s count()=${med(a)}%6.3f s ($sa%d stages)  sameDs=${med(b)}%6.3f s ($sb%d)  clonedPlan=${med(c)}%6.3f s ($sc%d)")
    }
    spark.stop()
  }
}
