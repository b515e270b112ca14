package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-10 diagnostic: Catalyst phase split (analysis / optimization /
  * physical planning, via QueryPlanningTracker) plus total toRdd wall for
  * the dd8Pipeline-shaped segments, to attribute the steady ~0.5 s
  * construction tax of the eager dd trio.
  */
object PlanPhaseProbe {
  def main(args: Array[String]): Unit = {
    // execution intent: this entry point runs what it builds, so let
    // query construction background-warm checkpoint segments (see
    // Dedup.warmOnConstruct -- plan-only introspection paths leave it off).
    graft.dedup.Dedup.warmOnConstruct = true
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.stream.LocalFsPerf.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (rep <- 1 to 4) {
      import org.apache.spark.sql.functions._
      val base = graft.Tables.documents(spark, dir).select("doc_id", "text")
      val variants = base.filter(col("doc_id") % 25 === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("text", concat(col("text"), lit(" tailword")))
      val docsAll = base.unionByName(variants)
      val slim = docsAll.select(col("doc_id"), md5(col("text")).as("dg"))
        .localCheckpoint(false)
      val repIds = slim.groupBy("dg")
        .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_copies"))
      val docs = docsAll
        .join(repIds.select(col("rep_id").as("doc_id")), Seq("doc_id"), "left_semi")
        .repartition(32, col("doc_id"))
      val shRowsPlan = docs.select(col("doc_id"),
          explode(graft.expressions.ShingleMd5.of(graft.dedup.Dedup.tokens(col("text")), 3)).as("__s"))
        .select(col("doc_id"), col("__s.sh_hi").as("sh_hi"), col("__s.sh_lo").as("sh_lo"))
      val t0 = System.nanoTime()
      shRowsPlan.queryExecution.executedPlan // analysis+optimize+planning
      val t1 = System.nanoTime()
      shRowsPlan.queryExecution.toRdd // + codegen etc.
      val t2 = System.nanoTime()
      val phases = shRowsPlan.queryExecution.tracker.phases
        .map { case (k, v) => f"$k=${(v.endTimeMs - v.startTimeMs)}%dms" }
        .mkString(" ")
      val m = org.apache.spark.metrics.source.CodegenMetrics
      println(f"rep$rep plan=${(t1 - t0) / 1e9}%6.3f s  toRdd=${(t2 - t1) / 1e9}%6.3f s  [$phases]  " +
        s"compiles=${m.METRIC_SOURCE_CODE_SIZE.getCount} compileMs=${m.METRIC_COMPILATION_TIME.getCount}")
    }
    spark.stop()
  }
}
