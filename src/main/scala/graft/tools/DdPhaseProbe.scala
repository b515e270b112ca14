package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-10 diagnostic: splits a dd-trio invocation into CONSTRUCTION
  * (query-function call — plan building, per-localCheckpoint Catalyst
  * optimize+codegen, plus the CC loop's in-construction actions) vs the
  * final COUNT action, under the bench session profile. Attribution for
  * where the ~1.3 s in-sweep cost actually sits.
  */
object DdPhaseProbe {
  def main(args: Array[String]): Unit = {
    // execution intent: this entry point runs what it builds, so let
    // query construction background-warm checkpoint segments (see
    // Dedup.warmOnConstruct -- plan-only introspection paths leave it off).
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
    for (name <- args; rep <- 1 to 4) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      graft.dedup.Dedup.countSettled(df)
      val t2 = System.nanoTime()
      println(f"$name%-22s rep$rep construct=${(t1 - t0) / 1e9}%6.3f s  count=${(t2 - t1) / 1e9}%6.3f s")
    }
    spark.stop()
  }
}
