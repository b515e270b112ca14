package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.rules.RuleExecutor

/** Round-11 diagnostic: per-invocation Catalyst rule time for one query at
  * steady state (warm caches). Runs the query 4x, resets the RuleExecutor
  * counters, runs once more, and dumps the top rule costs — attributing the
  * driver-side gaps StageProbe showed between jobs.
  */
object RuleTimeProbe {
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

    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      (1 to 4).foreach(_ => graft.dedup.Dedup.countSettled(fn(spark, dir)))
      RuleExecutor.resetMetrics()
      val t0 = System.nanoTime()
      graft.dedup.Dedup.countSettled(fn(spark, dir))
      val total = (System.nanoTime() - t0) / 1e9
      println(f"$name%-26s total=$total%6.3f s")
      val report = RuleExecutor.dumpTimeSpent()
      // keep the header + top 25 rule lines by time
      println(report.linesIterator.take(8).mkString("\n"))
      println(report.linesIterator.drop(8)
        .filter(_.trim.nonEmpty).take(25).mkString("\n"))
    }
    spark.stop()
  }
}
