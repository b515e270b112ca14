package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.metrics.source.CodegenMetrics
object CgProbe {
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
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def snap() = (CodegenMetrics.METRIC_SOURCE_CODE_SIZE.getCount,
      CodegenMetrics.METRIC_COMPILATION_TIME.getCount,
      CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getMean)
    val before = snap()
    graft.dedup.Dedup.countSettled(graft.SparkEntry.queries(args(0))(spark, dir))
    val after = snap()
    println(s"query=${args(0)} srcBytes=${after._1 - before._1} nCompiles=${after._2 - before._2} meanCompileMs=${after._3}")
    spark.stop()
  }
}
