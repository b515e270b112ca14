package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump .explain("formatted") for named queries to plans/<out>/<name>_<suffix>.txt */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val suffix = args(0) // e.g. "before" | "after"
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
    args.drop(1).foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"plans/r18/${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] wrote plans/r18/${name}_$suffix.txt")
      } catch { case e: Throwable => println(s"[explain] $name FAILED: $e") }
    }
    spark.stop()
  }
}
