package graft.tools
import org.apache.spark.sql.SparkSession
object SpotBench {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // GRAFT_NO_EXT=1 → vanilla session (A/B: custom operators vs fallbacks)
    if (!sys.env.contains("GRAFT_NO_EXT"))
      builder.withExtensions(new graft.expressions.GraftExtensions())
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val names = args.drop(1)
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"$n%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$cnt")
    }
    spark.stop()
  }
}
