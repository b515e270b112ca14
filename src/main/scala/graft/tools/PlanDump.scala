package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions()).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val name = if (a.nonEmpty) a(0) else "ta10_bm25_topk"
    val df = graft.SparkEntry.queries(name)(s, "/root/testdata/sf0.01")
    println(df.queryExecution.executedPlan.toString)
  }
}
