package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.expressions.GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = graft.QueryContext.dd8Pipeline(spark, dir)
    val plan = p.queryExecution.executedPlan.toString
    println("JOINS:")
    plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange")).foreach(println)
  }
}
