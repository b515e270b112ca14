package graft.tools
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
object T7Probe {
  def main(args: Array[String]): Unit = {
    // execution intent: this entry point runs what it builds, so let
    // query construction background-warm checkpoint segments (see
    // Dedup.warmOnConstruct -- plan-only introspection paths leave it off).
    graft.dedup.Dedup.warmOnConstruct = true
    val dir = "/root/testdata/sf0.1"
    val spark = graft.stream.LocalFsPerf.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(label: String)(df: => DataFrame): Unit = {
      val d = df; graft.dedup.Dedup.countSettled(d) // warm (drained)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); d.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-30s min=${ts.min}%6.3f")
    }
    val raw = graft.Tables.events(spark, dir).select(
      col("user_id").cast("string").as("float_id"),
      col("event_id").cast("string").as("profile_id"),
      col("ts").as("time"),
      expr("mod(value, 180) - 90").as("latitude"),
      expr("mod(value * 2, 360) - 180").as("longitude"),
      array(expr("mod(value, 45)"), lit(null).cast("double"),
        expr("mod(value, 50) - 5")).as("temperature"),
      array(expr("mod(value, 50)"), expr("mod(value, 40)"),
        lit(null).cast("double")).as("salinity"),
      array(expr("mod(value, 6000)"), lit(null).cast("double"),
        lit(null).cast("double")).as("pressure"))
    time("raw scan")(raw)
    val tidy = graft.ingest.Pipeline.tidy(raw)
    time("tidy")(tidy)
    val cleaned = graft.ingest.Pipeline.clean(tidy, "2026-01-01")
    time("tidy+clean")(cleaned)
    time("agg no-distinct")(cleaned.groupBy("float_id").agg(
      min("time").as("d1"), max("time").as("d2"),
      min("latitude"), max("latitude"), min("longitude"), max("longitude"),
      min("temperature"), max("temperature"), min("salinity"), max("salinity"),
      max("pressure")))
    time("agg with countDistinct")(cleaned.groupBy("float_id").agg(
      countDistinct(col("profile_id")).as("n_prof"),
      min("time").as("d1"), max("time").as("d2"),
      min("latitude"), max("latitude"), min("longitude"), max("longitude"),
      min("temperature"), max("temperature"), min("salinity"), max("salinity"),
      max("pressure")))
    time("full t7")(graft.SparkEntry.queries("t7_reference_t1")(spark, dir))
    time("full t6")(graft.SparkEntry.queries("t6_reference_doc")(spark, dir))
    spark.stop()
  }
}
