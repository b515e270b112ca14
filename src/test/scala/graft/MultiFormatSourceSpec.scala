package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source-layer format independence: the same relational computation over
  * parquet, CSV, and JSON landings of the same data produces identical
  * results. The engine's operators never care about the wire format — only
  * the scan differs (and only parquet gets full pushdown; the spec is the
  * documentation of that trade-off).
  */
class MultiFormatSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("mergeSchema unifies evolving parquet landings (new columns null-filled)") {
    val base = Files.createTempDirectory("graft-evolve").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.select("event_id", "value").filter(col("event_id") < 100)
      .write.parquet(s"$base/t/v1")
    ev.select("event_id", "value", "event_type").filter(col("event_id") >= 100 && col("event_id") < 200)
      .write.parquet(s"$base/t/v2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$base/t/*")
    assert(merged.columns.toSet == Set("event_id", "value", "event_type"))
    assert(merged.count() == 200)
    assert(merged.filter(col("event_type").isNull).count() == 100)
  }

  test("csv and json landings reproduce the parquet query result") {
    val base = Files.createTempDirectory("graft-formats").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type", "value")

    ev.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    ev.write.mode("overwrite").json(s"$base/json")

    def summarize(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
        .orderBy("event_type")
        .collect().map(_.toString).toSeq

    val fromParquet = summarize(ev)
    val fromCsv = summarize(
      spark.read.option("header", "true").schema(ev.schema).csv(s"$base/csv"))
    val fromJson = summarize(spark.read.schema(ev.schema).json(s"$base/json"))

    assert(fromCsv == fromParquet, "csv mismatch")
    assert(fromJson == fromParquet, "json mismatch")
  }
}
