package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.Ingest

class StreamIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("file-source micro-batch ingest is idempotent across restarts") {
    val base = Files.createTempDirectory("graft-stream").toString
    val inbox = s"$base/inbox"
    val sink = s"$base/sink"
    val ckpt = s"$base/ckpt"
    new java.io.File(inbox).mkdirs()

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    val schema = ev.schema

    // upload 1: events 0..199
    ev.filter(col("event_id") < 200).coalesce(1)
      .write.mode("overwrite").parquet(s"$inbox/u1")
    val q1 = Ingest.start(spark, s"$inbox/*", schema, sink, ckpt, "event_id",
      df => df.filter(col("value").isNotNull))
    q1.awaitTermination()
    val n1 = spark.read.parquet(sink).count()
    assert(n1 == ev.filter(col("event_id") < 200 && col("value").isNotNull).count())

    // upload 2: events 100..299 — overlap [100,200) must NOT duplicate
    ev.filter(col("event_id") >= 100 && col("event_id") < 300).coalesce(1)
      .write.mode("overwrite").parquet(s"$inbox/u2")
    val q2 = Ingest.start(spark, s"$inbox/*", schema, sink, ckpt, "event_id",
      df => df.filter(col("value").isNotNull))
    q2.awaitTermination()

    val out = spark.read.parquet(sink)
    val expected = ev.filter(col("event_id") < 300 && col("value").isNotNull)
    assert(out.count() == expected.count(), "sink row count after overlap")
    assert(out.select("event_id").distinct().count() == out.count(), "no duplicate keys")
  }
}
