package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** ST2 streaming variant: keyed dedup with a watermark —
  * `dropDuplicatesWithinWatermark` keeps per-key state only until the
  * watermark passes, so dedup state is bounded by the lateness window
  * instead of growing with the stream (the property that matters on an
  * unbounded 100 TB ingest).
  */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dropDuplicatesWithinWatermark dedups keys across a micro-batch") {
    val base = Files.createTempDirectory("graft-sdedup").toString
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      (1L, Timestamp.valueOf("2024-01-01 00:00:05"), 11.0), // dup key
      (2L, Timestamp.valueOf("2024-01-01 00:00:10"), 20.0),
      (3L, Timestamp.valueOf("2024-01-01 00:01:00"), 30.0),
      (2L, Timestamp.valueOf("2024-01-01 00:01:05"), 21.0)  // dup key
    ).toDF("event_id", "ts", "value")
    rows.coalesce(1).write.parquet(s"$base/in/b1")

    val q = spark.readStream.schema(rows.schema).parquet(s"$base/in/*")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(s"$base/out")
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 3)
    assert(out.select("event_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // first arrival wins within the batch (file order): values 10, 20, 30
    assert(out.select(sum("value")).as[Double].head() == 60.0)
  }
}
