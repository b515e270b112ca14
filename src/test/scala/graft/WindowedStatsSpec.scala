package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.WindowedStats

class WindowedStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming tumbling-window stats equal the batch computation") {
    val base = Files.createTempDirectory("graft-window").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "value")
    ev.coalesce(1).write.mode("overwrite").parquet(s"$base/in")

    // batch reference
    val batch = WindowedStats.tumbling(
      spark.read.parquet(s"$base/in"), "ts", "1 day", "1 hour", Seq("value"))
      .orderBy("window_start").collect()

    // streaming run over the same files
    val stream = spark.readStream.schema(ev.schema).parquet(s"$base/in")
    val q = WindowedStats.tumbling(stream, "ts", "1 day", "1 hour", Seq("value"))
      .writeStream
      .format("memory")
      .queryName("win_stats")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.awaitTermination()

    val streamed = spark.table("win_stats").orderBy("window_start").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
  }

  /** The live-deployment path st4's complete-mode oracle run can't show:
    * append mode + out-of-order batches. The watermark must (a) drop ONLY
    * rows later than the allowed lateness, (b) still accept in-order-window
    * stragglers above it, and (c) emit a window exactly once when the
    * watermark passes its end while never emitting still-open windows —
    * (c) is the finite-state property that lets a 1000-executor job run
    * forever.
    */
  test("append mode: watermark drops only too-late rows and bounds state") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-window-late").toString
    val inbox = s"$base/in"

    def writeBatch(rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts_s", "value")
        .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(inbox)

    // batch 1: two rows in the 10:00 window, one in 11:00 →
    // after this batch the watermark is max(11:20) - 1h = 10:20
    writeBatch(Seq(
      (1L, "2024-03-01 10:10:00", 1.0),
      (2L, "2024-03-01 10:50:00", 2.0),
      (3L, "2024-03-01 11:20:00", 4.0)))

    val schema = spark.read.parquet(inbox).schema
    spark.catalog.dropTempView("st4_append")
    val q = WindowedStats.tumbling(
        spark.readStream.schema(schema).parquet(inbox),
        "ts", "1 hour", "1 hour", Seq("value"))
      .writeStream.format("memory").queryName("st4_append")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // batch 2, out of order: a too-late row whose WHOLE WINDOW is closed
      // ([09:00,10:00) ends before watermark 10:20 → DROPPED — Spark's
      // lateness cut is the window end, not the raw event time), a
      // straggler for the still-open 10:00 window (accepted), and a 14:00
      // row that advances the watermark to 13:00, closing 10:00 and 11:00
      writeBatch(Seq(
        (4L, "2024-03-01 09:05:00", 100.0),
        (5L, "2024-03-01 10:40:00", 8.0),
        (6L, "2024-03-01 14:00:00", 16.0)))
      q.processAllAvailable()
      // the state operator itself must report exactly one watermark drop
      assert(q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum == 1L)

      val emitted = spark.table("st4_append")
        .select("window_start", "n_rows", "value_count", "value_min", "value_max")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      // closed windows emitted exactly once, with the straggler counted and
      // the dropped row's 09:00 window absent entirely (it would surface as
      // its own max=100.0 row had it leaked into state)
      assert(emitted.keySet == Set("2024-03-01 10:00:00", "2024-03-01 11:00:00"),
        s"emitted: $emitted")
      assert(emitted("2024-03-01 10:00:00") == ((3L, 3L, 1.0, 8.0)), s"$emitted")
      assert(emitted("2024-03-01 11:00:00") == ((1L, 1L, 4.0, 4.0)), s"$emitted")
      // the 14:00 window is still open: in state, NOT in the sink
    } finally q.stop()
  }
}
