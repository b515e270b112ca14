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
      df => df.filter(col("value").isNotNull), boundedSink = true)
    q1.awaitTermination()
    val n1 = spark.read.parquet(sink).count()
    assert(n1 == ev.filter(col("event_id") < 200 && col("value").isNotNull).count())

    // upload 2: events 100..299 — overlap [100,200) must NOT duplicate
    ev.filter(col("event_id") >= 100 && col("event_id") < 300).coalesce(1)
      .write.mode("overwrite").parquet(s"$inbox/u2")
    val q2 = Ingest.start(spark, s"$inbox/*", schema, sink, ckpt, "event_id",
      df => df.filter(col("value").isNotNull), boundedSink = true)
    q2.awaitTermination()

    val out = spark.read.parquet(sink)
    val expected = ev.filter(col("event_id") < 300 && col("value").isNotNull)
    assert(out.count() == expected.count(), "sink row count after overlap")
    assert(out.select("event_id").distinct().count() == out.count(), "no duplicate keys")
  }

  test("a micro-batch's own append is invisible to its anti-join (multi-batch drain)") {
    // Regression guard for an undocumented planner dependency: Ingest.start
    // reads the sink eagerly (InMemoryFileIndex lists files at
    // DataFrame-creation time), which is what keeps a batch's anti-join from
    // observing rows the SAME drain is appending. A Spark upgrade that made
    // that listing lazy would silently turn the anti-join self-observing —
    // batch 2 could see a stale/partial listing or (worse) its own append,
    // dropping fresh keys. Two overlapping micro-batches through ONE drain
    // (maxFilesPerTrigger=1) make that failure loud: every key must land
    // exactly once, including batch 2's NEW keys.
    val base = Files.createTempDirectory("graft-stream-own").toString
    val inbox = s"$base/inbox"
    val sink = s"$base/sink"
    val ckpt = s"$base/ckpt"
    new java.io.File(inbox).mkdirs()

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    // u1: keys [0,200); u2: keys [100,300) — overlap [100,200), fresh [200,300)
    ev.filter(col("event_id") < 200).coalesce(1)
      .write.mode("overwrite").parquet(s"$inbox/u1")
    ev.filter(col("event_id") >= 100 && col("event_id") < 300).coalesce(1)
      .write.mode("overwrite").parquet(s"$inbox/u2")
    Ingest.start(spark, s"$inbox/*", ev.schema, sink, ckpt, "event_id",
      identity, boundedSink = true,
      readOptions = Map("maxFilesPerTrigger" -> "1"))
      .awaitTermination()

    val out = spark.read.schema(ev.schema).parquet(sink)
    val expected = ev.filter(col("event_id") < 300)
    assert(out.select("event_id").distinct().count() == out.count(),
      "overlapping keys must not double across the drain's batches")
    assert(out.count() == expected.count(),
      "batch 2's fresh keys must survive its own-append anti-join")
    QueryContext.rmTree(base)
  }

  test("state-store ingest dedups across batches and restarts without re-reading the sink") {
    val base = Files.createTempDirectory("graft-stream-state").toString
    val inbox = s"$base/inbox"
    val sink = s"$base/sink"
    val ckpt = s"$base/ckpt"
    new java.io.File(inbox).mkdirs()

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    val schema = ev.schema

    // run 1 drains uploads u1 and u2 with an internal overlap [100,200):
    // cross-batch dedup must come from the state store (seen-key set),
    // not from scanning the sink.
    ev.filter(col("event_id") < 200).coalesce(1)
      .write.mode("overwrite").parquet(s"$inbox/u1")
    ev.filter(col("event_id") >= 100 && col("event_id") < 300).coalesce(1)
      .write.mode("overwrite").parquet(s"$inbox/u2")
    val q1 = Ingest.startStateful(spark, s"$inbox/*", schema, sink, ckpt, "event_id",
      df => df.filter(col("value").isNotNull))
    q1.awaitTermination()
    val expected1 = ev.filter(col("event_id") < 300 && col("value").isNotNull)
    val out1 = spark.read.parquet(sink)
    assert(out1.count() == expected1.count(), "run-1 sink count")
    assert(out1.select("event_id").distinct().count() == out1.count(), "run-1 unique keys")

    // run 2 is a RESTART from the same checkpoint: upload u3 re-sends
    // [200,300) (already ingested — must be dropped by the RESTORED state)
    // plus new keys [300,400).
    ev.filter(col("event_id") >= 200 && col("event_id") < 400).coalesce(1)
      .write.mode("overwrite").parquet(s"$inbox/u3")
    val q2 = Ingest.startStateful(spark, s"$inbox/*", schema, sink, ckpt, "event_id",
      df => df.filter(col("value").isNotNull))
    q2.awaitTermination()
    val out2 = spark.read.parquet(sink)
    val expected2 = ev.filter(col("event_id") < 400 && col("value").isNotNull)
    assert(out2.count() == expected2.count(), "run-2 sink count after restart")
    assert(out2.select("event_id").distinct().count() == out2.count(), "run-2 unique keys")
  }

  test("per-stream confs never leak into the user session (AQE clone, provider restore)") {
    // Ingest.start enables AQE on the stream's PRIVATE session clone and
    // startStateful sets the RocksDB provider around .start() with a
    // restore — both must leave the USER session's confs exactly as found,
    // or one drain would silently re-plan every later batch query.
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val provBefore = spark.conf.getOption(provKey)

    val base = Files.createTempDirectory("graft-stream-conf").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    new java.io.File(s"$base/in").mkdirs()
    ev.filter(col("event_id") < 50).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/in/u1")
    Ingest.start(spark, s"$base/in/*", ev.schema, s"$base/sink1",
      s"$base/ckpt1", "event_id", identity, boundedSink = true)
      .awaitTermination()
    Ingest.startStateful(spark, s"$base/in/*", ev.schema, s"$base/sink2",
      s"$base/ckpt2", "event_id", identity).awaitTermination()

    assert(spark.conf.get("spark.sql.adaptive.enabled") == aqeBefore,
      "Ingest.start's AQE enable must stay on the stream clone")
    assert(spark.conf.getOption(provKey) == provBefore,
      "startStateful must restore the session's state-store provider conf")
    // and the RocksDB provider really was pinned for the stateful query
    val offsets = new java.io.File(s"$base/ckpt2/offsets").listFiles()
    assert(offsets != null && offsets.nonEmpty)
    val meta = Files.readString(offsets.head.toPath)
    assert(meta.contains("RocksDBStateStoreProvider"),
      s"checkpoint offset metadata must pin the RocksDB provider:\n$meta")
    QueryContext.rmTree(base)
  }

  test("Ingest.start structurally rejects an unacknowledged O(sink) sink") {
    // The per-batch sink re-read is sanctioned for BOUNDED sinks only
    // (st15's upload table); the sanction used to live in a comment. Now
    // boundedSink has no default and false fails at call time — before
    // any stream starts — pointing the caller at startStateful.
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    val e = intercept[IllegalArgumentException] {
      Ingest.start(spark, "/tmp/nonexistent-inbox/*", ev.schema,
        "/tmp/nonexistent-sink", "/tmp/nonexistent-ckpt", "event_id",
        identity, boundedSink = false)
    }
    assert(e.getMessage.contains("startStateful"), e.getMessage)
  }

  test("dedupBounded: in-horizon dups dropped, state evicted, late dup re-admitted") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ddw").toString
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "ts_s")
        .select(col("id"), to_timestamp(col("ts_s")).as("ts"))
        .coalesce(1).write.mode("append").parquet(s"$base/in")

    write(Seq((1L, "2024-03-01 10:00:00"), (1L, "2024-03-01 10:10:00"),
      (2L, "2024-03-01 10:20:00")))
    val schema = spark.read.parquet(s"$base/in").schema
    spark.catalog.dropTempView("ddw_mem")
    val q = Ingest.dedupBounded(
        spark.readStream.schema(schema).parquet(s"$base/in"),
        "id", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("ddw_mem")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // batch 1: the in-horizon duplicate of key 1 is dropped
      assert(spark.table("ddw_mem").count() == 2, "in-horizon dup not dropped")
      val state1 = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // batch 2: far-future row advances the watermark (20:00 - 1h = 19:00)
      // past both keys' expiry → their state is evicted
      write(Seq((50L, "2024-03-01 20:00:00")))
      q.processAllAvailable()
      val state2 = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(state2 < state1 + 1, s"state not evicted: $state1 -> $state2")
      // batch 3: key 1 again, INSIDE the new watermark horizon — its old
      // state is gone, so it is re-admitted (the documented bounded-state
      // trade-off; rows below the watermark would just be dropped)
      write(Seq((1L, "2024-03-01 20:30:00")))
      q.processAllAvailable()
      val ids = spark.table("ddw_mem").select("id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 1L, 2L, 50L), s"got $ids")
    } finally q.stop()
  }
}
