package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.SessionTracker
import graft.stream.SessionTracker.{ClosedSession, Event}

class SessionTrackerSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("fold closes sessions on gaps and keeps the open one") {
    val (open, closed) = SessionTracker.fold(
      None,
      Seq(Event(1, 0), Event(1, 100), Event(1, 2000), Event(1, 2100)),
      gapSeconds = 1800)
    assert(closed == Seq(ClosedSession(1, 0, 100, 2)))
    assert(open.contains(SessionTracker.OpenSession(2000, 2100, 2)))
  }

  test("streaming sessionization carries state across micro-batches") {
    val base = Files.createTempDirectory("graft-sessions").toString
    // batch 1: two events 100s apart; batch 2 (separate file, second run):
    // one event inside the gap, one far beyond it
    Seq(Event(7, 1000), Event(7, 1100)).toDS()
      .write.parquet(s"$base/in/b1")

    def run(): Seq[ClosedSession] = {
      val in = spark.readStream.schema(Seq.empty[Event].toDS().schema)
        .parquet(s"$base/in/*").as[Event]
      val q = SessionTracker.sessions(in, gapSeconds = 1800)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[ClosedSession], _: Long) =>
          batch.write.mode("append").parquet(s"$base/out")
          ()
        }
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      if (new java.io.File(s"$base/out").exists())
        spark.read.parquet(s"$base/out").as[ClosedSession].collect().toSeq
      else Seq.empty
    }

    assert(run().isEmpty) // first session still open, nothing closed yet

    Seq(Event(7, 1500), Event(7, 9000)).toDS()
      .write.parquet(s"$base/in/b2")
    val closed = run()
    // event 1500 extends the open session (state survived the restart);
    // event 9000 closes it: one session [1000,1500] with 3 events
    assert(closed == Seq(ClosedSession(7, 1000, 1500, 3)))

    // batch 3: an event for a DIFFERENT key far in the future advances the
    // watermark past key 7's gap — its open session [9000] must close via
    // the event-time TIMEOUT path, with no further key-7 events.
    Seq(Event(8, 100000)).toDS().write.parquet(s"$base/in/b3")
    val afterTimeout = run()
    assert(afterTimeout.contains(ClosedSession(7, 9000, 9000, 1)),
      s"expected key 7 timeout close, got: ${afterTimeout.mkString(", ")}")
  }

  test("timeout boundary is strict: end+gap == watermark stays open") {
    // The st6 oracle encodes Spark's EventTimeTimeout firing rule as
    // `end_sec + gap < max ts` (STRICT). Pin that: a drained AvailableNow
    // run whose final watermark lands exactly ON a session's timeout
    // timestamp must NOT emit it, while one second past it must.
    val base = Files.createTempDirectory("graft-sessions-bnd").toString
    // key 1 session ends at 1000 → timeout ts (1000+1800)·1000 ms.
    // key 2's lone event at exactly 2800 pins the watermark AT the timeout.
    Seq(Event(1, 1000), Event(2, 2800)).toDS()
      .write.parquet(s"$base/at/in")
    def drained(dir: String): Seq[ClosedSession] = {
      val in = spark.readStream.schema(Seq.empty[Event].toDS().schema)
        .parquet(s"$dir/in").as[Event]
      spark.catalog.dropTempView("session_bnd")
      val q = SessionTracker.sessions(in, gapSeconds = 1800)
        .writeStream.format("memory").queryName("session_bnd")
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table("session_bnd").as[ClosedSession].collect().toSeq
    }
    assert(drained(s"$base/at").isEmpty,
      "watermark == timeout must not fire (strict <)")
    Seq(Event(1, 1000), Event(2, 2801)).toDS()
      .write.parquet(s"$base/past/in")
    assert(drained(s"$base/past").contains(ClosedSession(1, 1000, 1000, 1)),
      "watermark one past the timeout must fire")
  }
}
