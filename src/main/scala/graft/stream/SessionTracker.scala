package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful gap-based sessionization over a keyed event stream — the
  * streaming twin of the batch `w2_sessionize` query (lag + running sum).
  *
  * Keyed state holds only (last event time, open-session aggregates): O(1)
  * per key, so state size is bounded by active keys, not events — the
  * property that keeps it viable on an unbounded stream. A session closes
  * when a later event arrives more than `gapSeconds` after the previous
  * one; closed sessions are emitted, the open one stays in state. Works
  * identically across micro-batches (state persists in the checkpoint),
  * which the spec proves by feeding the same events in one batch vs two.
  */
object SessionTracker {

  case class Event(userId: Long, tsSec: Long)
  case class OpenSession(startSec: Long, lastSec: Long, nEvents: Long)
  case class ClosedSession(userId: Long, startSec: Long, endSec: Long, nEvents: Long)

  private[graft] def fold(
      openOpt: Option[OpenSession],
      events: Seq[Event],
      gapSeconds: Long): (Option[OpenSession], Seq[ClosedSession]) = {
    val sorted = events.sortBy(_.tsSec)
    var open = openOpt
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.tsSec - s.lastSec <= gapSeconds =>
          open = Some(s.copy(lastSec = e.tsSec, nEvents = s.nEvents + 1))
        case Some(s) =>
          closed += ClosedSession(e.userId, s.startSec, s.lastSec, s.nEvents)
          open = Some(OpenSession(e.tsSec, e.tsSec, 1))
        case None =>
          open = Some(OpenSession(e.tsSec, e.tsSec, 1))
      }
    }
    (open, closed.result())
  }

  private def update(gapSeconds: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      // Event-time timeout: the watermark passed the gap after the open
      // session's last event with nothing new for this key — close it and
      // release the state (no zombie keys).
      val out = state.getOption.map(s =>
        ClosedSession(userId, s.startSec, s.lastSec, s.nEvents)).iterator
      state.remove()
      out
    } else {
      val (open, closed) = fold(state.getOption, events.toSeq, gapSeconds)
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp((s.lastSec + gapSeconds) * 1000L)
      }
      closed.iterator
    }
  }

  /** Emit closed sessions; the open session per key stays in state until
    * either a later event closes it or the event-time watermark passes its
    * gap (timeout path — sessions end even for keys that fall silent).
    * `events` must carry a watermark on an event-time column when streaming.
    */
  def sessions(events: Dataset[Event], gapSeconds: Long)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val withWatermark =
      if (events.isStreaming)
        events
          .withColumn("eventTime", timestamp_seconds(col("tsSec")))
          .withWatermark("eventTime", "0 seconds")
          .as[Event]
      else events
    withWatermark
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update(gapSeconds))
  }

  /** Drain whatever is still open (batch-mode finalization helper). */
  def withFinalSessions(
      events: Dataset[Event], gapSeconds: Long)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events.groupByKey(_.userId).flatMapGroups { (id, evs) =>
      val (open, closed) = fold(None, evs.toSeq, gapSeconds)
      (closed ++ open.map(s => ClosedSession(id, s.startSec, s.lastSec, s.nEvents))).iterator
    }
  }
}
