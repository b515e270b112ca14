package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST3: the reference's in-memory task-status state machine
  * (fastapi_app.py:148-149,213-215,259-275 — pending → processing →
  * completed/failed, tracked per task id in a dict) as Structured Streaming
  * keyed state.
  *
  * `mapGroupsWithState` keeps one small state record per task key,
  * partitioned by key across executors — the distributed replacement for
  * the reference's single-process dict. Invalid transitions are ignored
  * (a terminal task never leaves completed/failed), matching the
  * reference's last-write endpoint behavior.
  */
object StatusTracker {

  case class StatusEvent(taskId: String, status: String, seq: Long)
  case class TaskState(taskId: String, status: String, transitions: Long, lastSeq: Long)

  val Order: Map[String, Int] =
    Map("pending" -> 0, "processing" -> 1, "completed" -> 2, "failed" -> 2)

  private[graft] def step(state: TaskState, ev: StatusEvent): TaskState = {
    val terminal = state.status == "completed" || state.status == "failed"
    val valid = !terminal &&
      Order.get(ev.status).exists(_ >= Order.getOrElse(state.status, 0))
    if (valid && ev.status != state.status)
      TaskState(state.taskId, ev.status, state.transitions + 1, ev.seq)
    else state
  }

  private def updateState(
      taskId: String,
      events: Iterator[StatusEvent],
      state: GroupState[TaskState]): TaskState = {
    val init = state.getOption.getOrElse(TaskState(taskId, "pending", 0L, -1L))
    val next = events.toSeq.sortBy(_.seq).foldLeft(init)(step)
    state.update(next)
    next
  }

  /** Fold a stream of status events into per-task current state. */
  def track(events: Dataset[StatusEvent])(implicit spark: SparkSession): Dataset[TaskState] = {
    import spark.implicits._
    events
      .groupByKey(_.taskId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateState)
  }

  /** Batch-shaped equivalent (for deterministic testing): replay all events
    * per task in seq order.
    */
  def replay(events: Dataset[StatusEvent])(implicit spark: SparkSession): Dataset[TaskState] = {
    import spark.implicits._
    events.groupByKey(_.taskId).mapGroups { (id, evs) =>
      evs.toSeq.sortBy(_.seq).foldLeft(TaskState(id, "pending", 0L, -1L))(step)
    }
  }
}
