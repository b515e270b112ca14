package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stream.StatusTracker
import graft.stream.StatusTracker.{StatusEvent, TaskState}

class StatusTrackerSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark

  test("step enforces the pending→processing→terminal state machine") {
    val s0 = TaskState("t", "pending", 0, -1)
    val s1 = StatusTracker.step(s0, StatusEvent("t", "processing", 1))
    assert(s1.status == "processing" && s1.transitions == 1)
    val s2 = StatusTracker.step(s1, StatusEvent("t", "completed", 2))
    assert(s2.status == "completed")
    // terminal state never transitions again
    val s3 = StatusTracker.step(s2, StatusEvent("t", "processing", 3))
    assert(s3 == s2)
    // backwards transition ignored
    val s4 = StatusTracker.step(s1, StatusEvent("t", "pending", 4))
    assert(s4 == s1)
  }

  test("replay folds per-task events in seq order") {
    import spark.implicits._
    val events = Seq(
      StatusEvent("a", "processing", 1), StatusEvent("a", "completed", 2),
      StatusEvent("b", "failed", 1),
      StatusEvent("c", "completed", 2), StatusEvent("c", "processing", 1)
    ).toDS()
    val out = StatusTracker.replay(events).collect().map(t => t.taskId -> t.status).toMap
    assert(out == Map("a" -> "completed", "b" -> "failed", "c" -> "completed"))
  }

  test("track maintains keyed state over a stream (batch Dataset path)") {
    import spark.implicits._
    val events = Seq(
      StatusEvent("x", "processing", 1), StatusEvent("x", "completed", 2)
    ).toDS()
    // mapGroupsWithState on a batch Dataset exercises the same state logic
    val out = StatusTracker.track(events).collect()
    assert(out.length == 1 && out.head.status == "completed" && out.head.transitions == 2)
  }
}
