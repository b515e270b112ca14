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
}
