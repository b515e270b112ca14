package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable

/** One-shot streaming cost profiler: runs each st* query fresh (like Bench's
  * one-shot pass) with a StreamingQueryListener capturing per-batch
  * durationMs, so the split between query-start bootstrap, per-batch
  * planning, state-store work, and sink writes is measurable instead of
  * guessed. Round-9 diagnostic for the one-shot subtotal target.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    // execution intent: this entry point runs what it builds, so let
    // query construction background-warm checkpoint segments (see
    // Dedup.warmOnConstruct -- plan-only introspection paths leave it off).
    graft.dedup.Dedup.warmOnConstruct = true
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.stream.LocalFsPerf.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    val progress = mutable.ArrayBuffer.empty[(String, Long, Map[String, Long])]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        import scala.jdk.CollectionConverters._
        progress += ((p.name, p.batchId, dm.asScala.map { case (k, v) => (k, v.longValue) }.toMap))
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "st4_stream_windowed", "st5_stream_join", "st6_stream_sessions",
      "st7_stream_outer_join", "st8_incremental_agg", "st9_stream_dedup",
      "st10_stream_static", "st11_dedup_window_chain", "st12_foreachbatch_merge")
    // warm one throwaway streaming query so one-time streaming-subsystem init
    // (listener bus, state store coordinator) isn't billed to the first query
    for (name <- names) {
      progress.clear()
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      graft.dedup.Dedup.countSettled(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      val nb = progress.size
      println(f"$name%-28s total=${sec}%6.3f s  batches=$nb")
      for ((qn, bid, dm) <- progress) {
        val keys = dm.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(f"    batch=$bid%-3d $keys")
      }
    }
    spark.stop()
  }
}
