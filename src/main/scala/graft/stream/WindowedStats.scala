package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarking — the streaming form of
  * the reference's time-range stats (A1/A3 are batch min/max-over-time; a
  * live deployment of the same pipeline needs them incrementally).
  *
  * Shape: `withWatermark` bounds state retention (late rows beyond the
  * watermark are dropped, state for closed windows is evicted — the property
  * that keeps a 1000-executor streaming job's state finite), then a tumbling
  * `window()` groupBy computes the same partial+final hash aggregate as the
  * batch path. The aggregation expressions are shared with `agg.Stats`, so
  * batch and streaming results agree by construction.
  */
object WindowedStats {

  /** Tumbling event-time window stats over a (streaming or batch) frame. */
  def tumbling(
      df: DataFrame,
      tsCol: String,
      windowLen: String,
      watermark: String,
      measures: Seq[String]): DataFrame = {
    val base =
      if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_rows")) ++
        measures.flatMap(graft.agg.Stats.measureStats)
    base
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("*")
      ).drop("w")
  }
}
