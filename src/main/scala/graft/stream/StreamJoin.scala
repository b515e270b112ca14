package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the attribution shape (join
  * each right-side event to the left-side events of the same key that
  * happened up to `windowSec` earlier).
  *
  * Why this exact form scales: with BOTH sides watermarked and the join
  * condition carrying an event-time INTERVAL, Spark can bound the join
  * state — a left row is evicted once the watermark passes `leftTs +
  * windowSec` (no future right row can match it), a right row once the
  * watermark passes `rightTs`. Without the interval term the state grows
  * forever; with it a 1000-executor job holds only `rate × window` rows
  * per side. Inner-join matches emit as they arrive (no watermark wait),
  * so the single-batch AvailableNow run equals the batch join — which is
  * exactly what the DuckDB oracle computes. Works identically on batch
  * frames (watermarks skipped), so batch and streaming results agree by
  * construction.
  */
object StreamJoin {

  /** `joinType` "inner" (default) or "leftOuter". Outer semantics on a
    * stream: matches still emit as they arrive; an unmatched left row
    * emits null-extended only when the watermark proves no future right
    * row can match it (state eviction) — so a drained run emits every
    * unmatched left row except those whose match window still reaches
    * past the final watermark. That boundary is exactly what the st7
    * oracle encodes.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      watermark: String, windowSec: Long,
      joinType: String = "inner"): DataFrame = {
    val l0 = left.withColumnRenamed(key, "__lkey")
    val r0 = right.withColumnRenamed(key, "__rkey")
    val l = if (l0.isStreaming) l0.withWatermark(leftTs, watermark) else l0
    val r = if (r0.isStreaming) r0.withWatermark(rightTs, watermark) else r0
    l.join(r,
        col("__lkey") === col("__rkey") &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $windowSec SECONDS"),
        joinType)
      .withColumnRenamed("__lkey", key)
      .drop("__rkey")
  }
}
