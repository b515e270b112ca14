package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity trajectory statistics — the float-track analysis the reference
  * runs over ARGO profile sequences (preprocess_floats_to_chromadb.py's
  * per-float lat/lon aggregation, generalized to ordered track geometry).
  *
  * Scale shape: ONE shuffle on the track key; the lag window and the final
  * aggregate share that partitioning, so a 100 TB ping table moves across
  * the network exactly once. Per-key state is the sort buffer for that
  * key's pings — tracks are bounded (one float reports ~10^3-10^5 profiles),
  * not corpus-sized, so no key ever exceeds executor memory.
  *
  * Numerics: step distances are computed on INTEGER coordinates (callers
  * pass scaled fixed-point lat/lon, e.g. centidegrees), so the squared-
  * displacement sum is exact under any aggregation order; the only floating
  * op is the final `sqrt` of an integer max, which IEEE defines exactly —
  * the whole output is engine-reproducible without rounding slop.
  */
object Trajectory {

  /** Per-key track stats over integer-coordinate pings.
    *
    * Orders each key's pings by (`tsCol`, `tieCol`) — the tie column makes
    * the fold deterministic under equal timestamps — and emits one row per
    * key: `n_pings`, `n_steps`, `total_d2` (exact sum of squared step
    * displacements), `max_step` (sqrt of the largest squared step, rounded
    * to 6), and `n_cells` (distinct `cellDiv`-sized grid cells visited —
    * the track's spatial footprint). Coordinates must be non-negative if
    * `cellDiv` bucketing is used (shift before calling): integer division
    * truncates toward zero, which only equals floor-division on
    * non-negatives, and the oracle's `//` floors.
    */
  def trackStats(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, latCol: String, lonCol: String,
      cellDiv: Long): DataFrame = {
    require(cellDiv > 0, s"cellDiv must be positive, got $cellDiv")
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    val dlat = col(latCol) - lag(latCol, 1).over(w)
    val dlon = col(lonCol) - lag(lonCol, 1).over(w)
    df.withColumn("__d2", dlat * dlat + dlon * dlon)
      .withColumn("__cell",
        expr(s"`$latCol` div ${cellDiv}L") * 1000000L +
          expr(s"`$lonCol` div ${cellDiv}L"))
      .groupBy(keyCol)
      .agg(
        count(lit(1)).as("n_pings"),
        count(col("__d2")).as("n_steps"),
        coalesce(sum("__d2"), lit(0L)).as("total_d2"),
        round(sqrt(coalesce(max("__d2"), lit(0L))), 6).as("max_step"),
        countDistinct("__cell").as("n_cells"))
  }
}
