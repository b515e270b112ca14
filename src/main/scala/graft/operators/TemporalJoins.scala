package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — operators Spark lacks natively, composed from
  * existing operators with shapes that survive 100 TB (SURVEY.md §7.3
  * preference (a): compose before custom Catalyst work).
  *
  * As-of: the naive form (θ-join on `u.ts <= q.ts` + per-query max) is a
  * nested loop. The scalable form is the merge-sorted union: tag both
  * sides, sort within each key by (time, side), and forward-fill the last
  * update value with an ignore-nulls window — ONE shuffle on the key, one
  * sort, linear scan. Ties at equal time resolve update-first (the `<=`
  * as-of convention, matching DuckDB's native ASOF JOIN, which oracles it).
  *
  * Range: points-in-interval via bucketing. Each interval explodes to the
  * fixed-width buckets it overlaps; points compute their bucket in O(1);
  * the join is then an equi-join on bucket + residual predicate — candidate
  * pairs are bounded by (interval span / bucket width) per interval instead
  * of |points|×|intervals|.
  */
object TemporalJoins {

  /** For each row of `queries`, the `valueCol` of the latest `updates` row
    * with the same `key` and time <= the query's time. Output: all query
    * columns + `asofCol`. `updates` must be unique per (key, time).
    */
  def asofJoin(
      queries: DataFrame, updates: DataFrame,
      key: String, time: String, valueCol: String, asofCol: String): DataFrame = {
    val qCols = queries.columns
    // The update value rides inside a single-field STRUCT: the forward-fill
    // skips nulls to pass over interleaved query rows, and a bare null
    // VALUE would be passed over too — silently substituting the previous
    // non-null update where true as-of semantics (DuckDB ASOF JOIN, pandas
    // merge_asof) match the latest ROW and return its value, null included.
    // The struct is non-null for every update row, so the fill stops at the
    // matched row; the field extract then surfaces its possibly-null value.
    // Caught by the round-12 null-injection fuzz (tools/fuzz_sweep.py).
    val u = updates.select(col(key), col(time),
        struct(col(valueCol).as("v")).as("__upd"))
      .withColumn("__side", lit(0))
    val q = queries.withColumn("__upd", lit(null).cast(u.schema("__upd").dataType))
      .withColumn("__side", lit(1))
    val unioned = q.unionByName(u, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asofCol, last(col("__upd"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .select(qCols.map(col).toIndexedSeq :+ col(asofCol): _*)
  }

  /** Join `points` to the `intervals` containing them ([lo, hi)), via
    * fixed-width bucket explosion. Output: point columns + interval columns.
    */
  def bucketedRangeJoin(
      points: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    val ranged = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor((col(hiCol) - lit(1e-9)) / bucketWidth).cast("long"))))
    val bucketed = points.withColumn("__bucket",
      floor(col(valueCol) / bucketWidth).cast("long"))
    bucketed.join(ranged, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }

  /** As-of join with direction and a match tolerance — the feature-store
    * lookup shape ("nearest reading, but only if fresh enough"). Same
    * merge-sorted-union plan as [[asofJoin]] (ONE shuffle on the key, one
    * sort, linear scan; no θ-join), but the forward-fill carries the
    * update's TIMESTAMP alongside its value so matches farther than
    * `toleranceMicros` null out afterwards — a per-row predicate, free.
    *
    * `forward = false`: latest update with `u.time <= q.time` (backward,
    * the [[asofJoin]] convention). `forward = true`: earliest update with
    * `u.time >= q.time` (next-reading lookup) via the same window over the
    * DESCENDING time order. Ties at equal time match in both directions.
    * `time` must be a timestamp column; `updates` unique per (key, time).
    * Output: all query columns + `asofCol` (null when no update within
    * tolerance).
    */
  def asofJoinTolerance(
      queries: DataFrame, updates: DataFrame,
      key: String, time: String, valueCol: String, asofCol: String,
      toleranceMicros: Long, forward: Boolean = false): DataFrame = {
    require(toleranceMicros >= 0, s"tolerance must be >= 0, got $toleranceMicros")
    val qCols = queries.columns
    val u = updates.select(col(key), col(time),
        struct(col(time).as("t"), col(valueCol).as("v")).as("__upd"))
      .withColumn("__side", lit(0))
    val q = queries
      .withColumn("__upd", lit(null).cast(u.schema("__upd").dataType))
      .withColumn("__side", lit(1))
    val ord = if (forward) col(time).desc else col(time).asc
    val w = Window.partitionBy(col(key)).orderBy(ord, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap =
      if (forward) unix_micros(col("__m.t")) - unix_micros(col(time))
      else unix_micros(col(time)) - unix_micros(col("__m.t"))
    q.unionByName(u, allowMissingColumns = true)
      .withColumn("__m", last(col("__upd"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn(asofCol, when(gap <= toleranceMicros, col("__m.v")))
      .select(qCols.map(col).toIndexedSeq :+ col(asofCol): _*)
  }

  /** Interval×interval OVERLAP join on closed integer intervals, bucketed.
    *
    * Both sides explode to the fixed-width cells their interval spans and
    * equi-join on (key, cell); a pair overlapping several cells would be
    * emitted once per shared cell, so each pair is kept ONLY in the cell
    * containing the overlap's start — `greatest(lo_a, lo_b) div width` — a
    * pure per-row predicate that replaces the `.distinct()` exchange the
    * naive bucketed join needs. Candidate volume is bounded by
    * (span/width)² per key-cell, never |A|×|B|; pick `cellWidth` ≳ the
    * typical interval span so most intervals land in 1-2 cells.
    *
    * `left`/`right` must share `keyCol`; their other columns must not
    * collide (prefix them before calling). Output: key + both sides'
    * columns + `overlap` (closed-interval day count, min(hi)-max(lo)+1).
    */
  def intervalOverlapJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      loA: String, hiA: String, loB: String, hiB: String,
      cellWidth: Long): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive, got $cellWidth")
    def cells(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__cell",
        explode(sequence(expr(s"`$lo` div ${cellWidth}L"),
          expr(s"`$hi` div ${cellWidth}L"))))
    cells(left, loA, hiA)
      .join(cells(right, loB, hiB), Seq(keyCol, "__cell"))
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .filter(col("__cell") === expr(s"greatest(`$loA`, `$loB`) div ${cellWidth}L"))
      .withColumn("overlap",
        least(col(hiA), col(hiB)) - greatest(col(loA), col(loB)) + 1)
      .drop("__cell")
  }
}
