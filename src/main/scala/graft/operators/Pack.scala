package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: concatenate documents in
  * a deterministic order and chunk the token stream into fixed-size windows
  * (the "concat-and-chunk" recipe pretraining pipelines use to fill every
  * context window).
  *
  * The core primitive is a global running total — `sum() OVER (ORDER BY
  * key)` — which naively plans as a SINGLE-PARTITION window: every row of a
  * 100 TB table through one task. [[globalCumsum]] is the scale-safe form:
  * deterministic key-range buckets, one tiny per-bucket total aggregate
  * (map-side combined, P rows out), a driver-side prefix scan over those P
  * totals folded back as a broadcast map literal, and a per-BUCKET window
  * for the local running sum — P parallel window partitions of N/P rows,
  * never one of N.
  */
object Pack {

  /** Exclusive global running sum of `valueCol` in `orderCol` order, written
    * to `outCol`. `orderCol` must be unique, non-null, non-negative
    * integral, and `df`'s lineage must be DETERMINISTIC across jobs (no
    * unseeded sample/rand upstream): the input is scanned three times (max
    * key, bucket totals, bucketed window), and the passes must agree. Each
    * pass shuffles the data at most once and keeps every partition at
    * ~N/`buckets` rows.
    */
  def globalCumsum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String,
      buckets: Int = 32): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val maxKey = df.agg(max(col(orderCol).cast("long"))).head() match {
      case r if r.isNullAt(0) => return df.withColumn(outCol, lit(0L)) // empty
      case r => r.getLong(0)
    }
    val span = math.max(1L, maxKey / buckets + 1)
    // exact integer division (a double floor would wobble past 2^53)
    val bucket = expr(s"CAST(`$orderCol` AS BIGINT) div ${span}L")
    val withBucket = df.withColumn("__pack_bucket", bucket)
    // P rows to the driver: the per-bucket totals that seed the prefix scan.
    // NULL values count as 0 (a bucket of only-null values must still
    // produce a total, and sum() alone would return NULL for it).
    val totals = withBucket.groupBy("__pack_bucket")
      .agg(coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("__t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0L, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toMap
    // fold the P offsets back as a broadcast map literal — no join, no shuffle
    val offsetExpr: Column =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.toSeq.sortBy(_._1).flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*),
        col("__pack_bucket"))
    val w = Window.partitionBy("__pack_bucket").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    withBucket
      .withColumn(outCol,
        coalesce(sum(col(valueCol).cast("long")).over(w), lit(0L)) + offsetExpr)
      .drop("__pack_bucket")
  }

  /** Chunk the concatenated token stream into `chunkTokens`-sized windows:
    * one output row per (document × chunk it overlaps), with the token
    * count the document contributes to that chunk. Zero-token documents
    * occupy no chunk and are dropped. `chunkTokens` must be a power of two
    * (the chunk index is a shift, staying in codegen-friendly integer ops).
    */
  def chunk(
      withOffsets: DataFrame,
      startCol: String,
      tokensCol: String,
      chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0 && (chunkTokens & (chunkTokens - 1)) == 0,
      s"chunkTokens must be a positive power of two, got $chunkTokens")
    val shift = java.lang.Integer.numberOfTrailingZeros(chunkTokens)
    withOffsets
      .filter(col(tokensCol) > 0)
      .withColumn("__end", col(startCol) + col(tokensCol).cast("long"))
      .withColumn("chunk_id", explode(sequence(
        shiftright(col(startCol), shift),
        shiftright(col("__end") - 1, shift))))
      .withColumn("chunk_tokens",
        least(col("__end"), (col("chunk_id") + 1) * chunkTokens) -
          greatest(col(startCol), col("chunk_id") * chunkTokens))
      .drop("__end")
  }
}
