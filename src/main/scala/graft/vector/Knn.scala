package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F11 cosine + E2/E3/W4 KNN top-k (reference: embeddings/embed.py:363-404
  * linear-scan search; ingest/db_handler.py:465-491 ChromaDB query with
  * metadata `where` filter).
  *
  * Cosine is a pure builtin-expression composition (`zip_with` +
  * `aggregate`), so it stays codegen'd and is DuckDB-oracle-expressible
  * (`list_cosine_similarity` agrees to 6 decimals — verified against the
  * fixture vectors). Top-k is `orderBy(...).limit(k)` → Spark plans
  * `TakeOrderedAndProject`: each partition keeps a k-heap, only k rows per
  * partition reach the driver — the scan is embarrassingly parallel at any
  * scale, no full sort.
  *
  * Batch KNN (many query vectors) broadcasts the query set and ranks with a
  * window partitioned by query id — one shuffle on query_id, each partition
  * top-k'd independently.
  */
object Knn {

  /** Elementwise dot product over two `array<double>` columns — a native
    * codegen expression (graft.expressions.DotProduct): tight primitive
    * loop inside whole-stage codegen, same left-to-right summation as the
    * `aggregate(zip_with(...))` composition it replaces (bit-identical
    * results, oracle-verified).
    */
  def dot(a: Column, b: Column): Column = graft.expressions.VectorExpressions.dot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** F11: cosine similarity — fused single-pass codegen expression
    * (graft.expressions.CosineSim); null on zero norms, like the
    * reference's guard at embeddings/embed.py:392-395. Bit-identical to
    * the dot/l2norm composition.
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosine(a, b)

  /** IVF-style coarse centroids: the per-cell mean vector. At 100 TB this
    * is the ANN scale path: assign each query to its nearest centroid and
    * brute-force only inside that cell — candidate set drops from N to
    * N/cells, and the centroid table is tiny (broadcastable).
    *
    * Plan shape: ONE aggregate with a native O(dim) vector-sum buffer
    * (graft.expressions.VectorSum) + a count, partial-combined map-side —
    * no dim× row explosion crosses the exchange (a posexplode + two-groupBy
    * form shuffles dim·rows skinny rows through two exchanges), and no
    * dim-expression plan for Catalyst to chew on (64 separate
    * `sum(element_at)` aggs measured ~2s of pure PLANNING per nested
    * training round). Mean = sum/n computed after the aggregate, same float
    * ops as `avg` per position.
    */
  def ivfCentroids(emb: DataFrame, vecCol: String, cellCol: String,
      dim: Int = 64): DataFrame =
    // ORDER-INDEPENDENT mean: components quantize to micro-units
    // (floor(x*1e6+0.5) — the parityRound recipe) BEFORE the sum, so the
    // accumulator holds exact integers (≤2^53) and the mean is identical
    // under ANY partition/merge order — 32 threads, 1000 executors, or
    // DuckDB's sequential scan. A raw double mean drifts by an ulp with
    // accumulation order; Lloyd iteration AMPLIFIES that ulp (one flipped
    // assignment moves a whole centroid next round), which the round-12
    // fresh-seed fuzz caught as 2/5-vs-4/5 recall divergence in e8. The
    // 1e-6 input quantization is far below any ANN-meaningful resolution.
    emb.groupBy(col(cellCol))
      .agg(count(lit(1)).as("__n"),
        graft.expressions.VectorSumAgg.vecSum(
          transform(col(vecCol), x => floor(x * 1e6 + 0.5).cast("double")),
          dim).as("__s"))
      .select(col(cellCol),
        transform(col("__s"), x => x / col("__n") / 1e6).as("centroid"))

  /** TRAINED IVF centroids: `iters` Lloyd rounds on top of [[ivfCentroids]].
    * Each round is the same two-phase DataFrame computation at cluster
    * scale: (1) assign every vector to its nearest current centroid —
    * centroids are broadcast, the argmax is a map-side `max_by` over a
    * `(csim, -cell)` struct so ties break on the LOWEST cell id
    * deterministically (exactly `row_number ... ORDER BY csim DESC, cell`
    * in the DuckDB oracle), with similarity rounded to 6 decimals before
    * the argmax so both engines rank identical values; (2) recompute each
    * cell's mean vector. Cells that lose all members simply vanish.
    *
    * Per round: one broadcast join + two shuffles on the tiny cell key —
    * no vector ever crosses an exchange except inside the partial-agg
    * combine. At 100 TB one trains on a sample (standard IVF practice) and
    * assigns the full corpus once with the final centroid table; this
    * method is that training loop.
    */
  def ivfTrain(emb: DataFrame, idCol: String, vecCol: String, cellCol: String,
      iters: Int, dim: Int = 64): DataFrame = {
    // Few-round training stays ONE nested DAG: each round's centroids feed
    // the next round's broadcast, so a single action executes every round
    // exactly once with no per-round job/disk round-trip (paired-measured
    // ~4x faster one-shot than checkpointing every round). Only every 4th
    // round cuts lineage — planning cost of the nested plan grows
    // superlinearly in rounds, the connectedComponents lesson, but at
    // iters<=3 (the normal IVF regime) the cut never fires.
    var cents = ivfCentroids(emb, vecCol, cellCol, dim)
    for (i <- 1 to iters) {
      cents = ivfCentroids(ivfAssign(emb, cents, idCol, vecCol, cellCol),
        vecCol, cellCol, dim)
      if (i % 4 == 0 && i < iters) cents = cents.localCheckpoint(false)
    }
    cents
  }

  /** Assign every vector to its nearest centroid — the index-build step that
    * must follow [[ivfTrain]] (searching the PRE-training cell column against
    * trained centroids probes the wrong rows). Returns `(idCol, vecCol,
    * cellCol)` with cellCol replaced by the nearest-centroid cell.
    *
    * Centroids are broadcast; the id × cells explosion is narrowed
    * IMMEDIATELY to (id, packed) — the vector must never ride the
    * explosion (the Knn.topK lesson: ~1 GB of row churn at 21k×82 for a
    * column nobody ranks on). The per-id argmax is a plain `max` over ONE
    * long that packs `(csim_micro + 10^6) · 2^32 + (2^32-1 − cell)`:
    * integer-exact (csim pre-rounded to 6 decimals ⇒ micro units), higher
    * similarity wins, ties break to the LOWEST cell — exactly `row_number
    * ... ORDER BY csim DESC, cell` in the DuckDB oracle. Packing matters
    * because `max_by`/max-of-struct plan SortAggregate (struct buffers are
    * not hash-aggregatable — the r4 lesson) and a k=1 heap runs object-path
    * per row; a primitive `max` stays in whole-stage codegen with map-side
    * partial combine (measured 2.4 s → 0.4 s per assign at ~sf1). The
    * vector joins back by id afterwards: the corpus crosses one hash
    * exchange, same as any assignment must.
    */
  def ivfAssign(emb: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String, cellCol: String): DataFrame = {
    val B = 4294967296L // 2^32
    val packed = (round(round(cosine(col(vecCol), col("centroid")), 6) * 1e6)
      .cast("long") + 1000000L) * B + (lit(B - 1) - col("__cell"))
    val best = emb.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cents.select(col(cellCol).as("__cell"), col("centroid"))))
      .select(col(idCol), packed.as("__packed"))
      .groupBy(col(idCol)).agg(max("__packed").as("__p"))
      .select(col(idCol), (lit(B - 1) - (col("__p") % B)).as("__cell"))
    emb.select(col(idCol), col(vecCol))
      .join(best, idCol)
      .select(col(idCol), col(vecCol), col("__cell").as(cellCol))
  }

  /** E2: exact top-k nearest candidates to each query vector, with the
    * metadata filter applied BEFORE the distance computation (Catalyst pushes
    * it into the scan). `queries` must be small (it is broadcast); candidates
    * can be arbitrarily large.
    *
    * Output: all candidate columns + query_id, sim (rounded), rank.
    */
  def topK(
      candidates: DataFrame,
      vecCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      tiebreak: String): DataFrame = {
    // Norms are hoisted out of the pair loop: candidate norms once per row,
    // query norms once per query — the same float ops as cosine() (dot /
    // (norm·norm)), so results are bit-identical, but O(n+q) norm work
    // instead of O(n·q).
    val scored = candidates
      .withColumn("__cn", l2norm(col(vecCol)))
      .crossJoin(broadcast(queries.withColumn("__qn", l2norm(col(queryVecCol)))))
      .withColumn("sim", round(
        when(col("__cn") * col("__qn") > 0,
          dot(col(vecCol), col(queryVecCol)) / (col("__cn") * col("__qn"))), 6))
      // The vectors' job ends at `sim` — drop them BEFORE the rank window,
      // not after: the window's exchange would otherwise shuffle both
      // dim-sized arrays per (candidate × query) pair, which at 158k pairs
      // of 64-dim doubles is ~100 MB of serialization for columns nobody
      // reads downstream.
      .drop(vecCol, queryVecCol, "__cn", "__qn")
    // Rank via the custom bounded-heap operator when the session carries
    // GraftExtensions (k-heaps instead of a per-partition sort on both
    // sides of the query_id exchange); identical-output window fallback
    // otherwise. (sim desc, tiebreak asc) is a total order, so the two
    // plans agree row-for-row.
    graft.operators.TopK.perKey(
      scored, Seq(queryIdCol), Seq("sim" -> false, tiebreak -> true), k)
  }
}
