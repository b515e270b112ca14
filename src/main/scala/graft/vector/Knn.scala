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

  /** IVF-style coarse centroids: the per-cell mean vector, computed with
    * posexplode + two aggregations (both shuffle on the small cell key).
    * At 100 TB this is the ANN scale path: assign each query to its nearest
    * centroid and brute-force only inside that cell — candidate set drops
    * from N to N/cells, and the centroid table is tiny (broadcastable).
    * (k-means would iterate this exact computation; one pass over a labeled
    * partitioning is the IVF shape without the training loop.)
    */
  def ivfCentroids(emb: DataFrame, vecCol: String, cellCol: String): DataFrame =
    emb.select(col(cellCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(cellCol), col("pos")).agg(avg("x").as("cx"))
      .groupBy(col(cellCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cx")))),
        s => s.getField("cx")).as("centroid"))

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
