package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** E1: deterministic text→vector featurizer (reference: the
  * sentence-transformers encode at embeddings/embed.py:176-198 — the one
  * non-deterministic external op in the reference; see SURVEY.md §7.4).
  *
  * Replacement semantics: text → fixed-dim float vector, cosine-comparable,
  * reproducible across runs/engines. Implementation: token hashing (FNV-1a
  * 32-bit) into `dim` buckets, term-frequency weights, L2-normalized —
  * HashingTF-style. A Scala UDF, not a row-python UDF: it runs inside the
  * JVM task, one pass per token, O(tokens) per row, no shuffle, and
  * parallelizes with the scan at any scale.
  */
object Embed {

  val Dim = 384

  /** FNV-1a 32-bit — stable across JVMs, no seed. */
  private[graft] def fnv1a(s: String): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x01000193
      i += 1
    }
    h
  }

  private[graft] def embedTokens(tokens: Seq[String], dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    tokens.foreach { t =>
      if (t.nonEmpty) acc((fnv1a(t) & 0x7fffffff) % dim) += 1.0
    }
    val norm = math.sqrt(acc.foldLeft(0.0)((s, x) => s + x * x))
    val out = new Array[Float](dim)
    if (norm > 0) {
      var i = 0
      while (i < dim) { out(i) = (acc(i) / norm).toFloat; i += 1 }
    }
    out
  }

  private val embedUdf =
    udf((text: String, dim: Int) =>
      if (text == null) Array.empty[Float]
      else embedTokens(text.toLowerCase.split("\\s+").toSeq, dim))

  /** text column → `array<float>` embedding column. */
  def embed(textCol: Column, dim: Int = Dim): Column = embedUdf(textCol, lit(dim))

  /** Stand-in for a real inference model: loaded once, encodes a whole
    * batch per call (the sentence-transformers contract —
    * embeddings/embed.py:34-44 one model load, :176-198 batch encode).
    */
  private[graft] class BatchEncoder(dim: Int) {
    def encode(texts: Seq[String]): Seq[Array[Float]] =
      texts.map {
        case null => Array.empty[Float]
        case t    => embedTokens(t.toLowerCase.split("\\s+").toSeq, dim)
      }
  }

  /** Batched-inference embed path: `mapPartitions` with ONE encoder
    * init per partition and encode calls over batches of `batchSize`
    * rows — the shape a real model plug-in needs (model load is seconds,
    * per-row calls waste it; batch calls amortize and let the backend
    * vectorize). Output is bit-identical to the per-row [[embed]] UDF
    * (spec-gated), so the two paths are interchangeable.
    */
  def embedPartitioned(
      df: org.apache.spark.sql.DataFrame, textCol: String, outCol: String,
      dim: Int = Dim, batchSize: Int = 50): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val outSchema = df.schema.add(outCol, ArrayType(FloatType), nullable = true)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      val model = new BatchEncoder(dim) // per-partition init ("model load")
      it.grouped(batchSize).flatMap { batch =>
        val vecs = model.encode(batch.map(r =>
          if (r.isNullAt(idx)) null else r.getString(idx)))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(enc)
  }
}
