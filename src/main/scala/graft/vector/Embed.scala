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
}
