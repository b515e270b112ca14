package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def freqs(pairs: (String, Long)*) =
    pairs.toSeq.toDF("word", "freq")

  test("train reproduces the hand-computed merge sequence") {
    // classic BPE walkthrough (Sennrich et al. 2016 shape, no </w>):
    // low*5 lower*2 newest*6 widest*3
    val words = freqs("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val (rules, _) = Bpe.train(words, k = 4)
    // pair counts round 1: es 9, st 9, lo 7, ow 7, ... tie (es, st) → 'es'
    // wins on left-symbol order; then (es,t) 9; then lo/ow 7-tie → 'lo'.
    assert(rules.map(r => (r.step, r.a, r.b, r.freq)) === Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L)))
  }

  test("merge pass is greedy left-to-right: llll merges to (ll)(ll)") {
    val words = freqs("llll" -> 1L)
    val (rules, fin) = Bpe.train(words, k = 1)
    assert(rules.head.a === "l" && rules.head.b === "l")
    // freq: 3 adjacent (l,l) positions x weight 1
    assert(rules.head.freq === 3L)
    val sym = fin.select("sym").as[Seq[String]].head()
    assert(sym === Seq("ll", "ll"), "merged token must not re-merge in-pass")
  }

  test("training stops when the pair domain dries up") {
    // single word 'ab': round 1 merges it to one symbol, round 2 has no pairs
    val (rules, fin) = Bpe.train(freqs("ab" -> 4L, "c" -> 9L), k = 8)
    assert(rules.size === 1)
    assert(rules.head === Bpe.MergeRule(1, "a", "b", 4L))
    val syms = fin.orderBy("word").select("sym").as[Seq[String]].collect()
    assert(syms.toSeq === Seq(Seq("ab"), Seq("c")))
  }

  test("empty corpus trains zero merges") {
    val (rules, fin) = Bpe.train(freqs(), k = 8)
    assert(rules.isEmpty && fin.count() === 0)
  }

  test("encode equals the trainer's final symbol table on the train corpus") {
    val docsWords = freqs("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "wid" -> 1L, "ne" -> 2L)
    val (rules, fin) = Bpe.train(docsWords, k = 6)
    val enc = Bpe.encode(docsWords.select("word"), rules)
    val got = enc.orderBy("word").select("word", "sym")
      .as[(String, Seq[String])].collect().toSeq
    val want = fin.orderBy("word").select("word", "sym")
      .as[(String, Seq[String])].collect().toSeq
    assert(got === want)
  }

  test("encode handles out-of-vocabulary words through the rule chain") {
    val (rules, _) = Bpe.train(freqs("lowest" -> 10L), k = 2)
    // rules: (l,o) 10? counts: lo 10, ow 10, we 10, es 10, st 10 → tie on
    // left asc: 'es' first (e < l < o < s < w), then... recompute: after
    // merging (e,s): l o w es t. next counts: lo/ow/w-es/es-t all 10 →
    // (es,t) has left 'es' < 'l' < 'o' < 'w' → merge (es,t).
    assert(rules.map(r => (r.a, r.b)) === Seq(("e", "s"), ("es", "t")))
    // unseen word containing the learned pairs in fresh contexts
    val enc = Bpe.encode(Seq("estestes").toDF("word"), rules)
      .select("sym").as[Seq[String]].head()
    // pass 1 (e,s): est est es -> [es t es t es]; pass 2 (es,t): [est est es]
    assert(enc === Seq("est", "est", "es"))
  }

  test("unicode words split per code point, surrogate pairs intact") {
    // (𝄞,𝄞) and (𝄞,x) tie at n=3; the b tie-break is UTF-8 BYTE order,
    // where 'x' (0x78) sorts below '𝄞' (0xF0 9D 84 9E) — so (𝄞,x) wins,
    // pinning both the per-code-point split AND the byte-order collation
    // the DuckDB oracle shares.
    val (rules, fin) = Bpe.train(freqs("𝄞𝄞x" -> 3L), k = 1)
    assert(rules.head.a === "𝄞" && rules.head.b === "x")
    val sym = fin.select("sym").as[Seq[String]].head()
    assert(sym === Seq("𝄞", "𝄞x"))
  }
}
