package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * builtin expressions (codegen-friendly, oracle-expressible).
  */
object Analysis {

  /** Marker-word sets for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"),
    "zh" -> Seq("的", "是", "在", "了")
  )

  private def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*)))

  /** Bits per packed language counter. 12 bits = counts up to 4095 per
    * language per document; a marker count is bounded by the document's
    * token count, so this is safe for any corpus chunked below 4k tokens
    * (the fixtures max out at ~600 chars / ~100 tokens).
    */
  private val CounterBits = 12

  /** marker token → packed counter increment. A token in k languages (e.g.
    * "un" is both fr and es) maps to the SUM of those languages' bit slots,
    * so one lookup still credits every matching language.
    */
  private val markerIncrements: Column = {
    val entries = LangMarkers.zipWithIndex
      .flatMap { case ((_, ms), i) => ms.map(m => m -> (1L << (CounterBits * i))) }
      .groupBy(_._1).map { case (m, incs) => m -> incs.map(_._2).sum }
    // typedlit → a MapType Literal built once at plan time; functions.map()
    // would be a CreateMap expression re-allocating the map on EVERY row.
    typedlit(entries)
  }

  /** Language-ID: argmax of marker-word counts with a fixed precedence order
    * (first language in `LangMarkers` wins ties); "unknown" when no marker
    * hits at all.
    *
    * Single-pass shape: ONE traversal of the token array accumulating all
    * five per-language counts packed into one long (12 bits each), with one
    * O(1) map lookup per token — not one filtered traversal per language,
    * which costs |languages| array passes with closure dispatch per row.
    */
  def langId(toks: Column): Column = {
    val packed = aggregate(toks, lit(0L),
      (acc, t) => acc + coalesce(element_at(markerIncrements, t), lit(0L)))
    val scores = LangMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> shiftright(packed, CounterBits * i).bitwiseAND(lit((1L << CounterBits) - 1))
    }
    val maxScore = greatest(scores.map(_._2): _*)
    val chain = scores.foldLeft(when(maxScore <= 0, "unknown")) {
      case (acc, (lang, s)) => acc.when(s === maxScore, lang)
    }
    chain.otherwise("unknown")
  }

  /** Stopword (English-marker) ratio of a token array. */
  def stopwordRatio(toks: Column): Column =
    markerScore(toks, LangMarkers.head._2) / size(toks)

  /** Mean token length. */
  def avgTokenLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x) / size(toks)

  /** Composite quality score in [0,1]: length saturation × non-stopword
    * density (the length/punct/stopword recipe every corpus pipeline uses).
    */
  def qualityScore(toks: Column): Column =
    least(lit(1.0), size(toks) / lit(100.0)) * (lit(1.0) - stopwordRatio(toks))

  /** BPE-ish subword token estimate: word+digit runs via regex. */
  def regexTokens(textCol: Column): Column =
    regexp_extract_all(lower(textCol), lit("[a-z0-9]+"), lit(0))

  /** Document fingerprint: md5 over the 5 smallest distinct-token md5s —
    * a deterministic content sketch stable under token reordering.
    */
  def fingerprint(toks: Column): Column =
    md5(concat_ws(",",
      slice(array_sort(transform(array_distinct(toks), t => md5(t))), 1, 5)))
}
