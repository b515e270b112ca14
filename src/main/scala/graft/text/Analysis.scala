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

  /** Language-ID: argmax of marker-word counts with a fixed precedence order
    * (first language in `LangMarkers` wins ties); "unknown" when no marker
    * hits at all.
    */
  def langId(toks: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> markerScore(toks, ms) }
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
