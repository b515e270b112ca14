package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J2: fuzzy id-match join (reference: update_chromadb_measurements.py:181-237).
  *
  * The reference nested-loops over two id sets matching by: exact equality
  * after byte-wrapper cleanup, OR substring containment in either direction;
  * first match wins. "First match wins" is order-dependent in the reference;
  * we pin the deterministic equivalent: the minimum matching registry id.
  *
  * Spark shape: clean ids with `regexp_replace`+`trim`, then generate
  * candidate pairs by GRAM BANDING (two equi-joins — shuffle/broadcast
  * hash, never a nested loop) and verify the real containment predicate
  * only inside the candidate set. The banding is EXACT (no false
  * negatives): if `b` is a substring of `a`, then `b`'s prefix gram — its
  * first `min(K, len(b))` characters — occurs verbatim somewhere in `a`,
  * i.e. it is one of `a`'s substrings of that length. So joining one
  * side's prefix gram against the other side's full substring-of-length-≤K
  * set (both directions, unioned) yields a candidate superset of every
  * containment pair; an earlier revision evaluated the θ-predicate as a
  * BroadcastNestedLoopJoin over the full |dirty|×|registry| cross product,
  * which is quadratic the moment both sides grow. Candidate volume is
  * bounded by gram selectivity instead: a pathological corpus (every id
  * sharing one gram) degrades to the true match set's size, which the
  * SEMANTICS require anyway — the banding only ever prunes verified-
  * impossible pairs.
  */
object FuzzyJoin {

  /** F2: strip the `b'...'` byte-repr wrapper + whitespace
    * (reference: update_chromadb_measurements.py:167-179).
    */
  def cleanId(c: Column): Column = trim(regexp_replace(c, "^b'(.*)'$", "$1"))

  /** Gram width for candidate banding. Wider prunes harder but emits more
    * container grams per id (≤ K·len + 1); 3 is the dd13 recipe's width.
    */
  private val K = 3

  /** All distinct substrings of `s` with length 0..K — the "container"
    * key set (the length-0 gram `""` pairs an empty contained id with
    * every container, which IS the containment truth: `contains(x, "")`).
    */
  private[graft] def containerGrams(s: Column): Column =
    array_distinct(flatten(transform(
      sequence(lit(0), least(length(s), lit(K))),
      l => transform(sequence(lit(1), length(s) - l + lit(1)),
        i => s.substr(i, l)))))

  /** Upper bound on gram-expanded bytes per base-registry byte, used to
    * decide whether the expansion is broadcast-safe. Per id of length
    * `len ≥ K`, [[containerGrams]] emits `Σ_{l=0..K} (len−l+1) = 4·len−2`
    * gram rows (K=3), each carrying the id plus a ≤K-char gram. 64 is a
    * true byte bound for ids up to ~12 chars (fan-out 46× at ~1.2× row
    * width); the reference corpus's float ids are 7-10. Longer ids
    * under-estimate proportionally — acceptable because the decision
    * only gates a HINT against a 10 MB-default threshold with ~100×
    * executor-memory headroom, and the unhinted planner errs the same
    * way with a far smaller constant (it ignores fan-out entirely).
    */
  private[graft] val GramExpansionFactor = 64L

  /** Broadcast `expanded` (a gram expansion of `base`) only while the
    * ESTIMATED expanded size — base's optimizer estimate ×
    * [[GramExpansionFactor]] — fits the session's auto-broadcast
    * threshold. The planner can't make this call itself: a `Generate`
    * node's size estimate ignores explode multiplicity, so an unhinted
    * plan would auto-broadcast expansions ~40× bigger than their
    * estimate, and the previous unconditional hint pinned a LARGE
    * registry (a multi-year platform list) to a driver-side collect —
    * the round-15 markExisting failure class. Past the threshold the
    * equi-join degrades to a shuffle hash join: same semantics, no
    * driver OOM, and AQE can still flip it back on runtime sizes.
    */
  private def broadcastIfEstSmall(expanded: DataFrame, base: DataFrame): DataFrame = {
    // the conf may read "-1" (disabled), "10485760" (bytes), or "10MB"
    // (size-string) — plain toLong first, JavaUtils for the suffixed form
    // (whose parser rejects negatives)
    val raw = base.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    val threshold =
      try raw.toLong
      catch { case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw) }
    val est = base.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && est * GramExpansionFactor <= threshold) broadcast(expanded)
    else expanded
  }

  /** Candidate containment pairs between distinct id sets `a` (column `a`)
    * and `b` (column `b`): every (a, b) where one contains the other is
    * present; extra pairs are possible (same gram, no containment) and get
    * filtered by the verify predicate in [[fuzzyMatch]]. The registry side
    * `b` is small in the operator's TYPICAL use, so its gram expansions
    * broadcast and the `a` side streams map-side through the hash joins —
    * but only while the size estimate says so ([[broadcastIfEstSmall]]);
    * a large registry shuffles both sides on the gram instead.
    */
  private[graft] def candidates(a: DataFrame, b: DataFrame): DataFrame = {
    val aPfx = a.select(col("a"), col("a").substr(lit(1), lit(K)).as("g"))
    val aAll = a.select(col("a"), explode(containerGrams(col("a"))).as("g"))
    val bPfx = b.select(col("b"), col("b").substr(lit(1), lit(K)).as("g"))
    val bAll = b.select(col("b"), explode(containerGrams(col("b"))).as("g"))
    aPfx.join(broadcastIfEstSmall(bAll, b), "g").select("a", "b") // a ⊆ b
      .unionByName(aAll.join(broadcastIfEstSmall(bPfx, b), "g")
        .select("a", "b")) // b ⊆ a
      .distinct()
  }

  /** Fuzzy match `dirty` (column `dirtyIdCol`, may carry the byte wrapper)
    * against `registry` (column `regIdCol`, already clean). Returns one row
    * per dirty row with `matched_id` = min matching registry id (null when
    * unmatched — the reference tracks those too).
    */
  def fuzzyMatch(dirty: DataFrame, dirtyIdCol: String, registry: DataFrame, regIdCol: String): DataFrame = {
    val cleaned = dirty.withColumn("clean_id", cleanId(col(dirtyIdCol)))
    val verified = candidates(
      cleaned.select(col("clean_id").as("a")).distinct(),
      registry.select(col(regIdCol).as("b")).distinct())
      .filter(col("a") === col("b") ||
        col("b").contains(col("a")) || col("a").contains(col("b")))
      .groupBy(col("a").as("clean_id"))
      .agg(min(col("b")).as("matched_id"))
    cleaned
      .join(verified, Seq("clean_id"), "left")
      .groupBy(cleaned.columns.map(col).toIndexedSeq: _*)
      .agg(min(col("matched_id")).as("matched_id"))
  }
}
