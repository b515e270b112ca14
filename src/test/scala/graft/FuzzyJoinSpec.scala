package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** J2 fuzzy θ-join, banded form (round 16): the containment semantics are
  * unchanged from the reference's nested loop
  * (update_chromadb_measurements.py:181-237), but candidates now come from
  * gram-equality joins instead of a BroadcastNestedLoopJoin over the full
  * cross product — these specs pin (a) exact equivalence with the brute
  * force, including the wrapper/empty/null edge lanes, and (b) that the
  * candidate set and the physical plan are actually banded.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("banded fuzzyMatch equals the brute-force θ-join on a randomized corpus") {
    val rng = new scala.util.Random(42)
    def id(): String = {
      val n = 1 + rng.nextInt(10)
      (0 until n).map(_ => "0123456789abc".charAt(rng.nextInt(13))).mkString
    }
    // short ids over a 13-char alphabet: dense genuine containments, plus
    // the byte-wrapper lane and the null/empty edges the cleaner handles
    val dirtyIds = (0 until 300).map { i =>
      val base = id()
      if (i % 3 == 0) s"b'$base '" else base
    } ++ Seq(null, "b''", "", "b'  '")
    val dirty = dirtyIds.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("k", "messy")
    val registry = (0 until 120).map(_ => id()).distinct.toDF("reg_id")

    val banded = FuzzyJoin.fuzzyMatch(dirty, "messy", registry, "reg_id")
      .select("k", "matched_id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    val cleaned = dirty.withColumn("clean_id", FuzzyJoin.cleanId(col("messy")))
    val cond = col("clean_id") === col("reg_id") ||
      col("reg_id").contains(col("clean_id")) ||
      col("clean_id").contains(col("reg_id"))
    val brute = cleaned.join(registry, cond, "left")
      .groupBy("k").agg(min("reg_id").as("matched_id"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    assert(banded.size == dirtyIds.size)
    assert(banded == brute)
    // sanity: the corpus actually exercised both outcomes
    assert(banded.values.exists(_.isDefined) && banded.values.exists(_.isEmpty))
  }

  test("candidate generation is banded, not a cross product; plan has no nested loop") {
    // disjoint alphabets: the cross product is 400×201 = 80k pairs but only
    // the planted containments (plus gram-collision noise) may surface
    val a = (0 until 400).map(i => s"x${i}y").toDF("a")
    val b = ((0 until 200).map(i => s"q${i}z") :+ "34").toDF("b") // "34" ⊆ "x34y", "x340y", …
    val cand = FuzzyJoin.candidates(a, b)
    val n = cand.count()
    assert(n < 1000, s"candidate set must be gram-bounded, got $n of 80k cross pairs")
    // the planted containment survived banding
    assert(cand.filter(col("a") === "x34y" && col("b") === "34").count() == 1)

    val dirty = (0 until 400).map(i => (i.toLong, s"x${i}y")).toDF("k", "messy")
    val matched = FuzzyJoin.fuzzyMatch(dirty, "messy", b.toDF("reg_id"), "reg_id")
    val plan = matched.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded fuzzyMatch must not plan a nested loop:\n$plan")
    val got = matched.select("k", "matched_id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(34L).contains("34") && got(340L).contains("34"))
    assert(got(35L).isEmpty)
  }

  test("registry-gram broadcast is size-conditional; shuffle strategy matches broadcast") {
    // Round-17 verdict item: the gram expansion of the registry side used
    // to broadcast UNCONDITIONALLY — a large registry (a multi-year
    // platform list) would collect its whole gram expansion on the driver.
    // Now the hint applies only while est(base) × GramExpansionFactor fits
    // autoBroadcastJoinThreshold; past it (or with broadcast disabled) the
    // same equi-joins run as shuffle joins. Both strategies must produce
    // identical matches and neither may plan a nested loop.
    val rng = new scala.util.Random(7)
    def id(): String =
      (0 until 1 + rng.nextInt(8)).map(_ => "0123456789".charAt(rng.nextInt(10))).mkString
    val dirty = (0 until 200).map(i => (i.toLong,
      if (i % 4 == 0) s"b'${id()} '" else id())).toDF("k", "messy")
    val registry = (0 until 80).map(_ => id()).distinct.toDF("reg_id")

    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val before = spark.conf.get(thresholdKey)
    def runWith(threshold: String): (Map[Long, Option[String]], String) =
      try {
        spark.conf.set(thresholdKey, threshold)
        val df = FuzzyJoin.fuzzyMatch(dirty, "messy", registry, "reg_id")
        val got = df.select("k", "matched_id").collect()
          .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
        (got, df.queryExecution.executedPlan.toString)
      } finally spark.conf.set(thresholdKey, before)

    val (viaBroadcast, planB) = runWith("256MB") // tiny registry: hint applies
    val (viaShuffle, planS) = runWith("-1") // disabled: no hint, no auto
    assert(planB.contains("BroadcastHashJoin"),
      s"broadcast-eligible registry must hash-broadcast:\n$planB")
    assert(!planS.contains("Broadcast"),
      s"with the threshold disabled nothing may broadcast:\n$planS")
    assert(!planS.contains("CartesianProduct") && !planS.contains("NestedLoop"),
      s"shuffle fallback must stay a hash/merge join:\n$planS")
    assert(viaBroadcast == viaShuffle, "join strategy must not change matches")
    assert(viaBroadcast.values.exists(_.isDefined) &&
      viaBroadcast.values.exists(_.isEmpty))
  }

  test("containment in BOTH directions and min-id tie-break survive banding") {
    val dirty = Seq(
      (1L, "b'00042 '"), // cleans to "00042"
      (2L, "777"), // equals a reg exactly AND contains reg "7"
      (3L, "zzz") // matches nothing
    ).toDF("k", "messy")
    val registry = Seq("42", "0004", "777", "7", "000042000").toDF("reg_id")
    // "00042" contains "42" and "0004" AND is contained in "000042000";
    // lexicographic min of the three is "000042000" ('0' < '4' at index 3).
    // "777" matches {"777", "7"}; min → "7"
    val got = FuzzyJoin.fuzzyMatch(dirty, "messy", registry, "reg_id")
      .select("k", "matched_id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("000042000"), 2L -> Some("7"), 3L -> None))
  }
}
