package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Enforces SURVEY §9 decision 34 — "the exact-dedup rep tier is MANDATORY
  * in front of every LSH consumer whose output is per-document" — as a
  * BEHAVIORAL gate (round-11 verdict item #5). Plan introspection cannot
  * see the tier: the pipelines checkpoint their segments, so the registered
  * queries' returned plans are joins over opaque LogicalRDD leaves. Instead
  * this spec runs every registered LSH consumer against a CLONE BOMB — a
  * corpus of few distinct texts with many byte-identical copies each, the
  * shape the sf10 rehearsal models at 100x — and asserts a hard ceiling on
  * total shuffle-read records. With the tier, bucket members are bounded by
  * DISTINCT contents and the run moves a few tens of thousands of rows;
  * without it, every band bucket holds a c-clone clique, the i<j expansion
  * emits ~c²/2 pairs per content per band, and the row-domain verify
  * multiplies that by shingles/doc — millions of records, far past the
  * ceiling. A future edit that drops the tier from ANY consumer fails here
  * in seconds instead of spilling 70 GB in the sf10 gate (dd8, round 10) or
  * 94 s in the rehearsal (dc2, round 10).
  */
class LshContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // every registered query that routes through Dedup.lshCandidatePairs
  // (pair-list outputs like dd2/dd6 are exempt per decision 34: their
  // result is itself quadratic in clones, and their scale path composes
  // dedupExact upstream via Engine.nearDup*)
  private val lshConsumers = Seq(
    "dd8_lsh_verified", "dd9_dup_groups", "dd10_dedup_apply",
    "dd16_canonical_pick", "dd12_incremental_dedup", "dc2_neardup_decontam")

  // 25 distinct 10-token texts x 120 byte-identical copies each. Ids are
  // contiguous so the queries' own %N variant injections still fire.
  private lazy val cloneDir: String = {
    val dir = QueryContext.scratchDir("clonebomb")
    import spark.implicits._
    val nDistinct = 25
    val copies = 120
    (0 until nDistinct * copies).map { id =>
      val g = id % nDistinct
      val text = (0 until 10).map(w => s"token${g}w$w").mkString(" ")
      (id.toLong, text, "en", s"src${g % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("every registered LSH consumer stays shuffle-bounded on a clone-heavy corpus") {
    val dir = cloneDir
    var records = 0L
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        records += e.stageInfo.taskMetrics.shuffleReadMetrics.recordsRead
    }
    lshConsumers.foreach { name =>
      spark.sparkContext.addSparkListener(listener)
      try {
        records = 0L
        SparkEntry.queries(name)(spark, dir).count()
        // listener events are async; a short drain keeps the tally complete
        Thread.sleep(300)
      } finally spark.sparkContext.removeSparkListener(listener)
      // Measured with the tier (round 11): 20k-60k records per query on
      // this 3,000-row corpus. Without the tier the in-bucket clique pairs
      // alone are 25 contents x 3 bands x C(120,2) ≈ 535k before the
      // verify's per-shingle amplification (x8) — two orders past the
      // ceiling. 300k holds a wide margin on both sides.
      info(s"$name: $records shuffle records")
      assert(records < 300000L,
        s"$name moved $records shuffle records on the clone-bomb corpus — " +
          "the exact-dedup rep tier (SURVEY §9 decision 34) appears to be " +
          "missing in front of its LSH candidate generation")
    }
  }
}
