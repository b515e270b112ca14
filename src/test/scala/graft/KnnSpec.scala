package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.Knn

/** Trained-IVF quality: on data with planted cluster structure, Lloyd
  * training (Knn.ivfTrain) must lift recall@5 ABOVE the probed fraction —
  * the thing a one-pass mean over arbitrary initial cells cannot do. The
  * probed fraction is MEASURED (how much of the corpus the probe actually
  * scanned), not assumed from nprobe/cells, so a degenerate quantizer that
  * collapses every vector into one giant cell fails the margin instead of
  * gaming it.
  */
class KnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Dim = 16
  private val NVec = 200
  private val NQuery = 12
  private val NProbe = 2

  /** Cluster c lives on dims [4c, 4c+4); hash-mixed deterministic noise —
    * a plain linear congruence here has short periods that plant accidental
    * micro-structure (identical-vector classes) the probe can exploit.
    */
  private def mkVec(cluster: Int, seed: Int): Seq[Double] =
    Seq.tabulate(Dim) { d =>
      val h = seed.toLong * 2654435761L + d.toLong * 40503L + 12345L
      val m = (((h ^ (h >>> 16)) % 997) + 997) % 997
      (if (d / 4 == cluster) 1.0 else 0.0) + (m / 997.0 - 0.5) * 0.2
    }

  // cluster by BLOCK (i / 50), initial cell by i % 8: every initial cell
  // is an even mixture of all four clusters — the quantizer starts with
  // zero cluster information and must learn it
  private lazy val data = (0 until NVec)
    .map(i => (i.toLong, (i % 8).toLong, mkVec(i / 50, i)))
    .toDF("vec_id", "cell", "vec")
  private lazy val queries = (0 until NQuery)
    .map(j => (1000L + j, mkVec(j % 4, 5000 + j)))
    .toDF("query_id", "qvec")

  /** (recall@5, measured probed fraction) for an nprobe-cell IVF search
    * over `index` — the corpus partitioned by whatever cell column the
    * quantizer under test produces (original cells for the untrained
    * baseline, ivfAssign output for the trained one).
    */
  private def recallAndProbed(cents: DataFrame, index: DataFrame): (Double, Double) = {
    val best = queries.crossJoin(broadcast(cents))
      .withColumn("csim", round(Knn.cosine(col("qvec"), col("centroid")), 6))
      .withColumn("r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("cell"))))
      .filter(col("r") <= NProbe)
      .select("query_id", "qvec", "cell")
    val ivf = index.join(broadcast(best), "cell")
      .withColumn("sim", Knn.cosine(col("vec"), col("qvec")))
      .withColumn("r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("r") <= 5)
      .select("query_id", "vec_id")
    val exact = Knn.topK(data, "vec", queries, "query_id", "qvec",
      k = 5, tiebreak = "vec_id").select("query_id", "vec_id")
    val hits = exact.join(ivf, Seq("query_id", "vec_id")).count()
    val probedRows = index
      .join(broadcast(best.select("query_id", "cell").distinct()), "cell").count()
    (hits.toDouble / (NQuery * 5), probedRows.toDouble / (NQuery.toLong * NVec))
  }

  test("ivfTrain recall@5 on planted clusters beats the probed fraction") {
    val trained = Knn.ivfTrain(data, "vec_id", "vec", "cell", iters = 3, dim = Dim)
    val (recallT, probedT) = recallAndProbed(trained,
      Knn.ivfAssign(data, trained, "vec_id", "vec", "cell"))
    val (recallU, probedU) =
      recallAndProbed(Knn.ivfCentroids(data, "vec", "cell", dim = Dim), data)
    // untrained cells (vec_id % 8) are cluster-blind: recall can only track
    // how much of the corpus the probe covers
    assert(recallU <= probedU + 0.2,
      s"untrained recall $recallU should track probed fraction $probedU")
    // training must recover the planted structure: high recall from a
    // small probed slice, with real margin over both baselines
    assert(recallT >= 0.8, s"trained recall $recallT")
    assert(recallT > probedT + 0.2,
      s"trained recall $recallT vs probed fraction $probedT")
    assert(recallT > recallU + 0.2,
      s"trained recall $recallT vs untrained $recallU")
    assert(probedT <= 0.6, s"trained probe should stay a corpus slice: $probedT")
  }

  test("ivfTrain is deterministic and drops empty cells") {
    val c1 = Knn.ivfTrain(data, "vec_id", "vec", "cell", iters = 2, dim = Dim)
      .orderBy("cell").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val c2 = Knn.ivfTrain(data, "vec_id", "vec", "cell", iters = 2, dim = Dim)
      .orderBy("cell").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(c1.toSeq == c2.toSeq)
    assert(c1.nonEmpty && c1.length <= 8)
    assert(c1.forall(_._2.length == Dim))
  }

  test("ivfTrain centroids are BIT-IDENTICAL under any partitioning") {
    // The round-13 invariant (SURVEY §9 #37): centroid accumulation is
    // fixed-point (micro-unit) so partition/merge order cannot move a mean
    // by an ulp — which Lloyd rounds would amplify into flipped cell
    // assignments. Trained centroids from a 1-partition and a 13-partition
    // layout of the same vectors must agree to the BIT, not a tolerance.
    def train(df: DataFrame) =
      Knn.ivfTrain(df, "vec_id", "vec", "cell", iters = 2, dim = Dim)
        .orderBy("cell").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toList))
    val narrow = train(data.repartition(1))
    val wide = train(data.repartition(13, col("vec_id")))
    assert(narrow.toSeq == wide.toSeq,
      "centroids differ across partitionings — accumulation is order-dependent again")
  }

  test("a null initial cell id never competes in assignment (sentinel required)") {
    // A NULL cell id has no defined ordering in the trainer: the packed
    // argmax drops the null cell entirely, so its members REASSIGN and the
    // cell vanishes. Callers feeding nullable labels must coalesce to a
    // sentinel first (e6/e8 do) — pinned here so the contract is explicit.
    val withNull = data.withColumn("cell",
      when(col("vec_id") % 5 === 0, lit(null)).otherwise(col("cell")))
    val cents = Knn.ivfCentroids(withNull, "vec", "cell", dim = Dim)
    assert(cents.filter(col("cell").isNull).count() == 1,
      "groupBy keeps a null-cell centroid row (the hazard)")
    val assigned = Knn.ivfAssign(withNull, cents, "vec_id", "vec", "cell")
    assert(assigned.filter(col("cell").isNull).count() == 0,
      "no vector may land in the null cell — it cannot win the packed argmax")
    assert(assigned.count() == NVec, "every vector still assigned somewhere")
  }
}
