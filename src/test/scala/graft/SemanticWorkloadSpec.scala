package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.vector.{Embed, Knn, SemanticWorkload}

/** Golden pin of the e7 semantic workload's embed stage (the part the DuckDB
  * oracle cannot recompute — it checks the inlined literals, this spec checks
  * the generator) plus the full text→doc-embedding ranking path over real
  * document text (the reference's actual flow:
  * test_advanced_chromadb_queries.py:262-279 encode → collection.query).
  */
class SemanticWorkloadSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("workload carries every reference query: 79 texts, 8 categories, reference k") {
    assert(SemanticWorkload.Queries.size == 79)
    assert(SemanticWorkload.Categories.map(_._1) == Seq(
      "temperature", "geographic", "salinity", "temporal",
      "depth", "edge_case", "multi_parameter", "negation"))
    // the reference uses n_results=3 except edge cases at 2 (:79,229)
    assert(SemanticWorkload.Categories.collect { case (c, k, _) if k == 2 => c } == Seq("edge_case"))
    assert(SemanticWorkload.Queries.map(_._1) == (0L until 79L))
  }

  test("embed stage golden pin: unit-norm, fixed-dim, stable checksum") {
    val vecs = SemanticWorkload.Queries.map { case (_, _, _, t) => SemanticWorkload.embedText(t) }
    assert(vecs.forall(_.length == SemanticWorkload.Dim))
    vecs.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // checksum over all raw float bits: any drift in tokenization, hashing,
    // or normalization breaks this (and would break the inlined oracle too)
    val crc = new java.util.zip.CRC32
    vecs.foreach(_.foreach(f => {
      val bits = java.lang.Float.floatToIntBits(f)
      crc.update(Array[Byte](
        (bits >>> 24).toByte, (bits >>> 16).toByte, (bits >>> 8).toByte, bits.toByte))
    }))
    assert(crc.getValue == 1822898498L, s"embed checksum drifted: ${crc.getValue}")
  }

  test("oracle literals round-trip: SQL text contains exactly the embedded doubles") {
    val sql = SemanticWorkload.oracleSql
    val v0 = SemanticWorkload.embedText(SemanticWorkload.Queries.head._4)
    val firstNonZero = v0.find(_ != 0f).get.toDouble.toString
    assert(sql.contains(firstNonZero))
    assert(sql.contains("'negation'") && sql.contains("'temperature'"))
  }

  test("full text→doc-embedding ranking over document text returns k rows per query") {
    val docs = Tables.documents(spark, sf)
      .withColumn("vec", Embed.embed(col("text"), dim = SemanticWorkload.Dim).cast("array<double>"))
      .select(col("doc_id"), col("lang"), col("vec"))
    val ranked = Knn.topK(
      docs, "vec", SemanticWorkload.queryFrame(spark),
      "query_id", "qvec", k = 3, tiebreak = "doc_id")
      .filter(col("rank") <= col("k"))
    val perQuery = ranked.groupBy("query_id", "k")
      .agg(count(lit(1)).as("n"), max("sim").as("best"))
      .collect()
    assert(perQuery.length == 79)
    perQuery.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Int]("k").toLong)
      assert(r.getAs[Double]("best") >= 0.0)
    }
    // hashed-TF buckets collide across vocabularies, so a healthy share of
    // queries must find some similarity even in the synthetic corpus
    assert(perQuery.count(_.getAs[Double]("best") > 0.0) > 40)
  }
}
