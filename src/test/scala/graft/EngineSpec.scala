package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val engine = new Engine(spark)
  val sf = "/root/testdata/sf0.001"

  test("search returns k ranked hits and respects the metadata filter") {
    val hits = engine.search(
      Tables.documents(spark, sf), "text", "doc_id",
      queryText = "fast table scan", k = 5,
      metadataFilter = col("lang") === "en")
    val rows = hits.collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[String]("lang") == "en"))
    val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("dedupExact keeps one row per content under the minimum id") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "x")).toDF("id", "text")
    val out = engine.dedupExact(df, "text", "id").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("nearDupCandidates surfaces injected duplicates") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dups = docs.filter(col("doc_id") % 100 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
    val pairs = engine.nearDupCandidates(docs.unionByName(dups), "text", "doc_id")
      .collect()
    val injected = pairs.filter(r =>
      r.getAs[Long]("id_b") - r.getAs[Long]("id_a") == 100000L)
    assert(injected.nonEmpty, "exact copies must collide in every band")
  }

  test("qualityFilter annotates language and drops low-quality docs") {
    val out = engine.qualityFilter(Tables.documents(spark, sf), "text", minQuality = 0.1)
    assert(out.columns.contains("lang_pred") && out.columns.contains("quality"))
    assert(out.count() > 0)
    assert(out.agg(min("quality")).head().getDouble(0) >= 0.1)
  }

  test("ingest produces floats and profiles from raw level arrays") {
    val raw = Tables.events(spark, sf).limit(500).select(
      col("user_id").cast("string").as("float_id"),
      col("event_id").cast("string").as("profile_id"),
      col("ts").as("time"),
      expr("mod(value, 180) - 90").as("latitude"),
      expr("mod(value * 2, 360) - 180").as("longitude"),
      array(expr("mod(value, 45)")).as("temperature"),
      array(expr("mod(value, 50)")).as("salinity"),
      array(expr("mod(value, 6000)")).as("pressure"))
    val (floats, profiles) = engine.ingest(raw)
    assert(floats.count() > 0 && profiles.count() > 0)
    assert(floats.columns.contains("properties"))
    assert(profiles.columns.toSet.contains("variable_name"))
  }
}
