package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Pipeline

/** End-to-end lifecycle spec mirroring the reference's only real
  * correctness test — the 5-row inline fixture through process_raw_data +
  * validate_dataframes (reference: ingest/preprocess.py:479-506).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // Two floats; float A has two profiles, float B one. Level arrays carry
  // a NaN-hole (null cell), an out-of-range temperature (45.0 > 40) and an
  // out-of-range latitude row that must be dropped entirely.
  private lazy val raw = Seq(
    ("A", "A-1", ts("2020-01-16 00:00:00"), 10.0, 70.0,
      Seq[Option[Double]](Some(20.0), Some(45.0), None),
      Seq[Option[Double]](Some(35.0), Some(34.5), None),
      Seq[Option[Double]](Some(5.0), Some(100.0), Some(200.0))),
    ("A", "A-2", ts("2020-02-16 00:00:00"), 11.0, 71.0,
      Seq[Option[Double]](Some(21.0), None, None),
      Seq[Option[Double]](Some(35.1), None, None),
      Seq[Option[Double]](Some(6.0), None, None)),
    ("B", "B-1", ts("2021-06-01 00:00:00"), -20.0, 100.0,
      Seq[Option[Double]](Some(18.0), Some(17.0), Some(16.0)),
      Seq[Option[Double]](Some(34.0), Some(34.1), Some(34.2)),
      Seq[Option[Double]](Some(10.0), Some(500.0), Some(1000.0))),
    ("C", "C-1", ts("2021-07-01 00:00:00"), 95.0, 10.0, // lat out of range → dropped
      Seq[Option[Double]](Some(19.0)), Seq[Option[Double]](Some(34.3)), Seq[Option[Double]](Some(15.0))),
    ("D", "D-1", ts("1990-01-01 00:00:00"), 0.0, 0.0, // before 1999 → dropped
      Seq[Option[Double]](Some(19.0)), Seq[Option[Double]](Some(34.3)), Seq[Option[Double]](Some(15.0)))
  ).toDF("float_id", "profile_id", "time", "latitude", "longitude",
    "temperature", "salinity", "pressure")

  test("tidy explodes levels and drops all-null cells") {
    val t = Pipeline.tidy(raw)
    // A-1: levels 0,1 valid + level 2 has pressure → 3 rows; A-2: 1 row;
    // B-1: 3 rows; C-1: 1 row; D-1: 1 row
    assert(t.count() == 9)
    assert(t.columns.contains("level"))
  }

  test("clean applies geo/time/bounds/id chain") {
    val cleaned = Pipeline.clean(Pipeline.tidy(raw), "2026-01-01")
    // C (bad lat) and D (1990) rows dropped entirely
    assert(cleaned.select("float_id").distinct().as[String].collect().toSet == Set("A", "B"))
    // out-of-range temperature 45.0 nulled but row kept
    val a1l1 = cleaned.filter(col("profile_id") === "A-1" && col("level") === 1).collect().head
    assert(a1l1.isNullAt(a1l1.fieldIndex("temperature")))
    assert(a1l1.getDouble(a1l1.fieldIndex("salinity")) == 34.5)
  }

  test("floats summary aggregates per float with nested properties") {
    val cleaned = Pipeline.clean(Pipeline.tidy(raw), "2026-01-01")
    val f = Pipeline.floats(cleaned)
    val byId = f.collect().map(r => r.getAs[String]("float_id") -> r).toMap
    assert(byId.keySet == Set("A", "B"))
    assert(byId("A").getAs[Long]("n_distinct") == 2) // two profiles
    assert(byId("B").getAs[Long]("n_distinct") == 1)
    // temperature stats skip the nulled 45.0: A has 20.0, 21.0
    assert(byId("A").getAs[Double]("temperature_max") == 21.0)
    assert(byId("A").getAs[Long]("temperature_count") == 2)
    // nested properties struct carries the same stats
    val props = byId("A").getAs[org.apache.spark.sql.Row]("properties")
    assert(props.getAs[org.apache.spark.sql.Row]("date_range").getAs[String]("start")
      == "2020-01-16 00:00:00")
  }

  test("profiles EAV keeps only non-null measurements") {
    val cleaned = Pipeline.clean(Pipeline.tidy(raw), "2026-01-01")
    val p = Pipeline.profiles(cleaned)
    assert(p.columns.toSet ==
      Set("float_id", "profile_id", "time", "level", "variable_name", "variable_value"))
    // A-1 level 1: temperature nulled → only salinity+pressure rows remain
    assert(p.filter(col("profile_id") === "A-1" && col("level") === 1).count() == 2)
    Pipeline.validate(p, Seq("float_id", "profile_id", "variable_name", "variable_value"))
  }

  test("validate rejects missing columns") {
    intercept[IllegalArgumentException] {
      Pipeline.validate(raw.drop("time"), Seq("float_id", "time"))
    }
  }
}
