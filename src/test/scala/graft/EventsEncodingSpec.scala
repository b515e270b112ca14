package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guard spec for `Tables.events` ts normalization. The driver's fixture has
  * shipped `events.ts` under three different parquet encodings across rounds:
  * TIMESTAMP(NANOS) (rounds 1-5), `timestamp[us]` without timezone (round 6 —
  * read as TIMESTAMP_NTZ, which silently broke every `unix_micros`/CAST/
  * watermark consumer), and plain `timestamp[us, UTC]`. This spec pins the
  * contract: whatever the file encoding, `Tables.events` surfaces `ts` as
  * TimestampType with the same instant values, so a future fixture flip can't
  * zero out the timestamp/streaming query families again.
  */
class EventsEncodingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val wallMicros = Seq(
    1700000000000000L, // 2023-11-14T22:13:20Z
    1700000123456789L,
    1735689600000000L) // 2025-01-01T00:00:00Z

  /** Write an events.parquet under `enc` into a temp sfDir; return the dir. */
  private def writeFixture(enc: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-evt-$enc").toString
    val rows = wallMicros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    import spark.implicits._
    val base = rows.toDF("event_id", "us")
    val df = enc match {
      // Raw micros reinterpreted per target type. NANOS can't be written by
      // Spark directly (it writes micros), so the long-surface branch is
      // exercised the way it actually manifests: a LongType ts column, which
      // is exactly what the legacy nanosAsLong conf turns a NANOS file into.
      case "nanos-long" => base.select(col("event_id"), (col("us") * 1000L).as("ts"))
      case "ntz"        => base.select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      case "ltz"        => base.select(col("event_id"),
        timestamp_micros(col("us")).as("ts"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readNormalized(dir: String): Seq[(Long, Long)] = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType,
      s"ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    ev.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
  }

  test("all three fixture ts encodings normalize to the same TimestampType instants") {
    val expected = wallMicros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    for (enc <- Seq("nanos-long", "ntz", "ltz")) {
      val dir = writeFixture(enc)
      assert(readNormalized(dir) === expected, s"encoding $enc")
    }
  }

  test("the live fixture surfaces ts as TimestampType and supports a watermark") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType === TimestampType)
    // withWatermark hard-requires TimestampType — this is the exact analysis
    // failure mode the round-6 NTZ fixture triggered in st4-st11.
    val wm = ev.withWatermark("ts", "1 hour")
    assert(wm.schema("ts").dataType === TimestampType)
    // unix_micros + CAST both analyze (the other two round-6 failure modes).
    val probed = ev.selectExpr("unix_micros(ts)", "CAST(ts AS BIGINT)").limit(1).count()
    assert(probed === 1)
  }
}
