package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.StreamJoin

/** Multi-batch behavior of the stream-stream interval join that the
  * oracled single-batch st5 run can't show: matches emit across batches,
  * join state is EVICTED once the watermark passes the interval bound, and
  * a purchase arriving after its click's state was evicted produces no
  * match — bounded state is the property that lets the join run forever.
  */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("interval join matches across batches and evicts expired state") {
    val base = Files.createTempDirectory("graft-sjoin").toString
    def write(dir: String, rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("id", "user_id", "ts_s")
        .select(col("id"), col("user_id"), to_timestamp(col("ts_s")).as("ts"))
        .coalesce(1).write.mode("append").parquet(s"$base/$dir")

    // batch 1: two clicks
    write("clicks", Seq(
      (1L, 100L, "2024-03-01 10:00:00"),
      (2L, 200L, "2024-03-01 10:05:00")))
    write("purchases", Seq((90L, 999L, "2024-03-01 09:00:00"))) // unmatched seed

    val cSchema = spark.read.parquet(s"$base/clicks").schema
    val clicks = spark.readStream.schema(cSchema).parquet(s"$base/clicks")
      .select(col("user_id"), col("id").as("click_id"), col("ts").as("click_ts"))
    val purchases = spark.readStream.schema(cSchema).parquet(s"$base/purchases")
      .select(col("user_id"), col("id").as("purchase_id"), col("ts").as("purchase_ts"))
    spark.catalog.dropTempView("sjoin_mem")
    val q = StreamJoin.intervalJoin(clicks, purchases, "user_id",
        "click_ts", "purchase_ts", watermark = "1 hour", windowSec = 3600L)
      .select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("sjoin_mem")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: in-window purchase for user 100 → match emits immediately
      write("purchases", Seq((10L, 100L, "2024-03-01 10:30:00")))
      q.processAllAvailable()
      assert(spark.table("sjoin_mem").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet == Set((1L, 10L)))
      val stateAfterMatch = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).max
      // batch 3: advance BOTH sides far ahead (global watermark = min of
      // the two sources) → 10:0x clicks are past click_ts + window and get
      // evicted from join state
      write("clicks", Seq((3L, 300L, "2024-03-01 20:00:00")))
      write("purchases", Seq((11L, 400L, "2024-03-01 20:00:00")))
      q.processAllAvailable()
      // batch 4: a purchase that WOULD match click 2 (10:05 + 15 min) —
      // but that click's state is gone and the row is below the watermark
      write("purchases", Seq((12L, 200L, "2024-03-01 10:20:00")))
      q.processAllAvailable()
      val got = spark.table("sjoin_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L)), s"late purchase matched evicted state: $got")
      val stateFinal = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateFinal < stateAfterMatch,
        s"join state not evicted: $stateFinal vs $stateAfterMatch")
    } finally q.stop()
  }

  test("left-outer: unmatched left emits null-extended only after eviction") {
    val base = Files.createTempDirectory("graft-sjoin-outer").toString
    def write(dir: String, rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("id", "user_id", "ts_s")
        .select(col("id"), col("user_id"), to_timestamp(col("ts_s")).as("ts"))
        .coalesce(1).write.mode("append").parquet(s"$base/$dir")

    write("clicks", Seq((1L, 100L, "2024-03-01 10:00:00")))
    write("purchases", Seq((90L, 999L, "2024-03-01 10:00:00"))) // seed wm

    val cSchema = spark.read.parquet(s"$base/clicks").schema
    val clicks = spark.readStream.schema(cSchema).parquet(s"$base/clicks")
      .select(col("user_id"), col("id").as("click_id"), col("ts").as("click_ts"))
    val purchases = spark.readStream.schema(cSchema).parquet(s"$base/purchases")
      .select(col("user_id"), col("id").as("purchase_id"), col("ts").as("purchase_ts"))
    spark.catalog.dropTempView("sjoin_outer_mem")
    val q = StreamJoin.intervalJoin(clicks, purchases, "user_id",
        "click_ts", "purchase_ts", watermark = "0 seconds", windowSec = 3600L,
        joinType = "leftOuter")
      .select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("sjoin_outer_mem")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // watermark (10:00) has not passed click+window (11:00): nothing out
      assert(spark.table("sjoin_outer_mem").isEmpty,
        "null-extended row emitted before the watermark proved no match")
      // advance BOTH sides well past 11:00 → eviction emits (1, null)
      write("clicks", Seq((2L, 300L, "2024-03-01 20:00:00")))
      write("purchases", Seq((91L, 999L, "2024-03-01 20:00:00")))
      q.processAllAvailable()
      val got = spark.table("sjoin_outer_mem").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(got == Set((1L, None)),
        s"expected the evicted unmatched click null-extended, got: $got")
    } finally q.stop()
  }

  /** Pins the exact eviction boundary the st7 oracle encodes
    * (`click_ts + window < wm`, STRICT): a watermark landing exactly on
    * click_ts + window must NOT emit the null-extended row; one second
    * past it must. Mirrors the st6 EventTimeTimeout boundary spec — a
    * `<=` vs `<` disagreement here would flip st7 parity on any fixture
    * with a tie between the final min-watermark and a click's bound.
    */
  test("left-outer eviction boundary is strict: wm == click_ts + window holds state") {
    val base = Files.createTempDirectory("graft-sjoin-bound").toString
    def write(dir: String, rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("id", "user_id", "ts_s")
        .select(col("id"), col("user_id"), to_timestamp(col("ts_s")).as("ts"))
        .coalesce(1).write.mode("append").parquet(s"$base/$dir")

    write("clicks", Seq((1L, 100L, "2024-03-01 10:00:00")))
    write("purchases", Seq((90L, 999L, "2024-03-01 10:00:00"))) // seed wm

    val cSchema = spark.read.parquet(s"$base/clicks").schema
    val clicks = spark.readStream.schema(cSchema).parquet(s"$base/clicks")
      .select(col("user_id"), col("id").as("click_id"), col("ts").as("click_ts"))
    val purchases = spark.readStream.schema(cSchema).parquet(s"$base/purchases")
      .select(col("user_id"), col("id").as("purchase_id"), col("ts").as("purchase_ts"))
    spark.catalog.dropTempView("sjoin_bound_mem")
    val q = StreamJoin.intervalJoin(clicks, purchases, "user_id",
        "click_ts", "purchase_ts", watermark = "0 seconds", windowSec = 3600L,
        joinType = "leftOuter")
      .select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("sjoin_bound_mem")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // advance BOTH sides to exactly click_ts + window (11:00:00): the
      // min-watermark equals the bound — strict eviction keeps the state
      write("clicks", Seq((2L, 300L, "2024-03-01 11:00:00")))
      write("purchases", Seq((91L, 999L, "2024-03-01 11:00:00")))
      q.processAllAvailable()
      assert(spark.table("sjoin_bound_mem").isEmpty,
        "null-extended row emitted at wm == click_ts + window (eviction not strict)")
      // one second past the bound: now it must evict and emit
      write("clicks", Seq((3L, 300L, "2024-03-01 11:00:01")))
      write("purchases", Seq((92L, 999L, "2024-03-01 11:00:01")))
      q.processAllAvailable()
      val got = spark.table("sjoin_bound_mem").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(got == Set((1L, None)),
        s"expected eviction one second past the bound, got: $got")
    } finally q.stop()
  }
}
