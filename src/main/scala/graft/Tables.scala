package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table access. All `SparkEntry.queries` read through here so the
  * scan layer (path layout, schema quirks) is defined once.
  *
  * Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
  * orders lineitem events documents embeddings — one parquet file each under
  * the scale-factor dir.
  */
object Tables {

  /** Read one fixture table. Plain parquet scan: Catalyst handles projection
    * and predicate pushdown (the reference hand-rolled both into its ERDDAP
    * URL builder — ingest/load_data.py:105-156; here they are free).
    *
    * DataFrames are memoized per (session, path): plans are immutable, and
    * reuse lets repeated queries share the resolved FileIndex/schema instead
    * of re-listing and re-reading parquet footers per query.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      key => key._1.read.parquet(key._2))

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos (legacy conf) and
    * truncate to a micros timestamp — the same truncation DuckDB applies when
    * casting its TIMESTAMP_NS to TIMESTAMP, so oracle comparisons agree.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Guarded write: set once per session, not on every access — repeated
    // conf mutation is benign single-threaded but racy if a session is ever
    // shared across concurrently-planning queries.
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") != Some("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    // Normalize ts to TimestampType across all fixture encodings seen so far:
    //   TIMESTAMP(NANOS)   → raw nanos long under the legacy conf → truncate;
    //   timestamp[us] (no tz) → TIMESTAMP_NTZ → rebind as session-TZ instant
    //     (session TZ is UTC everywhere in this repo, so the rebinding is
    //     value-identical to the wall-clock micros DuckDB's oracle reads);
    //   timestamp[us, UTC] → already TimestampType → pass through.
    // Downstream unix_micros / CAST / withWatermark all require TimestampType.
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
