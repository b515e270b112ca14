package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — the reference's ERDDAP tabledap query-URL construction
  * (ingest/load_data.py:62-90 `download_argo_data`, 105-156
  * `_build_erddap_query`, 42-47 the named-region constants).
  *
  * The reference builds one URL on the driver per download call. At crawl
  * scale the request SPEC is a DataFrame (one row per region × time-slice ×
  * source shard) and URL construction is a pure string expression — fully
  * codegen'd, no UDF — so a million-slice fetch plan materializes as one
  * narrow projection. The byte transfer behind the URLs is [[Acquire]]'s
  * job; this object owns only the query grammar.
  */
object Erddap {

  /** The reference's fixed variable list (load_data.py:117-126). */
  val variables: Seq[String] = Seq(
    "platform_number", "cycle_number", "time", "latitude", "longitude",
    "pres", "temp", "psal")

  /** The named-region bounds table (load_data.py:42-47): one row per named
    * region, doubles exactly as the reference declares them. Unknown region
    * names simply don't join — matching the reference, which emits bounds
    * only for `indian_ocean` and silently skips the clause otherwise.
    */
  def regions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("indian_ocean", -60.0, 30.0, 20.0, 120.0))
      .toDF("region", "lat_min", "lat_max", "lon_min", "lon_max")
  }

  /** `_build_erddap_query` (load_data.py:105-156): comma-joined variable
    * list, then `&latitude>=…&latitude<=…&longitude>=…&longitude<=…` when
    * region bounds are present (null `latMin` ⇔ the reference's
    * `region != "indian_ocean"` skip), then
    * `&time>=<start>T00:00:00Z&time<=<end>T23:59:59Z` when a time range is
    * present (null `startDate` ⇔ `time_range=None`). Bounds render via
    * double→string cast — "−60.0" style, byte-identical to Python's float
    * f-string for the constants the regions table carries. Dates are
    * 'YYYY-MM-DD' strings, as the reference's API contract requires.
    */
  def queryParams(
      latMin: Column, latMax: Column, lonMin: Column, lonMax: Column,
      startDate: Column, endDate: Column): Column =
    concat(
      lit(variables.mkString(",")),
      when(latMin.isNotNull, concat(
        lit("&latitude>="), latMin.cast("string"),
        lit("&latitude<="), latMax.cast("string"),
        lit("&longitude>="), lonMin.cast("string"),
        lit("&longitude<="), lonMax.cast("string"))).otherwise(lit("")),
      when(startDate.isNotNull, concat(
        lit("&time>="), startDate, lit("T00:00:00Z"),
        lit("&time<="), endDate, lit("T23:59:59Z"))).otherwise(lit("")))

  /** The full download URL (load_data.py:70-72):
    * `{base}/tabledap/{dataset}.nc?{query}`. A null `baseUrl` (unknown
    * source, load_data.py:66-68) nulls the whole URL — the reference's
    * "return None" in column form.
    */
  def tabledapUrl(
      baseUrl: Column, datasetId: Column,
      latMin: Column, latMax: Column, lonMin: Column, lonMax: Column,
      startDate: Column, endDate: Column): Column =
    concat(baseUrl, lit("/tabledap/"), datasetId, lit(".nc?"),
      queryParams(latMin, latMax, lonMin, lonMax, startDate, endDate))

  /** The reference's cache filename
    * (load_data.py:75: `{dataset}_{source}_{region}_{yyyyMMdd}.nc`).
    * `asOf` replaces the reference's `datetime.now()` — a cache name derived
    * from wall-clock is untestable and replays badly; callers pass the
    * batch/crawl date.
    */
  def cacheFilename(datasetId: Column, source: Column, region: Column,
      asOf: Column): Column =
    concat(datasetId, lit("_"), source, lit("_"), region, lit("_"),
      date_format(asOf, "yyyyMMdd"), lit(".nc"))
}
