package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library (SURVEY.md §2.7). Everything is a pure builtin
  * column expression — no UDFs — so the whole set stays inside whole-stage
  * codegen and is DuckDB-oracle-expressible.
  */
object Scalars {

  /** F1: numeric→string id; null/NaN → "unknown"; integral floats lose the
    * ".0" (reference: ingest/load_data.py:270-292).
    */
  def safeIdString(c: Column): Column =
    when(c.isNull || isnan(c.cast("double")), lit("unknown"))
      .otherwise(c.cast("long").cast("string"))

  /** F3: filename → float id, e.g. "nodc_D1900975_339.nc" → "1900975"
    * (reference: fastapi_app.py:660-675).
    */
  def filenameFloatId(c: Column): Column = {
    val hit = regexp_extract(c, "_[DR](\\d+)", 1)
    when(hit =!= "", hit)
  }

  /** F5: the reference's date label — day + hardcoded "th" + abbreviated
    * month + year, e.g. "16th Jan 2020" (reference:
    * preprocess_floats_to_chromadb.py:163-171 hardcodes "th" for ALL days;
    * replicated exactly, 1st/2nd/3rd included).
    */
  def dateTh(c: Column): Column =
    concat(dayofmonth(c).cast("string"), lit("th "), date_format(c, "MMM yyyy"))

  /** F6: deployment season from start month (reference: embeddings/embed.py:127-139). */
  def season(monthCol: Column): Column =
    when(monthCol.between(3, 5), "spring")
      .when(monthCol.between(6, 8), "summer")
      .when(monthCol.between(9, 11), "autumn")
      .otherwise("winter")

  /** F7: ocean-region classifier (reference: embeddings/embed.py:150-174).
    * Order of the CASE arms matches the reference's if/elif chain.
    */
  def oceanRegion(lat: Column, lon: Column): Column =
    when(lon.between(20, 120) && lat.between(-60, 30), "Indian Ocean")
      .when(lon <= -60, "Pacific Ocean")
      .when(lon.between(-60, 20), "Atlantic Ocean")
      .when(lon >= 120 && lat >= 0, "North Pacific Ocean")
      .when(lon >= 120 && lat < 0, "South Pacific Ocean")
      .otherwise("Global Ocean")

  /** F8: latitude-band context (reference: embeddings/embed.py:117-124). */
  def latBand(lat: Column): Column =
    when(lat < -30, "Southern Ocean region")
      .when(lat > 30, "Northern hemisphere waters")
      .otherwise("tropical and subtropical waters")

  /** F9: "12.345°N" hemisphere formatting (reference:
    * preprocess_floats_to_chromadb.py:200-204).
    */
  // null-guarded: format_string is java.util.Formatter underneath, which
  // renders a null %f argument as the STRING "null" (truncated by the
  // precision to "nul") instead of propagating NULL — a null latitude must
  // yield a null label, as every SQL formatter does. Caught by the round-12
  // null-injection fuzz (tools/fuzz_sweep.py).
  def hemisphereLat(lat: Column): Column =
    when(lat.isNotNull,
      format_string("%.3f°%s", abs(lat), when(lat >= 0, "N").otherwise("S")))

  def hemisphereLon(lon: Column): Column =
    when(lon.isNotNull,
      format_string("%.3f°%s", abs(lon), when(lon >= 0, "E").otherwise("W")))

  /** F10: bbox center (reference: embeddings/embed.py:80-81). */
  def center(lo: Column, hi: Column): Column = (lo + hi) / 2.0

  /** F12: finite guard — true when the value is usable for stats
    * (reference: fastapi_app.py:344-346).
    */
  def isFinite(c: Column): Column =
    c.isNotNull && !isnan(c) && abs(c) =!= Double.PositiveInfinity
}
