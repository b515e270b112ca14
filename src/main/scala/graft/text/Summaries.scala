package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** T1–T6 deterministic NL-template operators (the reference's signature
  * transform — embeddings/embed.py:46-148, preprocess_floats_to_chromadb.py
  * :145-271, fastapi_app.py:524-555, sync_supabase_to_chromadb.py:121-177).
  *
  * Pure `format_string`/`concat` compositions so the whole template stays
  * inside whole-stage codegen and has an exact DuckDB `printf` twin.
  * Formatting discipline for cross-engine parity: every double is
  * `round(x, n)`-ed BEFORE `%.nf` formatting (Java's formatter rounds
  * halfway cases up, C's rounds to even — pre-rounding removes the halfway
  * case so both agree).
  */
object Summaries {

  /** format_string with SQL null semantics: any null argument nulls the whole
    * template. java.util.Formatter renders a null %f/%s argument as the
    * literal string "null" (precision-truncated to "nul"), while every SQL
    * formatter — including the DuckDB printf twin — propagates NULL. The
    * round-12 null-injection fuzz caught the bare form in T2/T3 (an all-null
    * measurement column must yield a null summary, not "...from nul to nul").
    */
  def nullSafeFormat(fmt: String, args: Column*): Column =
    when(args.map(_.isNotNull).reduce(_ && _), format_string(fmt, args: _*))

  /** T2-shaped deployment summary over per-key aggregates. */
  def deploymentSummary(
      dateLabel: Column, id: Column, n: Column,
      lat: Column, vmin: Column, vmax: Column): Column =
    nullSafeFormat(
      "On %s, unit %s recorded %s event(s) near latitude %.3f°%s. Values ranged from %.2f to %.2f.",
      dateLabel, id, n,
      abs(round(lat, 3)), when(lat >= 0, "N").otherwise("S"),
      round(vmin, 2), round(vmax, 2))

  /** T3-shaped upload description over whole-set stats. */
  def uploadDescription(
      start: Column, end: Column, vmin: Column, vmax: Column,
      vmean: Column, nMeasurements: Column): Column =
    nullSafeFormat(
      "Data collected from %s to %s. Values: %.2f to %.2f (mean: %.2f, %s measurements).",
      start, end, round(vmin, 2), round(vmax, 2), round(vmean, 2), nMeasurements)

  /** T1-shaped metadata summary with region/band/season context. */
  def metadataSummary(
      id: Column, d1: Column, d2: Column, lat: Column, lon: Column, n: Column): Column =
    format_string(
      "Unit %s operated from %s to %s in the %s with %s records. This unit operated in %s, %s deployment.",
      id, d1, d2,
      Scalars.oceanRegion(lat, lon), n,
      Scalars.latBand(lat),
      Scalars.season(month(d1)))
}
