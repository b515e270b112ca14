package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.agg.{Stats, Unpivot}

/** The reference's end-to-end batch lifecycle (§3.1 of SURVEY.md;
  * reference: ingest/preprocess.py:28-61 `process_raw_data`) as composable
  * DataFrame stages:
  *
  *   raw (one row per profile, level-indexed measurement arrays)
  *     → tidy   (posexplode over zipped level arrays, NaN cells dropped — P9,
  *               ingest/preprocess.py:113-175)
  *     → clean  (P2 geo + P4 time + P5 bounds→null + P6 dropna + P7 id,
  *               ingest/preprocess.py:177-293)
  *     → floats (A1 per-float summary + nested properties struct,
  *               ingest/preprocess.py:295-357)
  *     → profiles (EAV unpivot + A2 group-id synthesis,
  *               ingest/preprocess.py:359-431)
  *
  * One Spark job per output; the only shuffles are the two groupBys. The 2D
  * explode runs inside the scan stage (generator, no shuffle).
  */
object Pipeline {

  /** Measurement columns carried as level arrays in the raw frame. */
  val MeasureCols: Seq[String] = Seq("temperature", "salinity", "pressure")

  /** 2D → long: one output row per (profile row, level), skipping levels
    * where every measurement is null (the reference's NaN-cell skip).
    */
  def tidy(raw: DataFrame, measures: Seq[String] = MeasureCols): DataFrame = {
    val keep = raw.columns.filterNot(measures.contains).map(col).toIndexedSeq
    raw
      .select(keep :+ posexplode(arrays_zip(measures.map(col): _*)).as(Seq("level", "m")): _*)
      .select(keep ++ Seq(col("level")) ++ measures.map(c => col(s"m.$c").as(c)): _*)
      .filter(measures.map(col(_).isNotNull).reduce(_ || _))
  }

  /** The full cleaning chain with the reference's bounds table. */
  def clean(df: DataFrame, timeUpper: String): DataFrame = {
    val scrubbed = Clean.scrubBounds(df, Clean.MeasurementBounds)
    Clean.validIdFilter(
      Clean.dropnaCritical(
        Clean.timeFilter(
          Clean.geoFilter(scrubbed, "latitude", "longitude"),
          "time", "1999-01-01", timeUpper),
        Seq("float_id", "time", "latitude", "longitude")),
      "float_id")
  }

  /** A1: per-float summary with the nested properties struct. */
  def floats(cleaned: DataFrame, measures: Seq[String] = MeasureCols): DataFrame =
    Stats.packProperties(
      Stats.perKeySummary(cleaned, Seq("float_id"), "time", "profile_id", measures),
      measures)

  /** Profiles EAV: wide → (variable_name, variable_value) long rows with a
    * synthesized dense profile-group id.
    */
  def profiles(cleaned: DataFrame, measures: Seq[String] = MeasureCols): DataFrame =
    Unpivot.toEav(
      cleaned.select((Seq("float_id", "profile_id", "time", "level") ++ measures).map(col): _*),
      keys = Seq("float_id", "profile_id", "time", "level"),
      measures = measures)
      .filter(col("variable_value").isNotNull)

  /** Schema assertion (reference: validate_dataframes,
    * ingest/preprocess.py:433-466): required columns present and frame
    * non-empty. Returns the frame for chaining; throws on violation.
    */
  def validate(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    df
  }
}
