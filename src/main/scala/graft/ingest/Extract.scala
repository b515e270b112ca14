package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S4: variable extraction with alias resolution and fill-value nulling
  * (reference: ingest/load_data.py:226-331 — NetCDF variables are located
  * through an alias table with case-variant fallback, and `_FillValue`
  * sentinels become NaN).
  *
  * Spark shape: one `coalesce` over the candidate columns per logical
  * field, then sentinel→null. Pure projection — Catalyst prunes the
  * untouched candidates out of the scan.
  */
object Extract {

  /** Resolve `target` from the first non-null of `candidates`, mapping the
    * fill-value sentinel (if any) to null.
    */
  def resolveAliases(
      df: DataFrame,
      target: String,
      candidates: Seq[String],
      fill: Option[Double] = None): DataFrame = {
    val present = candidates.filter(df.columns.contains)
    require(present.nonEmpty, s"no candidate column for $target in ${df.columns.mkString(",")}")
    val c = coalesce(present.map(col): _*)
    val v = fill.map(f => when(c === lit(f), lit(null)).otherwise(c)).getOrElse(c)
    df.withColumn(target, v)
  }

  /** The alias map shape the reference uses (logical field → candidates). */
  def resolveAll(df: DataFrame, aliases: Map[String, Seq[String]],
      fill: Option[Double] = None): DataFrame =
    aliases.foldLeft(df) { case (d, (t, cands)) => resolveAliases(d, t, cands, fill) }
}
