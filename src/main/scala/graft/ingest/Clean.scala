package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level cleaning chain, re-expressing the reference's preprocessor
  * (reference: ingest/preprocess.py:177-293).
  *
  * The reference cleans ARGO measurement rows; the same operators applied to
  * the fixture tables:
  *   - P5 bounds-to-null: out-of-range measurement -> null, row kept
  *     (ingest/preprocess.py:262-293, bounds at :23-26)
  *   - P2 geographic range filter (ingest/preprocess.py:243-260)
  *   - P4 time-range sanity filter (ingest/preprocess.py:221-241)
  *   - P6 critical-column dropna (ingest/preprocess.py:205-208)
  *   - P7 invalid-id filter (ingest/preprocess.py:191-194)
  *
  * Everything is a pure column expression — Catalyst pushes the filters into
  * the parquet scan and the whole chain stays inside one WholeStageCodegen.
  */
object Clean {

  /** Measurement validity bounds (reference ingest/preprocess.py:23-26). */
  val MeasurementBounds: Map[String, (Double, Double)] = Map(
    "temperature" -> (-5.0, 40.0),
    "salinity" -> (0.0, 50.0),
    "pressure" -> (0.0, 6000.0),
    "depth" -> (0.0, 6000.0)
  )

  /** P5: keep the row, null the out-of-range value. */
  def boundsToNull(c: Column, lo: Double, hi: Double): Column =
    when(c.between(lo, hi), c)

  /** P5 applied over a set of columns. */
  def scrubBounds(df: DataFrame, bounds: Map[String, (Double, Double)]): DataFrame =
    bounds.foldLeft(df) { case (d, (name, (lo, hi))) =>
      if (d.columns.contains(name)) d.withColumn(name, boundsToNull(col(name), lo, hi)) else d
    }

  /** P2: drop rows with out-of-range coordinates (row-dropping variant). */
  def geoFilter(df: DataFrame, latCol: String, lonCol: String): DataFrame =
    df.filter(col(latCol).between(-90, 90) && col(lonCol).between(-180, 180))

  /** P4: timestamp sanity window. `upper` is a parameter (the reference used
    * `now()`; a pinned bound keeps runs deterministic).
    */
  def timeFilter(df: DataFrame, tsCol: String, lower: String, upper: String): DataFrame =
    df.filter(col(tsCol) >= lit(lower).cast("timestamp") && col(tsCol) <= lit(upper).cast("timestamp"))

  /** P6: drop rows missing any critical column. */
  def dropnaCritical(df: DataFrame, critical: Seq[String]): DataFrame =
    df.na.drop(critical)

  /** P7: drop rows whose id is null or the literal string "nan" (the pandas
    * astype(str) artifact the reference filters — ingest/preprocess.py:191-194).
    */
  def validIdFilter(df: DataFrame, idCol: String): DataFrame =
    df.filter(col(idCol).isNotNull && col(idCol).cast("string") =!= "nan")
}
