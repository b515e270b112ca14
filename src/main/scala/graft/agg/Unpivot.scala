package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wide→long reshaping (reference: the profiles EAV unpivot at
  * ingest/preprocess.py:359-431 and the 2D level explode at :113-175).
  *
  * Both are builtin generators — `stack` for the unpivot, `posexplode` for
  * the positional explode — so they run inside the scan stage with no
  * shuffle of their own.
  */
object Unpivot {

  /** EAV unpivot: wide measure columns → (variable_name, variable_value)
    * long rows, exactly the reference's TEMP/PSAL reshaping.
    */
  def toEav(df: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    val stackArgs = measures.map(m => s"'$m', $m").mkString(", ")
    df.selectExpr(
      keys ++ Seq(s"stack(${measures.size}, $stackArgs) AS (variable_name, variable_value)"): _*)
  }

  /** Positional explode of a token array column, dropping empty cells — the
    * level-explode + NaN-skip pattern (P9, ingest/preprocess.py:154-166).
    * Output gains (pos, token).
    */
  def explodeTokens(df: DataFrame, arrayCol: String): DataFrame =
    df.select(col("*"), posexplode(col(arrayCol)).as(Seq("pos", "token")))
      .filter(col("token").isNotNull && col("token") =!= "")
      .drop(arrayCol)

  /** A2: synthesize a dense global group id over the grouping keys — the
    * pandas `ngroup()` equivalent (reference: ingest/preprocess.py:377).
    * NOTE: a global dense_rank needs a single-partition window; acceptable
    * only because group CARDINALITY (not row count) is small. At 100 TB,
    * synthesize ids per-partition (`monotonically_increasing_id`) or hash
    * the keys instead.
    */
  def withGroupId(df: DataFrame, keys: Seq[String]): DataFrame =
    df.withColumn("group_id", dense_rank().over(Window.orderBy(keys.map(col): _*)))
}
