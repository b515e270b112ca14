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
    *
    * Scale shape: only the DISTINCT key set (group cardinality, small by
    * definition of "grouping") flows through the single-partition rank
    * window; the full data never collapses to one task. The ranked key→id
    * map is then broadcast-joined back, so the big side keeps its
    * partitioning and the whole operator adds zero full-data shuffles.
    */
  def withGroupId(df: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val ranked = df.select(keyCols: _*).distinct()
      .withColumn("group_id", dense_rank().over(Window.orderBy(keyCols: _*)))
    df.join(broadcast(ranked), keys)
      .select(df.columns.map(col) :+ col("group_id"): _*)
  }
}
