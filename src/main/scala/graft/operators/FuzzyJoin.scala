package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J2: fuzzy id-match join (reference: update_chromadb_measurements.py:181-237).
  *
  * The reference nested-loops over two id sets matching by: exact equality
  * after byte-wrapper cleanup, OR substring containment in either direction;
  * first match wins. Spark shape: clean ids with `regexp_replace`+`trim`,
  * then a theta join (`===` OR `contains` either way). The containment
  * predicate is non-equi, so Spark plans a BroadcastNestedLoopJoin — correct
  * here because one side (the id registry) is small; NEVER use this shape
  * for two large sides (at 100 TB, pre-bucket by a prefix key instead).
  *
  * "First match wins" is order-dependent in the reference; we pin the
  * deterministic equivalent: the minimum matching registry id.
  */
object FuzzyJoin {

  /** F2: strip the `b'...'` byte-repr wrapper + whitespace
    * (reference: update_chromadb_measurements.py:167-179).
    */
  def cleanId(c: Column): Column = trim(regexp_replace(c, "^b'(.*)'$", "$1"))

  /** Fuzzy match `dirty` (column `dirtyIdCol`, may carry the byte wrapper)
    * against `registry` (column `regIdCol`, already clean). Returns one row
    * per dirty row with `matched_id` = min matching registry id (null when
    * unmatched — the reference tracks those too).
    */
  def fuzzyMatch(dirty: DataFrame, dirtyIdCol: String, registry: DataFrame, regIdCol: String): DataFrame = {
    val cleaned = dirty.withColumn("clean_id", cleanId(col(dirtyIdCol)))
    val cond = col("clean_id") === col(regIdCol) ||
      col(regIdCol).contains(col("clean_id")) ||
      col("clean_id").contains(col(regIdCol))
    cleaned
      .join(broadcast(registry.select(col(regIdCol))), cond, "left")
      .groupBy(cleaned.columns.map(col).toIndexedSeq: _*)
      .agg(min(col(regIdCol)).as("matched_id"))
  }
}
