package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-oriented re-expression of the reference's keyed sink semantics
  * (reference: ingest/db_handler.py:136-256).
  *
  * The reference does per-row `INSERT ... ON CONFLICT` round-trips (an N+1
  * anti-pattern — main.py:265-297); at scale these become set operations with
  * exactly one shuffle each:
  *
  *   - D1 upsert / last-writer-wins (ON CONFLICT DO UPDATE,
  *     ingest/db_handler.py:180-187): window row_number over the key, keep
  *     the highest-precedence row.
  *   - D2 insert-if-absent (ON CONFLICT DO NOTHING, ingest/db_handler.py:237-245):
  *     left_anti join then append.
  *   - J1 skip-existing probe (ingest/db_handler.py:326-344): the same
  *     anti-join, returning only the would-be-inserted rows.
  *
  * All three shuffle on the key only; when `existing` is small Catalyst
  * broadcasts it and the anti-join is shuffle-free.
  */
object Upsert {

  /** D1: merge `updates` into `base`; on key conflict the row with the higher
    * `precedence` value wins (ties broken by `tiebreak` descending so the
    * result is deterministic).
    */
  def lastWriterWins(
      base: DataFrame,
      updates: DataFrame,
      key: String,
      precedence: String,
      tiebreak: String): DataFrame = {
    val all = base.unionByName(updates)
    // max_by with a (precedence, tiebreak) struct comparator = the
    // lexicographic-max row per key, identical to rank-1 of a window
    // ordered by (precedence DESC, tiebreak DESC) — but as ONE hash
    // aggregate: the partial combine keeps a single winner per key
    // map-side, and the reduce side needs no per-partition sort the way a
    // window does. Same single shuffle, strictly less work at every scale.
    val others = all.columns.filterNot(_ == key).toSeq
    all.groupBy(col(key))
      .agg(max_by(
        struct(others.map(col): _*),
        struct(col(precedence), col(tiebreak))).as("__w"))
      .select(col(key) +: others.map(c => col(s"__w.$c")): _*)
  }

  /** J1: rows of `incoming` whose key is absent from `existing`. */
  def skipExisting(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    incoming.join(existing.select(key).distinct(), Seq(key), "left_anti")

  /** D2: `existing` plus the not-yet-present rows of `incoming`. */
  def insertIfAbsent(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    existing.unionByName(skipExisting(incoming, existing, key))
}
