package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.Stats
import graft.ingest.Clean

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry; every
  * SQL-expressible one gets a DuckDB `oracleSql` twin with IDENTICAL column
  * names and row order. Double-valued aggregates are rounded on both sides so
  * summation-order differences between engines can't flip the hash.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- headline agg (reference A1-spine: scan→filter→agg→sort) ----------
    "q1_pricing_summary" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- A1 per-key summary agg (ingest/preprocess.py:295-357) ------------
    "a1_user_summary" -> { (s, dir) =>
      Stats.perKeySummary(
        Tables.events(s, dir),
        key = Seq("user_id"), tsCol = "ts", distinctCol = "event_id",
        measures = Seq("value"))
        .orderBy("user_id")
    },

    // ---- A3 whole-table stats (fastapi_app.py:279-372) --------------------
    "a3_global_stats" -> { (s, dir) =>
      Stats.globalSummary(Tables.events(s, dir), tsCol = "ts", measures = Seq("value"))
    },

    // ---- P5+P6 cleaning chain (ingest/preprocess.py:177-293) --------------
    "p5_clean_events" -> { (s, dir) =>
      val cleaned = Tables.events(s, dir)
        .withColumn("value", Clean.boundsToNull(col("value"), 0.0, 200.0))
        .na.drop(Seq("event_id", "ts", "user_id"))
      cleaned
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("value")).as("n_valid"),
          round(avg("value"), 6).as("value_mean"))
        .orderBy("event_type")
    },

    // ---- J4 star join (schema.sql FK chain; Catalyst broadcasts dims) -----
    "j4_orders_by_region" -> { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_price"))
        .orderBy("r_name")
    }
  )

  /** DuckDB twins of `queries` (same columns, same order). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "a1_user_summary" ->
      """SELECT user_id,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
         count(DISTINCT event_id) AS n_distinct,
         count(*) AS n_rows,
         count(value) AS value_count,
         round(min(value), 4) AS value_min,
         round(max(value), 4) AS value_max,
         round(avg(value), 6) AS value_mean
         FROM events
         GROUP BY user_id
         ORDER BY user_id""",
    "a3_global_stats" ->
      """SELECT
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
         count(*) AS n_rows,
         count(value) AS value_count,
         round(min(value), 4) AS value_min,
         round(max(value), 4) AS value_max,
         round(avg(value), 6) AS value_mean
         FROM events""",
    "p5_clean_events" ->
      """SELECT event_type,
         count(*) AS n_rows,
         count(v) AS n_valid,
         round(avg(v), 6) AS value_mean
         FROM (
           SELECT event_type,
                  CASE WHEN value BETWEEN 0 AND 200 THEN value END AS v
           FROM events
           WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
         )
         GROUP BY event_type
         ORDER BY event_type""",
    "j4_orders_by_region" ->
      """SELECT r_name,
         count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS total_price
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name
         ORDER BY r_name"""
  )
}
