package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.{Stats, Unpivot}
import graft.functions.Scalars
import graft.ingest.{Clean, Extract}
import graft.operators.{FuzzyJoin, Upsert}
import graft.sources.{Multimodal, NetCdf, NetCdfFixture}
import graft.stream.Ingest
import graft.vector.{Embed, Knn, SemanticWorkload}
import graft.dedup.Dedup
import graft.text.{Analysis, Summaries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry; every
  * SQL-expressible one gets a DuckDB `oracleSql` twin with IDENTICAL column
  * names and row order. Double-valued aggregates are rounded on both sides so
  * summation-order differences between engines can't flip the hash; computed
  * int columns are cast to long to match DuckDB's BIGINT.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScanStreamQueries.queries ++ StreamingQueries.queries ++ DedupQueries.queries ++
      TextPipelineQueries.queries ++ AnalyticsQueries.queries ++
      VectorQueries.queries ++ AcquireQueries.queries

  /** DuckDB twins of `queries` (same columns, same order). */
  def oracleSql: Map[String, String] = OracleSql.map
}
