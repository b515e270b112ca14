package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-layout").toString

  test("compact rewrites a fragmented directory to the byte target, losslessly") {
    val base = freshDir()
    val df = spark.range(10000).select(
      col("id"), (col("id") % 97).as("k"), rand(7).as("v"))
    df.repartition(16).write.parquet(s"$base/frag")

    val (bytes, nFrag) = Layout.dataFileStats(spark, s"$base/frag")
    assert(nFrag == 16 && bytes > 0)

    // target = half the total ⇒ exactly 2 output files
    val (before, after) =
      Layout.compact(spark, s"$base/frag", s"$base/out2", bytes / 2 + 1)
    assert(before == 16 && after == 2)

    // lossless: same multiset of rows
    val orig = spark.read.parquet(s"$base/frag")
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    val compacted = spark.read.parquet(s"$base/out2")
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    assert(compacted == orig)

    // target above the total ⇒ single file
    val (_, one) =
      Layout.compact(spark, s"$base/frag", s"$base/out1", bytes * 2)
    assert(one == 1)
  }

  test("default compaction path plans no shuffle; shuffle=true repartitions") {
    val base = freshDir()
    spark.range(1000).repartition(8).write.parquet(s"$base/frag")
    val (bytes, _) = Layout.dataFileStats(spark, s"$base/frag")

    // the coalesce form must not exchange: 100 TB compaction that shuffles
    // is a different (and much more expensive) job
    val coalescePlan = spark.read.parquet(s"$base/frag").coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!coalescePlan.contains("Exchange"),
      s"coalesce compaction must be shuffle-free:\n$coalescePlan")

    val (_, after) =
      Layout.compact(spark, s"$base/frag", s"$base/shuf", bytes / 2 + 1,
        shuffle = true)
    assert(after == 2)
    assert(spark.read.parquet(s"$base/shuf").count() == 1000)
  }

  test("dataFileStats ignores bookkeeping files and missing dirs") {
    val base = freshDir()
    assert(Layout.dataFileStats(spark, s"$base/nope") == ((0L, 0)))
    spark.range(10).coalesce(1).write.parquet(s"$base/d")
    val (bytes, n) = Layout.dataFileStats(spark, s"$base/d")
    assert(n == 1 && bytes > 0) // _SUCCESS and .crc files not counted
  }
}
