package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path sink patterns: partitioned writes with partition pruning on
  * read (the B-tree-index replacement from SURVEY.md §4), and S5's
  * directory-glob scan with per-file error isolation.
  */
class PartitionedSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("partitionBy write prunes partitions at read time") {
    val base = Files.createTempDirectory("graft-part").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "event_type", "value")
    ev.write.partitionBy("event_type").parquet(s"$base/sink")

    val q = spark.read.parquet(s"$base/sink")
      .filter(col("event_type") === "click")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"expected partition filter in scan:\n$plan")
    assert(q.count() == ev.filter(col("event_type") === "click").count())
    // pruning is physical: only the matching partition directory is listed
    val dirs = new java.io.File(s"$base/sink").listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("event_type=click")))
  }

  test("glob scan isolates corrupt files instead of failing the job") {
    val base = Files.createTempDirectory("graft-glob").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "value")
    ev.filter(col("event_id") < 100).coalesce(1).write.parquet(s"$base/in/part1")
    ev.filter(col("event_id") >= 100 && col("event_id") < 200)
      .coalesce(1).write.parquet(s"$base/in/part2")
    // drop a corrupt "parquet" file into the tree
    Files.write(java.nio.file.Paths.get(s"$base/in/part1/zz-corrupt.parquet"),
      "not a parquet file".getBytes)

    val strict = spark.read.parquet(s"$base/in/*")
    intercept[org.apache.spark.SparkException](strict.count())

    val tolerant = spark.read.option("ignoreCorruptFiles", "true")
      .parquet(s"$base/in/*")
    assert(tolerant.count() == 200)
  }
}
