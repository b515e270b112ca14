package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Scratch profiler for round-8 perf work — not part of the engine. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    val base = Tables.documents(spark, dir).select("doc_id", "text")
    val variants = base.filter(col("doc_id") % 25 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", concat(col("text"), lit(" tailword")))
    def docs = base.unionByName(variants).repartition(32, col("doc_id"))

    def composed = Dedup.withShingleHash(docs.select(col("doc_id"),
        explode(array_distinct(Dedup.shingles(Dedup.tokens(col("text")), 3))).as("shingle")))
      .select("doc_id", "sh_hi", "sh_lo")
    def fused = docs.select(col("doc_id"),
        explode(graft.expressions.ShingleMd5.of(Dedup.tokens(col("text")), 3)).as("__s"))
      .select(col("doc_id"), col("__s.sh_hi").as("sh_hi"), col("__s.sh_lo").as("sh_lo"))

    composed.count(); fused.count() // warm both codepaths
    val tA = new Array[Double](5); val tB = new Array[Double](5)
    for (r <- 0 until 5) {
      var t0 = System.nanoTime(); composed.count(); tA(r) = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); fused.count(); tB(r) = (System.nanoTime() - t0) / 1e9
    }
    println(f"AB composed min ${tA.min}%.3f  fused min ${tB.min}%.3f")
    println("AB composed " + tA.map(t => f"$t%.3f").mkString(",") +
      "  fused " + tB.map(t => f"$t%.3f").mkString(","))
    spark.stop()
  }
}
