// Scratch: isolate dd7 stage costs. runMain graft.tools.Dd7Probe <sfDir>
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

object Dd7Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs = base.repartition(32, col("doc_id"))
    t("warmup")(docs.count())
    t("tokens")(docs.select(sum(size(Dedup.tokens(col("text"))))).head().getLong(0))
    val sets2 = docs.withColumn("sh", array_distinct(Dedup.shingles(Dedup.tokens(col("text")), 2)))
    t("sets n=2")(sets2.filter(size(col("sh")) > 0).count())
    val sets3nf = docs.withColumn("sh", array_distinct(Dedup.shingles(Dedup.tokens(col("text")), 3)))
    t("sets n=3 nofilter")(sets3nf.select(sum(size(col("sh")))).head().getLong(0))
    val sets = sets3nf.filter(size(col("sh")) > 0)
    t("sets.count")(sets.count())
    val shmd5 = sets.withColumn("shmd5", transform(col("sh"), s => md5(s)))
    t("shmd5.count")(shmd5.select(sum(size(col("shmd5")))).head().getLong(0))
    val sig = shmd5.select(
      col("doc_id") +: col("sh") +:
        (0 until 6).map(j =>
          array_min(transform(col("shmd5"), h => substring(h, j * 5 + 1, 5))).as(s"mh$j")): _*)
    t("sig.count")(sig.count())
    t("sig.count warm")(sig.count())
    val narrow = sig.drop("sh")
    t("narrow join")(narrow.as("a").join(narrow.as("b"),
      col("b.doc_id") === col("a.doc_id") + 20).count())
    val setsOnly = sets.select("doc_id", "sh")
    t("sets join+intersect")(setsOnly.as("a").join(setsOnly.as("b"),
      col("b.doc_id") === col("a.doc_id") + 20)
      .select(size(array_intersect(col("a.sh"), col("b.sh"))).as("ni"))
      .agg(sum("ni")).head().getLong(0))
    spark.stop()
  }
}
