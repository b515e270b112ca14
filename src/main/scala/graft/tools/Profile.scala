package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryContext, Tables}
import graft.agg.Stats
import graft.dedup.Dedup

/** Scratch profiler for round-8 CC-trio work — not part of the engine. */
object Profile {
  def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  /** shingles with the token array bound ONCE as a lambda variable. */
  def shinglesFast(toksExpr: Column, n: Int): Column =
    element_at(
      transform(array(toksExpr), tks =>
        when(size(tks) >= n,
          transform(sequence(lit(0), size(tks) - n),
            i => concat_ws(" ", (1 to n).map(j => element_at(tks, i + lit(j))): _*)))
          .otherwise(array().cast("array<string>"))),
      1)

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

    def inlineShape = Dedup.withShingleHash(docs.select(col("doc_id"),
        explode(array_distinct(Dedup.shingles(Dedup.tokens(col("text")), 3))).as("shingle")))
      .select("doc_id", "sh_hi", "sh_lo")
    def fastShape = Dedup.withShingleHash(docs.select(col("doc_id"),
        explode(array_distinct(shinglesFast(Dedup.tokens(col("text")), 3))).as("shingle")))
      .select("doc_id", "sh_hi", "sh_lo")

    t("warm inline") { inlineShape.count() }
    t("warm fast") { fastShape.count() }
    // equality check
    val a = inlineShape.groupBy("doc_id").agg(count(lit(1)).as("n"),
      sum(col("sh_hi").cast("decimal(38,0)")).as("s"))
    val b = fastShape.groupBy("doc_id").agg(count(lit(1)).as("n"),
      sum(col("sh_hi").cast("decimal(38,0)")).as("s"))
    println("DIFF rows = " + a.exceptAll(b).unionByName(b.exceptAll(a)).count())
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      t("inline count") { inlineShape.count() }
      t("fast count") { fastShape.count() }
      t("fast ckpt materialize") { fastShape.localCheckpoint(false).count() }
    }
    spark.stop()
  }
}
