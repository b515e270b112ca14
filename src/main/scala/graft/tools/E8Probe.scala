package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: dump e8's intermediate stages for a fixture dir. */
object E8Probe {
  def main(args: Array[String]): Unit = {
    val Array(dir, out) = args.take(2)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.vector.Knn
    import org.apache.spark.sql.expressions.Window
    val nprobe = 6
    val emb = graft.Tables.table(spark, dir, "embeddings")
      .withColumn("vec", col("embedding").cast("array<double>"))
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val cands = emb.filter(col("vec_id") >= 20).select("vec_id", "label", "vec")
    val exact = Knn.topK(cands, "vec", queries, "query_id", "qvec",
      k = 5, tiebreak = "vec_id").select("query_id", "vec_id")
    exact.coalesce(1).write.mode("overwrite").parquet(s"$out/exact")
    val cents = Knn.ivfTrain(cands, "vec_id", "vec", "label", iters = 2)
    cents.select(col("label"), to_json(col("centroid")).as("centroid"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/cents")
    val index = Knn.ivfAssign(cands, cents, "vec_id", "vec", "label")
    index.select("vec_id", "label").coalesce(1).write.mode("overwrite").parquet(s"$out/index")
    val best = queries.crossJoin(broadcast(cents))
      .withColumn("csim", round(Knn.cosine(col("qvec"), col("centroid")), 6))
      .withColumn("r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("label"))))
      .filter(col("r") <= nprobe)
      .select("query_id", "label")
    best.coalesce(1).write.mode("overwrite").parquet(s"$out/best")
    spark.stop()
  }
}
