package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch: get_json_object vs from_json vs variant for the f13 path. */
object JsonPerf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val props = graft.Tables.events(spark, dir).select("props")
      .repartition(32, col("props"))
    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"[jsonperf] $name run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }
    }
    time("get_json_object") {
      props.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .agg(sum("k")).collect(); props.count()
    }
    time("from_json") {
      props.withColumn("k",
        from_json(col("props"), StructType(Seq(StructField("k", LongType)))).getField("k"))
        .agg(sum("k")).collect(); props.count()
    }
    time("variant_get") {
      props.withColumn("k",
        expr("try_variant_get(parse_json(props), '$.k', 'long')"))
        .agg(sum("k")).collect(); props.count()
    }
    spark.stop()
  }
}
