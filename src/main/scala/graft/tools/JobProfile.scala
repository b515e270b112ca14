package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-Spark-job wall-time breakdown for one query invocation — round-9
  * diagnostic for the one-shot family: shows how a fresh call's cost splits
  * across checkpoint materializations, iterative-round actions, broadcast
  * collects, and the final output job.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    // execution intent: this entry point runs what it builds, so let
    // query construction background-warm checkpoint segments (see
    // Dedup.warmOnConstruct -- plan-only introspection paths leave it off).
    graft.dedup.Dedup.warmOnConstruct = true
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.stream.LocalFsPerf.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    val starts = mutable.Map.empty[Int, Long]
    val jobs = mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts(e.jobId) = System.nanoTime()
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { t0 =>
          jobs += ((e.jobId, (System.nanoTime() - t0) / 1e9, ""))
        }
    })

    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      graft.dedup.Dedup.countSettled(fn(spark, dir)) // warm codegen/plan caches like the bench reps
      Thread.sleep(200)
      jobs.clear()
      val t0 = System.nanoTime()
      graft.dedup.Dedup.countSettled(fn(spark, dir))
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      val sum = jobs.map(_._2).sum
      println(f"$name%-26s total=$total%6.3f s  jobs=${jobs.size}  jobSum=$sum%6.3f  gap=${total - sum}%6.3f")
      jobs.foreach { case (id, sec, _) => println(f"    job $id%-4d $sec%7.3f s") }
    }
    spark.stop()
  }
}
