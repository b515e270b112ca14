package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Round-10 diagnostic for the dd CC trio: per-job wall breakdown under the
  * SAME session profile the bench uses (BenchProfile tier — AQE, shuffle
  * width, compress flags), unlike JobProfile's fixed latency config. Used to
  * attribute the ~0.9 s gap between dd8 (pipeline only) and dd9/dd10/dd16
  * (pipeline + connected components + decision joins).
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    // execution intent: this entry point runs what it builds, so let
    // query construction background-warm checkpoint segments (see
    // Dedup.warmOnConstruct -- plan-only introspection paths leave it off).
    graft.dedup.Dedup.warmOnConstruct = true
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def size(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(size).sum else f.length()
    val profile = graft.BenchProfile.tier(size(new java.io.File(dir)), 32)
    val spark = graft.stream.LocalFsPerf.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", profile.shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", profile.aqe.toString)
      .config("spark.shuffle.compress", profile.compress.toString)
      .config("spark.shuffle.spill.compress", profile.compress.toString)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    val starts = mutable.Map.empty[Int, (Long, String)]
    val jobs = mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts(e.jobId) = (System.nanoTime(),
          Option(e.properties).flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse(""))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, desc) =>
          jobs.synchronized { jobs += ((e.jobId, (System.nanoTime() - t0) / 1e9, desc)) }
        }
    })

    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      graft.dedup.Dedup.countSettled(fn(spark, dir)) // warm plan/codegen caches like bench reps
      Thread.sleep(200)
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      graft.dedup.Dedup.countSettled(fn(spark, dir))
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      jobs.synchronized {
        val sum = jobs.map(_._2).sum
        println(f"$name%-26s total=$total%6.3f s  jobs=${jobs.size}  jobSum=$sum%6.3f")
        jobs.sortBy(_._1).foreach { case (id, sec, d) =>
          println(f"    job $id%-4d $sec%7.3f s  ${d.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
