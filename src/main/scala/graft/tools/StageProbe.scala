package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Round-11 diagnostic: CcProbe plus per-stage names/timing, to attribute
  * the dd-trio's serialized job list (which jobs are broadcast builds of
  * which subtree). Same session profile as the bench.
  */
object StageProbe {
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

    val stages = mutable.ArrayBuffer.empty[(Int, Double, Int, String)]
    val jobOfStage = mutable.Map.empty[Int, Int]
    val jobSpan = mutable.Map.empty[Int, (Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        e.stageIds.foreach(sid => jobOfStage(sid) = e.jobId)
        jobSpan(e.jobId) = (System.nanoTime(), 0L)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobSpan.get(e.jobId).foreach { case (s, _) =>
          jobSpan(e.jobId) = (s, System.nanoTime()) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        stages.synchronized {
          stages += ((i.stageId, wall, i.numTasks,
            i.name.take(60) + " || rdds=" + i.rddInfos.map(r =>
              s"${r.id}:${r.name}${if (r.storageLevel.useMemory) "*" else ""}")
              .mkString(",").take(220)))
        }
      }
    })

    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      (1 to 4).foreach(_ => graft.dedup.Dedup.countSettled(fn(spark, dir))) // steady state
      Thread.sleep(200)
      stages.synchronized(stages.clear())
      jobSpan.clear()
      val t0 = System.nanoTime()
      graft.dedup.Dedup.countSettled(fn(spark, dir))
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      stages.synchronized {
        println(f"$name%-26s total=$total%6.3f s  stages=${stages.size}")
        jobSpan.toSeq.sortBy(_._2._1).foreach { case (jid, (s, e)) =>
          val off = (s - t0) / 1e9
          val end = if (e == 0) -1.0 else (e - t0) / 1e9
          println(f"    job $jid%-4d [$off%6.3f -> $end%6.3f]")
        }
        stages.sortBy(_._1).foreach { case (id, sec, nt, nm) =>
          println(f"    stage $id%-5d job=${jobOfStage.getOrElse(id, -1)}%-3d $sec%7.3f s  tasks=$nt%-3d $nm")
        }
      }
    }
    spark.stop()
  }
}
