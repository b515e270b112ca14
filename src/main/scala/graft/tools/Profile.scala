package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import java.util.concurrent.atomic.AtomicInteger

/** Scratch profiler for round-8 perf work — not part of the engine. */
object Profile {
  def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
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
    val jobs = new AtomicInteger(0)
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(j.jobId, 0L)
        jobLog.add(f"job ${j.jobId} ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    t("warm dd9") { graft.SparkEntry.queries("dd9_dup_groups")(spark, dir).count() }
    Thread.sleep(300)
    for (rep <- 1 to 2) {
      jobs.set(0); jobLog.clear()
      t(s"dd9 one-shot rep$rep") {
        graft.SparkEntry.queries("dd9_dup_groups")(spark, dir).count()
      }
      Thread.sleep(300)
      println(s"  jobs=${jobs.get()}  " + jobLog.toArray.mkString(" | "))
      jobs.set(0); jobLog.clear()
      t(s"dd16 one-shot rep$rep") {
        graft.SparkEntry.queries("dd16_canonical_pick")(spark, dir).count()
      }
      Thread.sleep(300)
      println(s"  jobs=${jobs.get()}  " + jobLog.toArray.mkString(" | "))
    }
    spark.stop()
  }
}
