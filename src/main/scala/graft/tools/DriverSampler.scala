package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Round-11 diagnostic: poor-man's sampling profiler for the DRIVER main
  * thread while a query function runs at steady state — attributes the
  * between-jobs construction gaps (StageProbe) to concrete Spark driver
  * work (analysis, optimization, physical planning, codegen source
  * generation, broadcast waits).
  */
object DriverSampler {
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

    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 10
    val fn = graft.SparkEntry.queries(name)
    (1 to 4).foreach(_ => graft.dedup.Dedup.countSettled(fn(spark, dir)))

    val main = Thread.currentThread()
    val counts = mutable.Map.empty[String, Int].withDefaultValue(0)
    @volatile var run = true
    val sampler = new Thread(() => {
      while (run) {
        val st = main.getStackTrace
        // classify by the first "interesting" frame
        val key = st.find { f =>
          val c = f.getClassName
          c.contains("codegen") || c.contains("WholeStageCodegen") ||
          c.contains("RuleExecutor") || c.contains("QueryPlanner") ||
          c.contains("Analyzer") || c.contains("doExecuteBroadcast") ||
          c.contains("SparkStrategies") || c.contains("EnsureRequirements") ||
          c.contains("CollapseCodegenStages") || c.contains("awaitResult") ||
          c.contains("DAGScheduler") || c.contains("executeCollect") ||
          c.contains("TreeNode") || c.contains("QueryExecution")
        }.map(f => f.getClassName.split("\\.").last + "." + f.getMethodName)
          .getOrElse(st.headOption.map(f =>
            f.getClassName.split("\\.").last + "." + f.getMethodName).getOrElse("?"))
        counts.synchronized { counts(key) += 1 }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    (1 to reps).foreach(_ => graft.dedup.Dedup.countSettled(fn(spark, dir)))
    val total = (System.nanoTime() - t0) / 1e9
    run = false
    Thread.sleep(50)
    println(f"$name $reps reps, ${total / reps}%6.3f s/rep; driver main-thread samples:")
    counts.synchronized {
      counts.toSeq.sortBy(-_._2).take(30).foreach { case (k, n) =>
        println(f"  $n%5d  $k")
      }
    }
    spark.stop()
  }
}
