package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: split per-query time into plan vs execute (perf work). */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    // warm
    graft.SparkEntry.queries("q1_pricing_summary")(spark, dir).count()
    var planTot = 0.0; var execTot = 0.0
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // run 1 (cold codegen) discarded
      fn(spark, dir).count()
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      val p = (t1 - t0) / 1e9; val e = (t2 - t1) / 1e9
      planTot += p; execTot += e
      println(f"[plancost] $n%-26s plan $p%6.3f  exec $e%6.3f")
    }
    println(f"[plancost] TOTAL plan $planTot%6.3f  exec $execTot%6.3f")
    spark.stop()
  }
}
