package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch profiler for round-8 one-shot streaming cost — not engine code. */
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
    println("java.io.tmpdir=" + System.getProperty("java.io.tmpdir"))
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"BATCH ${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    val names = Seq("st5_stream_join", "st8_incremental_agg", "st7_stream_outer_join")
    // warm one
    t("warm st5") { graft.SparkEntry.queries("st5_stream_join")(spark, dir).count() }
    for (rep <- 1 to 2; n <- names) {
      Thread.sleep(500) // let listener drain
      t(s"$n one-shot rep$rep") { graft.SparkEntry.queries(n)(spark, dir).count() }
    }
    Thread.sleep(1000)
    spark.stop()
  }
}
