package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.stream.Ingest

/** Segment-level wall-clock breakdown of the st15 streaming harness: where
  * do the ~3 s that are NOT micro-batch execution go (fixture writes, query
  * start/stop lifecycle, final aggregate)? Drives the round-15 one-shot-tax
  * work; keep until the streaming tier's harness cost is settled.
  */
object StTaxProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.stream.LocalFsPerf.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect() // warm scheduler

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }

    for (rep <- 1 to 4) {
      val variant = if (rep % 2 == 1) "coalesce" else "repart+ckpt"
      println(s"--- st15 segments, rep $rep ($variant) ---")
      val evBase = Tables.events(spark, dir).select("event_id", "user_id", "value")
      val ev = if (rep % 2 == 1) evBase
        else t("ckpt events")(evBase.localCheckpoint(true))
      def one(df: DataFrame): DataFrame =
        if (rep % 2 == 1) df.coalesce(1) else df.repartition(1)
      val base = s"/tmp/sttax_$rep"
      graft.QueryContext.rmTree(base)
      val inbox = s"$base/inbox"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
      new java.io.File(inbox).mkdirs()
      val clean = (df: DataFrame) => df.filter(col("value").isNotNull)
      t("write u1")(one(ev.filter(col("event_id") % 3 === 0))
        .write.mode("overwrite").parquet(s"$inbox/u1"))
      t("write u2")(one(ev.filter(col("event_id") % 3 === 1))
        .write.mode("overwrite").parquet(s"$inbox/u2"))
      t("drain 1")(Ingest.start(spark, s"$inbox/*", ev.schema, sink, ckpt,
        "event_id", clean, boundedSink = true).awaitTermination())
      t("write u3")(one(ev.filter(col("event_id") % 2 === 0))
        .write.mode("overwrite").parquet(s"$inbox/u3"))
      t("drain 2")(drainVerbose("d2", Ingest.start(spark, s"$inbox/*",
        ev.schema, sink, ckpt, "event_id", clean, boundedSink = true)))
      val out = spark.read.schema(ev.schema).parquet(sink)
      t("final agg")(out.agg(count(lit(1)).as("n_rows"),
        countDistinct("event_id").as("n_keys")).collect())
      t("reap")(graft.QueryContext.rmTree(base))
    }

    // A/B: AQE inside the micro-batch jobs (the stream session clone
    // inherits the conf at query start) — with 32 fixed shuffle partitions
    // a 50k-row batch pays ~100 tiny tasks + a 32-file append per batch;
    // AQE coalesces both while staying wide for big batches
    for (rep <- 5 to 8) {
      val aqe = rep % 2 == 0
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8MB")
      println(s"--- st15 segments, rep $rep (aqe=$aqe) ---")
      val ev = Tables.events(spark, dir).select("event_id", "user_id", "value")
      val base = s"/tmp/sttax_$rep"
      graft.QueryContext.rmTree(base)
      val inbox = s"$base/inbox"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
      new java.io.File(inbox).mkdirs()
      val clean = (df: DataFrame) => df.filter(col("value").isNotNull)
      t("write u1")(ev.filter(col("event_id") % 3 === 0).coalesce(1)
        .write.mode("overwrite").parquet(s"$inbox/u1"))
      t("write u2")(ev.filter(col("event_id") % 3 === 1).coalesce(1)
        .write.mode("overwrite").parquet(s"$inbox/u2"))
      t("drain 1")(drainVerbose("a1", Ingest.start(spark, s"$inbox/*",
        ev.schema, sink, ckpt, "event_id", clean, boundedSink = true)))
      t("write u3")(ev.filter(col("event_id") % 2 === 0).coalesce(1)
        .write.mode("overwrite").parquet(s"$inbox/u3"))
      t("drain 2")(drainVerbose("a2", Ingest.start(spark, s"$inbox/*",
        ev.schema, sink, ckpt, "event_id", clean, boundedSink = true)))
      t("reap")(graft.QueryContext.rmTree(base))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    // same breakdown for the state-store path (st16/st17 shape)
    for (rep <- 1 to 2) {
      println(s"--- st16 segments (stateful), rep $rep ---")
      val ev = Tables.events(spark, dir).select("event_id", "user_id", "value")
      val base = s"/tmp/sttax_state_$rep"
      graft.QueryContext.rmTree(base)
      val inbox = s"$base/inbox"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
      new java.io.File(inbox).mkdirs()
      val clean = (df: DataFrame) => df.filter(col("value").isNotNull)
      t("write u1")(ev.filter(col("event_id") % 3 === 0).coalesce(1)
        .write.mode("overwrite").parquet(s"$inbox/u1"))
      t("write u2")(ev.filter(col("event_id") % 3 === 1).coalesce(1)
        .write.mode("overwrite").parquet(s"$inbox/u2"))
      t("drain 1")(drainVerbose("s1", Ingest.startStateful(spark, s"$inbox/*",
        ev.schema, sink, ckpt, "event_id", clean)))
      t("write u3")(ev.filter(col("event_id") % 2 === 0).coalesce(1)
        .write.mode("overwrite").parquet(s"$inbox/u3"))
      t("drain 2")(drainVerbose("s2", Ingest.startStateful(spark, s"$inbox/*",
        ev.schema, sink, ckpt, "event_id", clean)))
      t("reap")(graft.QueryContext.rmTree(base))
    }
    spark.stop()
  }

  /** Await the drain, then print Spark's own per-batch durationMs map —
    * where addBatch / walCommit / stateCommit actually go.
    */
  private def drainVerbose(tag: String,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      val d = p.durationMs
      println(s"    [$tag batch ${p.batchId}] rows=${p.numInputRows} " +
        d.entrySet().toArray.map(_.toString).sorted.mkString(" "))
    }
  }
}
