package graft.tools

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Isolates the "sweep tax" (round-9 BENCH_NOTES): why a query's rep-min is
  * ~0.15-0.25 s higher inside an interleaved sweep than back-to-back.
  * Runs t7 five times back-to-back, then five times interleaved with an
  * allocation-heavy neighbor (dd6), printing per-rep wall time alongside
  * the GC time that landed INSIDE the rep window — if interleaved reps each
  * absorb a collection that back-to-back reps amortize across the sweep,
  * the tax is GC scheduling, not execution.
  */
object SweepTaxProbe {
  def main(args: Array[String]): Unit = {
    // execution intent: this entry point runs what it builds, so let
    // query construction background-warm checkpoint segments (see
    // Dedup.warmOnConstruct -- plan-only introspection paths leave it off).
    graft.dedup.Dedup.warmOnConstruct = true
    val dir = "/root/testdata/sf0.1"
    val spark = graft.stream.LocalFsPerf.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    val t7 = graft.SparkEntry.queries("t7_reference_t1")(spark, dir)
    val neighbor = graft.SparkEntry.queries("dd6_simhash_hamming")(spark, dir)
    graft.dedup.Dedup.countSettled(t7); graft.dedup.Dedup.countSettled(neighbor) // warm both (drained: no action may race a marking)

    def rep(label: String): Unit = {
      val g0 = gcMillis(); val t0 = System.nanoTime()
      t7.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  $label t7 ${dt}%6.3f s  gc-in-window ${gcMillis() - g0}%4d ms")
    }
    println("back-to-back:")
    (1 to 5).foreach(_ => rep("b2b "))
    println("interleaved with dd6:")
    (1 to 5).foreach { _ => neighbor.count(); rep("mix ") }
    spark.stop()
  }
}
