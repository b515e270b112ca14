package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.ZOrder2

class ZOrderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** Bit-at-a-time reference implementation the magic-mask version must match. */
  private def naiveInterleave(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("magic-mask dilation matches the bit-at-a-time reference") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val x = rnd.nextLong()
      val y = rnd.nextLong()
      assert(ZOrder2.interleave16(x, y) == naiveInterleave(x & 0xffffL, y & 0xffffL),
        s"mismatch at x=$x y=$y")
    }
    // corners
    assert(ZOrder2.interleave16(0, 0) == 0L)
    assert(ZOrder2.interleave16(0xffffL, 0) == 0x55555555L)
    assert(ZOrder2.interleave16(0, 0xffffL) == 0xaaaaaaaaL)
    assert(ZOrder2.interleave16(0xffffL, 0xffffL) == 0xffffffffL)
  }

  test("expression evaluates in a DataFrame, null-safe, codegen path") {
    val df = Seq((3L, 5L), (1023L, 0L)).toDF("x", "y")
      .withColumn("z", ZOrder2(col("x"), col("y")))
    val got = df.orderBy("x").select("z").as[Long].collect().toSeq
    assert(got == Seq(naiveInterleave(3, 5), naiveInterleave(1023, 0)))
    // null in → null out
    val withNull = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(ZOrder2(col("x"), col("y")).as("z"))
    assert(withNull.head().isNullAt(0))
  }

  test("z-sorted layout prunes band probes on BOTH axes; 1-D sort only on one") {
    // The parquet data-skipping property the o2 layout query exists for:
    // a file/partition is scanned iff its min/max bbox intersects the
    // predicate. On a 64×64 grid in 16 range-partitioned chunks, an
    // x-sorted layout prunes x-band probes perfectly but a y-band probe
    // touches ALL 16 chunks (every chunk spans the full y range). The
    // z-sorted layout bounds both axes at once, so its WORST single-axis
    // band probe touches only the tiles crossing that band.
    val n = 64
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    // per-partition bboxes for a given sort column
    def bboxes(sortCol: String): Seq[(Long, Long, Long, Long)] = {
      grid
        .withColumn("z", ZOrder2(col("x"), col("y")))
        .repartitionByRange(16, col(sortCol))
        .select(col("x"), col("y"), spark_partition_id().as("p"))
        .groupBy("p")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .select("x0", "x1", "y0", "y1")
        .as[(Long, Long, Long, Long)].collect().toSeq
    }
    // partitions whose bbox intersects an 8-wide band on one axis
    def touched(bx: Seq[(Long, Long, Long, Long)], axis: String): Int = {
      val (lo, hi) = (24L, 31L)
      bx.count { case (x0, x1, y0, y1) =>
        if (axis == "x") x1 >= lo && x0 <= hi else y1 >= lo && y0 <= hi
      }
    }
    val xSorted = bboxes("x")
    val zSorted = bboxes("z")
    val xWorst = math.max(touched(xSorted, "x"), touched(xSorted, "y"))
    val zWorst = math.max(touched(zSorted, "x"), touched(zSorted, "y"))
    assert(xWorst == 16, s"1-D sort must fail to prune the off-axis band, got $xWorst")
    assert(zWorst <= 8,
      s"z-order worst single-axis probe should touch at most half the " +
        s"partitions, got $zWorst of 16")
  }

  test("graft_zorder is SQL-callable via SparkSessionExtensions") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-zorder-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(ext => new graft.expressions.GraftExtensions()(ext))
      .getOrCreate()
    try {
      val row = s.sql(
        "SELECT graft_zorder(3L, 5L) AS z, graft_zorder(CAST(7 AS INT), 0L) AS zi").head()
      assert(row.getLong(0) == naiveInterleave(3, 5))
      assert(row.getLong(1) == naiveInterleave(7, 0))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
