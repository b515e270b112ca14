package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pack

class PackSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def randomDocs(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    // sparse, shuffled ids; token counts include zeros and chunk-sized runs
    val ids = rnd.shuffle((0 until n * 3).toList).take(n)
    ids.map(id => (id.toLong, rnd.nextInt(900).toLong)).toDF("doc_id", "ntok")
      .repartition(7) // deliberately unaligned input partitioning
  }

  test("globalCumsum equals the single-partition window form") {
    val df = randomDocs(500, seed = 11)
    val got = Pack.globalCumsum(df, "doc_id", "ntok", "off", buckets = 8)
      .orderBy("doc_id").select("doc_id", "off").as[(Long, Long)].collect().toSeq
    val expected = df
      .withColumn("off", coalesce(sum("ntok").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("doc_id").select("doc_id", "off").as[(Long, Long)].collect().toSeq
    assert(got == expected)
    // edge: empty input
    val empty = Pack.globalCumsum(
      Seq.empty[(Long, Long)].toDF("doc_id", "ntok"), "doc_id", "ntok", "off")
    assert(empty.count() == 0)
    // edge: more buckets than keys
    val tiny = Pack.globalCumsum(
      Seq((5L, 10L), (9L, 3L)).toDF("doc_id", "ntok"), "doc_id", "ntok", "off",
      buckets = 64).orderBy("doc_id").select("off").as[Long].collect().toSeq
    assert(tiny == Seq(0L, 10L))
  }

  test("globalCumsum plans bucketed windows, never a single partition") {
    val df = randomDocs(200, seed = 13)
    val plan = Pack.globalCumsum(df, "doc_id", "ntok", "off", buckets = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"the scale-safe cumsum must not funnel rows through one partition:\n$plan")
  }

  test("chunk: interior chunks hold exactly chunkTokens; totals are preserved") {
    val df = randomDocs(400, seed = 17)
    val withOff = Pack.globalCumsum(df, "doc_id", "ntok", "start_off")
    val chunks = Pack.chunk(withOff, "start_off", "ntok", 1024)
    val perChunk = chunks.groupBy("chunk_id")
      .agg(sum("chunk_tokens").as("t"))
      .orderBy("chunk_id").as[(Long, Long)].collect().toSeq
    val totalTokens = df.agg(sum("ntok")).as[Long].head()
    // conservation: every token lands in exactly one chunk
    assert(perChunk.map(_._2).sum == totalTokens)
    // contiguity + fullness: chunk ids are 0..K with every interior one full
    val ids = perChunk.map(_._1)
    assert(ids == (0L until ids.length.toLong))
    perChunk.dropRight(1).foreach { case (id, t) =>
      assert(t == 1024L, s"interior chunk $id holds $t tokens, want 1024")
    }
    // a document never contributes more than chunkTokens to one chunk and
    // its per-chunk pieces sum back to its token count
    val pieces = chunks.groupBy("doc_id")
      .agg(sum("chunk_tokens").as("t"), max("chunk_tokens").as("m"))
      .join(df.filter(col("ntok") > 0), "doc_id")
      .select("t", "m", "ntok").as[(Long, Long, Long)].collect()
    pieces.foreach { case (t, m, ntok) =>
      assert(t == ntok && m <= 1024L)
    }
    // power-of-two guard
    intercept[IllegalArgumentException] {
      Pack.chunk(withOff, "start_off", "ntok", 1000)
    }
  }
}
