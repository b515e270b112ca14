package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.Tables

/** Scratch stage-profiler for perf work (not part of the engine). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val variants = docs.filter(col("doc_id") % 100 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", concat(col("text"), lit(" extraword")))
    val all = docs.unionByName(variants)

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      time("explode tokens")(
        all.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("token")).count())
      val tc = all
        .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      time("token counts")(tc.count())
      val sigs = Dedup.simhashWide(tc, "doc_id")
      time("simhashWide")(sigs.count())
      // bisect sigs materialization
      val withDigits = tc
        .withColumn("th", md5(col("token")))
        .select(
          Seq(col("doc_id"), col("cnt")) ++
            (1 to 16).map(d =>
              expr(s"instr('0123456789abcdef', substr(th, $d, 1)) - 1").as(s"d$d")): _*)
      val wd = withDigits.cache()
      time("digits cache")(wd.count())
      val packed2 = wd.select(
        Seq(col("doc_id"), col("cnt")) ++
          (0 until 13).map { g =>
            val bits = (g * 5) until math.min((g + 1) * 5, 63)
            bits.zipWithIndex.map { case (b, pos) =>
              expr(s"((d${b / 4 + 1} >> ${b % 4}) & 1) * cnt") * lit(1L << (12 * pos))
            }.reduce(_ + _).as(s"p$g")
          }: _*)
      val pc = packed2.cache()
      time("packed cache")(pc.count())
      val agged = pc.groupBy("doc_id").agg(
        sum(col("cnt")).as("tot"),
        (0 until 13).map(g => sum(col(s"p$g")).as(s"s$g")): _*)
      val ac = agged.cache()
      time("agg cache")(ac.count())
      time("final select")(ac.select(
        col("doc_id"),
        (0 until 63).map { b =>
          val g = b / 5; val pos = b % 5
          when(shiftright(col(s"s$g"), 12 * pos)
            .bitwiseAND(lit((1L << 12) - 1)) * 2 > col("tot"), lit(1L << b))
            .otherwise(0L)
        }.reduce(_ + _).cast("long").as("simhash")).withColumn("x", col("simhash") + 1).agg(sum("x")).count())
      wd.unpersist(); pc.unpersist(); ac.unpersist()
      val pairs = Dedup.hammingPairs(sigs, "doc_id", "simhash", bands = 3, maxDist = 16)
      time("hammingPairs")(pairs.count())
      time("full ordered")(pairs.orderBy("id_a", "id_b").count())
      // sub-steps of hammingPairs
      val cached = sigs.cache()
      time("sigs cache")(cached.count())
      val width = 63 / 3; val mask = (1L << width) - 1
      val banded = cached.select(
        col("doc_id"), col("simhash"),
        posexplode(array((0 until 3).map(b =>
          struct(lit(b).as("band_id"),
            expr(s"(simhash >> ${b * width}) & $mask").as("chunk"))): _*))
          .as(Seq("pos", "bc")))
        .select(col("doc_id"), col("simhash"), col("bc.band_id"), col("bc.chunk"))
      time("banded")(banded.count())
      val a = banded.select(col("band_id"), col("chunk"), col("doc_id").as("id_a"), col("simhash").as("h_a"))
      val b = banded.select(col("band_id"), col("chunk"), col("doc_id").as("id_b"), col("simhash").as("h_b"))
      val joined = a.join(b, Seq("band_id", "chunk")).filter(col("id_a") < col("id_b"))
      time("join raw")(joined.count())
      val withHam = joined.select(col("id_a"), col("id_b"),
        expr("bit_count(h_a ^ h_b)").cast("long").as("hamming"))
        .filter(col("hamming") <= 16)
      time("join+filter")(withHam.count())
      time("join+filter+distinct")(withHam.distinct().count())
      if (round == 2) {
        joined.explain("formatted")
      }
      cached.unpersist()
    }
    spark.stop()
  }
}
