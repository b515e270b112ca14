package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("graft_dot and graft_cosine are SQL-callable via SparkSessionExtensions") {
    // Force a NEW SparkSession (sharing the JVM's SparkContext): getOrCreate
    // would silently reuse the shared test session, where the extension was
    // never applied. Restore the previous sessions afterwards; do not stop()
    // (that would kill the shared context).
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(ext => new graft.expressions.GraftExtensions()(ext))
      .getOrCreate()
    try {
      val row = s.sql(
        """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
           round(graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c,
           graft_cosine(array(0.0d, 0.0d), array(1.0d, 0.0d)) AS z""").head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 1.0)
      assert(row.isNullAt(2))
      // split digest: hex-format of [hi, lo] must reproduce md5()'s hex
      val h = s.sql(
        """SELECT md5('graft') AS hex,
           concat(format_string('%016x', element_at(graft_md5_split('graft'), 1)),
                  format_string('%016x', element_at(graft_md5_split('graft'), 2))) AS split_hex
        """).head()
      assert(h.getString(0) == h.getString(1))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("bloom functions: no false negatives, real pruning, SQL-callable") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-bloom-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(ext => new graft.expressions.GraftExtensions()(ext))
      .getOrCreate()
    try {
      s.sql("SELECT graft_bloom_agg(xxhash64(id), 100L, 1024L) AS bf FROM range(100)")
        .createOrReplaceTempView("bloom_t")
      // every inserted key probes true — the property that makes the
      // j9 prune-then-exact-join compose to a bit-identical result
      val trueKept = s.sql(
        """SELECT count(*) FROM range(100)
           WHERE graft_might_contain((SELECT bf FROM bloom_t), xxhash64(id))""")
        .head().getLong(0)
      assert(trueKept == 100L, "bloom produced a false negative")
      // and it actually prunes: of 900 non-members, nearly all drop
      val allKept = s.sql(
        """SELECT count(*) FROM range(1000)
           WHERE graft_might_contain((SELECT bf FROM bloom_t), xxhash64(id))""")
        .head().getLong(0)
      assert(allKept < 200L, s"bloom pruned almost nothing: kept $allKept of 1000")
      // empty build side → NULL bloom → NULL probe → all rows filtered:
      // degenerates to the (empty) join result, never a crash
      s.sql("SELECT graft_bloom_agg(xxhash64(id), 10L, 64L) AS bf FROM range(0)")
        .createOrReplaceTempView("bloom_empty")
      val emptyKept = s.sql(
        """SELECT count(*) FROM range(100)
           WHERE graft_might_contain((SELECT bf FROM bloom_empty), xxhash64(id))""")
        .head().getLong(0)
      assert(emptyKept == 0L, "an empty-build bloom must filter everything")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("RewriteRankOneToMaxBy: rank-1 window filter plans as an aggregate, same result") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-rule-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(ext => new graft.expressions.GraftExtensions()(ext))
      .getOrCreate()
    try {
      import s.implicits._
      import org.apache.spark.sql.expressions.{Window => W}
      import org.apache.spark.sql.functions._
      val df = Seq(
        (1L, 10.0, 1L), (1L, 20.0, 2L), (1L, 20.0, 3L),
        (2L, 5.0, 4L), (3L, 7.0, 5L), (3L, 9.0, 6L))
        .toDF("k", "score", "seq")
      val ranked = df
        .withColumn("rn", row_number().over(
          W.partitionBy("k").orderBy(col("score").desc, col("seq").desc)))
        .filter(col("rn") === 1)
      val optimized = ranked.queryExecution.optimizedPlan.toString
      assert(optimized.contains("max_by") && !optimized.contains("Window"),
        s"rule did not fire:\n$optimized")
      val got = ranked.select("k", "score", "seq", "rn").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSeq
      assert(got == Seq((1L, 20.0, 3L, 1), (2L, 5.0, 4L, 1), (3L, 9.0, 6L, 1)))

      // ascending order -> min_by
      val asc = df
        .withColumn("rn", row_number().over(
          W.partitionBy("k").orderBy(col("score").asc, col("seq").asc)))
        .filter(col("rn") === 1)
      assert(asc.queryExecution.optimizedPlan.toString.contains("min_by"))
      assert(asc.select("score").orderBy("k").as[Double].collect().toSeq == Seq(10.0, 5.0, 7.0))

      // mixed directions: guard keeps the window form
      val mixed = df
        .withColumn("rn", row_number().over(
          W.partitionBy("k").orderBy(col("score").desc, col("seq").asc)))
        .filter(col("rn") === 1)
      assert(mixed.queryExecution.optimizedPlan.toString.contains("Window"))

      // rank > 1 filters: untouched
      val top2 = df
        .withColumn("rn", row_number().over(
          W.partitionBy("k").orderBy(col("score").desc, col("seq").desc)))
        .filter(col("rn") <= 2)
      assert(top2.queryExecution.optimizedPlan.toString.contains("Window"))
      assert(top2.count() == 5)

      // NULLABLE order keys with DEFAULT null ordering: rewrite fires and
      // matches the window — DESC NULLS LAST: null never wins unless the
      // whole group is null; ASC NULLS FIRST: null wins. Group 3 is
      // all-null (both forms pick its only row); group 1 mixes null and
      // non-null.
      val nd = Seq(
        (1L, Some(10.0), 1L), (1L, None, 2L), (1L, Some(20.0), 3L),
        (2L, Some(5.0), 4L), (3L, None, 5L))
        .toDF("k", "score", "seq")
      val ndDesc = nd
        .withColumn("rn", row_number().over(
          W.partitionBy("k").orderBy(col("score").desc, col("seq").desc)))
        .filter(col("rn") === 1)
      assert(ndDesc.queryExecution.optimizedPlan.toString.contains("max_by"),
        "nullable default-ordering DESC must rewrite")
      assert(ndDesc.select("k", "seq").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((1L, 3L), (2L, 4L), (3L, 5L)))
      val ndAsc = nd
        .withColumn("rn", row_number().over(
          W.partitionBy("k").orderBy(col("score").asc, col("seq").asc)))
        .filter(col("rn") === 1)
      assert(ndAsc.queryExecution.optimizedPlan.toString.contains("min_by"),
        "nullable default-ordering ASC must rewrite")
      assert(ndAsc.select("k", "seq").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((1L, 2L), (2L, 4L), (3L, 5L)))

      // explicit NON-default null ordering: guard keeps the window
      val ndExplicit = nd
        .withColumn("rn", row_number().over(
          W.partitionBy("k").orderBy(col("score").desc_nulls_first, col("seq").desc)))
        .filter(col("rn") === 1)
      assert(ndExplicit.queryExecution.optimizedPlan.toString.contains("Window"),
        "non-default null ordering must not rewrite")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
