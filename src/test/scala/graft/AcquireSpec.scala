package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Acquire, LocalTransport}

/** S6/S7 acquisition layer: the href tokenizer's grammar edges, the
  * first-N/skip-if-exists planner, the executor-side transfer (real files,
  * real idempotence), and the reference-shaped sample cache.
  */
class AcquireSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def links(html: String): Seq[String] = {
    val Seq(row) = Seq(html).toDF("h")
      .select(Acquire.hrefs(col("h")).as("l")).collect().toSeq
    row.getSeq[String](0)
  }

  test("tokenizer: quote styles, attr order, case, spacing") {
    assert(links("""<a href="a.nc">x</a>""") == Seq("a.nc"))
    assert(links("<a href='b.nc'>x</a>") == Seq("b.nc"))
    assert(links("<a HREF=c.nc>x</a>") == Seq("c.nc"))
    assert(links("""<A rel=nofollow Href = "d.nc" class='x'>x</A>""") == Seq("d.nc"))
    assert(links("<a\nhref\t=\n'e.nc'\n>x</a>") == Seq("e.nc"))
    // value containing '>' survives when quoted
    assert(links("""<a href="f>g.nc">x</a>""") == Seq("f>g.nc"))
    // first href attribute wins
    assert(links("""<a href="first.nc" href="second.nc">x</a>""") == Seq("first.nc"))
  }

  test("tokenizer: skips non-anchors, href-less anchors, and comments") {
    assert(links("""<img src="x.png"/><link href="s.css"><a name="t">x</a>""") == Nil)
    assert(links("""<!-- <a href="ghost.nc">x</a> --><a href="real.nc">x</a>""") ==
      Seq("real.nc"))
    // unterminated comment swallows the rest (browser behavior)
    assert(links("""<a href="a.nc">x</a><!-- <a href="b.nc">""") == Seq("a.nc"))
    // <abbr> must not match as <a>
    assert(links("""<abbr href="no.nc">x</abbr>""") == Nil)
    assert(links("") == Nil)
  }

  test("tokenizer: document order and truncated-tag resilience") {
    assert(links("""<a href="1.nc"><a href='2.nc'><a HREF=3.nc>""") ==
      Seq("1.nc", "2.nc", "3.nc"))
    // truncated inputs never throw, never loop
    for (h <- Seq("<a href=", "<a href=\"x", "<a ", "<", "<a href='y.nc'"))
      links(h) // must return without exception
  }

  test("ncHrefs filters to .nc like the reference's soup loop") {
    val got = links("""<a href="a.nc">x</a><a href="b.html">y</a>""")
    assert(got == Seq("a.nc", "b.html"))
    val Seq(row) = Seq("""<a href="a.nc">x</a><a href="b.html">y</a>""").toDF("h")
      .select(Acquire.ncHrefs(col("h")).as("l")).collect().toSeq
    assert(row.getSeq[String](0) == Seq("a.nc"))
  }

  test("downloadPlan: global first-N in (page, pos) order, per-page names") {
    val nc = Seq((0L, 0, "p0a.nc"), (0L, 1, "p0b.nc"), (1L, 0, "p1a.nc"),
      (2L, 0, "p2a.nc"), (2L, 1, "p2b.nc")).toDF("page_id", "pos", "href")
    val plan = Acquire.downloadPlan(nc, "page_id", "pos", "href", 4)
      .orderBy("seq").collect()
    assert(plan.map(_.getAs[Long]("seq")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(plan.map(_.getAs[String]("file_name")).toSeq ==
      Seq("0_001.nc", "0_002.nc", "1_001.nc", "2_001.nc"))
    assert(plan.map(_.getAs[String]("href")).toSeq ==
      Seq("p0a.nc", "p0b.nc", "p1a.nc", "p2a.nc"))
  }

  test("markExisting: correct under both join strategies; no forced broadcast " +
    "of an over-threshold ledger") {
    // a long-lived incremental crawl's ledger outgrows any broadcast budget
    // (st17's scenario at years of scale): past the session threshold the
    // hint must come OFF so the planner shuffles on file_name instead of
    // materializing the ledger on the driver
    val plan = (1 to 100).map(i => s"f$i.nc").toDF("file_name")
    val ledger = (1 to 5000).filter(_ % 2 == 0).map(i => s"f$i.nc")
      .toDF("file_name")
    def actions() = Acquire.markExisting(plan, ledger, "file_name")
      .collect().map(r => r.getAs[String]("file_name") -> r.getAs[String]("action"))
      .toMap
    val expected = (1 to 100)
      .map(i => s"f$i.nc" -> (if (i % 2 == 0) "skip" else "download")).toMap
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      assert(actions() == expected) // small ledger: broadcast-hinted path
      spark.conf.set(key, "64") // everything is over-threshold now
      val marked = Acquire.markExisting(plan, ledger, "file_name")
      val phys = marked.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastHashJoin") && !phys.contains("BroadcastExchange"),
        s"over-threshold ledger must not broadcast:\n$phys")
      assert(actions() == expected) // same answers on the shuffled path
    } finally spark.conf.set(key, saved)
  }

  test("Erddap builder reproduces the reference query grammar byte-for-byte") {
    // load_data.py:105-156 with indian_ocean bounds and a time range — the
    // exact string _build_erddap_query produces, prefixed per
    // download_argo_data's f"{base}/tabledap/{dataset}.nc?" (load_data.py:70-72)
    import graft.sources.Erddap
    val spec = Seq(("https://erddap.example.net/erddap", "ArgoFloats",
      "2023-01-01", "2023-01-31"))
      .toDF("base", "ds", "t0", "t1")
      .crossJoin(Erddap.regions(spark))
    val Seq(full) = spec.select(Erddap.tabledapUrl(col("base"), col("ds"),
      col("lat_min"), col("lat_max"), col("lon_min"), col("lon_max"),
      col("t0"), col("t1")).as("u")).as[String].collect().toSeq
    assert(full == "https://erddap.example.net/erddap/tabledap/ArgoFloats.nc?" +
      "platform_number,cycle_number,time,latitude,longitude,pres,temp,psal" +
      "&latitude>=-60.0&latitude<=30.0&longitude>=20.0&longitude<=120.0" +
      "&time>=2023-01-01T00:00:00Z&time<=2023-01-31T23:59:59Z")
    // region=None and time_range=None branches drop their clauses entirely
    val Seq(bare) = Seq(("https://e.example.net", "ArgoFloats")).toDF("base", "ds")
      .select(Erddap.tabledapUrl(col("base"), col("ds"), lit(null), lit(null),
        lit(null), lit(null), lit(null).cast("string"), lit(null).cast("string"))
        .as("u")).as[String].collect().toSeq
    assert(bare == "https://e.example.net/tabledap/ArgoFloats.nc?" +
      "platform_number,cycle_number,time,latitude,longitude,pres,temp,psal")
    // unknown source (null base) nulls the URL — the reference's None
    val nulled = Seq(("ArgoFloats", "x")).toDF("ds", "x")
      .select(Erddap.tabledapUrl(lit(null), col("ds"), lit(null), lit(null),
        lit(null), lit(null), lit(null).cast("string"), lit(null).cast("string"))
        .as("u")).collect()
    assert(nulled.head.isNullAt(0))
  }

  test("publish is atomic no-replace: the loser leaves the winner's bytes intact") {
    // rename(2) silently REPLACES on POSIX (even under ATOMIC_MOVE), so the
    // publish primitive is link(2), whose EEXIST failure is truly atomic.
    val d = Files.createTempDirectory("acq-pub")
    try {
      val winner = d.resolve("w.part"); Files.write(winner, "winner".getBytes)
      val loser = d.resolve("l.part"); Files.write(loser, "loser".getBytes)
      val dest = d.resolve("out.nc")
      assert(Acquire.publish(winner, dest))
      assert(!Acquire.publish(loser, dest), "second publish must lose")
      assert(Files.readString(dest) == "winner")
    } finally QueryContext.rmTree(d.toString)
  }

  test("download quarantines separator/dot-dot names instead of escaping destDir") {
    val src = Files.createTempDirectory("acq-q-src")
    val dst = Files.createTempDirectory("acq-q-dst")
    try {
      Files.write(src.resolve("ok.nc"), "ok".getBytes)
      val plan = Seq(("ok.nc", "good.nc"), ("ok.nc", "a/b.nc"),
        ("ok.nc", ".."), ("ok.nc", "..\\up.nc"))
        .toDF("url", "file_name")
      val got = Acquire.download(plan, "url", "file_name", dst.toString,
          new LocalTransport(src.toString))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got("good.nc") == "download")
      assert(got("a/b.nc") == "invalid" && got("..") == "invalid" &&
        got("..\\up.nc") == "invalid")
      assert(new java.io.File(dst.toString).listFiles().map(_.getName).toSeq ==
        Seq("good.nc"), "only the valid name landed")
    } finally {
      QueryContext.rmTree(src.toString); QueryContext.rmTree(dst.toString)
    }
  }

  test("download's ledger survives re-execution: actions are materialized once") {
    val src = Files.createTempDirectory("acq-m-src")
    val dst = Files.createTempDirectory("acq-m-dst")
    try {
      Files.write(src.resolve("x.nc"), "x".getBytes)
      val plan = Seq(("x.nc", "x.nc")).toDF("url", "file_name")
      val ledger = Acquire.download(plan, "url", "file_name", dst.toString,
        new LocalTransport(src.toString))
      // a lazy plan would re-run the fetch here and report 'skip'
      assert(ledger.count() == 1)
      assert(ledger.collect().head.getString(1) == "download")
    } finally {
      QueryContext.rmTree(src.toString); QueryContext.rmTree(dst.toString)
    }
  }

  test("download: executor-side fetch is idempotent and byte-faithful") {
    val src = Files.createTempDirectory("acq-src")
    val dst = Files.createTempDirectory("acq-dst")
    try {
      val payloads = (1 to 5).map(i => s"f$i.nc" -> s"payload-$i".getBytes("UTF-8"))
      payloads.foreach { case (n, b) => Files.write(src.resolve(n), b) }
      val plan = payloads.map { case (n, _) => (n, s"local_$n") }
        .toDF("href", "file_name")
        .withColumn("url", col("href"))
      val t = new LocalTransport(src.toString)
      val first = Acquire.download(plan, "url", "file_name", dst.toString, t)
        .collect().map(r => r.getString(1)).toSeq
      assert(first.forall(_ == "download"))
      // bytes round-trip
      payloads.foreach { case (n, b) =>
        assert(Files.readAllBytes(dst.resolve(s"local_$n")).toSeq == b.toSeq)
      }
      // second run: every file skips, nothing rewritten
      val second = Acquire.download(plan, "url", "file_name", dst.toString, t)
        .collect()
      assert(second.forall(_.getString(1) == "skip"))
      assert(second.map(_.getLong(2)).sorted.toSeq ==
        payloads.map(_._2.length.toLong).sorted)
    } finally {
      QueryContext.rmTree(src.toString); QueryContext.rmTree(dst.toString)
    }
  }

  test("LocalTransport refuses paths escaping its base") {
    val src = Files.createTempDirectory("acq-jail")
    try {
      val t = new LocalTransport(src.toString)
      intercept[IllegalArgumentException](t.fetch("../../etc/hostname"))
    } finally QueryContext.rmTree(src.toString)
  }

  test("fetchSample: registry miss → None; cache hit skips the transport") {
    val src = Files.createTempDirectory("acq-s7src")
    val cache = Files.createTempDirectory("acq-s7cache")
    try {
      Files.write(src.resolve("remote.nc"), "sampledata".getBytes("UTF-8"))
      val counting = new graft.sources.Transport {
        val n = new java.util.concurrent.atomic.AtomicInteger
        val inner = new LocalTransport(src.toString)
        def fetch(url: String): Array[Byte] = { n.incrementAndGet(); inner.fetch(url) }
      }
      val reg = Map("small_test" -> "remote.nc")
      assert(Acquire.fetchSample("nope", reg, cache.toString, counting).isEmpty)
      assert(counting.n.get() == 0)
      val p1 = Acquire.fetchSample("small_test", reg, cache.toString, counting)
      assert(p1.contains(Paths.get(cache.toString, "sample_small_test.nc").toString))
      assert(counting.n.get() == 1)
      // second call: cached — the transport is not consulted (load_data.py:404-406)
      val p2 = Acquire.fetchSample("small_test", reg, cache.toString, counting)
      assert(p2 == p1 && counting.n.get() == 1)
      assert(Files.readString(Paths.get(p1.get)) == "sampledata")
    } finally {
      QueryContext.rmTree(src.toString); QueryContext.rmTree(cache.toString)
    }
  }

  test("tokenizer property: 300 seeded random pages parse to their generator's link list") {
    // Grammar fuzz: pages assembled from random interleavings of text runs,
    // comments (with embedded fake anchors), non-anchor tags carrying
    // href-shaped attributes, href-less anchors, and real anchors with
    // random quoting/attribute order/name case/whitespace. The generator
    // KNOWS its link list; extraction must reproduce it exactly — this is
    // the independent-derivation check the fixed acq1 fixture can't give
    // (its grammar is only 3 encodings wide).
    val rnd = new scala.util.Random(20260816L)
    def word(chars: String, min: Int, max: Int): String =
      Seq.fill(min + rnd.nextInt(max - min + 1))(chars(rnd.nextInt(chars.length))).mkString
    val hrefChars = "abcdefghijklmnopqrstuvwxyz0123456789._-/%"
    val textChars = "abc 0123 \n\t.,;éλ北🚀" // no '<'
    def ws(): String = Seq.fill(1 + rnd.nextInt(3))(" \t\n"(rnd.nextInt(3))).mkString
    def attr(name: String, value: String): String = rnd.nextInt(3) match {
      case 0 => s"""$name="$value""""
      case 1 => s"$name='$value'"
      case _ => if (value.nonEmpty) s"$name=$value" else s"$name=\"\"" // unquoted needs non-empty
    }
    def caseShuffle(s: String): String =
      s.map(c => if (rnd.nextBoolean()) c.toUpper else c)
    val pages = (1 to 300).map { _ =>
      val expected = Seq.newBuilder[String]
      val body = (1 to 1 + rnd.nextInt(29)).map { _ =>
        rnd.nextInt(6) match {
          case 0 => word(textChars, 0, 12)
          case 1 => s"<!-- ${word(textChars, 0, 6)}<a href='${word(hrefChars, 1, 8)}.nc'>x</a> -->"
          case 2 => s"<${Seq("img", "link", "abbr", "area")(rnd.nextInt(4))} ${attr("href", word(hrefChars, 1, 10))}>"
          case 3 => s"<a ${attr("name", word(hrefChars, 1, 6))}>${word(textChars, 0, 8)}</a>"
          case _ =>
            val href = word(hrefChars, 1, 14)
            expected += href
            val pre = if (rnd.nextBoolean()) attr(word("relcstyz", 3, 6), word(hrefChars, 0, 5)) + ws() else ""
            val post = if (rnd.nextBoolean()) ws() + attr(word("datidx", 3, 6), word(hrefChars, 0, 5)) else ""
            s"<a ${pre}${caseShuffle("href")}${ws()}=${ws()}" +
              (rnd.nextInt(3) match {
                case 0 => s""""$href""""
                case 1 => s"'$href'"
                case _ => href
              }) + s"$post>${word(textChars, 0, 8)}</a>"
        }
      }.mkString
      (body, expected.result())
    }
    val got = pages.map(_._1).toDF("h")
      .select(Acquire.hrefs(col("h")).as("l")).collect()
      .map(_.getSeq[String](0))
    pages.zip(got).zipWithIndex.foreach { case (((page, exp), act), i) =>
      assert(act == exp, s"page $i diverged:\n$page")
    }
  }

  test("S6→S2 lifecycle: crawl an index, download real .nc files, decode them") {
    // the reference's full acquisition-to-ingest flow (download.py feeding
    // ingest/load_data.py) in one pass: an HTML index over real NetCDF
    // classic files (the S2 writer twin), CLI download mode, then the
    // downloaded directory decodes through the same source every upload
    // uses — proving the acquisition tier hands S2 bytes it can ingest.
    val base = Files.createTempDirectory("acq-e2e")
    try {
      (0 until 3).foreach(f => Files.write(base.resolve(s"float_$f.nc"),
        graft.sources.NetCdfFixture.fileBytes(f)))
      Files.writeString(base.resolve("2020_01.html"),
        (0 until 3).map(f => s"""<a href="float_$f.nc">f$f</a>""")
          .mkString("<html><body>", "", "</body></html>"))
      val dest = s"$base/got"
      assert(graft.tools.Cli.run(spark, Array("--mode", "download",
        "--index-dir", base.toString, "--dest", dest)) == 0)
      val rows = new Engine(spark).ingestNetCdf(dest)
      assert(rows.select("float_id").distinct().count() == 3)
      assert(rows.count() > 0)
    } finally QueryContext.rmTree(base.toString)
  }

  test("acq1 parses back exactly the synthesized inventory at sf0.001") {
    val df = SparkEntry.queries("acq1_index_links")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    // 500 docs: one .nc each + one .html decoy per doc_id%3==0 (167 of 0..499)
    assert(rows.length == 500 + 167)
    assert(rows.count(_.getAs[Boolean]("is_nc")) == 500)
    // ghost comment link never surfaces
    assert(!rows.exists(_.getAs[String]("href").startsWith("ghost_")))
    // positions are dense per page
    val byPage = rows.groupBy(_.getAs[Long]("page_id"))
    byPage.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("pos")).sorted.toSeq == (0L until rs.length).toSeq)
    }
  }
}
