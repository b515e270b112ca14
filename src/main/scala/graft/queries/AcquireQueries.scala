package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Acquire, Erddap}

/** S6/S7 acquisition queries (download.py:12-37, ingest/load_data.py:377-426).
  *
  * The HTML index pages are synthesized deterministically from the
  * `documents` table — the same closed-form-fixture pattern the multimodal
  * (mm*) and NetCDF (s9/s11) queries use — so the Spark side runs the REAL
  * parser/planner while the DuckDB oracle recomputes the expected link set
  * analytically. Fuzz-robust by construction: hrefs are built from `doc_id`
  * and `md5(text)` hex (never raw text, which the utext/uhard variants lace
  * with markup-hostile unicode), and all arithmetic uses `%` forms with
  * identical semantics in both engines.
  */
private[graft] object AcquireQueries {

  /** One synthesized index page per `doc_id % 12` bucket. Every document
    * contributes one fragment, concatenated in doc_id order: an `<img>`
    * (url-shaped attr the parser must ignore), an href-less `<a name=…>`
    * (must not emit), a decoy `.html` link for every doc_id % 3 == 0, and
    * the `.nc` link in a rotating encoding — double-quoted after another
    * attribute, single-quoted before one, or unquoted uppercase `HREF=` —
    * so one green row set certifies the whole attribute grammar. Each page
    * opens with a commented-out ghost `.nc` anchor: a parser that reads
    * comments shifts every position and fails the oracle.
    *
    * Scale shape: one shuffle keyed on page_id. NOTE the fixture's
    * deliberate tradeoff — 12 FIXED pages mean per-page HTML grows
    * LINEARLY with the corpus (~2.5 MB/page at the ~sf1 rehearsal, where
    * acq2 is gated), which is what makes it a superlinear-tokenizer canary;
    * a real crawl grows the PAGE COUNT with bounded page bodies, and the
    * operators are written for that shape (per-page parse, page-keyed
    * aggregation).
    */
  private[graft] def indexPages(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), (col("doc_id") % 12).as("page_id"),
        substring(md5(coalesce(col("text"), lit(""))), 1, 8).as("tag"))
    val ncName = concat(lit("prof_"), col("doc_id"), lit("_"), col("tag"), lit(".nc"))
    val frag = concat(
      lit("<img src=\"thumb_"), col("doc_id"), lit(".png\"/>"),
      lit("<a name=\"s"), col("doc_id"), lit("\">x</a>"),
      when(col("doc_id") % 3 === 0,
        concat(lit("<a rel=nofollow href=\"page_"), col("doc_id"),
          lit(".html\">index</a>"))).otherwise(lit("")),
      when(col("doc_id") % 3 === 0,
        concat(lit("<a class=\"f\" href=\""), ncName, lit("\">dl</a>")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("<a href='"), ncName, lit("' title='p'>dl</a>")))
        .otherwise(concat(lit("<a HREF="), ncName, lit(">dl</a>"))))
    d.select(col("page_id"), struct(col("doc_id"), frag.as("frag")).as("sf"))
      .groupBy("page_id")
      .agg(array_join(
        transform(array_sort(collect_list(col("sf"))), _.getField("frag")),
        "").as("body"))
      .select(col("page_id"),
        concat(
          lit("<html><body><!-- <a href=\"ghost_"), col("page_id"),
          lit(".nc\">never</a> --><h1>argo index</h1>"), col("body"),
          lit("</body></html>")).as("html"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- S1 ERDDAP tabledap URL construction (load_data.py:62-156) -------
    // One fetch-spec row per (source, region, order-month): sources rotate
    // through the three known endpoints plus one unknown (→ null URL, the
    // reference's "return None"), regions alternate indian_ocean (bounds
    // clause) / global (no clause), and a null month (fuzz allnull) takes
    // the reference's time_range=None branch. Endpoints and region bounds
    // are constant tables broadcast by construction; the URL itself is one
    // codegen'd projection — the plan is scan → distinct → two broadcast
    // joins, no wide shuffle beyond the distinct.
    "s1_erddap_url" -> { (s, dir) =>
      import s.implicits._
      val endpoints = Seq(
        ("ifremer", "https://erddap-ifremer.example.net/erddap"),
        ("ncei", "https://erddap-ncei.example.net/erddap"),
        ("incois", "https://erddap-incois.example.net/erddap"))
        .toDF("source", "base_url")
      val specs = Tables.orders(s, dir)
        .filter(col("o_orderkey").isNotNull)
        .select(
          element_at(array(lit("ifremer"), lit("ncei"), lit("incois"),
            lit("deepsea")), (col("o_orderkey") % 4 + 1).cast("int"))
            .as("source"),
          when(col("o_orderkey") % 2 === 0, lit("indian_ocean"))
            .otherwise(lit("global")).as("region"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .distinct()
      specs
        .join(broadcast(endpoints), Seq("source"), "left")
        .join(broadcast(Erddap.regions(s)), Seq("region"), "left")
        .select(col("source"), col("region"),
          date_format(col("month"), "yyyy-MM-dd").as("month_str"),
          Erddap.tabledapUrl(
            col("base_url"), lit("ArgoFloats"),
            col("lat_min"), col("lat_max"), col("lon_min"), col("lon_max"),
            date_format(col("month"), "yyyy-MM-dd"),
            date_format(last_day(col("month")), "yyyy-MM-dd")).as("url"),
          when(col("month").isNotNull,
            Erddap.cacheFilename(lit("ArgoFloats"), col("source"),
              col("region"), col("month"))).as("cache_file"))
        .orderBy("source", "region", "month_str")
    },

    // ---- S6 link extraction (download.py:15-18) --------------------------
    "acq1_index_links" -> { (s, dir) =>
      indexPages(s, dir)
        .select(col("page_id"), posexplode(Acquire.hrefs(col("html"))))
        .select(col("page_id"), col("pos").cast("long").as("pos"),
          col("col").as("href"))
        .withColumn("is_nc", col("href").endsWith(".nc"))
        .orderBy("page_id", "pos")
    },

    // ---- S6 first-N download plan + skip-if-exists (download.py:19-31) ---
    "acq2_download_plan" -> { (s, dir) =>
      val nc = Acquire.ncLinks(indexPages(s, dir), "page_id", "html")
      // capped at maxFiles rows by construction — checkpointing the tiny
      // plan once keeps the existing-ledger derivation below from replaying
      // the whole page-synthesis + parse + prefix-sum lineage a second and
      // third time (the plan had three full scans without it)
      val planned = Acquire.downloadPlan(nc, "page_id", "pos", "href", maxFiles = 40)
        .withColumn("url", concat(lit("https://data.example.net/argo/"),
          col("page_id"), lit("/"), col("href")))
        .localCheckpoint(false)
      // "already on disk": a deterministic fifth of the planned names —
      // stands in for the reference's os.path.exists probe (download.py:26)
      val existing = planned
        .filter((col("pos") + 1) % 5 === 2).select("file_name")
      Acquire.markExisting(planned, existing, "file_name")
        .select(col("seq"), col("page_id"), col("file_name"), col("href"),
          col("url"), col("action"))
        .orderBy("seq")
    },

    // ---- S7 sample registry + cache resolution (load_data.py:377-426) ----
    "acq3_sample_cache" -> { (s, dir) =>
      import s.implicits._
      val registry = Seq(
        ("small_test", "https://erddap.example.net/tabledap/argo-synth.nc"),
        ("ifremer_sample", "https://erddap.example.net/tabledap/argo-floats.nc"),
        ("indian_202001", "https://data.example.net/argo/2020/01/all.nc"))
        .toDF("sample_name", "url")
      val cached = Seq("small_test").toDF("sample_name")
      val requests = Tables.documents(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(element_at(
          array(lit("small_test"), lit("ifremer_sample"),
            lit("indian_202001"), lit("missing_set")),
          (col("doc_id") % 4 + 1).cast("int")).as("sample_name"))
      Acquire.resolveSamples(requests, registry, cached)
        .groupBy("sample_name", "status", "cache_file", "url")
        .agg(count(lit(1)).as("n_requests"))
        .orderBy("sample_name")
    })
}
