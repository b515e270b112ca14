package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S6/S7 — the reference's acquisition layer (download.py:12-37,
  * ingest/load_data.py:377-426), re-expressed as distributed operators.
  *
  * The reference runs a single-threaded driver loop: fetch one HTML index,
  * soup out the `.nc` hrefs, download the first N with a per-file
  * `os.path.exists` skip. At crawl scale the frontier is a DataFrame of
  * pages, link extraction is a codegen'd scalar expression
  * ([[graft.expressions.ExtractHrefs]]), "first N" is a prefix-sum over the
  * per-page link counts (never a global sort of the link set), skip-if-exists
  * is an anti-join against the download ledger, and the byte transfer runs
  * executor-side, one partition per task.
  *
  * Network IO hides behind [[Transport]]: [[LocalTransport]] reads fixture
  * paths; [[HttpTransport]] is the production wire (streamed 8 KB chunks,
  * reference-matched timeouts), exercised in tests against an in-process
  * loopback HTTP server — this container has zero egress.
  */
object Acquire {

  /** All `href` attribute values of `<a>` tags in `html`, document order. */
  def hrefs(html: Column): Column = graft.expressions.ExtractHrefs.of(html)

  /** The reference's link filter: hrefs ending `.nc` (download.py:18). */
  def ncHrefs(html: Column): Column =
    filter(hrefs(html), _.endsWith(".nc"))

  /** One row per `.nc` link of a page frame: (`pageCol`, pos, href) with
    * `pos` the link's 0-based document-order position within its page —
    * the link-domain view every downstream consumer (planner, CLI, acq2)
    * starts from.
    */
  def ncLinks(pages: DataFrame, pageCol: String, htmlCol: String): DataFrame =
    pages.select(col(pageCol), posexplode(ncHrefs(col(htmlCol))))
      .select(col(pageCol), col("pos"), col("col").as("href"))

  /** S6 planner: global download order + deterministic local names for the
    * first `maxFiles` links of a crawl.
    *
    * `ncLinks` carries one row per link: (`pageCol`, `posCol`, `hrefCol`)
    * with `posCol` the link's 0-based document-order position within its
    * page. The global sequence is `offset(page) + pos + 1` where the
    * per-page offsets come from a prefix sum over the per-page COUNTS — an
    * aggregate of one row per page, so the only global sort touches the
    * tiny page table, never the link set (the PlanQualitySpec global-window
    * gate holds by construction). Offsets broadcast back to the links.
    *
    * Local names generalize the reference's `2020_01_{i+1:03d}.nc`
    * (download.py:23): `{page}_{pos+1:03d}.nc` — the page key (any
    * castable-to-string type; the reference's is the "2020_01" month
    * label) prefixes a zero-padded position-within-page. The remote URL
    * shape is the CALLER's contract (relative hrefs, absolute hrefs, a
    * base prefix — every crawl differs), so the plan deliberately carries
    * no url column; attach one before [[download]].
    */
  def downloadPlan(
      ncLinks: DataFrame, pageCol: String, posCol: String, hrefCol: String,
      maxFiles: Int): DataFrame = {
    val counts = ncLinks.groupBy(pageCol).agg(count(lit(1)).as("__n"))
    val w = Window.orderBy(pageCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.select(col(pageCol),
      coalesce(sum("__n").over(w), lit(0L)).as("__off"))
    ncLinks.join(broadcast(offsets), pageCol)
      .withColumn("seq", col("__off") + col(posCol) + 1)
      .filter(col("seq") <= maxFiles)
      .withColumn("file_name",
        concat(col(pageCol).cast("string"), lit("_"),
          format_string("%03d", col(posCol) + 1), lit(".nc")))
      .drop("__off")
  }

  /** Skip-if-exists (download.py:26): mark each planned file `download` or
    * `skip` against the existing-file ledger. Per CRAWL the ledger is small,
    * but a long-lived incremental crawl's ledger (st17's scenario) is every
    * file ever fetched and grows without bound — so there is deliberately
    * NO broadcast hint: the planner auto-broadcasts while the ledger's
    * estimated size fits autoBroadcastJoinThreshold (and AQE re-decides on
    * runtime sizes), and past that the join shuffles on `fileCol` instead
    * of OOMing the driver on a multi-year ledger. (An earlier revision
    * forced the hint, which pinned the multi-year case to a driver
    * collect; a round-15 review pass removed the replacement conditional
    * hint too — it re-implemented the planner's own size rule.)
    */
  def markExisting(plan: DataFrame, existing: DataFrame, fileCol: String): DataFrame = {
    val ex = existing.select(col(fileCol)).distinct().withColumn("__ex", lit(true))
    plan.join(ex, Seq(fileCol), "left")
      .withColumn("action",
        when(col("__ex").isNotNull, lit("skip")).otherwise(lit("download")))
      .drop("__ex")
  }

  /** Executor-side fetch of a (url, file_name) plan into `destDir`, one
    * partition per task. Returns the ledger: one row per planned file —
    * (file_name, action ∈ download/skip/error/invalid, n_bytes, error)
    * where `error` carries the failing exception's class + message (null
    * on the non-error actions). Skip-if-exists holds under concurrency:
    * bytes land in a task-unique temp file and publish via [[publish]] (hard-link
    * creation — link(2) fails EEXIST atomically, unlike rename(2), which
    * REPLACES silently on POSIX even under ATOMIC_MOVE), so two tasks
    * racing on one name produce one file, one `download` and one `skip`.
    * Names carrying path separators or `..` quarantine as `invalid` rows
    * instead of probing outside `destDir` (the o3/s10 accounted-skip
    * pattern — one hostile link must not kill or escape a crawl).
    *
    * The ledger is materialized EAGERLY (the transfer runs exactly once,
    * here): a lazily re-executed side-effecting plan would re-fetch on
    * every downstream action and re-report every row as `skip`.
    */
  def download(
      plan: DataFrame, urlCol: String, fileCol: String,
      destDir: String, transport: Transport): DataFrame = {
    val spark = plan.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(destDir))
    plan.select(col(urlCol).cast("string"), col(fileCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.map { case (url, name) =>
          if (name == null || name.isEmpty || name.contains('/') ||
            name.contains('\\') || name == "." || name == "..")
            (name, "invalid", 0L, null: String)
          else {
            val dest = Paths.get(destDir, name)
            if (Files.exists(dest)) (name, "skip", Files.size(dest), null: String)
            else {
              val tmp = Files.createTempFile(Paths.get(destDir), s".$name.", ".part")
              try {
                // a failed wire transfer (non-200, timeout, mid-body
                // disconnect) is an accounted `error` row, never a task
                // failure — one dead link must not kill a million-file
                // crawl — and never a partial publish: bytes stream into
                // the temp file, which the finally reaps on every path.
                // NOTE the catch also converts LOCAL faults raised inside
                // fetchTo (ENOSPC, permissions, even a transport NPE) into
                // error rows; the `error` column records the exception
                // class + message so a crawl monitor can tell N dead links
                // (IOException, rate ∝ link quality) from a systemic fault
                // (one class across every row) instead of inferring from
                // the rate alone
                val n =
                  try Right(transport.fetchTo(url, tmp))
                  catch {
                    case scala.util.control.NonFatal(e) =>
                      Left(s"${e.getClass.getName}: ${e.getMessage}")
                  }
                n match {
                  case Left(detail) => (name, "error", 0L, detail)
                  case Right(bytes) =>
                    if (Acquire.publish(tmp, dest))
                      (name, "download", bytes, null: String)
                    else // concurrent winner
                      (name, "skip", Files.size(dest), null: String)
                }
              } finally Files.deleteIfExists(tmp)
            }
          }
        }
      }
      .toDF("file_name", "action", "n_bytes", "error")
      // eager: run the transfer now, hand back the cached ledger rows
      .localCheckpoint(true)
  }

  /** Atomic no-replace publish: link `tmp` into place as `dest`. Returns
    * false (leaving `dest` untouched) when a concurrent publisher already
    * created it — the one primitive rename(2) cannot provide, since POSIX
    * rename silently replaces. Callers delete `tmp` afterwards.
    */
  private[graft] def publish(tmp: Path, dest: Path): Boolean =
    try { Files.createLink(dest, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  /** S7 resolver: classify a request stream against the sample registry and
    * the cache ledger — `cached` (reuse), `fetch` (registered, not yet
    * cached), `unknown` (the reference logs an error and returns None,
    * load_data.py:400-402 → null cache_file here). Registry and cache are
    * small named sets: broadcast by construction.
    */
  def resolveSamples(
      requests: DataFrame, registry: DataFrame, cachedNames: DataFrame): DataFrame = {
    val reg = broadcast(registry.select(col("sample_name"), col("url")))
    val cn = broadcast(
      cachedNames.select(col("sample_name")).distinct().withColumn("__c", lit(true)))
    requests.join(reg, Seq("sample_name"), "left")
      .join(cn, Seq("sample_name"), "left")
      .withColumn("status",
        when(col("url").isNull, lit("unknown"))
          .when(col("__c").isNotNull, lit("cached"))
          .otherwise(lit("fetch")))
      .withColumn("cache_file",
        when(col("url").isNotNull,
          concat(lit("sample_"), col("sample_name"), lit(".nc"))))
      .drop("__c")
  }

  /** The reference's `download_sample_data` call-for-call
    * (load_data.py:391-426): named registry lookup, `sample_{name}.nc`
    * cache path, fetch-on-miss, None on unknown name or failed fetch.
    * Deliberately driver-side — it moves ONE small file; the distributed
    * path for real volume is [[downloadPlan]] + [[download]].
    */
  def fetchSample(
      name: String, registry: Map[String, String], cacheDir: String,
      transport: Transport): Option[String] =
    registry.get(name).flatMap { url =>
      val cache = Paths.get(cacheDir, s"sample_$name.nc")
      if (Files.exists(cache)) Some(cache.toString)
      else
        try {
          Files.createDirectories(cache.getParent)
          val tmp = Files.createTempFile(cache.getParent, s".sample_$name.", ".part")
          try {
            Files.write(tmp, transport.fetch(url))
            publish(tmp, cache) // losing the race is fine: winner's bytes match
            Some(cache.toString)
          } finally Files.deleteIfExists(tmp)
          // the reference catches ANY exception and returns None
          // (load_data.py:424-426) — a production transport's runtime
          // failures must degrade to a failed fetch, not propagate
        } catch { case scala.util.control.NonFatal(_) => None }
    }
}

/** Byte-transfer seam for [[Acquire]]. Implementations must be serializable:
  * [[Acquire.download]] ships the transport to executors.
  */
trait Transport extends Serializable {
  def fetch(url: String): Array[Byte]

  /** Stream `url` into `dest`, returning the byte count. The default
    * buffers through [[fetch]]; transports with a real wire (HTTP) override
    * to stream bounded chunks so a multi-GB NetCDF never materializes on
    * one executor's heap (the reference's `iter_content(chunk_size=8192)`
    * loop, download.py:28-30). On failure `dest`'s content is undefined —
    * callers fetch into a task-unique temp file and publish only on success.
    */
  def fetchTo(url: String, dest: Path): Long = {
    val bytes = fetch(url)
    Files.write(dest, bytes)
    bytes.length.toLong
  }
}

/** Test/fixture transport: resolves `url` as a local path (optionally
  * `file:`-prefixed) under an allow-listed base directory. The production
  * HTTP twin implements the same seam against a connection pool.
  */
class LocalTransport(base: String) extends Transport {
  override def fetch(url: String): Array[Byte] = {
    val rel = url.stripPrefix("file://").stripPrefix("file:")
    val p = Paths.get(rel)
    val resolved = (if (p.isAbsolute) p else Paths.get(base).resolve(p)).normalize()
    require(resolved.startsWith(Paths.get(base).normalize()),
      s"LocalTransport: $url escapes base $base")
    Files.readAllBytes(resolved)
  }
}
