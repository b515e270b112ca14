package graft.stream

import java.nio.file.{Files, Path, Paths, FileAlreadyExistsException}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal transactional table format for streaming sinks — the thing the
  * `startStateful` docstring always said its `batch=<id>` partition
  * overwrite "upgrades to at 100 TB", now real (round-17 verdict item 5).
  *
  * Layout under the table root:
  * {{{
  *   data/b<batchId>_<uuid>/part-*.parquet   immutable data files, one
  *                                           attempt dir per commit try
  *   _manifests/seg_<uuid>.list              immutable SEGMENT: the file
  *                                           list ONE commit added
  *   _manifests/v<version>.manifest          snapshot: committed batch ids
  *                                           + the segments composing it
  * }}}
  *
  * The commit protocol (`appendBatch`):
  *  1. write the batch's parquet under a fresh attempt dir (UUID-unique, so
  *     a replayed attempt never collides with a crashed one's leftovers);
  *  2. write an immutable segment file listing exactly those part files;
  *  3. PUBLISH atomically: write the next version's manifest to a temp
  *     name, then hard-link it to `v<N>.manifest` — link(2) fails EEXIST
  *     atomically (the `Acquire.publish` rule: rename(2) REPLACES silently
  *     on POSIX), so of two racing committers exactly one wins version N
  *     and the loser re-reads and retries on N+1.
  *
  * Readers (`read`) resolve the HIGHEST committed manifest and scan exactly
  * the files its segments list — a crash between steps 1-2 and 3 leaves
  * data on disk that NO reader ever sees (`vacuum` reaps it), which is the
  * reads-never-see-a-half-committed-batch guarantee the o7 oracle row
  * drives end-to-end. Exactly-once across crash-replay comes from the
  * batch-id ledger: every manifest carries the full set of committed batch
  * ids, so a replayed `appendBatch` whose id already committed is a no-op
  * (checked again after losing a publish race, closing the
  * replay-races-its-own-twin window).
  *
  * Scale notes: a commit writes ONE segment (O(files added this batch))
  * and ONE manifest (O(commits so far) lines — batch ids + segment names,
  * NOT data files), so commit cost is independent of table size; the
  * Iceberg/Delta analogue of snapshot → manifest-list → manifest. Readers
  * pay O(commits) tiny metadata reads + the data scan. The local-FS
  * hard-link publish maps to the conditional-PUT / atomic-rename primitive
  * every object store and HDFS offers. Manifests are never rewritten —
  * historical versions stay readable ([[readAt]] time travel) until
  * [[expireSnapshots]] drops them; [[compact]] folds the latest listing
  * into size-targeted files as a NEW version (o1's OPTIMIZE inside the
  * log), and [[vacuum]] reclaims whatever no retained version references.
  */
object ManifestTable {

  /** A resolved snapshot: `files` are table-root-relative parquet paths. */
  final case class Manifest(version: Long, batchIds: Set[Long], files: Seq[String])

  private def manifestsDir(table: String): Path = Paths.get(table, "_manifests")

  /** `Files.list` under a closed stream (the returned java Stream holds a
    * directory handle until closed — a drain loop would leak them).
    */
  private def listDir[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(p)
    try f(s.iterator().asScala) finally s.close()
  }

  private val ManifestName = raw"v(\d{20})\.manifest".r

  /** (version, manifest path) for every committed snapshot on disk. */
  private def versionsOnDisk(table: String): Seq[(Long, Path)] = {
    val dir = manifestsDir(table)
    if (!Files.isDirectory(dir)) Seq.empty
    else listDir(dir)(_.flatMap(p => p.getFileName.toString match {
      case ManifestName(v) => Some(v.toLong -> p)
      case _ => None
    }).toSeq)
  }

  private def parseManifest(table: String, version: Long, path: Path): Manifest = {
    val dir = manifestsDir(table)
    val lines = Files.readAllLines(path).asScala
    val batchIds = lines.collect { case s if s.startsWith("batch=") =>
      s.stripPrefix("batch=").toLong }.toSet
    val files = lines.collect { case s if s.startsWith("segment=") =>
      Files.readAllLines(dir.resolve(s.stripPrefix("segment="))).asScala
        .collect { case f if f.startsWith("file=") => f.stripPrefix("file=") }
    }.flatten.toSeq
    Manifest(version, batchIds, files)
  }

  /** Highest committed snapshot, None for an empty/absent table. */
  def latest(table: String): Option[Manifest] = {
    val versions = versionsOnDisk(table)
    if (versions.isEmpty) None
    else {
      val (version, path) = versions.maxBy(_._1)
      Some(parseManifest(table, version, path))
    }
  }

  /** A specific committed snapshot — time travel. None if that version was
    * never committed or has been expired ([[expireSnapshots]]).
    */
  def manifestAt(table: String, version: Long): Option[Manifest] =
    versionsOnDisk(table).find(_._1 == version)
      .map { case (v, p) => parseManifest(table, v, p) }

  /** Batch ids the latest snapshot has committed (replay no-op test). */
  def committedBatchIds(table: String): Set[Long] =
    latest(table).map(_.batchIds).getOrElse(Set.empty)

  /** Commit `batch` under `batchId`. Idempotent per id: a crash-replayed
    * micro-batch whose id already committed returns without writing —
    * exactly-once ACROSS crash-replay, not just per run.
    */
  def appendBatch(batch: DataFrame, table: String, batchId: Long): Unit = {
    if (committedBatchIds(table).contains(batchId)) return
    val segment = writeAttempt(batch, table, batchId)
    publish(table, batchId, segment)
  }

  /** Steps 1-2 of the protocol WITHOUT the publish — data + segment on
    * disk, invisible to every reader. Package-private so the o7 oracle row
    * and specs can park a table in the mid-crash state and prove readers
    * skip it; `appendBatch` is the only production path and always
    * publishes. Returns the segment file name to hand to [[publish]].
    */
  private[graft] def writeAttempt(batch: DataFrame, table: String, batchId: Long): String = {
    val attempt = s"data/b${batchId}_${UUID.randomUUID().toString.take(8)}"
    batch.write.mode("error").parquet(s"$table/$attempt")
    val files = listDir(Paths.get(table, attempt))(
      _.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        .toSeq.sorted)
    val dir = manifestsDir(table)
    Files.createDirectories(dir)
    val segment = s"seg_${UUID.randomUUID().toString.take(8)}.list"
    Files.write(dir.resolve(segment),
      files.map(f => s"file=$attempt/$f").mkString("", "\n", "\n").getBytes("UTF-8"))
    segment
  }

  /** Step 3: atomically claim the next version, folding `segment` and
    * `batchId` into the previous snapshot. Retries on a lost race (EEXIST
    * from the hard link), re-checking the batch-id ledger each round so a
    * replay that raced its own twin degrades to the no-op.
    */
  @annotation.tailrec
  private[graft] def publish(table: String, batchId: Long, segment: String): Unit = {
    val cur = latest(table)
    if (cur.exists(_.batchIds.contains(batchId))) return
    val won = tryPublish(table, cur, { prevLines =>
      prevLines ++ Seq(s"batch=$batchId", s"segment=$segment")
    })
    if (!won) publish(table, batchId, segment)
  }

  /** Optimistic single-version claim: build the next manifest's body from
    * the previous one's `batch=`/`segment=` lines via `buildLines`, then
    * hard-link it into place. Returns false on a lost race (someone else
    * claimed the version) — the CALLER decides whether to fold-and-retry
    * (append) or recompute its whole input (compaction).
    */
  private def tryPublish(table: String, cur: Option[Manifest],
      buildLines: Seq[String] => Seq[String]): Boolean = {
    val dir = manifestsDir(table)
    Files.createDirectories(dir)
    val next = cur.map(_.version + 1).getOrElse(0L)
    val prevLines = cur.map { m =>
      Files.readAllLines(dir.resolve(f"v${m.version}%020d.manifest")).asScala.toSeq
        .filter(s => s.startsWith("batch=") || s.startsWith("segment="))
    }.getOrElse(Seq.empty)
    val content = (s"version=$next" +: buildLines(prevLines))
      .mkString("", "\n", "\n")
    val tmp = dir.resolve(s".tmp_${UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, content.getBytes("UTF-8"))
    val won =
      try { Files.createLink(dir.resolve(f"v$next%020d.manifest"), tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    Files.deleteIfExists(tmp)
    won
  }

  /** Scan exactly the latest snapshot's files (explicit writer schema —
    * the repo-wide read-back rule; an empty table is an empty frame, not
    * an inference failure). A half-committed batch's files are structurally
    * unreachable from here.
    */
  def read(spark: SparkSession, table: String, schema: StructType): DataFrame =
    readManifest(spark, table, schema, latest(table))

  /** Time-travel scan of a specific committed version (an expired or
    * never-committed version reads empty — callers check [[manifestAt]]
    * when absence must be distinguished from an empty snapshot).
    */
  def readAt(spark: SparkSession, table: String, schema: StructType,
      version: Long): DataFrame =
    readManifest(spark, table, schema, manifestAt(table, version))

  private def readManifest(spark: SparkSession, table: String,
      schema: StructType, m: Option[Manifest]): DataFrame =
    m match {
      case Some(mf) if mf.files.nonEmpty =>
        spark.read.schema(schema).parquet(mf.files.map(f => s"$table/$f"): _*)
      case _ =>
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    }

  /** Reap ATTEMPT DIRS no RETAINED snapshot references. Before any
    * [[expireSnapshots]] that is exactly the crash orphans (data written,
    * publish never ran); after expiry it additionally reclaims files only
    * expired versions referenced (pre-compaction originals). Whole-dir
    * removal also reaps a dir's _SUCCESS/.crc bookkeeping without ever
    * touching a live dir's. Returns the removed attempt-dir names.
    */
  def vacuum(table: String): Seq[String] = {
    val dataDir = Paths.get(table, "data")
    if (!Files.isDirectory(dataDir)) return Seq.empty
    // live attempt dirs = first two path components of every file any
    // RETAINED manifest references (compaction REPLACES listings, so the
    // latest manifest alone no longer covers older versions' files)
    val liveDirs = versionsOnDisk(table)
      .flatMap { case (v, p) => parseManifest(table, v, p).files }
      .map(f => f.split('/').take(2).mkString("/")).toSet
    val orphans = listDir(dataDir)(_.filter(d => Files.isDirectory(d) &&
      !liveDirs.contains(s"data/${d.getFileName}")).toSeq)
    orphans.foreach { d =>
      listDir(d)(_.toSeq).foreach(Files.delete)
      Files.delete(d)
    }
    orphans.map(d => s"data/${d.getFileName}")
  }

  /** OPTIMIZE inside the commit log: rewrite the latest snapshot's files
    * to ~`targetBytes` outputs (shuffle-free coalesce — whole input splits
    * concatenate per output task, the o1 `Layout.compact` recipe) and
    * publish a version whose listing REPLACES the fragmented one. Batch
    * ids carry over unchanged (the ledger tracks COMMITTED INGEST, not
    * file layout, so replayed batches stay no-ops across a compaction);
    * prior versions keep resolving the original files for time travel
    * until [[expireSnapshots]] + [[vacuum]] reclaim them. A lost publish
    * race (a concurrent append landed first) recomputes from the NEW
    * snapshot — folding the prior listing forward would resurrect the
    * fragments and drop the append. Returns (files before, files after);
    * a no-op on an empty table.
    */
  def compact(spark: SparkSession, table: String, schema: StructType,
      targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    var result = (0, 0)
    var done = false
    while (!done) {
      val cur = latest(table)
      if (cur.isEmpty || cur.get.files.isEmpty) { done = true }
      else {
        val m = cur.get
        val bytes = m.files.map(f => Files.size(Paths.get(table, f))).sum
        val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        val attempt = s"data/c${m.version + 1}_${UUID.randomUUID().toString.take(8)}"
        readManifest(spark, table, schema, Some(m)).coalesce(nOut)
          .write.mode("error").parquet(s"$table/$attempt")
        val files = listDir(Paths.get(table, attempt))(
          _.map(_.getFileName.toString)
            .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
            .toSeq.sorted)
        val dir = manifestsDir(table)
        val segment = s"seg_${UUID.randomUUID().toString.take(8)}.list"
        Files.write(dir.resolve(segment),
          files.map(f => s"file=$attempt/$f").mkString("", "\n", "\n")
            .getBytes("UTF-8"))
        done = tryPublish(table, Some(m), { prevLines =>
          prevLines.filter(_.startsWith("batch=")) :+ s"segment=$segment"
        })
        if (done) result = (m.files.size, files.size)
        // a lost race leaves this attempt dir + segment orphaned — exactly
        // what vacuum reaps; the loop recomputes against the new snapshot
      }
    }
    result
  }

  /** Drop every manifest except the newest `keepLast` (and the segments
    * only expired manifests referenced). Expired versions stop resolving
    * for time travel; the data files they alone referenced become vacuum
    * fodder. Returns the expired version numbers.
    *
    * Retention contract (the standard lakehouse one): a reader that
    * resolved a manifest BEFORE it expired may fail mid-scan once a
    * subsequent [[vacuum]] deletes that version's files — expiry is the
    * operator's declaration that no reader needs those versions anymore.
    * Readers of retained versions are never affected (vacuum only removes
    * what no retained manifest references).
    */
  def expireSnapshots(table: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must retain at least the latest: $keepLast")
    val versions = versionsOnDisk(table).sortBy(_._1)
    val expire = versions.dropRight(keepLast)
    if (expire.isEmpty) return Seq.empty
    val dir = manifestsDir(table)
    def segmentsOf(p: Path): Set[String] =
      Files.readAllLines(p).asScala
        .collect { case s if s.startsWith("segment=") => s.stripPrefix("segment=") }
        .toSet
    val keptSegments = versions.takeRight(keepLast).map(_._2)
      .flatMap(segmentsOf).toSet
    val deadSegments = expire.map(_._2).flatMap(segmentsOf).toSet -- keptSegments
    expire.foreach { case (_, p) => Files.delete(p) }
    deadSegments.foreach(seg => Files.deleteIfExists(dir.resolve(seg)))
    expire.map(_._1)
  }
}
