package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.{Ingest, ManifestTable}

/** The transactional manifest sink (round-17 verdict item 5): atomic
  * hard-link publish, batch-id-ledger replay idempotence, reader isolation
  * from half-committed batches, vacuum safety, and the streaming path
  * (`Ingest.startTransactional`) end-to-end across a checkpoint restart.
  * The o7 oracle row drives the same crash window against the DuckDB
  * oracle; these specs pin the pieces the oracle row can't isolate
  * (concurrent publish races, vacuum never touching live files).
  */
class ManifestTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-manifest").toString + "/t"

  test("commits are atomic and versioned; read resolves exactly the latest snapshot") {
    val t = freshTable()
    assert(ManifestTable.latest(t).isEmpty)
    val schema = Seq((1L, "a")).toDF("id", "s").schema
    // empty table reads as an empty frame with the writer schema
    assert(ManifestTable.read(spark, t, schema).count() == 0)

    ManifestTable.appendBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, 0L)
    ManifestTable.appendBatch(Seq((3L, "c")).toDF("id", "s"), t, 1L)
    val m = ManifestTable.latest(t).get
    assert(m.version == 1L && m.batchIds == Set(0L, 1L))
    val got = ManifestTable.read(spark, t, schema)
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("a half-committed batch is invisible to readers; vacuum reaps only the orphan") {
    val t = freshTable()
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    ManifestTable.appendBatch(df, t, 0L)
    // crash window: data + segment for batch 1, no publish
    ManifestTable.writeAttempt(Seq((9L, 90.0)).toDF("id", "v"), t, 1L)
    assert(ManifestTable.read(spark, t, df.schema).count() == 2,
      "reader must not see the unpublished attempt")
    // replay commits a FRESH attempt; the crashed one stays orphaned.
    // Default-grace vacuum must NOT reap it (it is seconds old — from
    // vacuum's view indistinguishable from a LIVE committer's in-flight
    // attempt, the round-17 advice race); grace-0 then reaps exactly the
    // orphan dir and its never-published segment listing.
    ManifestTable.appendBatch(Seq((9L, 90.0)).toDF("id", "v"), t, 1L)
    assert(ManifestTable.read(spark, t, df.schema).count() == 3)
    assert(ManifestTable.vacuum(t).isEmpty,
      "an attempt inside the grace window must survive vacuum")
    val reaped = ManifestTable.vacuum(t, 0L)
    assert(reaped.count(_.startsWith("data/b1_")) == 1, reaped.toString)
    assert(reaped.count(_.startsWith("_manifests/seg_")) == 1,
      s"the crashed attempt's orphan segment reaps too: $reaped")
    assert(reaped.size == 2, reaped.toString)
    // vacuum touched nothing live: full content still reads back
    val got = ManifestTable.read(spark, t, df.schema)
      .as[(Long, Double)].collect().sorted.toSeq
    assert(got == Seq((1L, 10.0), (2L, 20.0), (9L, 90.0)))
    assert(ManifestTable.vacuum(t, 0L).isEmpty, "second vacuum finds nothing")
  }

  test("duplicate delivery of a committed batch id is a no-op (ledger idempotence)") {
    val t = freshTable()
    val df = Seq((1L, "x")).toDF("id", "s")
    ManifestTable.appendBatch(df, t, 5L)
    val v1 = ManifestTable.latest(t).get.version
    ManifestTable.appendBatch(df, t, 5L)
    ManifestTable.appendBatch(df, t, 5L)
    assert(ManifestTable.latest(t).get.version == v1, "no new version on replay")
    assert(ManifestTable.read(spark, t, df.schema).count() == 1)
  }

  test("racing committers: every batch lands exactly once, versions are a dense chain") {
    // 8 threads commit 8 DISTINCT batch ids concurrently — the hard-link
    // publish means exactly one wins each version and losers retry on the
    // next; nothing is lost, nothing doubles, and the version history is
    // 0..7 with all ids present.
    val t = freshTable()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (0 until 8).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = ManifestTable.appendBatch(
            Seq((i.toLong, s"row$i")).toDF("id", "s"), t, i.toLong)
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    val m = ManifestTable.latest(t).get
    assert(m.version == 7L, s"8 commits must occupy versions 0..7, got ${m.version}")
    assert(m.batchIds == (0L until 8L).toSet)
    val schema = Seq((1L, "a")).toDF("id", "s").schema
    val ids = ManifestTable.read(spark, t, schema)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 8L).toSeq, s"exactly-once per batch, got $ids")
  }

  test("compact folds the listing as a NEW version; time travel survives until expiry") {
    val t = freshTable()
    val schema = Seq((1L, 1.0)).toDF("id", "v").schema
    (0 until 4).foreach { i =>
      ManifestTable.appendBatch(
        Seq((i * 10L, i.toDouble), (i * 10L + 1, i + 0.5)).toDF("id", "v")
          .repartition(2), t, i.toLong)
    }
    val before = ManifestTable.latest(t).get
    assert(before.files.size == 8 && before.version == 3L)
    val (nb, na) = ManifestTable.compact(spark, t, schema, 128L << 20).get
    assert(nb == 8 && na == 1, s"8 fragments must fold to 1 file, got ($nb, $na)")
    val after = ManifestTable.latest(t).get
    assert(after.version == 4L, "compaction publishes a NEW version")
    assert(after.batchIds == before.batchIds, "ingest ledger carries over")
    // a replayed batch id is STILL a no-op after the rewrite
    ManifestTable.appendBatch(Seq((99L, 9.9)).toDF("id", "v"), t, 2L)
    assert(ManifestTable.latest(t).get.version == 4L)
    // content identical through the rewrite
    val all = ManifestTable.read(spark, t, schema).count()
    assert(all == 8)
    // time travel: v1 = batches 0-1 only, reading the ORIGINAL files
    assert(ManifestTable.readAt(spark, t, schema, 1L).count() == 4)
    // pre-compaction files are NOT vacuum fodder while old versions remain
    assert(ManifestTable.vacuum(t, 0L).isEmpty,
      "retained versions' files must survive vacuum")
    // expire everything but the compacted snapshot → originals reclaim
    val expired = ManifestTable.expireSnapshots(t, keepLast = 1)
    assert(expired == Seq(0L, 1L, 2L, 3L))
    assert(ManifestTable.manifestAt(t, 1L).isEmpty, "expired version gone")
    val reclaimed = ManifestTable.vacuum(t, 0L)
    assert(reclaimed.size == 4 && reclaimed.forall(_.startsWith("data/b")),
      s"exactly the four pre-compaction batch dirs reclaim: $reclaimed")
    assert(ManifestTable.read(spark, t, schema).count() == 8,
      "the compacted snapshot is untouched by expiry+vacuum")
  }

  test("concurrent readers always see a consistent committed snapshot, never a partial one") {
    // Snapshot-isolation under live commits: a reader loop resolves and
    // scans the table WHILE a writer commits batches of known shape (batch
    // i = i+1 rows, all rows carrying value i). Every read must be some
    // PREFIX of the commit history — total rows == sum of the first k
    // batch sizes AND max batch id == k-1 — never a torn mix (files from
    // an unpublished attempt, or a manifest whose segments are missing).
    val t = freshTable()
    val schema = Seq((0L, 0L)).toDF("batch", "x").schema
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reader = new Thread(() => {
      while (!stop.get() && bad.get() == null) {
        val rows = ManifestTable.read(spark, t, schema)
          .groupBy("batch").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        if (rows.nonEmpty) {
          val k = rows.keys.max.toInt + 1
          val expect = (0 until k).map(i => i.toLong -> (i + 1L)).toMap
          if (rows != expect)
            bad.set(s"torn read: $rows (expected prefix $expect)")
        }
      }
    }, "manifest-reader")
    reader.start()
    try (0 until 8).foreach { i =>
      ManifestTable.appendBatch(
        Seq.fill(i + 1)((i.toLong, 1L)).toDF("batch", "x"), t, i.toLong)
    } finally { stop.set(true); reader.join(30000) }
    assert(bad.get() == null, String.valueOf(bad.get()))
    assert(ManifestTable.read(spark, t, schema).count() == (1 to 8).sum)
  }

  test("startTransactional: manifest-committed streaming ingest across a restart") {
    val base = Files.createTempDirectory("graft-txn-stream").toString
    val inbox = s"$base/inbox"; val table = s"$base/table"; val ckpt = s"$base/ckpt"
    new java.io.File(inbox).mkdirs()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")

    ev.filter(col("event_id") < 200).coalesce(1)
      .write.mode("overwrite").parquet(s"$inbox/u1")
    Ingest.startTransactional(spark, s"$inbox/*", ev.schema, table, ckpt,
      "event_id", df => df.filter(col("value").isNotNull)).awaitTermination()
    val n1 = ManifestTable.read(spark, table, ev.schema).count()
    assert(n1 == ev.filter(col("event_id") < 200 && col("value").isNotNull).count())

    // restart from the same checkpoint: u2 re-sends [100,200) (dropped by
    // the RESTORED state store) plus fresh [200,300)
    ev.filter(col("event_id") >= 100 && col("event_id") < 300).coalesce(1)
      .write.mode("overwrite").parquet(s"$inbox/u2")
    Ingest.startTransactional(spark, s"$inbox/*", ev.schema, table, ckpt,
      "event_id", df => df.filter(col("value").isNotNull)).awaitTermination()

    val out = ManifestTable.read(spark, table, ev.schema)
    val expected = ev.filter(col("event_id") < 300 && col("value").isNotNull)
    assert(out.count() == expected.count())
    assert(out.select("event_id").distinct().count() == out.count(), "unique keys")
    // the sink really is manifest-resolved: versions advanced once per
    // non-empty micro-batch and every data file is manifest-listed
    val m = ManifestTable.latest(table).get
    assert(m.batchIds.nonEmpty && m.files.nonEmpty)
    assert(ManifestTable.vacuum(table, 0L).isEmpty, "clean runs leave no orphans")
    QueryContext.rmTree(base)
  }
}
