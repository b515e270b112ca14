package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermissions

import graft.stream.{FastLocalFileSystem, FastRawLocalFileSystem, NioCheckpointFileManager}

/** Contract coverage for the round-9 local-fs perf shims: the no-fork
  * permission mapping must be bit-faithful to chmod, and the NIO
  * checkpoint manager must preserve the rename-based manager's atomicity
  * semantics (no-overwrite conflicts SURFACE as Hadoop's
  * FileAlreadyExistsException — the concurrent-writer signal
  * HDFSMetadataLog relies on — and cancel discards cleanly).
  */
class LocalFsPerfSpec extends AnyFunSuite {

  private def tempDir(): String =
    Files.createTempDirectory("graft-fsperf").toString

  test("LocalFsPerf.tune pins the perf levers (codegen cache + class-name sharing + fs shims)") {
    // These four confs carry measured double-digit-percent sweep wins
    // (BENCH_NOTES r9-r11); a silent drop would regress 46%/12% of sweep
    // perf without failing any correctness gate. The shared test session is
    // built through LocalFsPerf.tune — the same wiring Verify/Bench use —
    // so this asserts the END-TO-END effective configuration.
    val s = SparkTestSession.spark
    assert(s.conf.get("spark.sql.codegen.cache.maxEntries") === "5000",
      "codegen source->class cache must stay sized for the full query surface (r10, -46% sweep)")
    assert(s.conf.get("spark.sql.codegen.useIdInClassName") === "false",
      "stage-id-free class names let structurally identical stages share one Janino entry (r11, -6.5% sweep)")
    assert(s.conf.get("spark.hadoop.fs.file.impl")
      === classOf[FastLocalFileSystem].getName)
    assert(s.conf.get("spark.sql.streaming.checkpointFileManagerClass")
      === classOf[NioCheckpointFileManager].getName)
  }

  test("FastRawLocalFileSystem.setPermission maps all nine POSIX bits") {
    val fs = new FastRawLocalFileSystem
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    val dir = tempDir()
    val f = Paths.get(dir, "p.bin")
    Files.write(f, Array[Byte](1))
    for (mode <- Seq("644", "600", "755", "640", "444", "711")) {
      fs.setPermission(new Path(f.toString),
        new org.apache.hadoop.fs.permission.FsPermission(
          Integer.parseInt(mode, 8).toShort))
      val expect = PosixFilePermissions.fromString(
        mode.map(_.asDigit).flatMap { d =>
          Seq(if ((d & 4) != 0) 'r' else '-', if ((d & 2) != 0) 'w' else '-',
            if ((d & 1) != 0) 'x' else '-')
        }.mkString)
      assert(Files.getPosixFilePermissions(f) === expect, s"mode $mode")
    }
  }

  test("FastLocalFileSystem writes are byte-identical to stock LocalFileSystem") {
    val conf = new Configuration()
    val fast = new FastLocalFileSystem
    fast.initialize(java.net.URI.create("file:///"), conf)
    val dir = tempDir()
    val p = new Path(s"$dir/out.bin")
    val payload = Array.tabulate[Byte](4096)(i => (i * 31).toByte)
    val out = fast.create(p, true)
    out.write(payload); out.close()
    assert(Files.readAllBytes(Paths.get(s"$dir/out.bin")).toSeq === payload.toSeq)
    // checksum sidecar still produced (ChecksumFileSystem behavior kept)
    assert(Files.exists(Paths.get(s"$dir/.out.bin.crc")))
    val in = fast.open(p)
    val back = new Array[Byte](4096); in.readFully(0, back); in.close()
    assert(back.toSeq === payload.toSeq)
  }

  test("NioCheckpointFileManager: atomic publish, conflict surfacing, cancel") {
    val dir = tempDir()
    val fm = new NioCheckpointFileManager(new Path(dir), new Configuration())
    val target = new Path(s"$dir/offsets/0")

    // atomic publish: content visible only after close, readable via open
    val s1 = fm.createAtomic(target, overwriteIfPossible = false)
    s1.write("batch-0".getBytes("UTF-8"))
    assert(!fm.exists(target), "target must not exist before close")
    s1.close()
    assert(fm.exists(target))
    val in = fm.open(target)
    val buf = new Array[Byte](7); in.readFully(0, buf); in.close()
    assert(new String(buf, "UTF-8") === "batch-0")

    // no-overwrite conflict surfaces as Hadoop's FileAlreadyExistsException
    val s2 = fm.createAtomic(target, overwriteIfPossible = false)
    s2.write("usurper".getBytes("UTF-8"))
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException](s2.close())
    val in2 = fm.open(target)
    val buf2 = new Array[Byte](7); in2.readFully(0, buf2); in2.close()
    assert(new String(buf2, "UTF-8") === "batch-0", "loser must not clobber")

    // overwrite mode replaces atomically
    val s3 = fm.createAtomic(target, overwriteIfPossible = true)
    s3.write("batch-1".getBytes("UTF-8")); s3.close()
    val in3 = fm.open(target)
    val buf3 = new Array[Byte](7); in3.readFully(0, buf3); in3.close()
    assert(new String(buf3, "UTF-8") === "batch-1")

    // cancel discards: no target mutation, no temp litter
    val s4 = fm.createAtomic(new Path(s"$dir/offsets/1"), overwriteIfPossible = false)
    s4.write("junk".getBytes("UTF-8")); s4.cancel()
    assert(!fm.exists(new Path(s"$dir/offsets/1")))
    assert(fm.list(new Path(s"$dir/offsets")).map(_.getPath.getName).toSeq === Seq("0"),
      "cancelled temp files must not linger")

    // close-after-cancel and cancel-after-close are no-ops
    s4.close()
    val s5 = fm.createAtomic(new Path(s"$dir/offsets/2"), overwriteIfPossible = false)
    s5.write("x".getBytes("UTF-8")); s5.close(); s5.cancel()
    assert(fm.exists(new Path(s"$dir/offsets/2")))

    // delete is recursive and idempotent
    fm.delete(new Path(s"$dir/offsets"))
    assert(!fm.exists(new Path(s"$dir/offsets")))
    fm.delete(new Path(s"$dir/offsets")) // second delete: no throw
  }
}
