package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.Cli

/** The reference-CLI-compatible entry point (`main.py --mode ...` parity):
  * sample/file/data-folder modes produce the floats/profiles/embeddings
  * sink layout; download mode runs the S6 acquisition path end-to-end over
  * local index fixtures; flags behave.
  */
class CliSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("sample mode materializes floats, profiles and embeddings sinks") {
    val out = Files.createTempDirectory("graft-cli").toString
    assert(Cli.run(spark, Array("--mode", "sample", "--sample", "sf0.001", "--out", out)) == 0)
    val floats = spark.read.parquet(s"$out/floats")
    val profiles = spark.read.parquet(s"$out/profiles")
    val emb = spark.read.parquet(s"$out/embeddings")
    assert(floats.count() > 0 && profiles.count() > 0)
    assert(emb.count() == floats.count(), "one embedding per float summary")
    assert(emb.select(size(col("embedding"))).head().getInt(0) == 64)
    // same lifecycle as the oracled pl1_full_pipeline query
    assert(floats.columns.contains("temperature_mean") && profiles.columns.contains("variable_name"))
  }

  test("file mode ingests a single raw parquet; --no-embeddings skips the sink") {
    val base = Files.createTempDirectory("graft-cli-file").toString
    val rawPath = s"$base/raw.parquet"
    Cli.sampleRaw(spark, "/root/testdata/sf0.001").limit(500)
      .write.mode("overwrite").parquet(rawPath)
    val out = s"$base/out"
    assert(Cli.run(spark, Array("--mode", "file", "--file", rawPath,
      "--no-embeddings", "--out", out)) == 0)
    assert(spark.read.parquet(s"$out/floats").count() > 0)
    assert(!new java.io.File(s"$out/embeddings").exists(), "--no-embeddings honored")
  }

  test("download mode scrapes index pages and fetches first-N with skip-if-exists") {
    val base = Files.createTempDirectory("graft-cli-dl")
    try {
      // two month-index pages, reference layout: hrefs relative to the dir
      (1 to 4).foreach(i =>
        Files.write(base.resolve(s"f$i.nc"), s"bytes-$i".getBytes("UTF-8")))
      Files.writeString(base.resolve("2020_01.html"),
        """<html><a href="f1.nc">a</a><a href="skip.html">x</a><a href='f2.nc'>b</a></html>""")
      Files.writeString(base.resolve("2020_02.html"),
        """<a HREF=f3.nc>c</a><a href="f4.nc">d</a>""")
      val dest = s"$base/got"
      // max-files=3 caps the global plan: f4.nc (page 2020_02 pos 1) is cut
      assert(Cli.run(spark, Array("--mode", "download", "--index-dir",
        base.toString, "--dest", dest, "--max-files", "3")) == 0)
      val got = new java.io.File(dest).listFiles().map(_.getName).sorted.toSeq
      assert(got == Seq("2020_01_001.nc", "2020_01_002.nc", "2020_02_001.nc"))
      assert(Files.readString(java.nio.file.Paths.get(dest, "2020_01_002.nc")) == "bytes-2")
      // second run: same plan, everything already on disk → all skips
      assert(Cli.run(spark, Array("--mode", "download", "--index-dir",
        base.toString, "--dest", dest, "--max-files", "3")) == 0)
      assert(new java.io.File(dest).listFiles().length == 3)
    } finally QueryContext.rmTree(base.toString)
  }

  test("bad args decline with nonzero rc; setup-db makes layout") {
    assert(Cli.run(spark, Array("--mode", "download")) == 2) // missing --index-dir
    assert(Cli.run(spark, Array("--mode", "file")) == 2) // missing --file
    assert(Cli.run(spark, Array("--mode", "nope")) == 2)
    val out = Files.createTempDirectory("graft-cli-db").toString
    assert(Cli.run(spark, Array("--setup-db", "--out", out)) == 0)
    assert(Seq("floats", "profiles", "embeddings").forall(t => new java.io.File(s"$out/$t").isDirectory))
  }
}
