package graft

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Acquire, HttpTransport}

/** The production HTTP wire, exercised against an in-process loopback
  * `com.sun.net.httpserver.HttpServer` (zero egress): byte-faithful
  * streaming for fixed-length and chunked bodies, multi-chunk (>8 KB)
  * payloads, non-200 → accounted `error` ledger row, read-timeout
  * fail-fast, and mid-body disconnect → temp reaped, nothing published.
  */
class HttpTransportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Start a loopback server with the given (path → handler) routes, run
    * `f` against its base URL, always stop the server.
    */
  private def withServer[A](routes: (String, HttpExchange => Unit)*)(
      f: String => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val pool = Executors.newCachedThreadPool()
    server.setExecutor(pool)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) =>
        try h(ex) finally ex.close())
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally { server.stop(0); pool.shutdownNow() }
  }

  private def sendAll(ex: HttpExchange, body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(200, body.length)
    val os: OutputStream = ex.getResponseBody
    os.write(body); os.close()
  }

  // deterministic >8 KB payload: exercises the multi-chunk copy loop
  private val bigBody: Array[Byte] =
    Array.tabulate(100003)(i => ((i * 31 + 7) % 251).toByte)

  test("fetch round-trips fixed-length and chunked bodies byte-identically") {
    val small = "netcdf-bytes-éλ".getBytes("UTF-8")
    withServer(
      "/fixed" -> (sendAll(_, bigBody)),
      "/small" -> (sendAll(_, small)),
      "/chunked" -> { ex =>
        ex.sendResponseHeaders(200, 0) // 0 ⇒ chunked transfer encoding
        val os = ex.getResponseBody
        bigBody.grouped(1000).foreach(os.write) // server-side dribble
        os.close()
      }) { base =>
      val t = new HttpTransport(5000)
      assert(t.fetch(s"$base/small").toSeq == small.toSeq)
      assert(t.fetch(s"$base/fixed").toSeq == bigBody.toSeq)
      assert(t.fetch(s"$base/chunked").toSeq == bigBody.toSeq)
    }
  }

  test("fetchTo streams to the destination file; bytes round-trip") {
    val d = Files.createTempDirectory("http-to")
    try withServer("/f.nc" -> (sendAll(_, bigBody))) { base =>
      val dest = d.resolve("f.nc")
      val n = new HttpTransport(5000).fetchTo(s"$base/f.nc", dest)
      assert(n == bigBody.length.toLong)
      assert(Files.readAllBytes(dest).toSeq == bigBody.toSeq)
    } finally QueryContext.rmTree(d.toString)
  }

  test("non-2xx raises like raise_for_status; download accounts it as error") {
    val dst = Files.createTempDirectory("http-404")
    try withServer(
      "/ok.nc" -> (sendAll(_, "fine".getBytes)),
      "/gone.nc" -> (_.sendResponseHeaders(404, -1))) { base =>
      val t = new HttpTransport(5000)
      intercept[java.io.IOException](t.fetch(s"$base/gone.nc"))
      val plan = Seq((s"$base/ok.nc", "ok.nc"), (s"$base/gone.nc", "gone.nc"))
        .toDF("url", "file_name")
      val got = Acquire.download(plan, "url", "file_name", dst.toString, t)
        .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2)))
        .toMap
      assert(got("ok.nc") == (("download", 4L)))
      assert(got("gone.nc") == (("error", 0L)))
      // only the good file landed; the error path left no temp debris
      assert(new java.io.File(dst.toString).listFiles().map(_.getName).toSeq ==
        Seq("ok.nc"))
    } finally QueryContext.rmTree(dst.toString)
  }

  test("3xx redirects are followed: absolute, relative, and cross-server Location") {
    // Cross-protocol (http→https) can't run on a loopback without certs;
    // cross-SERVER redirection exercises the same code path — the hop
    // re-opens a fresh connection from the resolved Location instead of
    // relying on the JDK's same-connection auto-follow (which refuses
    // protocol changes). The second server stands in for the https target.
    val body = "redirected-bytes".getBytes("UTF-8")
    withServer("/final.nc" -> (sendAll(_, body))) { other =>
      withServer(
        "/final.nc" -> (sendAll(_, body)),
        "/abs" -> { ex =>
          val host = ex.getRequestHeaders.getFirst("Host")
          ex.getResponseHeaders.add("Location", s"http://$host/final.nc")
          ex.sendResponseHeaders(301, -1)
        },
        "/rel" -> { ex =>
          ex.getResponseHeaders.add("Location", "/final.nc")
          ex.sendResponseHeaders(302, -1)
        },
        "/cross" -> { ex =>
          ex.getResponseHeaders.add("Location", s"$other/final.nc")
          ex.sendResponseHeaders(307, -1)
        }) { base =>
        val t = new HttpTransport(5000)
        assert(t.fetch(s"$base/abs").toSeq == body.toSeq)
        assert(t.fetch(s"$base/rel").toSeq == body.toSeq)
        assert(t.fetch(s"$base/cross").toSeq == body.toSeq)
        // fetchTo streams through the hop too
        val d = Files.createTempDirectory("http-redir")
        try {
          val n = t.fetchTo(s"$base/rel", d.resolve("f.nc"))
          assert(n == body.length.toLong)
          assert(Files.readAllBytes(d.resolve("f.nc")).toSeq == body.toSeq)
        } finally QueryContext.rmTree(d.toString)
      }
    }
  }

  test("a redirect loop fails bounded, and the ledger's error column says why") {
    val dst = Files.createTempDirectory("http-loop")
    try withServer(
      "/a" -> { ex =>
        ex.getResponseHeaders.add("Location", "/b"); ex.sendResponseHeaders(302, -1)
      },
      "/b" -> { ex =>
        ex.getResponseHeaders.add("Location", "/a"); ex.sendResponseHeaders(302, -1)
      },
      "/gone.nc" -> (_.sendResponseHeaders(404, -1))) { base =>
      val t = new HttpTransport(5000)
      val e = intercept[java.io.IOException](t.fetch(s"$base/a"))
      assert(e.getMessage.contains("too many redirects"))
      // download accounts the loop AND a plain 404 as error rows whose
      // `error` column records class + message — a monitor can tell N dead
      // links from one systemic fault without inferring from rates alone
      val plan = Seq((s"$base/a", "loop.nc"), (s"$base/gone.nc", "gone.nc"))
        .toDF("url", "file_name")
      val got = Acquire.download(plan, "url", "file_name", dst.toString, t)
        .collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getString(3)))).toMap
      assert(got("loop.nc")._1 == "error" &&
        got("loop.nc")._2.contains("IOException") &&
        got("loop.nc")._2.contains("too many redirects"))
      assert(got("gone.nc")._1 == "error" && got("gone.nc")._2.contains("HTTP 404"))
    } finally QueryContext.rmTree(dst.toString)
  }

  test("hostile redirects keep the IOException contract: off-scheme, malformed, bad URL") {
    // A compromised/misconfigured server can point Location anywhere; the
    // transport's documented error contract is ONE exception type
    // (IOException) for every transport failure, so Acquire's ledger and
    // fetchSample's None path stay total. Pre-round-17 these leaked
    // ClassCastException (ftp:) and IllegalArgumentException (malformed)
    // out of the URI plumbing.
    withServer(
      "/ftp" -> { ex =>
        ex.getResponseHeaders.add("Location", "ftp://127.0.0.1/evil.nc")
        ex.sendResponseHeaders(302, -1)
      },
      "/file" -> { ex =>
        ex.getResponseHeaders.add("Location", "file:///etc/passwd")
        ex.sendResponseHeaders(301, -1)
      },
      "/mangled" -> { ex =>
        ex.getResponseHeaders.add("Location", "http://[not-a-host/..")
        ex.sendResponseHeaders(302, -1)
      }) { base =>
      val t = new HttpTransport(5000)
      val ftp = intercept[java.io.IOException](t.fetch(s"$base/ftp"))
      assert(ftp.getMessage.contains("redirect off http(s)"), ftp.getMessage)
      val file = intercept[java.io.IOException](t.fetch(s"$base/file"))
      assert(file.getMessage.contains("redirect off http(s)"), file.getMessage)
      val bad = intercept[java.io.IOException](t.fetch(s"$base/mangled"))
      assert(bad.getMessage.contains("unresolvable redirect"), bad.getMessage)
      // and a directly-supplied non-http(s)/malformed URL fails the same way
      intercept[java.io.IOException](t.fetch("file:///etc/passwd"))
      intercept[java.io.IOException](t.fetch("http://[broken"))
    }
  }

  test("read timeout fails fast instead of hanging the task") {
    withServer("/slow.nc" -> { ex =>
      Thread.sleep(10000); sendAll(ex, "late".getBytes)
    }) { base =>
      val t0 = System.nanoTime()
      intercept[java.io.IOException](
        new HttpTransport(400).fetch(s"$base/slow.nc"))
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      assert(elapsedMs < 5000, s"timed out in ${elapsedMs}ms, not ~400ms")
    }
  }

  test("mid-body disconnect: no partial publish, temp reaped, error accounted") {
    val dst = Files.createTempDirectory("http-trunc")
    try withServer("/trunc.nc" -> { ex =>
      // declare 100 KB, deliver 10 KB, hang up: the client sees premature EOF
      ex.sendResponseHeaders(200, bigBody.length)
      ex.getResponseBody.write(bigBody, 0, 10240)
    }) { base =>
      val t = new HttpTransport(5000)
      intercept[java.io.IOException](t.fetch(s"$base/trunc.nc"))
      val got = Acquire.download(
        Seq((s"$base/trunc.nc", "t.nc")).toDF("url", "file_name"),
        "url", "file_name", dst.toString, t).collect()
      assert(got.map(r => (r.getString(1), r.getLong(2))).toSeq ==
        Seq(("error", 0L)))
      assert(new java.io.File(dst.toString).listFiles().isEmpty,
        "neither the file nor a .part temp may survive a truncated body")
    } finally QueryContext.rmTree(dst.toString)
  }

  test("CLI download mode crawls a live HTTP index end-to-end into ingestable files") {
    // the reference's full download.py flow on the wire: GET the month
    // listing, soup out .nc links, stream base_url + link to disk with
    // skip-if-exists — then prove the downloaded bytes ingest through the
    // NetCDF source (the S6→S2 lifecycle, HTTP edition)
    val dest = Files.createTempDirectory("http-cli")
    try {
      val ncBytes = (0 until 3).map(f => graft.sources.NetCdfFixture.fileBytes(f))
      val index = (0 until 3).map(f => s"""<a href="float_$f.nc">f$f</a>""")
        .mkString("<html><body><!-- <a href='ghost.nc'>x</a> -->", "", "</body></html>")
      withServer(
        // index registered at the no-slash prefix: serves both the slashed
        // and unslashed listing URL; the longer .nc contexts still win
        (Seq("/argo/2020/01" -> ((ex: HttpExchange) =>
          sendAll(ex, index.getBytes("UTF-8")))) ++
          (0 until 3).map(f => s"/argo/2020/01/float_$f.nc" ->
            ((ex: HttpExchange) => sendAll(ex, ncBytes(f))))): _*) { base =>
        val args = Array("--mode", "download", "--base-url", s"$base/argo/2020/01/",
          "--dest", s"$dest/got", "--max-files", "2")
        assert(graft.tools.Cli.run(spark, args) == 0)
        // first-N cap + the reference's month_pos naming
        val names = new java.io.File(s"$dest/got").listFiles().map(_.getName).sorted
        assert(names.toSeq == Seq("2020_01_001.nc", "2020_01_002.nc"))
        // re-run: everything skips, bytes untouched
        assert(graft.tools.Cli.run(spark, args) == 0)
        assert(Files.readAllBytes(Paths.get(s"$dest/got/2020_01_001.nc")).toSeq ==
          ncBytes(0).toSeq)
        // the downloaded directory decodes through the same NetCDF source
        // every upload uses
        val rows = new Engine(spark).ingestNetCdf(s"$dest/got")
        assert(rows.select("float_id").distinct().count() == 2)
        assert(rows.count() > 0)
        // a base URL WITHOUT its trailing slash must normalize, not
        // concatenate into malformed file URLs (all-error ledger trap)
        assert(graft.tools.Cli.run(spark, Array("--mode", "download",
          "--base-url", s"$base/argo/2020/01", "--dest", s"$dest/got2",
          "--max-files", "1")) == 0)
        assert(new java.io.File(s"$dest/got2").listFiles().map(_.getName).toSeq ==
          Seq("2020_01_001.nc"))
      }
    } finally QueryContext.rmTree(dest.toString)
  }

  test("fetchSample over HTTP: caches on success, None on HTTP failure") {
    val cache = Files.createTempDirectory("http-sample")
    try withServer(
      "/s.nc" -> (sendAll(_, "sample-bytes".getBytes)),
      "/e.nc" -> (_.sendResponseHeaders(500, -1))) { base =>
      val t = HttpTransport.sample
      val reg = Map("good" -> s"$base/s.nc", "bad" -> s"$base/e.nc")
      val p = Acquire.fetchSample("good", reg, cache.toString, t)
      assert(p.contains(Paths.get(cache.toString, "sample_good.nc").toString))
      assert(Files.readString(Paths.get(p.get)) == "sample-bytes")
      // the reference returns None on any fetch failure (load_data.py:424-426)
      assert(Acquire.fetchSample("bad", reg, cache.toString, t).isEmpty)
      assert(!Files.exists(Paths.get(cache.toString, "sample_bad.nc")))
    } finally QueryContext.rmTree(cache.toString)
  }
}
