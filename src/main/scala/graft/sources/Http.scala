package graft.sources

import java.io.{IOException, InputStream, OutputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Path, StandardOpenOption}

/** Production [[Transport]]: plain JDK `HttpURLConnection`, zero
  * dependencies, serializable by construction (two ints — each executor
  * task opens its own connection).
  *
  * Wire behavior matches the reference's `requests` usage:
  *  - bodies stream in 8 KB chunks (download.py:28-30's
  *    `iter_content(chunk_size=8192)`) — [[fetchTo]] never holds more than
  *    one chunk on the heap, so a multi-GB file costs O(8 KB) memory;
  *  - one timeout value applies to connect AND each read, the `requests`
  *    `timeout=` contract (load_data.py:87 uses 300 s for bulk pulls,
  *    load_data.py:415 uses 120 s for samples — see the companion presets);
  *  - a non-2xx status raises (the reference's `raise_for_status()`,
  *    load_data.py:88) — [[Acquire.download]] turns that into an accounted
  *    `error` ledger row, and [[Acquire.fetchSample]] into `None`;
  *  - a mid-body disconnect under a declared Content-Length surfaces as the
  *    connection's premature-EOF `IOException`, so partial bodies never
  *    publish (the caller's temp file is reaped on the failure path);
  *  - 3xx redirects are followed (bounded at [[HttpTransport.MaxRedirects]]
  *    hops) INCLUDING cross-protocol http→https, which `requests.get`
  *    follows but the JDK's auto-follow refuses — see [[withBody]].
  */
class HttpTransport(connectTimeoutMs: Int, readTimeoutMs: Int) extends Transport {

  def this(timeoutMs: Int) = this(timeoutMs, timeoutMs)

  override def fetch(url: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    withBody(url)(copyChunks(_, out))
    out.toByteArray
  }

  override def fetchTo(url: String, dest: Path): Long = {
    val out = Files.newOutputStream(dest,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    try withBody(url)(copyChunks(_, out)) finally out.close()
  }

  /** Open `url`, follow 3xx redirects (bounded hops), enforce 2xx, hand the
    * body stream to `f` (which returns the bytes it copied), verify the
    * count against any declared Content-Length, always disconnect.
    *
    * Redirects are followed MANUALLY (JDK auto-follow off): the JDK client
    * refuses cross-protocol hops, so an `http://` URL that 301s to
    * `https://` — routine on public data servers — would surface as an
    * error instead of a download under the default. Re-opening from the
    * resolved Location makes the hop protocol-agnostic, the `requests.get`
    * contract. Relative Locations resolve against the redirecting URL
    * (RFC 9110 §10.2.2); every request here is a bodiless GET, so the
    * 303 see-other method switch is a no-op. An https→http DOWNGRADE
    * redirect is followed (again the `requests` default — public data
    * servers really do bounce between the schemes), but a redirect OFF
    * http(s) entirely (ftp:, file:, …) or an unparseable Location is an
    * [[IOException]] like every other transport failure — one exception
    * type for callers ([[openHttp]]), never a leaked
    * IllegalArgument/ClassCast from URI plumbing.
    */
  private def withBody(url: String)(f: InputStream => Long): Long = {
    @annotation.tailrec
    def open(current: String, hops: Int): Long = {
      val conn = openHttp(current)
      conn.setInstanceFollowRedirects(false)
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Accept-Encoding", "identity")
      val redirectTo: Option[String] =
        try {
          val code = conn.getResponseCode
          if (code == 301 || code == 302 || code == 303 ||
            code == 307 || code == 308) {
            val loc = conn.getHeaderField("Location")
            if (loc == null)
              throw new IOException(s"HTTP $code without Location for $current")
            if (hops >= HttpTransport.MaxRedirects)
              throw new IOException(
                s"too many redirects (${hops + 1}) for $url, last at $current")
            val resolved =
              try URI.create(current).resolve(loc)
              catch { case e: IllegalArgumentException =>
                throw new IOException(
                  s"unresolvable redirect Location '$loc' from $current", e) }
            val scheme = Option(resolved.getScheme).getOrElse("")
            if (!scheme.equalsIgnoreCase("http") && !scheme.equalsIgnoreCase("https"))
              throw new IOException(
                s"refusing redirect off http(s) to '$resolved' from $current")
            Some(resolved.toString)
          } else if (code < 200 || code >= 300) {
            throw new IOException(s"HTTP $code for $current")
          } else {
            val in = conn.getInputStream
            try {
              val got = f(in)
              // the JDK client can surface a server hang-up mid-body as a
              // clean EOF; enforce the declared length ourselves so a
              // truncated file never counts as a successful transfer
              val declared = conn.getContentLengthLong
              if (declared >= 0 && got != declared)
                throw new IOException(
                  s"premature EOF: $got of $declared bytes from $current")
              return got
            } finally in.close()
          }
        } finally conn.disconnect()
      open(redirectTo.get, hops + 1)
    }
    open(url, 0)
  }

  /** Open `url` as an [[HttpURLConnection]], converting the URI layer's
    * unchecked failures — malformed URL (IllegalArgumentException) or a
    * non-http(s) scheme (whose URLConnection can't cast) — into the
    * [[IOException]] contract the fetch/fetchTo callers document.
    */
  private def openHttp(url: String): HttpURLConnection =
    (try URI.create(url).toURL.openConnection()
    catch { case e: IllegalArgumentException =>
      throw new IOException(s"malformed URL '$url'", e)
    }) match {
      case h: HttpURLConnection => h
      case other => throw new IOException(
        s"non-http(s) URL '$url' (${other.getClass.getSimpleName})")
    }

  /** The 8 KB chunk loop; returns bytes copied. */
  private def copyChunks(in: InputStream, out: OutputStream): Long = {
    val buf = new Array[Byte](HttpTransport.ChunkSize)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      total += n
      n = in.read(buf)
    }
    total
  }
}

object HttpTransport {
  /** The reference's streaming chunk size (download.py:29). */
  val ChunkSize = 8192

  /** Redirect hop bound — one shy of `requests`' default 30 would also be
    * fine; 5 covers every real http→https / trailing-slash / CDN chain
    * while keeping a redirect LOOP from spinning a crawl task for 30 RTTs.
    */
  val MaxRedirects = 5

  /** Bulk-download preset: 300 s, load_data.py:87. */
  def bulk: HttpTransport = new HttpTransport(300000)

  /** Sample-fetch preset: 120 s, load_data.py:415. */
  def sample: HttpTransport = new HttpTransport(120000)
}
