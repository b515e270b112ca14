package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal NetCDF classic (CDF-1) container support, pure Scala.
  *
  * The reference ingests Argo profile data from NetCDF files via xarray
  * (ingest/load_data.py:201-224) and tabularizes them with an alias table,
  * fill-value nulling, and "days/hours since epoch" time decode
  * (ingest/load_data.py:226-375). This module re-expresses that as a
  * Spark-native source: the CDF-1 binary format itself is parsed with a
  * ~150-line reader (the classic format is a flat big-endian header + data
  * spec), and files fan out across executors through Spark's `binaryFile`
  * source — one task per file, O(file) memory, which matches the real
  * corpus shape (Argo publishes millions of small per-float .nc files; a
  * 100 TB sweep is file-parallel, not row-parallel, at the container
  * level).
  *
  * Scope: classic format (magic CDF\x01), fixed-size variables only (no
  * record dimension) — exactly the shape of ERDDAP tabledap .nc responses
  * the reference downloads. Types: NC_BYTE/CHAR/SHORT/INT/FLOAT/DOUBLE.
  */
object NetCdf {

  // nc_type tags (NetCDF classic spec)
  val NC_BYTE = 1; val NC_CHAR = 2; val NC_SHORT = 3
  val NC_INT = 4; val NC_FLOAT = 5; val NC_DOUBLE = 6

  private val TAG_DIM = 0x0A
  private val TAG_VAR = 0x0B
  private val TAG_ATT = 0x0C

  final case class NcDim(name: String, size: Int)

  /** Attribute / data value container for the writer. */
  sealed trait NcVal
  final case class NcStr(s: String) extends NcVal
  final case class NcFloats(a: Array[Float]) extends NcVal
  final case class NcDoubles(a: Array[Double]) extends NcVal
  final case class NcInts(a: Array[Int]) extends NcVal
  final case class NcChars(a: Array[Byte]) extends NcVal

  final case class NcVar(
      name: String, dimIds: Seq[Int], ncType: Int,
      attrs: Seq[(String, NcVal)], data: NcVal)

  // ------------------------------------------------------------------ writer

  private def typeSize(t: Int): Int = t match {
    case NC_BYTE | NC_CHAR => 1; case NC_SHORT => 2
    case NC_INT | NC_FLOAT => 4; case NC_DOUBLE => 8
  }

  private def pad4(n: Int): Int = (n + 3) & ~3

  private def putName(b: ByteBuffer, s: String): Unit = {
    val bytes = s.getBytes("UTF-8")
    b.putInt(bytes.length); b.put(bytes)
    var i = bytes.length
    while (i % 4 != 0) { b.put(0.toByte); i += 1 }
  }

  private def putAttrVal(b: ByteBuffer, v: NcVal): Unit = v match {
    case NcStr(s) =>
      val bytes = s.getBytes("UTF-8")
      b.putInt(NC_CHAR); b.putInt(bytes.length); b.put(bytes)
      var i = bytes.length; while (i % 4 != 0) { b.put(0.toByte); i += 1 }
    case NcFloats(a) => b.putInt(NC_FLOAT); b.putInt(a.length); a.foreach(b.putFloat)
    case NcDoubles(a) => b.putInt(NC_DOUBLE); b.putInt(a.length); a.foreach(b.putDouble)
    case NcInts(a) => b.putInt(NC_INT); b.putInt(a.length); a.foreach(b.putInt)
    case NcChars(a) =>
      b.putInt(NC_CHAR); b.putInt(a.length); b.put(a)
      var i = a.length; while (i % 4 != 0) { b.put(0.toByte); i += 1 }
  }

  private def attrListSize(attrs: Seq[(String, NcVal)]): Int =
    if (attrs.isEmpty) 8
    else 8 + attrs.map { case (n, v) =>
      val nameSz = 4 + pad4(n.getBytes("UTF-8").length)
      val valSz = v match {
        case NcStr(s) => 8 + pad4(s.getBytes("UTF-8").length)
        case NcFloats(a) => 8 + a.length * 4
        case NcDoubles(a) => 8 + a.length * 8
        case NcInts(a) => 8 + a.length * 4
        case NcChars(a) => 8 + pad4(a.length)
      }
      nameSz + valSz
    }.sum

  private def putAttrList(b: ByteBuffer, attrs: Seq[(String, NcVal)]): Unit =
    if (attrs.isEmpty) { b.putInt(0); b.putInt(0) }
    else {
      b.putInt(TAG_ATT); b.putInt(attrs.length)
      attrs.foreach { case (n, v) => putName(b, n); putAttrVal(b, v) }
    }

  /** Serialize a classic file. Fixed-size vars only (numrecs = 0).
    * `version` 1 = CDF-1 (32-bit data offsets), 2 = CDF-2 (64-bit offsets —
    * the format variant real >2 GiB Argo aggregates ship in).
    */
  def writeBytes(
      dims: Seq[NcDim], globalAttrs: Seq[(String, NcVal)],
      vars: Seq[NcVar], version: Int = 1): Array[Byte] = {
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    def dataCount(v: NcVar): Int =
      v.dimIds.map(dims(_).size.toLong).product.toInt.max(1)
    def vsize(v: NcVar): Int = pad4(dataCount(v) * typeSize(v.ncType))
    val beginSz = if (version == 2) 8 else 4

    val dimListSz =
      if (dims.isEmpty) 8
      else 8 + dims.map(d => 4 + pad4(d.name.getBytes("UTF-8").length) + 4).sum
    val varHdrSz = vars.map { v =>
      4 + pad4(v.name.getBytes("UTF-8").length) + 4 + v.dimIds.length * 4 +
        attrListSize(v.attrs) + 4 + 4 + beginSz // nc_type, vsize, begin
    }.sum
    val headerSz = 4 + 4 + dimListSz + attrListSize(globalAttrs) +
      (if (vars.isEmpty) 8 else 8 + varHdrSz)

    val begins = vars.scanLeft(headerSz)((off, v) => off + vsize(v)).init
    val total = headerSz + vars.map(vsize).sum
    val b = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)

    b.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(version.toByte)
    b.putInt(0) // numrecs
    if (dims.isEmpty) { b.putInt(0); b.putInt(0) }
    else {
      b.putInt(TAG_DIM); b.putInt(dims.length)
      dims.foreach { d => putName(b, d.name); b.putInt(d.size) }
    }
    putAttrList(b, globalAttrs)
    if (vars.isEmpty) { b.putInt(0); b.putInt(0) }
    else {
      b.putInt(TAG_VAR); b.putInt(vars.length)
      vars.zip(begins).foreach { case (v, begin) =>
        putName(b, v.name)
        b.putInt(v.dimIds.length); v.dimIds.foreach(b.putInt)
        putAttrList(b, v.attrs)
        b.putInt(v.ncType); b.putInt(vsize(v))
        if (version == 2) b.putLong(begin.toLong) else b.putInt(begin)
      }
    }
    vars.foreach { v =>
      val start = b.position()
      v.data match {
        case NcFloats(a) => a.foreach(b.putFloat)
        case NcDoubles(a) => a.foreach(b.putDouble)
        case NcInts(a) => a.foreach(b.putInt)
        case NcChars(a) => b.put(a)
        case NcStr(s) => b.put(s.getBytes("UTF-8"))
      }
      while ((b.position() - start) % 4 != 0) b.put(0.toByte)
    }
    b.array()
  }

  def writeFile(path: String, dims: Seq[NcDim],
      globalAttrs: Seq[(String, NcVal)], vars: Seq[NcVar]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      writeBytes(dims, globalAttrs, vars))

  // ------------------------------------------------------------------ parser

  /** A parsed variable: dims resolved, numeric data widened to Double
    * (NC_CHAR kept as raw bytes for string assembly).
    */
  final case class ParsedVar(
      name: String, dims: Seq[NcDim], ncType: Int,
      attrs: Map[String, Any], numeric: Array[Double], chars: Array[Byte])

  final case class ParsedFile(
      dims: Seq[NcDim], globalAttrs: Map[String, Any], vars: Seq[ParsedVar])

  private def readName(b: ByteBuffer): String = {
    val n = b.getInt
    val bytes = new Array[Byte](n); b.get(bytes)
    var i = n; while (i % 4 != 0) { b.get(); i += 1 }
    new String(bytes, "UTF-8")
  }

  private def readAttrVal(b: ByteBuffer): Any = {
    val t = b.getInt; val n = b.getInt
    t match {
      case NC_CHAR =>
        val bytes = new Array[Byte](n); b.get(bytes)
        var i = n; while (i % 4 != 0) { b.get(); i += 1 }
        new String(bytes, "UTF-8")
      case NC_BYTE =>
        val a = Array.fill(n)(b.get().toDouble)
        var i = n; while (i % 4 != 0) { b.get(); i += 1 }; a
      case NC_SHORT =>
        val a = Array.fill(n)(b.getShort.toDouble)
        var i = n * 2; while (i % 4 != 0) { b.get(); i += 1 }; a
      case NC_INT => Array.fill(n)(b.getInt.toDouble)
      case NC_FLOAT => Array.fill(n)(b.getFloat.toDouble)
      case NC_DOUBLE => Array.fill(n)(b.getDouble)
    }
  }

  private def readAttrList(b: ByteBuffer): Map[String, Any] = {
    val tag = b.getInt; val n = b.getInt
    if (tag == 0 || n == 0) Map.empty
    else (0 until n).map(_ => readName(b) -> readAttrVal(b)).toMap
  }

  def parse(bytes: Array[Byte]): ParsedFile = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val magic = Array(b.get(), b.get(), b.get())
    require(magic.sameElements("CDF".getBytes), "not a NetCDF classic file")
    val version = b.get()
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    b.getInt // numrecs (0 for fixed-size-only files)

    val dimTag = b.getInt; val nDims = b.getInt
    val dims =
      if (dimTag == 0) Seq.empty
      else (0 until nDims).map(_ => NcDim(readName(b), b.getInt))

    val gatts = readAttrList(b)

    val varTag = b.getInt; val nVars = b.getInt
    val headers =
      if (varTag == 0) Seq.empty
      else (0 until nVars).map { _ =>
        val name = readName(b)
        val nd = b.getInt
        val dimIds = (0 until nd).map(_ => b.getInt)
        val attrs = readAttrList(b)
        val t = b.getInt; val vsize = b.getInt
        val begin = if (version == 2) b.getLong else b.getInt.toLong
        (name, dimIds, attrs, t, vsize, begin)
      }

    val vars = headers.map { case (name, dimIds, attrs, t, _, begin) =>
      val vdims = dimIds.map(dims(_))
      val count = vdims.map(_.size.toLong).product.toInt.max(1)
      val d = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      d.position(begin.toInt)
      t match {
        case NC_CHAR =>
          val raw = new Array[Byte](count); d.get(raw)
          ParsedVar(name, vdims, t, attrs, Array.empty, raw)
        case _ =>
          val a = new Array[Double](count)
          var i = 0
          while (i < count) {
            a(i) = t match {
              case NC_BYTE => d.get().toDouble
              case NC_SHORT => d.getShort.toDouble
              case NC_INT => d.getInt.toDouble
              case NC_FLOAT => d.getFloat.toDouble
              case NC_DOUBLE => d.getDouble
            }
            i += 1
          }
          ParsedVar(name, vdims, t, attrs, a, Array.empty)
      }
    }
    ParsedFile(dims, gatts, vars)
  }

  // ------------------------------------------------- Argo tabularization

  /** One tabular (profile, level) observation row. */
  final case class ProfileLevel(
      float_id: String, profile_id: Long, level: Long,
      ts: Option[java.sql.Timestamp], lat: Option[Double], lon: Option[Double],
      pres: Option[Double], temp: Option[Double], psal: Option[Double])

  /** The reference's variable alias table (ingest/load_data.py:239-250),
    * matched case-insensitively (it also probes lower/upper/title variants,
    * load_data.py:259-264).
    */
  private val aliases: Map[String, Seq[String]] = Map(
    "float_id" -> Seq("platform_number", "float_serial_no", "wmo_inst_type"),
    "profile_id" -> Seq("cycle_number", "profile_number"),
    "time" -> Seq("time", "juld", "reference_date_time", "date_time"),
    "latitude" -> Seq("latitude", "lat", "position_latitude"),
    "longitude" -> Seq("longitude", "lon", "position_longitude"),
    "pressure" -> Seq("pres", "pressure", "pres_adjusted"),
    "temperature" -> Seq("temp", "temperature", "temp_adjusted"),
    "salinity" -> Seq("psal", "salinity", "psal_adjusted"))

  private def resolve(f: ParsedFile, field: String): Option[ParsedVar] = {
    val names = aliases(field)
    names.iterator
      .flatMap(a => f.vars.find(_.name.equalsIgnoreCase(a)))
      .nextOption()
  }

  /** Fill-value nulling: _FillValue wins over missing_value
    * (load_data.py:320-326); NaN is null either way.
    */
  private def cleanValue(v: ParsedVar, x: Double): Option[Double] = {
    val fill = v.attrs.get("_FillValue").orElse(v.attrs.get("missing_value"))
    val isFill = fill match {
      case Some(a: Array[Double]) if a.nonEmpty => x == a(0)
      case Some(d: Double) => x == d
      case _ => false
    }
    if (isFill || x.isNaN) None else Some(x)
  }

  /** Decode a time value per its `units` attribute — "days since <epoch>" /
    * "hours since <epoch>" (load_data.py:357-368). Returns micros since
    * 1970-01-01T00:00:00Z.
    */
  private[graft] def decodeTimeMicros(units: String, value: Double): Long = {
    val u = units.toLowerCase.trim
    val (scaleMicros, rest) =
      if (u.startsWith("days since")) (86400000000.0, u.stripPrefix("days since").trim)
      else if (u.startsWith("hours since")) (3600000000.0, u.stripPrefix("hours since").trim)
      else if (u.startsWith("seconds since")) (1000000.0, u.stripPrefix("seconds since").trim)
      else throw new IllegalArgumentException(s"unsupported time units: $units")
    val epochStr = rest.takeWhile(c => c != 'Z' && c != '+').trim
    val ld =
      if (epochStr.contains(" ") || epochStr.contains("T"))
        java.time.LocalDateTime.parse(epochStr.replace(' ', 'T'))
      else java.time.LocalDate.parse(epochStr).atStartOfDay()
    val epochMicros = ld.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    epochMicros + (value * scaleMicros).round
  }

  /** NC_CHAR variables hold fixed-width strings: a (N, STRLEN) char array is
    * N trimmed strings (the trailing dim is the string width).
    */
  private def charStrings(v: ParsedVar): Array[String] = {
    val width = if (v.dims.length >= 2) v.dims.last.size else v.chars.length
    v.chars.grouped(width.max(1))
      .map(g => new String(g, "UTF-8").trim.stripSuffix(" ").trim)
      .toArray
  }

  /** Numeric float ids print as integers when integral — the reference's
    * str(int(value)) conversion (load_data.py:278-289); NaN → "unknown".
    */
  private def floatIdString(x: Double): String =
    if (x.isNaN) "unknown"
    else if (x == math.rint(x)) x.toLong.toString
    else x.toString

  /** Tabularize one parsed file: 2D (profile × level) measurement arrays
    * explode to one row per (profile, level); 1D per-profile vars broadcast
    * across that profile's levels.
    */
  def tabularize(f: ParsedFile): Seq[ProfileLevel] = {
    val pres = resolve(f, "pressure")
    val temp = resolve(f, "temperature")
    val psal = resolve(f, "salinity")
    // Profile/level extents come from the first 2D measurement var; an
    // all-1D file (ERDDAP tabledap flat response) degenerates to 1 level.
    val shape2d = Seq(pres, temp, psal).flatten.find(_.dims.length == 2)
    val (nProf, nLev) = shape2d match {
      case Some(v) => (v.dims(0).size, v.dims(1).size)
      case None =>
        val n = Seq(pres, temp, psal).flatten.headOption
          .orElse(resolve(f, "time"))
          .map(v => v.dims.headOption.map(_.size).getOrElse(1)).getOrElse(0)
        (n, 1)
    }

    val floatIds: Int => String = resolve(f, "float_id") match {
      case Some(v) if v.ncType == NC_CHAR =>
        val s = charStrings(v); p => if (p < s.length) s(p) else "unknown"
      case Some(v) => p => floatIdString(v.numeric(p))
      case None => _ => "unknown"
    }
    val profIds: Int => Long = resolve(f, "profile_id") match {
      case Some(v) => p => v.numeric(p).toLong
      case None => p => p.toLong
    }
    val times: Int => Option[java.sql.Timestamp] = resolve(f, "time") match {
      case Some(v) =>
        val units = v.attrs.get("units").collect { case s: String => s }
        p => cleanValue(v, v.numeric(p)).map { x =>
          val micros = units match {
            case Some(u) => decodeTimeMicros(u, x)
            case None => (x * 1000000.0).round // already epoch seconds
          }
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            micros / 1000000L, (micros % 1000000L) * 1000L))
        }
      case None => _ => None
    }
    def oneD(ov: Option[ParsedVar]): Int => Option[Double] = ov match {
      case Some(v) => p => cleanValue(v, v.numeric(p))
      case None => _ => None
    }
    val lats = oneD(resolve(f, "latitude"))
    val lons = oneD(resolve(f, "longitude"))
    def twoD(ov: Option[ParsedVar]): (Int, Int) => Option[Double] = ov match {
      case Some(v) if v.dims.length == 2 =>
        (p, l) => cleanValue(v, v.numeric(p * nLev + l))
      case Some(v) => (p, l) => if (l == 0) cleanValue(v, v.numeric(p)) else None
      case None => (_, _) => None
    }
    val presF = twoD(pres); val tempF = twoD(temp); val psalF = twoD(psal)

    for (p <- 0 until nProf; l <- 0 until nLev) yield ProfileLevel(
      floatIds(p), profIds(p), l.toLong,
      times(p), lats(p), lons(p), presF(p, l), tempF(p, l), psalF(p, l))
  }

  /** One container-metadata row: a dimension or a variable of one file. */
  final case class InspectRow(
      file: String, kind: String, name: String,
      dtype: Option[String], shape: String, n_attrs: Long)

  private def typeName(t: Int): String = t match {
    case NC_BYTE => "byte"; case NC_CHAR => "char"; case NC_SHORT => "short"
    case NC_INT => "int"; case NC_FLOAT => "float"; case NC_DOUBLE => "double"
  }

  /** Schema inspection from container bytes — the reference's
    * `inspect_netcdf_file` report (ingest/load_data.py:158-199: dims with
    * sizes, variables with dtype/shape/attr counts) as a DataFrame, one
    * task per file like [[read]].
    */
  def inspect(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.nc").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val file = p.substring(p.lastIndexOf('/') + 1)
        val f = parse(bytes)
        f.dims.map(d =>
          InspectRow(file, "dim", d.name, None, d.size.toString, 0L)) ++
          f.vars.map(v => InspectRow(file, "var", v.name,
            Some(typeName(v.ncType)), v.dims.map(_.size).mkString("x"),
            v.attrs.size.toLong))
      }
      .toDF()
  }

  /** Distributed read: every .nc file under `path` becomes one task's worth
    * of parse work via Spark's binaryFile source; rows fan out from
    * `flatMap`. File-parallel is the right unit for the Argo corpus (many
    * small per-float files); parsing is a single linear pass over the
    * file's bytes.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    read(spark, path, tolerant = false)

  /** As [[read]]; with `tolerant = true` files that fail to parse are
    * skipped instead of failing the job — the reference loader's behavior
    * (`load_netcdf_file` catches, logs, and returns None,
    * ingest/load_data.py:222-224). At corpus scale one truncated upload
    * must not kill a million-file scan; pair with [[inspect]] to audit
    * what was skipped.
    */
  def read(spark: SparkSession, path: String, tolerant: Boolean): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.nc").load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        if (!tolerant) tabularize(parse(bytes))
        else try tabularize(parse(bytes))
        catch { case _: Exception => Seq.empty[ProfileLevel] }
      }
      .toDF()
  }
}
