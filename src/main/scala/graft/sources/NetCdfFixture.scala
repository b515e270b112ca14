package graft.sources

import NetCdf._

/** Deterministic Argo-shaped NetCDF fleet fixture. Four per-float .nc files
  * in classic CDF-1 format with the naming/attr diversity the reference's
  * loader tolerates (ingest/load_data.py:239-264,318-326,357-368):
  *
  *   - even floats use uppercase Argo variable names (PLATFORM_NUMBER, JULD,
  *     PRES, ...) with `_FillValue` and "days since" time units;
  *   - odd floats use lowercase alternates (platform_number, time, pres, ...)
  *     with `missing_value` and "hours since" units;
  *   - float 2 stores PLATFORM_NUMBER as a fixed-width NC_CHAR array (the
  *     real Argo encoding), the others as numeric.
  *
  * All values come from an integer-exact closed form in (f, p, l) — binary
  * fractions only — so a DuckDB oracle can reproduce the decoded table from
  * `generate_series` with exact float equality (the same synthesis-recipe
  * oracle pattern the multimodal fixtures use).
  */
object NetCdfFixture {

  val N_FLOATS = 4
  val N_PROF = 6
  val N_LEVELS = 5
  val FILL = 99999.0f

  // closed form — mirrored verbatim in the s7_netcdf_decode oracle SQL
  def juldDays(f: Int, p: Int): Double = 26000.0 + f * 10 + p + 0.25
  def lat(f: Int, p: Int): Double = -60.0 + ((f * 7 + p * 3) % 120) + 0.5
  def lon(f: Int, p: Int): Double = -180.0 + ((f * 11 + p * 17) % 360) + 0.5
  def pres(f: Int, p: Int, l: Int): Float =
    if ((f + p + l) % 7 == 0) FILL else (l * 100 + p).toFloat
  def temp(f: Int, p: Int, l: Int): Float =
    if ((f * 3 + p + l * 2) % 11 == 0) FILL
    else (25.0 - 2 * l - ((f + p) % 5) * 0.5).toFloat
  def psal(f: Int, p: Int, l: Int): Float =
    if ((f + 2 * p + l) % 13 == 0) FILL
    else (34.0 + (l % 4) * 0.25 + ((f + p) % 3) * 0.125).toFloat

  /** Serialize float `f`'s profile file. `version` 1/2/5 selects the
    * classic container variant; CDF-5 additionally stores CYCLE_NUMBER as
    * NC_INT64 (the extended type real PnetCDF outputs use for counters).
    */
  def fileBytes(f: Int, version: Int = 1): Array[Byte] = {
    val upper = f % 2 == 0
    def nm(u: String, l: String) = if (upper) u else l
    val dims = Seq(NcDim("N_PROF", N_PROF), NcDim("N_LEVELS", N_LEVELS),
      NcDim("STRING8", 8))
    val fillAttr: Seq[(String, NcVal)] =
      if (upper) Seq("_FillValue" -> NcFloats(Array(FILL)))
      else Seq("missing_value" -> NcFloats(Array(FILL)))
    val timeUnits =
      if (upper) "days since 1950-01-01 00:00:00"
      else "hours since 1950-01-01 00:00:00"
    def timeVal(p: Int): Double =
      if (upper) juldDays(f, p) else juldDays(f, p) * 24.0

    val platform: NcVar =
      if (f == 2) {
        val chars = (0 until N_PROF).flatMap { _ =>
          (100 + f).toString.padTo(8, ' ').getBytes("UTF-8").toSeq
        }.toArray
        NcVar("PLATFORM_NUMBER", Seq(0, 2), NC_CHAR, Nil, NcChars(chars))
      } else NcVar(nm("PLATFORM_NUMBER", "platform_number"), Seq(0), NC_DOUBLE,
        Nil, NcDoubles(Array.fill(N_PROF)((100 + f).toDouble)))

    val cycle =
      if (version == 5)
        NcVar(nm("CYCLE_NUMBER", "cycle_number"), Seq(0), NC_INT64, Nil,
          NcLongs((0 until N_PROF).map(p => (1000 + p).toLong).toArray))
      else NcVar(nm("CYCLE_NUMBER", "cycle_number"), Seq(0), NC_INT, Nil,
        NcInts((0 until N_PROF).map(1000 + _).toArray))
    val vars = Seq(
      platform,
      cycle,
      NcVar(nm("JULD", "time"), Seq(0), NC_DOUBLE,
        Seq("units" -> NcStr(timeUnits)),
        NcDoubles((0 until N_PROF).map(timeVal).toArray)),
      NcVar(nm("LATITUDE", "latitude"), Seq(0), NC_DOUBLE, Nil,
        NcDoubles((0 until N_PROF).map(lat(f, _)).toArray)),
      NcVar(nm("LONGITUDE", "longitude"), Seq(0), NC_DOUBLE, Nil,
        NcDoubles((0 until N_PROF).map(lon(f, _)).toArray)),
      NcVar(nm("PRES", "pres"), Seq(0, 1), NC_FLOAT, fillAttr,
        NcFloats((for (p <- 0 until N_PROF; l <- 0 until N_LEVELS)
          yield pres(f, p, l)).toArray)),
      NcVar(nm("TEMP", "temp"), Seq(0, 1), NC_FLOAT, fillAttr,
        NcFloats((for (p <- 0 until N_PROF; l <- 0 until N_LEVELS)
          yield temp(f, p, l)).toArray)),
      NcVar(nm("PSAL", "psal"), Seq(0, 1), NC_FLOAT, fillAttr,
        NcFloats((for (p <- 0 until N_PROF; l <- 0 until N_LEVELS)
          yield psal(f, p, l)).toArray)))

    writeBytes(dims,
      Seq("title" -> NcStr(s"graft synthetic Argo float ${100 + f}")), vars,
      version = version)
  }

  /** Write the whole fleet (plus a `_SUCCESS` marker so the repo's
    * materialize-once cache treats the dir as complete).
    */
  def writeFleet(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    for (f <- 0 until N_FLOATS)
      java.nio.file.Files.write(p.resolve(s"float_${100 + f}.nc"), fileBytes(f))
    java.nio.file.Files.write(p.resolve("_SUCCESS"), Array.emptyByteArray)
  }

  // ---------------------------------------------- record-dimension variant

  /** Serialize float `f`'s profiles as a RECORD file: N_PROF is the
    * UNLIMITED dimension (size 0 in the dim list, numrecs = [[N_PROF]]),
    * so per-profile slabs interleave after the fixed data — the layout of
    * native per-float Argo profile files, vs the fixed-size ERDDAP
    * response shape of [[fileBytes]]. Same closed-form values at the same
    * (f, p, l), so the two encodings must tabularize identically modulo
    * the time units:
    *
    *   - even floats: uppercase names, `_FillValue`, units
    *     "days since 1950-01-01 00:00:00 UTC" (named-zone token);
    *   - odd floats: lowercase names, `missing_value`, units
    *     "hours since 1950-01-01 00:00:00 -02:00" — a real numeric-offset
    *     epoch, so every decoded instant shifts +2 h vs the closed form;
    *   - float f=4 stores PLATFORM_NUMBER as NC_CHAR over the record dim
    *     (char record slabs);
    *   - one fixed-size var (`DEPTH_INDEX`) rides along to exercise the
    *     mixed fixed-then-record data layout.
    */
  def recordFileBytes(f: Int, version: Int = 1): Array[Byte] = {
    val upper = f % 2 == 0
    def nm(u: String, l: String) = if (upper) u else l
    val dims = Seq(NcDim("N_PROF", 0), NcDim("N_LEVELS", N_LEVELS),
      NcDim("STRING8", 8))
    val fillAttr: Seq[(String, NcVal)] =
      if (upper) Seq("_FillValue" -> NcFloats(Array(FILL)))
      else Seq("missing_value" -> NcFloats(Array(FILL)))
    val timeUnits =
      if (upper) "days since 1950-01-01 00:00:00 UTC"
      else "hours since 1950-01-01 00:00:00 -02:00"
    def timeVal(p: Int): Double =
      if (upper) juldDays(f, p) else juldDays(f, p) * 24.0

    val platform: NcVar =
      if (f == 4) {
        val chars = (0 until N_PROF).flatMap { _ =>
          (100 + f).toString.padTo(8, ' ').getBytes("UTF-8").toSeq
        }.toArray
        NcVar("PLATFORM_NUMBER", Seq(0, 2), NC_CHAR, Nil, NcChars(chars))
      } else NcVar(nm("PLATFORM_NUMBER", "platform_number"), Seq(0), NC_DOUBLE,
        Nil, NcDoubles(Array.fill(N_PROF)((100 + f).toDouble)))

    val cycle =
      if (version == 5)
        NcVar(nm("CYCLE_NUMBER", "cycle_number"), Seq(0), NC_INT64, Nil,
          NcLongs((0 until N_PROF).map(p => (1000 + p).toLong).toArray))
      else NcVar(nm("CYCLE_NUMBER", "cycle_number"), Seq(0), NC_INT, Nil,
        NcInts((0 until N_PROF).map(1000 + _).toArray))
    val vars = Seq(
      NcVar(nm("DEPTH_INDEX", "depth_index"), Seq(1), NC_INT, Nil,
        NcInts((0 until N_LEVELS).toArray)), // fixed-size bystander
      platform,
      cycle,
      NcVar(nm("JULD", "time"), Seq(0), NC_DOUBLE,
        Seq("units" -> NcStr(timeUnits)),
        NcDoubles((0 until N_PROF).map(timeVal).toArray)),
      NcVar(nm("LATITUDE", "latitude"), Seq(0), NC_DOUBLE, Nil,
        NcDoubles((0 until N_PROF).map(lat(f, _)).toArray)),
      NcVar(nm("LONGITUDE", "longitude"), Seq(0), NC_DOUBLE, Nil,
        NcDoubles((0 until N_PROF).map(lon(f, _)).toArray)),
      NcVar(nm("PRES", "pres"), Seq(0, 1), NC_FLOAT, fillAttr,
        NcFloats((for (p <- 0 until N_PROF; l <- 0 until N_LEVELS)
          yield pres(f, p, l)).toArray)),
      NcVar(nm("TEMP", "temp"), Seq(0, 1), NC_FLOAT, fillAttr,
        NcFloats((for (p <- 0 until N_PROF; l <- 0 until N_LEVELS)
          yield temp(f, p, l)).toArray)),
      NcVar(nm("PSAL", "psal"), Seq(0, 1), NC_FLOAT, fillAttr,
        NcFloats((for (p <- 0 until N_PROF; l <- 0 until N_LEVELS)
          yield psal(f, p, l)).toArray)))

    writeBytes(dims,
      Seq("title" -> NcStr(s"graft synthetic Argo float ${100 + f} (record)")),
      vars, version = version, numrecs = N_PROF)
  }

  /** Write the record-dimension fleet: floats 104 (lowercase `.nc`) and
    * 105 (UPPERCASE `.NC` — the reference's scan accepts both suffixes).
    */
  def writeRecordFleet(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("rec_float_104.nc"), recordFileBytes(4))
    java.nio.file.Files.write(p.resolve("rec_float_105.NC"), recordFileBytes(5))
    java.nio.file.Files.write(p.resolve("_SUCCESS"), Array.emptyByteArray)
  }

  /** An upload inbox as a real crawl sees it: the healthy fixed-size fleet
    * PLUS a healthy HDF5-backed NetCDF-4 file (decodes since round 10) and
    * four poison files — a truncated classic header, a non-NetCDF payload,
    * a truncated HDF5 superblock (corrupt), and a VALID szip-filtered
    * NetCDF-4 container (beyond the read subset — must quarantine with the
    * distinct `unsupported-hdf5` status so an operator converts it instead
    * of discarding it). Drives the quarantine ledger
    * (`s10_netcdf_quarantine`): the scan must decode the healthy files and
    * account for the skips, never abort.
    */
  def writeQuarantineFleet(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    for (f <- 0 until N_FLOATS)
      java.nio.file.Files.write(p.resolve(s"float_${100 + f}.nc"), fileBytes(f))
    java.nio.file.Files.write(p.resolve("hdf5_float_108.nc"),
      hdf5FileBytes(8, charPlatform = true, zone = " UTC"))
    java.nio.file.Files.write(p.resolve("upload_truncated.nc"),
      fileBytes(0).take(40))
    java.nio.file.Files.write(p.resolve("upload_garbage.nc"),
      "not a netcdf container".getBytes("UTF-8"))
    java.nio.file.Files.write(p.resolve("upload_hdf5_truncated.nc"),
      hdf5FileBytes(8).take(60))
    java.nio.file.Files.write(p.resolve("upload_netcdf4.nc"), hdf5SzipBytes)
    java.nio.file.Files.write(p.resolve("_SUCCESS"), Array.emptyByteArray)
  }

  // ----------------------------------------------- HDF5 (netCDF-4) variant

  /** The shared fleet model (dims with REAL sizes + vars) for container
    * writers that don't use the CDF record encoding — the HDF5 twin of the
    * [[fileBytes]]/[[recordFileBytes]] recipe at the same (f, p, l) closed
    * form, so cross-container parity is exact by construction.
    */
  private[graft] def fleetVars(f: Int, charPlatform: Boolean, zone: String)
      : (Seq[NcDim], Seq[(String, NcVal)], Seq[NcVar]) = {
    val upper = f % 2 == 0
    def nm(u: String, l: String) = if (upper) u else l
    val dims = Seq(NcDim("N_PROF", N_PROF), NcDim("N_LEVELS", N_LEVELS),
      NcDim("STRING8", 8))
    val fillAttr: Seq[(String, NcVal)] =
      if (upper) Seq("_FillValue" -> NcFloats(Array(FILL)))
      else Seq("missing_value" -> NcFloats(Array(FILL)))
    val timeUnits =
      (if (upper) "days since 1950-01-01 00:00:00"
       else "hours since 1950-01-01 00:00:00") + zone
    def timeVal(p: Int): Double =
      if (upper) juldDays(f, p) else juldDays(f, p) * 24.0
    val platform: NcVar =
      if (charPlatform) {
        val chars = (0 until N_PROF).flatMap { _ =>
          (100 + f).toString.padTo(8, ' ').getBytes("UTF-8").toSeq
        }.toArray
        NcVar("PLATFORM_NUMBER", Seq(0, 2), NC_CHAR, Nil, NcChars(chars))
      } else NcVar(nm("PLATFORM_NUMBER", "platform_number"), Seq(0), NC_DOUBLE,
        Nil, NcDoubles(Array.fill(N_PROF)((100 + f).toDouble)))
    val vars = Seq(
      platform,
      NcVar(nm("CYCLE_NUMBER", "cycle_number"), Seq(0), NC_INT, Nil,
        NcInts((0 until N_PROF).map(1000 + _).toArray)),
      NcVar(nm("JULD", "time"), Seq(0), NC_DOUBLE,
        Seq("units" -> NcStr(timeUnits)),
        NcDoubles((0 until N_PROF).map(timeVal).toArray)),
      NcVar(nm("LATITUDE", "latitude"), Seq(0), NC_DOUBLE, Nil,
        NcDoubles((0 until N_PROF).map(lat(f, _)).toArray)),
      NcVar(nm("LONGITUDE", "longitude"), Seq(0), NC_DOUBLE, Nil,
        NcDoubles((0 until N_PROF).map(lon(f, _)).toArray)),
      NcVar(nm("PRES", "pres"), Seq(0, 1), NC_FLOAT, fillAttr,
        NcFloats((for (p <- 0 until N_PROF; l <- 0 until N_LEVELS)
          yield pres(f, p, l)).toArray)),
      NcVar(nm("TEMP", "temp"), Seq(0, 1), NC_FLOAT, fillAttr,
        NcFloats((for (p <- 0 until N_PROF; l <- 0 until N_LEVELS)
          yield temp(f, p, l)).toArray)),
      NcVar(nm("PSAL", "psal"), Seq(0, 1), NC_FLOAT, fillAttr,
        NcFloats((for (p <- 0 until N_PROF; l <- 0 until N_LEVELS)
          yield psal(f, p, l)).toArray)))
    (dims, Seq("title" -> NcStr(s"graft synthetic Argo float ${100 + f} (hdf5)")), vars)
  }

  /** Serialize float `f` as an HDF5-backed NetCDF-4 container — the format
    * modern Argo GDAC distributions ship — via [[Hdf5.writeBytes]].
    * `record` marks N_PROF UNLIMITED (forcing chunked storage, as real
    * HDF5 requires for extendable dims) with the shuffle+deflate pipeline;
    * `v2` uses the v2 superblock + link-message root group.
    */
  def hdf5FileBytes(f: Int, record: Boolean = false, v2: Boolean = false,
      charPlatform: Boolean = false, zone: String = "",
      denseAttrs: Boolean = false): Array[Byte] = {
    val (dims, gatts, vars) = fleetVars(f, charPlatform, zone)
    // `denseAttrs` turns on BOTH dense stores — attributes per var and the
    // root link index, the latter under an INDIRECT-rooted doubling-table
    // heap — the shape a real multi-variable netCDF-4 file has
    Hdf5.writeBytes(dims, gatts, vars, Hdf5.H5Opts(
      v2Superblock = v2,
      unlimited = if (record) Set("N_PROF") else Set.empty,
      denseAttrs = if (denseAttrs) vars.map(_.name).toSet else Set.empty,
      denseLinks = denseAttrs,
      denseIndirectLinks = denseAttrs))
  }

  /** The `s12_netcdf_hdf5` fleet: float 108 (v0 superblock, contiguous,
    * NC_CHAR platform id, "... UTC" zone token), float 109 (record layout —
    * UNLIMITED N_PROF, chunked + shuffle + deflate — lowercase alternates,
    * applied -02:00 epoch offset), float 110 (v2 superblock with
    * link-message root), float 111 (DENSE fractal-heap attribute storage —
    * _FillValue/units/DIMENSION_LIST all flow from the heap). Same closed
    * form as every other fleet.
    */
  def writeHdf5Fleet(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("hdf5_float_108.nc"),
      hdf5FileBytes(8, charPlatform = true, zone = " UTC"))
    java.nio.file.Files.write(p.resolve("hdf5_float_109.nc"),
      hdf5FileBytes(9, record = true, zone = " -02:00"))
    java.nio.file.Files.write(p.resolve("hdf5_float_110.nc"),
      hdf5FileBytes(10, v2 = true))
    java.nio.file.Files.write(p.resolve("hdf5_float_111.nc"),
      hdf5FileBytes(11, denseAttrs = true))
    java.nio.file.Files.write(p.resolve("_SUCCESS"), Array.emptyByteArray)
  }

  /** Serialize float `f` as an ENHANCED-model netCDF-4 container: the
    * measurement vars (pres/temp/psal) live in an `obs` SUBGROUP while the
    * coordinates and dimension scales stay in the root — the split shape
    * group-organized oceanographic products ship. Same closed form as
    * every other fleet; the group topology is the only variable under
    * test. The reader surfaces members as `obs/PRES` and alias-resolves by
    * basename, so tabularization is identical to the flat twin.
    */
  def hdf5GroupFileBytes(f: Int, vlenPlatform: Boolean = false): Array[Byte] = {
    val (dims, gatts, vars) = fleetVars(f, charPlatform = vlenPlatform, zone = "")
    val meas = vars.map(_.name)
      .filter(n => Set("pres", "temp", "psal").contains(n.toLowerCase))
    Hdf5.writeBytes(dims, gatts, vars, Hdf5.H5Opts(
      subgroups = Map("obs" -> meas),
      // netCDF4-python's default string-variable encoding: NC_STRING
      // (vlen) platform ids, resolved through the global heap
      vlenStrVars = if (vlenPlatform) Set("PLATFORM_NUMBER") else Set.empty))
  }

  /** The `s13_hdf5_groups` fleet: float 112 (uppercase names, `_FillValue`,
    * "days since" units), float 113 (lowercase alternates,
    * `missing_value`, "hours since" units), and float 114 (NC_STRING vlen
    * platform ids — netCDF4-python's string-variable encoding), all with
    * the measurements in an `obs` subgroup — the fill/alias machinery must
    * work THROUGH the group prefix on both naming arms, and the string
    * decode through the global heap.
    */
  def writeHdf5GroupFleet(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("hdf5_float_112.nc"),
      hdf5GroupFileBytes(12))
    java.nio.file.Files.write(p.resolve("hdf5_float_113.nc"),
      hdf5GroupFileBytes(13))
    java.nio.file.Files.write(p.resolve("hdf5_float_114.nc"),
      hdf5GroupFileBytes(14, vlenPlatform = true))
    java.nio.file.Files.write(p.resolve("_SUCCESS"), Array.emptyByteArray)
  }

  /** A VALID-but-beyond-subset HDF5 container: declares the szip filter
    * (publicly registered id 4, not implementable with the JDK alone) on
    * its data — must triage as `unsupported-hdf5`, not `corrupt`.
    */
  def hdf5SzipBytes: Array[Byte] = {
    val (dims, gatts, vars) = fleetVars(8, charPlatform = false, zone = "")
    Hdf5.writeBytes(dims, gatts, vars, Hdf5.H5Opts(szipVar = Some("PRES")))
  }

  // --------------------------------------------------------- CDF-5 variant

  /** The CDF-5 (PnetCDF 64-bit data) pair for `s11_netcdf_cdf5`: float 106
    * in record layout (UNLIMITED N_PROF, named-zone epoch token, NC_INT64
    * cycle counter) and float 107 fixed-size (lowercase alternates, "hours
    * since" units, NC_INT64 cycle counter). Same closed form as the other
    * fleets at the same (f, p, l) — the container encoding is the ONLY
    * variable under test.
    */
  def writeCdf5Fleet(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("cdf5_float_106.nc"),
      recordFileBytes(6, version = 5))
    java.nio.file.Files.write(p.resolve("cdf5_float_107.nc"),
      fileBytes(7, version = 5))
    java.nio.file.Files.write(p.resolve("_SUCCESS"), Array.emptyByteArray)
  }
}
