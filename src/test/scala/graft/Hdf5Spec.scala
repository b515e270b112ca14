package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Hdf5, NetCdf, NetCdfFixture}
import graft.sources.NetCdf.{NcDim, NetCdfParseException}

/** The HDF5-backed NetCDF-4 read path (round 10). The contract: an HDF5
  * container serialized from the same fleet model as a classic CDF file
  * must tabularize IDENTICALLY — the container encoding is the only
  * variable — and beyond-subset features triage as `unsupported-hdf5`
  * while malformed bytes triage as `corrupt`, with allocation-bounded
  * parsing under fuzz (the CDF parser's quarantine contract).
  */
class Hdf5Spec extends AnyFunSuite {

  private def cdfTwin(f: Int, zone: String, charPlatform: Boolean): Array[Byte] = {
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(f, charPlatform, zone)
    NetCdf.writeBytes(dims, gatts, vars, version = 1)
  }

  test("jenkins lookup3 matches the published test vector") {
    // hashlittle("Four score and seven years ago", 0) from Bob Jenkins'
    // lookup3.c self-test (public domain reference implementation).
    assert(Hdf5.lookup3("Four score and seven years ago".getBytes("US-ASCII")) === 0x17770551)
    assert(Hdf5.lookup3(Array.emptyByteArray) === 0xdeadbeef)
  }

  test("v0 superblock contiguous file tabularizes identically to its CDF twin") {
    val h5 = NetCdfFixture.hdf5FileBytes(8, zone = " UTC")
    val cdf = cdfTwin(8, " UTC", charPlatform = false)
    assert(NetCdf.tabularize(NetCdf.parse(h5)) === NetCdf.tabularize(NetCdf.parse(cdf)))
  }

  test("NC_CHAR platform ids decode from HDF5 string-typed datasets") {
    val h5 = NetCdfFixture.hdf5FileBytes(8, charPlatform = true, zone = " UTC")
    val rows = NetCdf.tabularize(NetCdf.parse(h5))
    assert(rows.nonEmpty)
    assert(rows.forall(_.float_id == "108"))
    val cdf = cdfTwin(8, " UTC", charPlatform = true)
    assert(rows === NetCdf.tabularize(NetCdf.parse(cdf)))
  }

  test("chunked + shuffle + deflate record file decodes and flags the record dim") {
    val h5 = NetCdfFixture.hdf5FileBytes(9, record = true, zone = " -02:00")
    val parsed = NetCdf.parse(h5)
    assert(parsed.recordDim === Some("N_PROF"))
    val cdf = cdfTwin(9, " -02:00", charPlatform = false)
    assert(NetCdf.tabularize(parsed) === NetCdf.tabularize(NetCdf.parse(cdf)))
  }

  test("v2 superblock with link-message root tabularizes identically") {
    val h5 = NetCdfFixture.hdf5FileBytes(10, v2 = true)
    val cdf = cdfTwin(10, "", charPlatform = false)
    assert(NetCdf.tabularize(NetCdf.parse(h5)) === NetCdf.tabularize(NetCdf.parse(cdf)))
  }

  test("nested groups: members surface as obs/VAR and tabularize like the flat twin") {
    val parsed = NetCdf.parse(NetCdfFixture.hdf5GroupFileBytes(12))
    assert(parsed.vars.map(_.name).toSet ===
      Set("PLATFORM_NUMBER", "CYCLE_NUMBER", "JULD", "LATITUDE", "LONGITUDE",
        "obs/PRES", "obs/TEMP", "obs/PSAL"))
    assert(NetCdf.tabularize(parsed) ===
      NetCdf.tabularize(NetCdf.parse(cdfTwin(12, "", charPlatform = false))))
    // lowercase arm: missing_value + "hours since" resolve through the prefix
    assert(NetCdf.tabularize(NetCdf.parse(NetCdfFixture.hdf5GroupFileBytes(13))) ===
      NetCdf.tabularize(NetCdf.parse(cdfTwin(13, "", charPlatform = false))))
  }

  test("NC_STRING (vlen) platform ids decode and tabularize like the char-matrix twin") {
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(14, charPlatform = true, zone = "")
    val h5 = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(vlenStrVars = Set("PLATFORM_NUMBER")))
    val rows = NetCdf.tabularize(NetCdf.parse(h5))
    assert(rows.nonEmpty && rows.forall(_.float_id == "114"))
    assert(rows === NetCdf.tabularize(NetCdf.parse(cdfTwin(14, "", charPlatform = true))))
    // combined with subgroups (the s13 float-114 shape)
    val grouped = NetCdf.parse(NetCdfFixture.hdf5GroupFileBytes(14, vlenPlatform = true))
    assert(NetCdf.tabularize(grouped) === rows)
  }

  test("chunked (unlimited-dim) NC_STRING platform ids decode like the char twin") {
    // netCDF-4's REAL shape for string vars over the record dim: vlen
    // descriptors in UNFILTERED chunks (vlen refuses compression), the
    // numeric record vars chunked+shuffle+deflate alongside
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(14, charPlatform = true, zone = "")
    val h5 = Hdf5.writeBytes(dims, gatts, vars, Hdf5.H5Opts(
      unlimited = Set("N_PROF"),
      vlenStrVars = Set("PLATFORM_NUMBER")))
    val parsed = NetCdf.parse(h5)
    assert(parsed.recordDim === Some("N_PROF"))
    assert(NetCdf.tabularize(parsed) ===
      NetCdf.tabularize(NetCdf.parse(cdfTwin(14, "", charPlatform = true))))
  }

  test("vlen strings of width <= 1 keep their synthetic width dim") {
    import graft.sources.NetCdf.{NcVar, NcChars}
    // all-1-char values (QC-flag shape): the normalized width floors at 1,
    // and the width dim must STILL be appended — dropping it would make
    // row 0 swallow every element's chars downstream (charStrings uses
    // chars.length as the width for 1-D char vars)
    val dims = Seq(NcDim("N", 4), NcDim("STRING8", 8))
    // row 1 is the EMPTY string: a zero-length heap object must decode as
    // "" (all-zero padded row), not fail or shift later rows
    val flat = Seq("A", "", "C", "D").flatMap(_.padTo(8, ' ')).map(_.toByte).toArray
    val v = NcVar("FLAG", Seq(0, 1), NetCdf.NC_CHAR, Nil, NcChars(flat))
    val bytes = Hdf5.writeBytes(dims, Nil, Seq(v),
      Hdf5.H5Opts(vlenStrVars = Set("FLAG")))
    val flag = NetCdf.parse(bytes).vars.find(_.name == "FLAG").get
    assert(flag.dims.map(_.name) === Seq("N", "STRING1"))
    assert(new String(flag.chars, "US-ASCII") === "A\u0000CD")
  }

  test("group hard-link cycle triages as unsupported-hdf5, never loops") {
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(12, charPlatform = false, zone = "")
    val bytes = Hdf5.writeBytes(dims, gatts, vars, Hdf5.H5Opts(
      subgroups = Map("obs" -> Seq("PRES", "TEMP", "PSAL")),
      groupCycleIn = Some("obs")))
    val e = intercept[NetCdfParseException](NetCdf.parse(bytes))
    assert(e.kind === "unsupported-hdf5")
    assert(e.getMessage.contains("re-visits"))
  }

  test("group nesting depth: the cap parses, one past it triages") {
    def chained(n: Int): Array[Byte] = {
      val (dims, gatts, vars) = NetCdfFixture.fleetVars(12, charPlatform = false, zone = "")
      Hdf5.writeBytes(dims, gatts, vars, Hdf5.H5Opts(nestChain = n))
    }
    assert(NetCdf.tabularize(NetCdf.parse(chained(8))).nonEmpty)
    val e = intercept[NetCdfParseException](NetCdf.parse(chained(9)))
    assert(e.kind === "unsupported-hdf5")
    assert(e.getMessage.contains("nesting"))
  }

  test("dims carry _Netcdf4Dimid order and global attrs survive") {
    val parsed = NetCdf.parse(NetCdfFixture.hdf5FileBytes(8))
    assert(parsed.dims === Seq(NcDim("N_PROF", 6), NcDim("N_LEVELS", 5), NcDim("STRING8", 8)))
    assert(parsed.globalAttrs.get("title").exists(_.toString.contains("float 108")))
    // phony dim scales must NOT surface as variables
    assert(!parsed.vars.exists(_.name == "N_PROF"))
    assert(parsed.vars.map(_.name).toSet ===
      Set("PLATFORM_NUMBER", "CYCLE_NUMBER", "JULD", "LATITUDE", "LONGITUDE",
        "PRES", "TEMP", "PSAL"))
  }

  test("szip-filtered container triages as unsupported-hdf5, not corrupt") {
    val e = intercept[NetCdfParseException](NetCdf.parse(NetCdfFixture.hdf5SzipBytes))
    assert(e.kind === "unsupported-hdf5")
    assert(e.getMessage.contains("filter"))
  }

  test("truncated superblock triages as corrupt") {
    val e = intercept[NetCdfParseException](
      NetCdf.parse(NetCdfFixture.hdf5FileBytes(8).take(60)))
    assert(e.kind === "corrupt")
  }

  test("fuzz: corrupted HDF5 containers parse or throw NetCdfParseException, nothing else") {
    // Same quarantine contract as the CDF fuzz pass: tolerant reads catch
    // EXACTLY NetCdfParseException, so hostile bytes must never surface as
    // OOM-sized allocations, raw underflows, NPEs, or infinite loops.
    val rnd = new scala.util.Random(4242)
    // default 300 mutation rounds per base; GRAFT_FUZZ_N raises the budget
    // for one-off deep sessions (same seed → the default prefix is
    // reproduced, the extension explores further)
    val fuzzN = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(300)
    val (fDims, fGatts, fVars) = NetCdfFixture.fleetVars(8, charPlatform = false, zone = "")
    val bases = Seq(
      NetCdfFixture.hdf5FileBytes(8, charPlatform = true, zone = " UTC"),
      NetCdfFixture.hdf5FileBytes(9, record = true, zone = " -02:00"),
      NetCdfFixture.hdf5FileBytes(10, v2 = true),
      Hdf5.writeBytes(fDims, fGatts, fVars, Hdf5.H5Opts(
        compactVars = Set("LATITUDE"), fletcher = true,
        unlimited = Set("N_PROF"), vlenTitle = true)),
      Hdf5.writeBytes(fDims, fGatts, fVars, Hdf5.H5Opts(
        denseAttrs = fVars.map(_.name).toSet)),
      Hdf5.writeBytes(fDims, fGatts, fVars, Hdf5.H5Opts(
        denseLinks = true, denseIndirectLinks = true,
        denseAttrs = Set("PRES", "TEMP"))),
      NetCdfFixture.hdf5GroupFileBytes(12),
      NetCdfFixture.hdf5GroupFileBytes(14, vlenPlatform = true))
    def check(bytes: Array[Byte], tag: String): Unit =
      try { NetCdf.parse(bytes); () }
      catch {
        case _: NetCdfParseException => ()
        case e: Throwable =>
          fail(s"$tag leaked ${e.getClass.getName}: ${e.getMessage}")
      }
    for (base <- bases) {
      for (len <- Seq(0, 7, 8, 9, 48, 96, 200, base.length / 2, base.length - 3))
        check(base.take(len.max(0)), s"truncate@$len")
      for (_ <- 1 to fuzzN) {
        val b = base.clone()
        for (_ <- 0 to rnd.nextInt(4))
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        check(b, "mutate")
      }
      // hostile values in the superblock/addresses region
      for (pos <- Seq(9, 13, 24, 32, 40, 56, 64, 80) if pos + 8 <= base.length) {
        val b = base.clone()
        java.util.Arrays.fill(b, pos, pos + 8, 0x7F.toByte)
        check(b, s"bigaddr@$pos")
        java.util.Arrays.fill(b, pos, pos + 8, 0xFF.toByte)
        check(b, s"undef@$pos")
      }
    }
  }

  test("compact layout, fletcher32 pipeline, and vlen-string attrs all round-trip") {
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(8, charPlatform = false, zone = " UTC")
    val cdf = NetCdf.tabularize(NetCdf.parse(NetCdf.writeBytes(dims, gatts, vars, version = 1)))
    // compact: the 1-D coordinate-ish vars store their data IN the header
    val compact = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(compactVars = Set("LATITUDE", "LONGITUDE", "JULD", "CYCLE_NUMBER")))
    assert(NetCdf.tabularize(NetCdf.parse(compact)) === cdf)
    // fletcher32 appended to the chunk pipeline (checksum stripped on read)
    val fletch = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(unlimited = Set("N_PROF"), fletcher = true))
    assert(NetCdf.tabularize(NetCdf.parse(fletch)) === cdf)
    // vlen-string global attr (h5netcdf's encoding) resolves via the gheap
    val vlen = Hdf5.writeBytes(dims, gatts, vars, Hdf5.H5Opts(vlenTitle = true))
    val parsed = NetCdf.parse(vlen)
    assert(parsed.globalAttrs("title") === gatts.collectFirst {
      case ("title", NetCdf.NcStr(s)) => s
    }.get)
    assert(NetCdf.tabularize(parsed) === cdf)
  }

  test("compound-typed attributes are skipped, never fatal") {
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(8, charPlatform = false, zone = " UTC")
    val bytes = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(compoundAttrOn = Some("PRES")))
    val parsed = NetCdf.parse(bytes) // must not throw
    val pres = parsed.vars.find(_.name == "PRES").get
    assert(!pres.attrs.contains("REFERENCE_LIST")) // skipped
    assert(pres.attrs.contains("_FillValue")) // siblings survive
  }

  test("dense (fractal-heap) attribute storage decodes identically to compact attrs") {
    // the default compact→dense transition fires at 8+ attributes — which
    // real netCDF-4 Argo variables reach routinely (long_name, units,
    // _FillValue, valid_min/max, C_format, ...) — so the read path must
    // carry _FillValue, time units, and DIMENSION_LIST out of the heap
    // exactly as from inline header messages
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(8, charPlatform = false, zone = " UTC")
    val cdf = NetCdf.tabularize(NetCdf.parse(NetCdf.writeBytes(dims, gatts, vars, version = 1)))
    val dense = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(denseAttrs = vars.map(_.name).toSet))
    val parsed = NetCdf.parse(dense)
    assert(NetCdf.tabularize(parsed) === cdf)
    val pres = parsed.vars.find(_.name == "PRES").get
    assert(pres.attrs.contains("_FillValue"))
    // mixed storage in one file: some vars dense, some compact
    val mixed = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(denseAttrs = Set("PRES", "JULD")))
    assert(NetCdf.tabularize(NetCdf.parse(mixed)) === cdf)
  }

  test("dense (fractal-heap) link storage decodes identically to compact links") {
    // netCDF-4 groups track link creation order (new-style groups), so any
    // file with more than 8 links — i.e. any real multi-variable dataset —
    // stores its root links DENSELY; the 11-link fleet model is exactly
    // past that transition
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(8, charPlatform = false, zone = " UTC")
    val cdf = NetCdf.tabularize(NetCdf.parse(NetCdf.writeBytes(dims, gatts, vars, version = 1)))
    // v0 superblock + dense links
    val dense0 = Hdf5.writeBytes(dims, gatts, vars, Hdf5.H5Opts(denseLinks = true))
    assert(NetCdf.tabularize(NetCdf.parse(dense0)) === cdf)
    // v2 superblock + dense links
    val dense2 = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(v2Superblock = true, denseLinks = true))
    assert(NetCdf.tabularize(NetCdf.parse(dense2)) === cdf)
    // fully dense: links AND every var's attributes through fractal heaps
    val full = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(denseLinks = true, denseAttrs = vars.map(_.name).toSet))
    val parsed = NetCdf.parse(full)
    assert(NetCdf.tabularize(parsed) === cdf)
    assert(parsed.dims === Seq(NcDim("N_PROF", 6), NcDim("N_LEVELS", 5), NcDim("STRING8", 8)))
  }

  test("indirect-rooted dense link storage (multi-block heap) decodes") {
    // libhdf5's default starting block is 512 B, so a real multi-variable
    // file's link heap outgrows one block and the root becomes an INDIRECT
    // block over doubling-table direct blocks — 30 long-named variables
    // force at least two blocks here
    import graft.sources.NetCdf.{NcVar, NcFloats, NcStr, NC_FLOAT}
    val dims = Seq(NcDim("X", 4))
    val vars = (0 until 30).map(i => NcVar(f"VARIABLE_NUMBER_$i%02d", Seq(0), NC_FLOAT,
      Seq("units" -> NcStr("m")), NcFloats(Array.tabulate(4)(j => i * 10f + j))))
    val compact = Hdf5.writeBytes(dims, Nil, vars)
    val indirect = Hdf5.writeBytes(dims, Nil, vars,
      Hdf5.H5Opts(denseLinks = true, denseIndirectLinks = true))
    def occurrences(hay: Array[Byte], needle: String): Int = {
      val nb = needle.getBytes("US-ASCII")
      (0 to hay.length - nb.length).count(i => nb.indices.forall(j => hay(i + j) == nb(j)))
    }
    assert(occurrences(indirect, "FHIB") >= 1, "fixture premise: indirect root written")
    assert(occurrences(indirect, "FHDB") >= 2, "fixture premise: multiple direct blocks")
    val pc = NetCdf.parse(compact)
    val pi = NetCdf.parse(indirect)
    assert(pi.vars.map(_.name).sorted === pc.vars.map(_.name).sorted)
    val byName = pc.vars.map(v => v.name -> v).toMap
    pi.vars.foreach { v =>
      assert(v.numeric === byName(v.name).numeric, s"values of ${v.name}")
      assert(v.attrs.get("units") === byName(v.name).attrs.get("units"), s"attrs of ${v.name}")
    }
  }

  test("beyond-subset dense storage (filtered heap) quarantines, never drops attrs") {
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(8, charPlatform = false, zone = " UTC")
    val bytes = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(denseAttrInfoOn = Some("PRES")))
    val e = intercept[NetCdfParseException](NetCdf.parse(bytes))
    assert(e.kind === "unsupported-hdf5")
    assert(e.getMessage.contains("filtered fractal heap"))
  }

  test("beyond-subset dense storage (indirect-block CHILDREN) quarantines") {
    // maxDirect 1024 over a 512-byte start block allows 3 direct rows;
    // a heap declaring 5 current rows must hold indirect children — past
    // the subset, so it triages rather than parsing child addresses as
    // direct blocks
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(8, charPlatform = false, zone = " UTC")
    val bytes = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(denseAttrInfoOn = Some("PRES"), denseAttrPoisonDeep = true))
    val e = intercept[NetCdfParseException](NetCdf.parse(bytes))
    assert(e.kind === "unsupported-hdf5")
    assert(e.getMessage.contains("indirect-block children"))
  }

  test("userblock files parse: superblock found at a power-of-two offset") {
    val h5 = NetCdfFixture.hdf5FileBytes(8, zone = " UTC")
    val withBlock = new Array[Byte](512) ++ h5
    assert(NetCdf.tabularize(NetCdf.parse(withBlock)) ===
      NetCdf.tabularize(NetCdf.parse(h5)))
    // a 2048-byte userblock too (offsets double)
    val big = new Array[Byte](2048) ++ h5
    assert(NetCdf.tabularize(NetCdf.parse(big)) === NetCdf.tabularize(NetCdf.parse(h5)))
  }

  test("a crafted dims product that would wrap the size math quarantines, not decodes") {
    import graft.sources.NetCdf.{NcVar, NcDoubles, NC_DOUBLE}
    // Each declared dim passes the per-dim Int.MaxValue bound and the
    // product 2^30 · (2^31-1) ≈ 2^61 passes the exact dataspace count —
    // but × esz 8 the byte size is ~2^64, which WRAPS under plain
    // multiplication to a small value that would sail through every
    // downstream size gate and fabricate an 'ok' decode over garbage.
    // The exact-multiply guard must triage the file instead.
    val dims = Seq(NcDim("X", 8), NcDim("Y", 4))
    val v = NcVar("PRES", Seq(0, 1), NC_DOUBLE, Nil,
      NcDoubles(Array.fill(32)(1.0)))
    val sane = Hdf5.writeBytes(dims, Nil, Seq(v))
    assert(NetCdf.parse(sane).vars.exists(_.name == "PRES"))
    val crafted = Hdf5.writeBytes(dims, Nil, Seq(v),
      Hdf5.H5Opts(declaredDims = Map("PRES" -> Seq(1L << 30, (1L << 31) - 1))))
    val e = intercept[NetCdfParseException](NetCdf.parse(crafted))
    assert(e.getMessage.contains("overflows"),
      s"expected the exact-multiply guard, got: ${e.getMessage}")
  }

  test("a userblock that itself starts with 'CDF' still probes through to the superblock") {
    // a userblock is ARBITRARY user bytes: when it begins with the classic
    // magic, the classic parse runs (and fails somewhere past the header) —
    // the HDF5 probe must still recover the file instead of triaging the
    // valid container as corrupt
    val h5 = NetCdfFixture.hdf5FileBytes(8, zone = " UTC")
    val block = new Array[Byte](512)
    "CDFthis userblock is not actually a classic file".getBytes("ISO-8859-1")
      .copyToArray(block)
    val withBlock = block ++ h5
    assert(NetCdf.tabularize(NetCdf.parse(withBlock)) ===
      NetCdf.tabularize(NetCdf.parse(h5)))
    // and a genuinely corrupt classic file (no superblock anywhere) still
    // fails with its ORIGINAL classic-parse error
    val corrupt = block.clone()
    val e = intercept[NetCdfParseException](NetCdf.parse(corrupt))
    assert(e.kind === "corrupt")
  }

  test("a corrupt VALID-magic classic file embedding HDF5 bytes is not adopted as HDF5") {
    // a classic file (complete 'CDF\x01' magic) corrupted past its header
    // whose payload contains a full HDF5 file at a power-of-two offset:
    // the userblock probe must NOT re-parse the embedded file as the
    // upload's content (fabricated rows) — the corrupt triage stands
    val classic = NetCdfFixture.fileBytes(0)
    classic(12) = 0x7F // nDims high byte: dim count now absurd -> corrupt
    val h5 = NetCdfFixture.hdf5FileBytes(8, zone = " UTC")
    val crafted = classic ++ new Array[Byte](2048 - classic.length) ++ h5
    assert(graft.sources.Hdf5.userblockOffset(crafted) === 2048,
      "fixture premise: the embedded superblock IS findable by the probe")
    val e = intercept[NetCdfParseException](NetCdf.parse(crafted))
    assert(e.kind === "corrupt")
    assert(e.getMessage.contains("dim count"))
  }

  test("unallocated storage decodes as the fill-value message, then nulls out") {
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(8, charPlatform = false, zone = " UTC")
    // PRES never written: storage UNDEF + a fill message matching its
    // _FillValue attr — every PRES cell must decode as FILL and then null
    // out through cleanValue, exactly like an explicit fill write
    val bytes = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(unallocatedFill = Map("PRES" -> NetCdfFixture.FILL)))
    val parsed = NetCdf.parse(bytes)
    val pres = parsed.vars.find(_.name == "PRES").get
    assert(pres.numeric.forall(_ == NetCdfFixture.FILL.toDouble),
      "unwritten storage must read as the declared fill, not zeros")
    val rows = NetCdf.tabularize(parsed)
    assert(rows.nonEmpty && rows.forall(_.pres.isEmpty))
    assert(rows.exists(_.temp.nonEmpty)) // the written vars still decode
  }

  test("a zlib FDICT chunk fails fast instead of hanging the inflater") {
    val (dims, gatts, vars) = NetCdfFixture.fleetVars(9, charPlatform = false, zone = "")
    val bytes = Hdf5.writeBytes(dims, gatts, vars,
      Hdf5.H5Opts(unlimited = Set("N_PROF")))
    // deflater output starts 0x78 0x9C; patch the first occurrence to
    // 0x78 0xBB (valid zlib header with FDICT set)
    var i = 0
    var patched = false
    while (!patched && i < bytes.length - 1) {
      if (bytes(i) == 0x78.toByte && bytes(i + 1) == 0x9C.toByte) {
        bytes(i + 1) = 0xBB.toByte; patched = true
      }
      i += 1
    }
    assert(patched, "no deflate header found to patch")
    val e = intercept[NetCdfParseException](NetCdf.parse(bytes))
    assert(e.kind === "corrupt")
  }

  test("random fleet models: HDF5 and CDF-5 containers parse identically") {
    // Seeded structural fuzz across the WRITER x PARSER matrix: random
    // dims/var shapes/types/values serialized as BOTH a CDF-5 classic file
    // and an HDF5 file (random v0/v2 superblock, random per-var chunking,
    // random fletcher32) must parse to the same dims, types, and numeric
    // values — the two container stacks pin each other.
    import graft.sources.NetCdf._
    val rnd = new scala.util.Random(777)
    for (trial <- 0 until 50) {
      val nDims = 1 + rnd.nextInt(2)
      val dims = (0 until nDims).map(i => NcDim(s"D$i", 1 + rnd.nextInt(7))) :+
        NcDim("STR4", 4)
      val types = Seq(NC_BYTE, NC_UBYTE, NC_SHORT, NC_USHORT, NC_INT, NC_UINT,
        NC_INT64, NC_UINT64, NC_FLOAT, NC_DOUBLE)
      val nVars = 1 + rnd.nextInt(4)
      val vars = (0 until nVars).map { vi =>
        val dimIds = (0 until nDims).filter(_ => rnd.nextBoolean()) match {
          case Seq() => Seq(0)
          case s => s
        }
        val count = dimIds.map(dims(_).size).product
        val t = types(rnd.nextInt(types.length))
        val data: NcVal = t match {
          case NC_FLOAT => NcFloats(Array.fill(count)((rnd.nextInt(1024) * 0.25).toFloat))
          case NC_DOUBLE => NcDoubles(Array.fill(count)(rnd.nextInt(65536) * 0.125))
          case NC_INT64 | NC_UINT64 => NcLongs(Array.fill(count)(rnd.nextInt(1 << 20).toLong))
          case _ => NcInts(Array.fill(count)(rnd.nextInt(100)))
        }
        NcVar(s"V$vi", dimIds, t, Seq("units" -> NcStr("arbitrary")), data)
      }
      val gatts = Seq("title" -> NcStr(s"trial $trial"))
      val cdf = NetCdf.parse(NetCdf.writeBytes(dims, gatts, vars, version = 5))
      // random subgroup placement: moved vars must parse back as g0/NAME
      // with identical types/shapes/values (composes with chunking,
      // fletcher32, and both superblock families)
      val grouped = vars.filter(_ => rnd.nextBoolean()).map(_.name)
      val opts = Hdf5.H5Opts(
        v2Superblock = rnd.nextBoolean(),
        chunkBy = vars.filter(_ => rnd.nextBoolean())
          .map(v => v.name -> (1 + rnd.nextInt(3))).toMap,
        fletcher = rnd.nextBoolean(),
        subgroups = if (grouped.nonEmpty) Map("g0" -> grouped) else Map.empty)
      val h5 = NetCdf.parse(Hdf5.writeBytes(dims, gatts, vars, opts))
      assert(h5.dims === cdf.dims, s"trial $trial dims")
      for (v <- vars) {
        val a = cdf.vars.find(_.name == v.name).get
        val wantName = if (grouped.contains(v.name)) s"g0/${v.name}" else v.name
        val b = h5.vars.find(_.name == wantName)
          .getOrElse(fail(s"trial $trial: '$wantName' missing from ${h5.vars.map(_.name)}"))
        assert(b.ncType === a.ncType, s"trial $trial ${v.name} type")
        assert(b.dims.map(_.size) === a.dims.map(_.size), s"trial $trial ${v.name} dims")
        assert(b.numeric.toSeq === a.numeric.toSeq, s"trial $trial ${v.name} values")
        assert(b.attrs.get("units") === a.attrs.get("units"))
      }
      assert(h5.globalAttrs("title") === cdf.globalAttrs("title"))
    }
  }

  test("quarantine ledger triages healthy HDF5, corrupt, and unsupported per file") {
    val dir = java.nio.file.Files.createTempDirectory("h5_quarantine").toString
    NetCdfFixture.writeQuarantineFleet(dir)
    val statuses = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filter(_.endsWith(".nc")).sorted
      .map { p =>
        val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
        val name = p.substring(p.lastIndexOf('/') + 1)
        val status = try { NetCdf.parse(bytes); "ok" }
          catch { case e: NetCdfParseException => e.kind }
        name -> status
      }.toMap
    assert(statuses("hdf5_float_108.nc") === "ok")
    assert(statuses("float_100.nc") === "ok")
    assert(statuses("upload_truncated.nc") === "corrupt")
    assert(statuses("upload_garbage.nc") === "corrupt")
    assert(statuses("upload_hdf5_truncated.nc") === "corrupt")
    assert(statuses("upload_netcdf4.nc") === "unsupported-hdf5")
  }
  test("compound-typed datasets decode: members surface as name.member (v1 + v3 encodings)") {
    // round-14 verdict item: netCDF-4's enhanced model CAN put compound
    // (user-defined) types on variables; the reader now tabularizes their
    // numeric members as `dataset.member` instead of quarantining the file.
    import NetCdf.{NcDim, NcVar, NcFloats}
    val dims = Seq(NcDim("N", 5))
    val presVals = Array(1013.25f, 998.5f, 1020.0f, 975.125f, 1001.5f)
    val vars = Seq(
      NcVar("press_qc", Seq(0), NetCdf.NC_FLOAT, Nil, NcFloats(presVals)),
      NcVar("TEMP", Seq(0), NetCdf.NC_FLOAT, Nil,
        NcFloats(Array(1f, 2f, 3f, 4f, 5f))))
    for (v3 <- Seq(false, true)) {
      val bytes = Hdf5.writeBytes(dims, Nil, vars,
        Hdf5.H5Opts(compoundVars = Set("press_qc"), compoundV3 = v3))
      val parsed = NetCdf.parse(bytes)
      val byName = parsed.vars.map(v => v.name -> v).toMap
      // the atomic sibling in the SAME file still decodes — compound
      // support shrinks the triage surface to zero here
      assert(byName.contains("TEMP"), s"v3=$v3")
      assert(byName("TEMP").numeric.toSeq === Seq(1.0, 2, 3, 4, 5))
      assert(byName("press_qc.val").numeric.toSeq ===
        presVals.map(_.toDouble).toSeq, s"v3=$v3")
      assert(byName("press_qc.qc").numeric.toSeq === Seq(0.0, 1, 2, 3, 4),
        s"v3=$v3 (writer rule: qc = index % 7)")
      assert(byName("press_qc.val").dims.map(_.name) === Seq("N"))
    }
  }

  test("compound datasets decode through the chunked+filtered pipeline too") {
    import NetCdf.{NcDim, NcVar, NcFloats}
    val n = 24
    val dims = Seq(NcDim("N", n))
    val vals = Array.tabulate(n)(i => 100.0f + i * 0.5f)
    val vars = Seq(NcVar("M", Seq(0), NetCdf.NC_FLOAT, Nil, NcFloats(vals)))
    val bytes = Hdf5.writeBytes(dims, Nil, vars, Hdf5.H5Opts(
      compoundVars = Set("M"), chunkBy = Map("M" -> 7)))
    val parsed = NetCdf.parse(bytes)
    val byName = parsed.vars.map(v => v.name -> v).toMap
    assert(byName("M.val").numeric.toSeq === vals.map(_.toDouble).toSeq)
    assert(byName("M.qc").numeric.toSeq === (0 until n).map(i => (i % 7).toDouble))
  }

}
