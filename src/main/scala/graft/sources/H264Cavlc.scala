package graft.sources

/** CAVLC residual entropy layer of H.264 (ITU-T H.264 §9.2): coeff_token,
  * trailing-one signs, adaptive level prefix/suffix, total_zeros and
  * run_before — decode AND the encoder twin, so transform-coded fixtures
  * round-trip bit-exactly (reference behavior replaced: the pipeline treats
  * video as opaque bytes; this closes the round-13 verdict's "I_PCM only"
  * boundary in sources/H264.scala).
  *
  * PROVENANCE / CONFORMANCE BOUNDARY (carried from round 11, re-verified:
  * the container has no copy of the spec, no ffmpeg/JM to transcribe or
  * cross-check against): the VLC tables below are transcriptions of the
  * published Table 9-5 / 9-7..9-10 constants from memory of the spec and
  * the JM reference arrays. `H264CavlcSpec` machine-checks every table for
  * prefix-freeness and full encode→decode round-trip over every (value,
  * context) combination — which catches structural transcription damage —
  * but a value-for-value slip against the real standard would be invisible
  * until the driver supplies a real encoder's stream (the standing
  * conformance-artifact request). All level/run ARITHMETIC (§9.2.2.1) is
  * algorithmic and verified from first principles by the property tests.
  *
  * Decode never throws on garbage: unmatched codes raise ParseEnd, which
  * the H264 decoder converts to per-frame quarantine (the media contract).
  */
private[graft] object H264Cavlc {

  import H264.{BitReader, BitWriter, ParseEnd}

  /** One VLC codebook: (len, code) per symbol id, len == 0 ⇒ invalid
    * combination. Decode walks bits until a (len, code) matches.
    */
  private final class Vlc(entries: Array[(Int, Int, Int)]) { // (symbol, len, code)
    private val byBits: Map[(Int, Int), Int] =
      entries.iterator.map { case (s, l, c) => (l, c) -> s }.toMap
    require(byBits.size == entries.length, "duplicate codeword in VLC table")
    private[H264Cavlc] val bySymbol: Map[Int, (Int, Int)] =
      entries.iterator.map { case (s, l, c) => s -> (l, c) }.toMap
    val maxLen: Int = entries.iterator.map(_._2).max

    def decode(r: BitReader): Int = {
      var len = 0; var code = 0
      while (len < maxLen) {
        code = (code << 1) | r.u(1); len += 1
        byBits.get((len, code)) match {
          case Some(s) => return s
          case None => ()
        }
      }
      throw new ParseEnd
    }
    def encode(w: BitWriter, symbol: Int): Unit = bySymbol.get(symbol) match {
      case Some((l, c)) => w.u(c, l)
      case None => throw new IllegalArgumentException(s"no code for symbol $symbol")
    }
    private[H264Cavlc] def symbols: Iterable[Int] = bySymbol.keys
  }

  /** coeff_token symbol packing: totalCoeff * 4 + trailingOnes. */
  @inline private def ctSym(tc: Int, t1: Int): Int = tc * 4 + t1

  // Table 9-5, 0 <= nC < 2. Arrays are (trailingOnes, totalCoeff, len, code).
  private def ct(rows: (Int, Int, Int, Int)*): Vlc =
    new Vlc(rows.map { case (t1, tc, l, c) => (ctSym(tc, t1), l, c) }.toArray)

  private val coeffToken0: Vlc = ct(
    (0, 0, 1, 1),
    (0, 1, 6, 5), (1, 1, 2, 1),
    (0, 2, 8, 7), (1, 2, 6, 4), (2, 2, 3, 1),
    (0, 3, 9, 7), (1, 3, 8, 6), (2, 3, 7, 5), (3, 3, 5, 3),
    (0, 4, 10, 7), (1, 4, 9, 6), (2, 4, 8, 5), (3, 4, 6, 3),
    (0, 5, 11, 7), (1, 5, 10, 6), (2, 5, 9, 5), (3, 5, 7, 4),
    (0, 6, 13, 15), (1, 6, 11, 6), (2, 6, 10, 5), (3, 6, 8, 4),
    (0, 7, 13, 11), (1, 7, 13, 14), (2, 7, 11, 5), (3, 7, 9, 4),
    (0, 8, 13, 8), (1, 8, 13, 10), (2, 8, 13, 13), (3, 8, 10, 4),
    (0, 9, 14, 15), (1, 9, 14, 14), (2, 9, 13, 9), (3, 9, 11, 4),
    (0, 10, 14, 11), (1, 10, 14, 10), (2, 10, 14, 13), (3, 10, 13, 12),
    (0, 11, 15, 15), (1, 11, 15, 14), (2, 11, 14, 9), (3, 11, 14, 12),
    (0, 12, 15, 11), (1, 12, 15, 10), (2, 12, 15, 13), (3, 12, 14, 8),
    (0, 13, 16, 15), (1, 13, 15, 1), (2, 13, 15, 9), (3, 13, 15, 12),
    (0, 14, 16, 11), (1, 14, 16, 14), (2, 14, 16, 13), (3, 14, 15, 8),
    (0, 15, 16, 7), (1, 15, 16, 10), (2, 15, 16, 9), (3, 15, 16, 12),
    (0, 16, 16, 4), (1, 16, 16, 6), (2, 16, 16, 5), (3, 16, 16, 8))

  // Table 9-5, 2 <= nC < 4
  private val coeffToken1: Vlc = ct(
    (0, 0, 2, 3),
    (0, 1, 6, 11), (1, 1, 2, 2),
    (0, 2, 6, 7), (1, 2, 5, 7), (2, 2, 3, 3),
    (0, 3, 7, 7), (1, 3, 6, 10), (2, 3, 6, 9), (3, 3, 4, 5),
    (0, 4, 8, 7), (1, 4, 6, 6), (2, 4, 6, 5), (3, 4, 4, 4),
    (0, 5, 8, 4), (1, 5, 7, 6), (2, 5, 7, 5), (3, 5, 5, 6),
    (0, 6, 9, 7), (1, 6, 8, 6), (2, 6, 8, 5), (3, 6, 6, 8),
    (0, 7, 11, 15), (1, 7, 9, 6), (2, 7, 9, 5), (3, 7, 6, 4),
    (0, 8, 11, 11), (1, 8, 11, 14), (2, 8, 11, 13), (3, 8, 7, 4),
    (0, 9, 12, 15), (1, 9, 11, 10), (2, 9, 11, 9), (3, 9, 9, 4),
    (0, 10, 12, 11), (1, 10, 12, 14), (2, 10, 12, 13), (3, 10, 11, 12),
    (0, 11, 12, 8), (1, 11, 12, 10), (2, 11, 12, 9), (3, 11, 11, 8),
    (0, 12, 13, 15), (1, 12, 13, 14), (2, 12, 13, 13), (3, 12, 12, 12),
    (0, 13, 13, 11), (1, 13, 13, 10), (2, 13, 13, 9), (3, 13, 13, 12),
    (0, 14, 13, 7), (1, 14, 14, 11), (2, 14, 13, 6), (3, 14, 13, 8),
    (0, 15, 14, 9), (1, 15, 14, 8), (2, 15, 14, 10), (3, 15, 13, 1),
    (0, 16, 14, 7), (1, 16, 14, 6), (2, 16, 14, 5), (3, 16, 14, 4))

  // Table 9-5, 4 <= nC < 8
  private val coeffToken2: Vlc = ct(
    (0, 0, 4, 15),
    (0, 1, 6, 15), (1, 1, 4, 14),
    (0, 2, 6, 11), (1, 2, 5, 15), (2, 2, 4, 13),
    (0, 3, 6, 8), (1, 3, 5, 12), (2, 3, 5, 14), (3, 3, 4, 12),
    (0, 4, 7, 15), (1, 4, 5, 10), (2, 4, 5, 11), (3, 4, 4, 11),
    (0, 5, 7, 11), (1, 5, 5, 8), (2, 5, 5, 9), (3, 5, 4, 10),
    (0, 6, 7, 9), (1, 6, 6, 14), (2, 6, 6, 13), (3, 6, 4, 9),
    (0, 7, 7, 8), (1, 7, 6, 10), (2, 7, 6, 9), (3, 7, 4, 8),
    (0, 8, 8, 15), (1, 8, 7, 14), (2, 8, 7, 13), (3, 8, 5, 13),
    (0, 9, 8, 11), (1, 9, 8, 14), (2, 9, 7, 10), (3, 9, 6, 12),
    (0, 10, 9, 15), (1, 10, 8, 10), (2, 10, 8, 13), (3, 10, 7, 12),
    (0, 11, 9, 11), (1, 11, 9, 14), (2, 11, 8, 9), (3, 11, 8, 12),
    (0, 12, 9, 8), (1, 12, 9, 10), (2, 12, 9, 13), (3, 12, 8, 8),
    (0, 13, 10, 13), (1, 13, 9, 7), (2, 13, 9, 9), (3, 13, 9, 12),
    (0, 14, 10, 9), (1, 14, 10, 12), (2, 14, 10, 11), (3, 14, 10, 10),
    (0, 15, 10, 5), (1, 15, 10, 8), (2, 15, 10, 7), (3, 15, 10, 6),
    (0, 16, 10, 1), (1, 16, 10, 4), (2, 16, 10, 3), (3, 16, 10, 2))

  // Table 9-5, nC == -1 (chroma DC, 4:2:0 — 4 coefficients max)
  private val coeffTokenChromaDc: Vlc = ct(
    (0, 0, 2, 1),
    (0, 1, 6, 7), (1, 1, 1, 1),
    (0, 2, 6, 4), (1, 2, 6, 6), (2, 2, 3, 1),
    (0, 3, 6, 3), (1, 3, 7, 3), (2, 3, 7, 2), (3, 3, 6, 5),
    (0, 4, 6, 2), (1, 4, 8, 3), (2, 4, 8, 2), (3, 4, 7, 0))

  /** nC >= 8: 6-bit fixed-length; 000011 is TC=0, else ((TC-1)<<2)|T1. */
  private def decodeCoeffTokenFlc(r: BitReader): (Int, Int) = {
    val v = r.u(6)
    if (v == 3) (0, 0)
    else {
      val tc = (v >> 2) + 1; val t1 = v & 3
      if (t1 > math.min(tc, 3)) throw new ParseEnd
      (tc, t1)
    }
  }
  private def encodeCoeffTokenFlc(w: BitWriter, tc: Int, t1: Int): Unit =
    if (tc == 0) w.u(3, 6) else w.u(((tc - 1) << 2) | t1, 6)

  private def coeffTokenVlc(nC: Int): Vlc =
    if (nC == -1) coeffTokenChromaDc
    else if (nC < 2) coeffToken0
    else if (nC < 4) coeffToken1
    else coeffToken2

  // Table 9-7/9-8: total_zeros for 4x4-shaped blocks, indexed [totalCoeff-1];
  // each Vlc maps totalZeros -> code.
  private def tz(rows: (Int, Int)*): Vlc = // (len, code) in totalZeros order
    new Vlc(rows.zipWithIndex.map { case ((l, c), z) => (z, l, c) }.toArray)

  private val totalZeros4x4: Array[Vlc] = Array(
    tz((1, 1), (3, 3), (3, 2), (4, 3), (4, 2), (5, 3), (5, 2), (6, 3), (6, 2),
      (7, 3), (7, 2), (8, 3), (8, 2), (9, 3), (9, 2), (9, 1)), // tc 1
    tz((3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (4, 5), (4, 4), (4, 3), (4, 2),
      (5, 3), (5, 2), (6, 3), (6, 2), (6, 1), (6, 0)), // tc 2
    tz((4, 5), (3, 7), (3, 6), (3, 5), (4, 4), (4, 3), (3, 4), (3, 3), (4, 2),
      (5, 3), (5, 2), (6, 1), (5, 1), (6, 0)), // tc 3
    tz((5, 3), (3, 7), (4, 5), (4, 4), (3, 6), (3, 5), (3, 4), (4, 3), (3, 3),
      (4, 2), (5, 2), (5, 1), (5, 0)), // tc 4
    tz((4, 5), (4, 4), (4, 3), (3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (4, 2),
      (5, 1), (4, 1), (5, 0)), // tc 5
    tz((6, 1), (5, 1), (3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (3, 2), (4, 1),
      (3, 1), (6, 0)), // tc 6
    tz((6, 1), (5, 1), (3, 5), (3, 4), (3, 3), (2, 3), (3, 2), (4, 1), (3, 1),
      (6, 0)), // tc 7
    tz((6, 1), (4, 1), (5, 1), (3, 3), (2, 3), (2, 2), (3, 2), (3, 1),
      (6, 0)), // tc 8
    tz((6, 1), (6, 0), (4, 1), (2, 3), (2, 2), (3, 1), (2, 1), (5, 1)), // tc 9
    tz((5, 1), (5, 0), (3, 1), (2, 3), (2, 2), (2, 1), (4, 1)), // tc 10
    tz((4, 0), (4, 1), (3, 1), (3, 2), (1, 1), (3, 3)), // tc 11
    tz((4, 0), (4, 1), (2, 1), (1, 1), (3, 1)), // tc 12
    tz((3, 0), (3, 1), (1, 1), (2, 1)), // tc 13
    tz((2, 0), (2, 1), (1, 1)), // tc 14
    tz((1, 0), (1, 1))) // tc 15

  // Table 9-9(a): total_zeros for chroma DC (4:2:0), indexed [totalCoeff-1]
  private val totalZerosChromaDc: Array[Vlc] = Array(
    tz((1, 1), (2, 1), (3, 1), (3, 0)), // tc 1
    tz((1, 1), (2, 1), (2, 0)), // tc 2
    tz((1, 1), (1, 0))) // tc 3

  // Table 9-10: run_before, indexed by min(zerosLeft, 7) - 1
  private val runBefore: Array[Vlc] = Array(
    tz((1, 1), (1, 0)), // zerosLeft 1
    tz((1, 1), (2, 1), (2, 0)), // 2
    tz((2, 3), (2, 2), (2, 1), (2, 0)), // 3
    tz((2, 3), (2, 2), (2, 1), (3, 1), (3, 0)), // 4
    tz((2, 3), (2, 2), (3, 3), (3, 2), (3, 1), (3, 0)), // 5
    tz((2, 3), (3, 0), (3, 1), (3, 3), (3, 2), (3, 5), (3, 4)), // 6
    tz((3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (3, 2), (3, 1), (4, 1), (5, 1),
      (6, 1), (7, 1), (8, 1), (9, 1), (10, 1), (11, 1))) // > 6

  /** Every VLC table as symbol → (len, code), keyed by a stable name —
    * the seam for `H264CavlcTablesSpec`'s SECOND, independently-written
    * transcription (spec bit-string notation, table layout) to diff
    * against: two transcriptions in two representations from two sittings
    * turn a silent memory slip into a loud table mismatch. Test-only
    * introspection; the decoder never reads this.
    */
  private[graft] def dumpTables: Map[String, Map[Int, (Int, Int)]] =
    Map(
      "coeff_token_nc0" -> coeffToken0.bySymbol,
      "coeff_token_nc2" -> coeffToken1.bySymbol,
      "coeff_token_nc4" -> coeffToken2.bySymbol,
      "coeff_token_chroma_dc" -> coeffTokenChromaDc.bySymbol) ++
      totalZeros4x4.zipWithIndex.map { case (v, i) =>
        s"total_zeros_tc${i + 1}" -> v.bySymbol
      } ++
      totalZerosChromaDc.zipWithIndex.map { case (v, i) =>
        s"total_zeros_chroma_dc_tc${i + 1}" -> v.bySymbol
      } ++
      runBefore.zipWithIndex.map { case (v, i) =>
        s"run_before_zl${i + 1}" -> v.bySymbol
      }

  /** Decode one residual block (§9.2). Returns the coefficient array in
    * SCAN order (index 0 = lowest frequency) of length `maxCoeff`, plus
    * totalCoeff (the value neighbors' nC derivation needs).
    * maxCoeff: 16 (luma/DC 4x4), 15 (AC 4x4), 4 (chroma DC). nC as spec
    * (-1 selects the chroma-DC table; >= 8 the 6-bit FLC).
    */
  def residualBlock(r: BitReader, maxCoeff: Int, nC: Int): (Array[Int], Int) = {
    val out = new Array[Int](maxCoeff)
    val (tc, t1) =
      if (nC >= 8) decodeCoeffTokenFlc(r)
      else {
        val s = coeffTokenVlc(nC).decode(r)
        (s / 4, s % 4)
      }
    if (tc == 0) return (out, 0)
    if (tc > maxCoeff) throw new ParseEnd
    // levels, highest frequency first
    val level = new Array[Int](tc)
    var i = 0
    while (i < t1) { level(i) = if (r.u(1) == 1) -1 else 1; i += 1 }
    var suffixLength = if (tc > 10 && t1 < 3) 1 else 0
    while (i < tc) {
      var levelPrefix = 0
      while (r.u(1) == 0) {
        levelPrefix += 1
        if (levelPrefix > 32) throw new ParseEnd // corrupt unary run
      }
      var levelCode = math.min(15, levelPrefix) << suffixLength
      if (suffixLength > 0 || levelPrefix >= 14) {
        val suffixSize =
          if (levelPrefix == 14 && suffixLength == 0) 4
          else if (levelPrefix >= 15) levelPrefix - 3
          else suffixLength
        if (suffixSize > 0) levelCode += r.u(suffixSize)
      }
      if (levelPrefix >= 16) levelCode += (1 << (levelPrefix - 3)) - 4096
      if (i == t1 && t1 < 3) levelCode += 2
      level(i) =
        if ((levelCode & 1) == 0) (levelCode + 2) >> 1 else -((levelCode + 1) >> 1)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    // total_zeros
    var zerosLeft =
      if (tc == maxCoeff) 0
      else if (nC == -1) {
        if (tc > totalZerosChromaDc.length) throw new ParseEnd // tc>3 only valid at maxCoeff
        totalZerosChromaDc(tc - 1).decode(r)
      } else totalZeros4x4(tc - 1).decode(r)
    if (zerosLeft + tc > maxCoeff) throw new ParseEnd
    // runs, highest frequency first; the last (lowest) soaks the rest
    val run = new Array[Int](tc)
    i = 0
    while (i < tc - 1) {
      run(i) =
        if (zerosLeft > 0) runBefore(math.min(zerosLeft, 7) - 1).decode(r)
        else 0
      if (run(i) > zerosLeft) throw new ParseEnd
      zerosLeft -= run(i)
      i += 1
    }
    run(tc - 1) = zerosLeft
    // place from the low end (spec 9.2.4 loop shape)
    var coeffNum = -1
    i = tc - 1
    while (i >= 0) {
      coeffNum += run(i) + 1
      out(coeffNum) = level(i)
      i -= 1
    }
    (out, tc)
  }

  /** Encoder twin of [[residualBlock]] — bit-exact inverse, used by the
    * writer to emit transform-coded fixtures and by the round-trip spec.
    */
  def writeResidualBlock(w: BitWriter, coeff: Array[Int], maxCoeff: Int, nC: Int): Unit = {
    require(coeff.length == maxCoeff, s"coeff length ${coeff.length} != $maxCoeff")
    // gather nonzero levels highest-frequency-first + their runs
    val idx = (0 until maxCoeff).filter(coeff(_) != 0).reverse // high -> low
    val tc = idx.length
    require(tc <= maxCoeff)
    var t1 = 0
    while (t1 < math.min(3, tc) && math.abs(coeff(idx(t1))) == 1) t1 += 1
    if (nC >= 8) encodeCoeffTokenFlc(w, tc, t1)
    else coeffTokenVlc(nC).encode(w, ctSym(tc, t1))
    if (tc == 0) return
    var i = 0
    while (i < t1) { w.u(if (coeff(idx(i)) < 0) 1 else 0, 1); i += 1 }
    var suffixLength = if (tc > 10 && t1 < 3) 1 else 0
    while (i < tc) {
      val level = coeff(idx(i))
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (i == t1 && t1 < 3) levelCode -= 2
      writeLevel(w, levelCode, suffixLength)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    val totalZeros = idx.head - (tc - 1) // zeros below the highest nonzero
    if (tc < maxCoeff) {
      if (nC == -1) totalZerosChromaDc(tc - 1).encode(w, totalZeros)
      else totalZeros4x4(tc - 1).encode(w, totalZeros)
    }
    var zerosLeft = totalZeros
    i = 0
    while (i < tc - 1 && zerosLeft > 0) {
      val runB = idx(i) - idx(i + 1) - 1
      runBefore(math.min(zerosLeft, 7) - 1).encode(w, runB)
      zerosLeft -= runB
      i += 1
    }
  }

  /** Emit levelCode under the current suffixLength — the §9.2.2.1 decode
    * mapping inverted, choosing the shortest legal escape.
    */
  private def writeLevel(w: BitWriter, levelCode: Int, suffixLength: Int): Unit = {
    if (suffixLength == 0) {
      if (levelCode < 14) w.u(1, levelCode + 1) // unary: levelCode zeros + 1
      else if (levelCode < 30) { // prefix 14, 4-bit suffix
        w.u(1, 15); w.u(levelCode - 14, 4)
      } else writeEscape(w, levelCode, suffixLength)
    } else {
      val prefix = levelCode >> suffixLength
      if (prefix < 15) {
        w.u(1, prefix + 1)
        w.u(levelCode & ((1 << suffixLength) - 1), suffixLength)
      } else writeEscape(w, levelCode, suffixLength)
    }
  }

  /** prefix >= 15 escape: suffixSize = prefix - 3, with the prefix-16+
    * offset subtraction mirrored from decode.
    */
  private def writeEscape(w: BitWriter, levelCode: Int, suffixLength: Int): Unit = {
    var prefix = 15
    while (prefix < 32) {
      val base = (15 << suffixLength) +
        (if (prefix >= 16) (1 << (prefix - 3)) - 4096 else 0)
      val size = prefix - 3
      val span = 1 << size
      if (levelCode >= base && levelCode < base + span) {
        w.u(1, prefix + 1)
        w.u(levelCode - base, size)
        return
      }
      prefix += 1
    }
    throw new IllegalArgumentException(s"level code $levelCode out of range")
  }

  // ---- structural validation hooks (H264CavlcSpec) ------------------------

  /** All tables with their ids, for prefix-freeness checks. */
  private[graft] def allTables: Seq[(String, Seq[(Int, Int, Int)])] = {
    def dump(v: Vlc): Seq[(Int, Int, Int)] =
      v.bySymbol.toSeq.map { case (s, (l, c)) => (s, l, c) }
    Seq(
      "coeff_token nC<2" -> dump(coeffToken0),
      "coeff_token 2<=nC<4" -> dump(coeffToken1),
      "coeff_token 4<=nC<8" -> dump(coeffToken2),
      "coeff_token chromaDC" -> dump(coeffTokenChromaDc)) ++
      totalZeros4x4.zipWithIndex.map { case (v, i) =>
        s"total_zeros tc=${i + 1}" -> dump(v)
      } ++
      totalZerosChromaDc.zipWithIndex.map { case (v, i) =>
        s"total_zeros_cdc tc=${i + 1}" -> dump(v)
      } ++
      runBefore.zipWithIndex.map { case (v, i) =>
        s"run_before zl=${i + 1}" -> dump(v)
      }
  }
}
