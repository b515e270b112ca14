package graft.sources

/** Transform-coded I-slice macroblock layer (round 14): Intra_4x4 and
  * Intra_16x16 luma reconstruction — CAVLC residuals (H264Cavlc), dequant,
  * the 4x4 integer inverse transform, the 4x4 DC Hadamard, and intra
  * prediction — plus the encoder twin that emits conformant transform-coded
  * fixtures. Closes the round-13 "I_PCM only" boundary of sources/H264.
  *
  * Scope and honesty:
  *   - LUMA and (round 15) CHROMA are both reconstructed: chroma DC 2x2
  *     butterfly + dequant (8.5.8), shared 4x4 AC dequant/IDCT at QPc
  *     (Table 8-15 with the PPS chroma_qp_index_offset), all four 8.3.4
  *     prediction modes (per-block DC, H, V, plane), and I_PCM chroma
  *     passthrough. mm9's oracle pins position-weighted chroma sums
  *     against tools/h264_residual_ref.py's independent derivation.
  *   - No deblocking filter: the writer twin disables it explicitly
  *     (PPS deblocking_filter_control_present + slice idc 1), making the
  *     fixtures exactly conformant; a real stream that leaves the filter
  *     ON decodes to its PRE-filter reconstruction here (documented
  *     approximation for feature extraction, not a pixel-exact conformance
  *     claim — same class as the Hdf5 external-artifact boundary).
  *   - All tables/arithmetic are the published spec's (§8.3, §8.5); the
  *     dequant/IDCT constants are cross-checked against an independent
  *     Python derivation in tools/h264_residual_ref.py, which also
  *     generates the mm9 oracle's residual constants.
  */
private[graft] object H264Coded {

  import H264.{BitReader, BitWriter, ParseEnd}

  // ---- scan / dequant / transforms ----------------------------------------

  /** 4x4 zigzag: scan index -> raster index (frame scan, Table 8-13). */
  val zigzag: Array[Int] = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  // LevelScale V(m, pos) classes (8.5.12.1): A = both-even positions,
  // B = both-odd, C = mixed
  private val vA = Array(10, 11, 13, 14, 16, 18)
  private val vB = Array(16, 18, 20, 23, 25, 29)
  private val vC = Array(13, 14, 16, 18, 20, 23)

  def levelScale(m: Int, raster: Int): Int = {
    val i = raster >> 2; val j = raster & 3
    if ((i & 1) == 0 && (j & 1) == 0) vA(m)
    else if ((i & 1) == 1 && (j & 1) == 1) vB(m)
    else vC(m)
  }

  /** Dequantize one 4x4 block given SCAN-order coefficients. `dcSkip` = 1
    * for Intra16x16 AC blocks (raster 0 is fed by the DC path). Output in
    * raster order.
    */
  def dequant4x4(scan: Array[Int], qp: Int, dcSkip: Int): Array[Int] = {
    val d = new Array[Int](16)
    val m = qp % 6; val per = qp / 6
    var k = dcSkip
    while (k < 16) {
      val raster = zigzag(k)
      val c = scan(k - dcSkip)
      if (c != 0) d(raster) = (c * levelScale(m, raster)) << per
      k += 1
    }
    d
  }

  /** 4x4 inverse core transform (8.5.12.2): rows then columns, final
    * (x + 32) >> 6. Input raster-order dequantized coefficients; output
    * raster-order residuals.
    */
  def idct4x4(d: Array[Int]): Array[Int] = {
    val f = new Array[Int](16)
    var i = 0
    while (i < 4) { // horizontal on each row
      val o = i * 4
      val e0 = d(o) + d(o + 2); val e1 = d(o) - d(o + 2)
      val e2 = (d(o + 1) >> 1) - d(o + 3); val e3 = d(o + 1) + (d(o + 3) >> 1)
      f(o) = e0 + e3; f(o + 1) = e1 + e2; f(o + 2) = e1 - e2; f(o + 3) = e0 - e3
      i += 1
    }
    val r = new Array[Int](16)
    var j = 0
    while (j < 4) { // vertical on each column
      val e0 = f(j) + f(8 + j); val e1 = f(j) - f(8 + j)
      val e2 = (f(4 + j) >> 1) - f(12 + j); val e3 = f(4 + j) + (f(12 + j) >> 1)
      r(j) = (e0 + e3 + 32) >> 6; r(4 + j) = (e1 + e2 + 32) >> 6
      r(8 + j) = (e1 - e2 + 32) >> 6; r(12 + j) = (e0 - e3 + 32) >> 6
      j += 1
    }
    r
  }

  /** 4x4 inverse Hadamard for the Intra16x16 DC grid (8.5.10), no rounding
    * (scaling happens in the DC dequant). Input/output raster order.
    */
  def invHadamard4x4(c: Array[Int]): Array[Int] = {
    val f = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = i * 4
      val z0 = c(o) + c(o + 2); val z1 = c(o) - c(o + 2)
      val z2 = c(o + 1) - c(o + 3); val z3 = c(o + 1) + c(o + 3)
      f(o) = z0 + z3; f(o + 1) = z1 + z2; f(o + 2) = z1 - z2; f(o + 3) = z0 - z3
      i += 1
    }
    val r = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val z0 = f(j) + f(8 + j); val z1 = f(j) - f(8 + j)
      val z2 = f(4 + j) - f(12 + j); val z3 = f(4 + j) + f(12 + j)
      r(j) = z0 + z3; r(4 + j) = z1 + z2; r(8 + j) = z1 - z2; r(12 + j) = z0 - z3
      j += 1
    }
    r
  }

  /** Intra16x16 DC scaling (8.5.10): applied to each inverse-Hadamard
    * output f at luma qp.
    */
  def scaleDc16(f: Int, qp: Int): Int = {
    val ls = levelScale(qp % 6, 0)
    if (qp >= 36) (f * ls) << (qp / 6 - 6)
    else (f * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }

  /** QPc from qPI (Table 8-15): identity below 30, compressed above. */
  private val qpcTail: Array[Int] = Array(
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38,
    38, 39, 39, 39, 39) // qPI 30..51
  def chromaQp(qpY: Int, offset: Int): Int = {
    val qpi = math.max(0, math.min(51, qpY + offset))
    if (qpi < 30) qpi else qpcTail(qpi - 30)
  }

  /** Chroma DC (4:2:0, 8.5.8/8.5.11): 2x2 butterfly over the raster-scanned
    * DC grid, then ((f * LevelScale(qPc%6, (0,0))) << (qPc/6)) >> 5. Input:
    * 4 scan-order ChromaDCLevel values; output: per-4x4-block DC in block
    * raster order (TL, TR, BL, BR).
    */
  def chromaDcDequant(scan: Array[Int], qpc: Int): Array[Int] = {
    val f0 = scan(0) + scan(1) + scan(2) + scan(3)
    val f1 = scan(0) - scan(1) + scan(2) - scan(3)
    val f2 = scan(0) + scan(1) - scan(2) - scan(3)
    val f3 = scan(0) - scan(1) - scan(2) + scan(3)
    val ls = levelScale(qpc % 6, 0)
    val per = qpc / 6
    Array(((f0 * ls) << per) >> 5, ((f1 * ls) << per) >> 5,
      ((f2 * ls) << per) >> 5, ((f3 * ls) << per) >> 5)
  }

  @inline private def clip1(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- CBP mapping (Table 9-4, intra column): codeNum -> coded_block_pattern
  private[sources] val cbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  private val cbpIntraInv: Map[Int, Int] =
    cbpIntra.zipWithIndex.map { case (cbp, cn) => cbp -> cn }.toMap

  /** luma4x4BlkIdx -> (x4, y4) within the MB (quad order, 6.4.3). */
  @inline def blkX(idx: Int): Int = ((idx >> 2) & 1) * 2 + (idx & 1)
  @inline def blkY(idx: Int): Int = ((idx >> 2) >> 1) * 2 + ((idx >> 1) & 1)

  // ---- per-slice decode state ----------------------------------------------

  /** Reconstruction + neighbor-context state for one I slice. Grids are
    * frame-global so nC/prediction derivation crosses MB boundaries the way
    * §9.2.1/§8.3.1 require (raster decode order == availability).
    */
  final class SliceState(val wMb: Int, val hMb: Int, var qp: Int,
      val chromaQpOffset: Int = 0) {
    val lumaW: Int = wMb * 16; val lumaH: Int = hMb * 16
    val y = new Array[Byte](lumaW * lumaH)
    // 4:2:0 chroma planes (round 15: reconstructed, not just parsed)
    val chromaW: Int = wMb * 8; val chromaH: Int = hMb * 8
    val cb = new Array[Byte](chromaW * chromaH)
    val cr = new Array[Byte](chromaW * chromaH)
    // per-4x4 totalCoeff; -1 = not decoded yet (doubles as availability)
    val lumaTc: Array[Array[Int]] = Array.fill(hMb * 4, wMb * 4)(-1)
    val cbTc: Array[Array[Int]] = Array.fill(hMb * 2, wMb * 2)(-1)
    val crTc: Array[Array[Int]] = Array.fill(hMb * 2, wMb * 2)(-1)
    // Intra4x4PredMode per block; non-I4x4 MBs record 2 (DC) per 8.3.1.1
    val i4mode: Array[Array[Int]] = Array.fill(hMb * 4, wMb * 4)(2)

    def pix(x: Int, yy: Int): Int = y(yy * lumaW + x) & 0xff
    def setPix(x: Int, yy: Int, v: Int): Unit = y(yy * lumaW + x) = v.toByte
    def cPix(plane: Array[Byte], x: Int, yy: Int): Int =
      plane(yy * chromaW + x) & 0xff
    def setCPix(plane: Array[Byte], x: Int, yy: Int, v: Int): Unit =
      plane(yy * chromaW + x) = v.toByte

    /** luma nC (9.2.1) for the 4x4 block at global block coords. */
    def lumaNc(gx: Int, gy: Int): Int = {
      val nA = if (gx > 0 && lumaTc(gy)(gx - 1) >= 0) lumaTc(gy)(gx - 1) else -1
      val nB = if (gy > 0 && lumaTc(gy - 1)(gx) >= 0) lumaTc(gy - 1)(gx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA else if (nB >= 0) nB else 0
    }
    def chromaNc(grid: Array[Array[Int]], gx: Int, gy: Int): Int = {
      val nA = if (gx > 0 && grid(gy)(gx - 1) >= 0) grid(gy)(gx - 1) else -1
      val nB = if (gy > 0 && grid(gy - 1)(gx) >= 0) grid(gy - 1)(gx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA else if (nB >= 0) nB else 0
    }

    /** After an I_PCM macroblock: neighbors see nN = 16 (9.2.1), pred
      * mode 2, and its pixels are available for intra prediction.
      */
    def markPcm(mbX: Int, mbY: Int): Unit = {
      var by = 0
      while (by < 4) {
        var bx = 0
        while (bx < 4) {
          lumaTc(mbY * 4 + by)(mbX * 4 + bx) = 16
          i4mode(mbY * 4 + by)(mbX * 4 + bx) = 2
          bx += 1
        }
        by += 1
      }
      var cy = 0
      while (cy < 2) {
        var cx = 0
        while (cx < 2) {
          cbTc(mbY * 2 + cy)(mbX * 2 + cx) = 16
          crTc(mbY * 2 + cy)(mbX * 2 + cx) = 16
          cx += 1
        }
        cy += 1
      }
    }
  }

  // ---- intra prediction -----------------------------------------------------

  /** 4x4 intra prediction (8.3.1.2) for the block at pixel (x0, y0).
    * Availability is "in frame and already decoded" (lumaTc >= 0), which in
    * single-slice raster order equals the spec's neighbour availability.
    * Returns a 16-entry raster prediction. Throws ParseEnd when `mode`
    * needs an unavailable neighbour (illegal stream -> quarantine).
    */
  def predict4x4(st: SliceState, x0: Int, y0: Int, mode: Int): Array[Int] = {
    val availLeft = x0 > 0 && st.lumaTc(y0 >> 2)((x0 - 1) >> 2) >= 0
    val availTop = y0 > 0 && st.lumaTc((y0 - 1) >> 2)(x0 >> 2) >= 0
    val availTl = availLeft && availTop // raster order: corner decoded iff both
    // top-right: pixels (x0+4..x0+7, y0-1); available iff in frame AND that
    // 4x4 block is already decoded (captures the blk-3/7/11/13/15 cases)
    val availTr = y0 > 0 && x0 + 4 < st.lumaW &&
      st.lumaTc((y0 - 1) >> 2)((x0 + 4) >> 2) >= 0
    val t = new Array[Int](8) // p[x0-1+1+x, y0-1], x = 0..7
    val l = new Array[Int](4)
    var tl = 0
    if (availTop) {
      var i = 0
      while (i < 4) { t(i) = st.pix(x0 + i, y0 - 1); i += 1 }
      while (i < 8) {
        t(i) = if (availTr) st.pix(x0 + i, y0 - 1) else t(3)
        i += 1
      }
    }
    if (availLeft) {
      var i = 0
      while (i < 4) { l(i) = st.pix(x0 - 1, y0 + i); i += 1 }
    }
    if (availTl) tl = st.pix(x0 - 1, y0 - 1)

    val p = new Array[Int](16)
    @inline def need(ok: Boolean): Unit = if (!ok) throw new ParseEnd
    mode match {
      case 0 => // vertical
        need(availTop)
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { p(y * 4 + x) = t(x); x += 1 }; y += 1 }
      case 1 => // horizontal
        need(availLeft)
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { p(y * 4 + x) = l(y); x += 1 }; y += 1 }
      case 2 => // DC
        val v =
          if (availLeft && availTop) (t(0) + t(1) + t(2) + t(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
          else if (availTop) (t(0) + t(1) + t(2) + t(3) + 2) >> 2
          else if (availLeft) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
          else 128
        java.util.Arrays.fill(p, v)
      case 3 => // diagonal down-left
        need(availTop)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            p(y * 4 + x) =
              if (x + y == 6) (t(6) + 3 * t(7) + 2) >> 2
              else (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 4 => // diagonal down-right
        need(availLeft && availTop && availTl)
        // the x-y == +/-1 diagonals reach p[-1,-1]: extend both edge arrays
        // with the corner at index -1
        @inline def tAt(i: Int): Int = if (i < 0) tl else t(i)
        @inline def lAt(i: Int): Int = if (i < 0) tl else l(i)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            p(y * 4 + x) =
              if (x > y) (tAt(x - y - 2) + 2 * tAt(x - y - 1) + t(x - y) + 2) >> 2
              else if (x < y) (lAt(y - x - 2) + 2 * lAt(y - x - 1) + l(y - x) + 2) >> 2
              else (t(0) + 2 * tl + l(0) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 5 => // vertical-right
        need(availLeft && availTop && availTl)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * x - y
            p(y * 4 + x) =
              if (z >= 0 && z % 2 == 0) {
                val i = x - (y >> 1)
                ((if (i == 0) tl else t(i - 1)) + (if (i == 0) t(0) else t(i)) + 1) >> 1
              } else if (z >= 0) {
                val i = x - (y >> 1)
                ((if (i == 1) tl else t(i - 2)) + 2 * (if (i == 1) t(0) else t(i - 1)) + t(i) + 2) >> 2
              } else if (z == -1) (l(0) + 2 * tl + t(0) + 2) >> 2
              else (l(y - 1) + 2 * l(y - 2) + (if (y - 3 >= 0) l(y - 3) else tl) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 6 => // horizontal-down
        need(availLeft && availTop && availTl)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * y - x
            p(y * 4 + x) =
              if (z >= 0 && z % 2 == 0) {
                val i = y - (x >> 1)
                ((if (i == 0) tl else l(i - 1)) + (if (i == 0) l(0) else l(i)) + 1) >> 1
              } else if (z >= 0) {
                val i = y - (x >> 1)
                ((if (i == 1) tl else l(i - 2)) + 2 * (if (i == 1) l(0) else l(i - 1)) + l(i) + 2) >> 2
              } else if (z == -1) (t(0) + 2 * tl + l(0) + 2) >> 2
              else (t(x - 1) + 2 * t(x - 2) + (if (x - 3 >= 0) t(x - 3) else tl) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 7 => // vertical-left
        need(availTop)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val i = x + (y >> 1)
            p(y * 4 + x) =
              if (y % 2 == 0) (t(i) + t(i + 1) + 1) >> 1
              else (t(i) + 2 * t(i + 1) + t(i + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 8 => // horizontal-up
        need(availLeft)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = x + 2 * y
            p(y * 4 + x) =
              if (z > 5) l(3)
              else if (z == 5) (l(2) + 3 * l(3) + 2) >> 2
              else if (z % 2 == 0) (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
              else (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) + l(y + (x >> 1) + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case _ => throw new ParseEnd
    }
    p
  }

  /** Intra16x16 prediction (8.3.3) into a 256-entry raster array. */
  def predict16x16(st: SliceState, mbX: Int, mbY: Int, mode: Int): Array[Int] = {
    val x0 = mbX * 16; val y0 = mbY * 16
    val availLeft = x0 > 0
    val availTop = y0 > 0
    val p = new Array[Int](256)
    @inline def need(ok: Boolean): Unit = if (!ok) throw new ParseEnd
    mode match {
      case 0 =>
        need(availTop)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) { p(y * 16 + x) = st.pix(x0 + x, y0 - 1); x += 1 }
          y += 1
        }
      case 1 =>
        need(availLeft)
        var y = 0
        while (y < 16) {
          val v = st.pix(x0 - 1, y0 + y)
          var x = 0
          while (x < 16) { p(y * 16 + x) = v; x += 1 }
          y += 1
        }
      case 2 =>
        var sumT = 0; var sumL = 0
        if (availTop) { var x = 0; while (x < 16) { sumT += st.pix(x0 + x, y0 - 1); x += 1 } }
        if (availLeft) { var y = 0; while (y < 16) { sumL += st.pix(x0 - 1, y0 + y); y += 1 } }
        val v =
          if (availTop && availLeft) (sumT + sumL + 16) >> 5
          else if (availTop) (sumT + 8) >> 4
          else if (availLeft) (sumL + 8) >> 4
          else 128
        java.util.Arrays.fill(p, v)
      case 3 =>
        need(availLeft && availTop)
        var iH = 0; var iV = 0
        var i = 1
        while (i <= 8) {
          iH += i * (st.pix(x0 + 7 + i, y0 - 1) -
            (if (7 - i >= 0) st.pix(x0 + 7 - i, y0 - 1) else st.pix(x0 - 1, y0 - 1)))
          iV += i * (st.pix(x0 - 1, y0 + 7 + i) -
            (if (7 - i >= 0) st.pix(x0 - 1, y0 + 7 - i) else st.pix(x0 - 1, y0 - 1)))
          i += 1
        }
        val a = 16 * (st.pix(x0 - 1, y0 + 15) + st.pix(x0 + 15, y0 - 1))
        val b = (5 * iH + 32) >> 6
        val c = (5 * iV + 32) >> 6
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            p(y * 16 + x) = clip1((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case _ => throw new ParseEnd
    }
    p
  }

  /** Chroma 8x8 intra prediction (8.3.4) into a 64-entry raster array.
    * Mode order is CHROMA's (0=DC, 1=Horizontal, 2=Vertical, 3=Plane) —
    * deliberately different from luma 16x16's. DC is derived PER 4x4
    * block (8.3.4.1): corner blocks average both edges, the top-right
    * block prefers the top edge, the bottom-left block the left edge.
    * Availability = neighbour MB exists (raster single-slice decode order
    * makes in-frame neighbours always already reconstructed).
    */
  def predictChroma(st: SliceState, plane: Array[Byte], mbX: Int, mbY: Int,
      mode: Int): Array[Int] = {
    val x0 = mbX * 8; val y0 = mbY * 8
    val availLeft = x0 > 0
    val availTop = y0 > 0
    val p = new Array[Int](64)
    @inline def need(ok: Boolean): Unit = if (!ok) throw new ParseEnd
    @inline def top(x: Int): Int = st.cPix(plane, x0 + x, y0 - 1)
    @inline def left(y: Int): Int = st.cPix(plane, x0 - 1, y0 + y)
    mode match {
      case 0 => // DC, per 4x4 chroma block
        var blk = 0
        while (blk < 4) {
          val bx = (blk & 1) * 4; val by = (blk >> 1) * 4
          def sumTop: Int = top(bx) + top(bx + 1) + top(bx + 2) + top(bx + 3)
          def sumLeft: Int = left(by) + left(by + 1) + left(by + 2) + left(by + 3)
          val v = blk match {
            case 0 | 3 =>
              if (availLeft && availTop) (sumTop + sumLeft + 4) >> 3
              else if (availTop) (sumTop + 2) >> 2
              else if (availLeft) (sumLeft + 2) >> 2
              else 128
            case 1 => // top-right: top edge first
              if (availTop) (sumTop + 2) >> 2
              else if (availLeft) (sumLeft + 2) >> 2
              else 128
            case _ => // bottom-left: left edge first
              if (availLeft) (sumLeft + 2) >> 2
              else if (availTop) (sumTop + 2) >> 2
              else 128
          }
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) { p((by + yy) * 8 + bx + xx) = v; xx += 1 }
            yy += 1
          }
          blk += 1
        }
      case 1 => // horizontal
        need(availLeft)
        var yv = 0
        while (yv < 8) {
          val v = left(yv)
          var x = 0
          while (x < 8) { p(yv * 8 + x) = v; x += 1 }
          yv += 1
        }
      case 2 => // vertical
        need(availTop)
        var yv = 0
        while (yv < 8) {
          var x = 0
          while (x < 8) { p(yv * 8 + x) = top(x); x += 1 }
          yv += 1
        }
      case 3 => // plane (8.3.4.4; the 8x8 analogue of luma's mode 3)
        need(availLeft && availTop)
        val tl = st.cPix(plane, x0 - 1, y0 - 1)
        var iH = 0; var iV = 0
        var i = 1
        while (i <= 4) {
          iH += i * (top(3 + i) - (if (3 - i >= 0) top(3 - i) else tl))
          iV += i * (left(3 + i) - (if (3 - i >= 0) left(3 - i) else tl))
          i += 1
        }
        val a = 16 * (left(7) + top(7))
        val b = (17 * iH + 16) >> 5
        val c = (17 * iV + 16) >> 5
        var yv = 0
        while (yv < 8) {
          var x = 0
          while (x < 8) {
            p(yv * 8 + x) = clip1((a + b * (x - 3) + c * (yv - 3) + 16) >> 5)
            x += 1
          }
          yv += 1
        }
      case _ => throw new ParseEnd
    }
    p
  }

  // ---- macroblock decode -----------------------------------------------------

  /** Parse + reconstruct one Intra_4x4 macroblock (mb_type 0). */
  def decodeI4x4Mb(r: BitReader, st: SliceState, mbX: Int, mbY: Int): Unit = {
    val modes = new Array[Int](16)
    var blk = 0
    while (blk < 16) {
      val gx = mbX * 4 + blkX(blk); val gy = mbY * 4 + blkY(blk)
      val availA = gx > 0 && (blkX(blk) > 0 || mbX > 0)
      val availB = gy > 0 && (blkY(blk) > 0 || mbY > 0)
      val predMode =
        if (!availA || !availB) 2
        else math.min(st.i4mode(gy)(gx - 1), st.i4mode(gy - 1)(gx))
      val mode =
        if (r.u(1) == 1) predMode
        else {
          val rem = r.u(3)
          if (rem < predMode) rem else rem + 1
        }
      modes(blk) = mode
      st.i4mode(gy)(gx) = mode
      blk += 1
    }
    val chromaPredMode = r.ue()
    if (chromaPredMode > 3) throw new ParseEnd
    val cbpCode = r.ue()
    if (cbpCode > 47) throw new ParseEnd
    val cbp = cbpIntra(cbpCode)
    val cbpLuma = cbp & 15; val cbpChroma = cbp >> 4
    if (cbp != 0) {
      st.qp = ((st.qp + r.se()) + 104) % 52 // mb_qp_delta, mod-52 wrap (7.4.5)
      if (st.qp < 0) throw new ParseEnd
    }
    // luma residual + reconstruction, block decode order
    var i8 = 0
    while (i8 < 4) {
      var j = 0
      while (j < 4) {
        val b = 4 * i8 + j
        val gx = mbX * 4 + blkX(b); val gy = mbY * 4 + blkY(b)
        val x0 = gx * 4; val y0 = gy * 4
        var scan: Array[Int] = null
        var tc = 0
        if ((cbpLuma & (1 << i8)) != 0) {
          val res = H264Cavlc.residualBlock(r, 16, st.lumaNc(gx, gy))
          scan = res._1; tc = res._2
        } else scan = new Array[Int](16)
        val pred = predict4x4(st, x0, y0, modes(b))
        val resid = if (tc == 0 && scan.forall(_ == 0)) null else idct4x4(dequant4x4(scan, st.qp, 0))
        var yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) {
            val v = pred(yy * 4 + xx) + (if (resid == null) 0 else resid(yy * 4 + xx))
            st.setPix(x0 + xx, y0 + yy, clip1(v))
            xx += 1
          }
          yy += 1
        }
        st.lumaTc(gy)(gx) = tc
        j += 1
      }
      i8 += 1
    }
    decodeChroma(r, st, mbX, mbY, cbpChroma, chromaPredMode)
  }

  /** Parse + reconstruct one Intra_16x16 macroblock (mb_type 1..24). */
  def decodeI16x16Mb(r: BitReader, st: SliceState, mbX: Int, mbY: Int, mbType: Int): Unit = {
    val predMode = (mbType - 1) % 4
    val cbpChroma = ((mbType - 1) / 4) % 3
    val cbpLuma = if (mbType - 1 >= 12) 15 else 0
    // non-I4x4 MB: neighbors derive Intra4x4PredMode 2 (SliceState default)
    val chromaPredMode = r.ue()
    if (chromaPredMode > 3) throw new ParseEnd
    st.qp = ((st.qp + r.se()) + 104) % 52 // mb_qp_delta always present
    // DC block: nC of luma blk 0
    val (dcScan, _) = H264Cavlc.residualBlock(r, 16, st.lumaNc(mbX * 4, mbY * 4))
    // zigzag over the 4x4 DC grid, inverse Hadamard, per-DC scaling
    val dcGrid = new Array[Int](16)
    var k = 0
    while (k < 16) { dcGrid(zigzag(k)) = dcScan(k); k += 1 }
    val dcT = invHadamard4x4(dcGrid)
    val dcVal = dcT.map(scaleDc16(_, st.qp))
    val pred = predict16x16(st, mbX, mbY, predMode)
    var blk = 0
    while (blk < 16) {
      val bx = blkX(blk); val by = blkY(blk)
      val gx = mbX * 4 + bx; val gy = mbY * 4 + by
      val x0 = gx * 4; val y0 = gy * 4
      var acScan: Array[Int] = null
      var tc = 0
      if (cbpLuma != 0) {
        val res = H264Cavlc.residualBlock(r, 15, st.lumaNc(gx, gy))
        acScan = res._1; tc = res._2
      } else acScan = new Array[Int](15)
      val d = dequant4x4(acScan, st.qp, 1)
      d(0) = dcVal(by * 4 + bx) // DC grid position = block position in MB
      val resid = idct4x4(d)
      var yy = 0
      while (yy < 4) {
        var xx = 0
        while (xx < 4) {
          val v = pred((by * 4 + yy) * 16 + bx * 4 + xx) + resid(yy * 4 + xx)
          st.setPix(x0 + xx, y0 + yy, clip1(v))
          xx += 1
        }
        yy += 1
      }
      st.lumaTc(gy)(gx) = tc
      blk += 1
    }
    decodeChroma(r, st, mbX, mbY, cbpChroma, chromaPredMode)
  }

  /** Chroma residual parse + RECONSTRUCTION (7.3.5.3.2 syntax, 8.5.8
    * chroma DC dequant, shared AC dequant/IDCT, 8.3.4 prediction — round
    * 15 closed the parse-only boundary). Syntax order is the spec's: both
    * components' 2x2 DC blocks (when cbpChroma != 0), then per component
    * four AC blocks (when cbpChroma == 2), with the nC grids feeding
    * later blocks' CAVLC contexts. `predMode` is the MB header's
    * intra_chroma_pred_mode.
    */
  private def decodeChroma(r: BitReader, st: SliceState, mbX: Int, mbY: Int,
      cbpChroma: Int, predMode: Int): Unit = {
    val qpc = chromaQp(st.qp, st.chromaQpOffset)
    val dcScans = new Array[Array[Int]](2)
    if (cbpChroma != 0) {
      var comp = 0
      while (comp < 2) {
        dcScans(comp) = H264Cavlc.residualBlock(r, 4, -1)._1 // ChromaDCLevel
        comp += 1
      }
    }
    var comp = 0
    while (comp < 2) {
      val grid = if (comp == 0) st.cbTc else st.crTc
      val plane = if (comp == 0) st.cb else st.cr
      val dc = if (dcScans(comp) != null) chromaDcDequant(dcScans(comp), qpc) else null
      val pred = predictChroma(st, plane, mbX, mbY, predMode)
      var blk = 0
      while (blk < 4) {
        val gx = mbX * 2 + (blk & 1); val gy = mbY * 2 + (blk >> 1)
        var acScan: Array[Int] = null
        if (cbpChroma == 2) {
          val (scan, tc) = H264Cavlc.residualBlock(r, 15, st.chromaNc(grid, gx, gy))
          acScan = scan
          grid(gy)(gx) = tc
        } else {
          acScan = new Array[Int](15)
          grid(gy)(gx) = 0
        }
        val bx = (blk & 1) * 4; val by = (blk >> 1) * 4
        // dc == null ⇔ cbpChroma == 0 ⇔ no AC either: the residual is
        // identically zero, so the prediction IS the block — skip the
        // dequant/IDCT round trip on the per-frame hot path
        val resid =
          if (dc == null) null
          else {
            val d = dequant4x4(acScan, qpc, 1)
            d(0) = dc(blk)
            idct4x4(d)
          }
        var yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) {
            val p = pred((by + yy) * 8 + bx + xx)
            st.setCPix(plane, mbX * 8 + bx + xx, mbY * 8 + by + yy,
              clip1(if (resid == null) p else p + resid(yy * 4 + xx)))
            xx += 1
          }
          yy += 1
        }
        blk += 1
      }
      comp += 1
    }
  }

  // ---- encoder twin ----------------------------------------------------------

  /** Writer-side macroblock descriptions. Coefficients are SCAN-order
    * levels (what lands in the bitstream); the writer never computes
    * pixels — the decode side owns reconstruction, which is what the
    * closed-form oracle checks.
    */
  sealed trait MbSpec
  /** luma(xWithinMb, yWithinMb) in 0..255; chroma(comp, x, y) over the 8x8
    * chroma grid (comp 0 = Cb, 1 = Cr), mid-gray by default.
    */
  final case class PcmMb(luma: (Int, Int) => Int,
      chroma: (Int, Int, Int) => Int = (_, _, _) => 128) extends MbSpec
  /** modes: 16 Intra4x4PredModes in block order; lumaCoeff: 16 blocks x 16
    * scan levels (all-zero blocks allowed — cbp is derived); chromaDc: 2
    * components x 4 scan levels or null; chromaAc: 2x4 blocks x 15 levels
    * or null (forces cbpChroma 2); chromaMode: intra_chroma_pred_mode
    * (0=DC 1=H 2=V 3=Plane).
    */
  final case class I4x4Mb(modes: Array[Int], lumaCoeff: Array[Array[Int]],
      chromaDc: Array[Array[Int]], chromaAc: Array[Array[Array[Int]]],
      chromaMode: Int = 0) extends MbSpec
  /** predMode 0..3; dcScan: 16 scan levels of the Hadamard DC grid;
    * acCoeff: 16 blocks x 15 levels or null (cbpLuma 0); chroma as I4x4Mb.
    */
  final case class I16x16Mb(predMode: Int, dcScan: Array[Int],
      acCoeff: Array[Array[Int]], chromaDc: Array[Array[Int]],
      chromaAc: Array[Array[Array[Int]]], chromaMode: Int = 0) extends MbSpec

  /** Encode one self-contained Annex-B access unit ([SPS][PPS][IDR]) of
    * transform-coded / PCM macroblocks over a wMb x hMb grid, cropped to
    * (w, h). Deblocking is explicitly disabled so the stream is conformant
    * for a decoder (like this one) that runs no loop filter. qp is the
    * slice QP (pic_init_qp 26 + slice_qp_delta).
    */
  def encodeIdrCoded(w: Int, h: Int, qp: Int, mbs: Seq[MbSpec],
      idrPicId: Int = 0, chromaQpOffset: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0)
    require(qp >= 0 && qp <= 51)
    require(chromaQpOffset >= -12 && chromaQpOffset <= 12)
    val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
    require(mbs.length == mbW * mbH, s"need ${mbW * mbH} MBs, got ${mbs.length}")
    val sw = new BitWriter
    sw.u(66, 8); sw.u(0, 8); sw.u(10, 8) // Baseline, level 1.0
    sw.ue(0) // sps_id
    sw.ue(0) // log2_max_frame_num_minus4
    sw.ue(2) // pic_order_cnt_type 2
    sw.ue(0) // max_num_ref_frames
    sw.u(0, 1)
    sw.ue(mbW - 1); sw.ue(mbH - 1)
    sw.u(1, 1); sw.u(1, 1) // frame_mbs_only, direct_8x8_inference
    sw.u(1, 1) // frame_cropping_flag
    sw.ue(0); sw.ue((mbW * 16 - w) / 2)
    sw.ue(0); sw.ue((mbH * 16 - h) / 2)
    sw.u(0, 1) // vui
    sw.trailing()
    val pw = new BitWriter
    pw.ue(0); pw.ue(0)
    pw.u(0, 1) // CAVLC
    pw.u(0, 1)
    pw.ue(0)
    pw.ue(0); pw.ue(0)
    pw.u(0, 1); pw.u(0, 2)
    pw.se(qp - 26); pw.se(0) // pic_init_qp_minus26, pic_init_qs
    pw.se(chromaQpOffset) // chroma_qp_index_offset
    pw.u(1, 1) // deblocking_filter_control_present_flag
    pw.u(0, 1); pw.u(0, 1)
    pw.trailing()
    val iw = new BitWriter
    iw.ue(0) // first_mb_in_slice
    iw.ue(7) // slice_type I
    iw.ue(0) // pps_id
    iw.u(0, 4) // frame_num
    iw.ue(idrPicId & 0xffff)
    iw.u(0, 1); iw.u(0, 1) // dec_ref_pic_marking
    iw.se(0) // slice_qp_delta (qp carried by pic_init)
    iw.ue(1) // disable_deblocking_filter_idc = 1 (filter off)
    // encode MBs with the same neighbor-context the decoder derives
    val st = new SliceState(mbW, mbH, qp)
    var mb = 0
    while (mb < mbs.length) {
      val mbX = mb % mbW; val mbY = mb / mbW
      mbs(mb) match {
        case PcmMb(luma, chroma) =>
          iw.ue(25)
          iw.byteAlignZero()
          var i = 0
          while (i < 256) {
            iw.u(luma(i % 16, i / 16) & 0xff, 8); i += 1
          }
          var c = 0
          while (c < 128) {
            iw.u(chroma(c >> 6, (c & 63) % 8, (c & 63) / 8) & 0xff, 8)
            c += 1
          }
          st.markPcm(mbX, mbY)
        case m: I4x4Mb => encodeI4x4(iw, st, mbX, mbY, m)
        case m: I16x16Mb => encodeI16x16(iw, st, mbX, mbY, m)
      }
      mb += 1
    }
    iw.trailing()
    H264.nalUnits(sw.bytes, pw.bytes, iw.bytes)
  }

  private def chromaCbp(chromaDc: Array[Array[Int]],
      chromaAc: Array[Array[Array[Int]]]): Int =
    if (chromaAc != null) 2
    else if (chromaDc != null && chromaDc.exists(_.exists(_ != 0))) 1
    else 0

  private def encodeI4x4(w: BitWriter, st: SliceState, mbX: Int, mbY: Int,
      m: I4x4Mb): Unit = {
    w.ue(0) // mb_type I_4x4
    var blk = 0
    while (blk < 16) {
      val gx = mbX * 4 + blkX(blk); val gy = mbY * 4 + blkY(blk)
      val availA = gx > 0 && (blkX(blk) > 0 || mbX > 0)
      val availB = gy > 0 && (blkY(blk) > 0 || mbY > 0)
      val predMode =
        if (!availA || !availB) 2
        else math.min(st.i4mode(gy)(gx - 1), st.i4mode(gy - 1)(gx))
      val mode = m.modes(blk)
      if (mode == predMode) w.u(1, 1)
      else {
        w.u(0, 1)
        w.u(if (mode < predMode) mode else mode - 1, 3)
      }
      st.i4mode(gy)(gx) = mode
      blk += 1
    }
    w.ue(m.chromaMode) // intra_chroma_pred_mode
    val cbpLuma = (0 until 4).map { i8 =>
      val coded = (0 until 4).exists(j => m.lumaCoeff(4 * i8 + j).exists(_ != 0))
      if (coded) 1 << i8 else 0
    }.sum
    val cbpC = chromaCbp(m.chromaDc, m.chromaAc)
    val cbp = cbpLuma | (cbpC << 4)
    w.ue(cbpIntraInv(cbp))
    if (cbp != 0) w.se(0) // mb_qp_delta
    var i8 = 0
    while (i8 < 4) {
      var j = 0
      while (j < 4) {
        val b = 4 * i8 + j
        val gx = mbX * 4 + blkX(b); val gy = mbY * 4 + blkY(b)
        var tc = 0
        if ((cbpLuma & (1 << i8)) != 0) {
          H264Cavlc.writeResidualBlock(w, m.lumaCoeff(b), 16, st.lumaNc(gx, gy))
          tc = m.lumaCoeff(b).count(_ != 0)
        }
        st.lumaTc(gy)(gx) = tc
        j += 1
      }
      i8 += 1
    }
    writeChroma(w, st, mbX, mbY, cbpC, m.chromaDc, m.chromaAc)
  }

  private def encodeI16x16(w: BitWriter, st: SliceState, mbX: Int, mbY: Int,
      m: I16x16Mb): Unit = {
    val cbpLuma15 = m.acCoeff != null
    val cbpC = chromaCbp(m.chromaDc, m.chromaAc)
    val mbType = 1 + m.predMode + 4 * cbpC + (if (cbpLuma15) 12 else 0)
    w.ue(mbType)
    w.ue(m.chromaMode) // intra_chroma_pred_mode
    w.se(0) // mb_qp_delta
    H264Cavlc.writeResidualBlock(w, m.dcScan, 16, st.lumaNc(mbX * 4, mbY * 4))
    var blk = 0
    while (blk < 16) {
      val gx = mbX * 4 + blkX(blk); val gy = mbY * 4 + blkY(blk)
      var tc = 0
      if (cbpLuma15) {
        H264Cavlc.writeResidualBlock(w, m.acCoeff(blk), 15, st.lumaNc(gx, gy))
        tc = m.acCoeff(blk).count(_ != 0)
      }
      st.lumaTc(gy)(gx) = tc
      blk += 1
    }
    writeChroma(w, st, mbX, mbY, cbpC, m.chromaDc, m.chromaAc)
  }

  private def writeChroma(w: BitWriter, st: SliceState, mbX: Int, mbY: Int,
      cbpC: Int, dc: Array[Array[Int]], ac: Array[Array[Array[Int]]]): Unit = {
    if (cbpC != 0) {
      var comp = 0
      while (comp < 2) {
        val scan = if (dc != null) dc(comp) else new Array[Int](4)
        H264Cavlc.writeResidualBlock(w, scan, 4, -1)
        comp += 1
      }
    }
    var comp = 0
    while (comp < 2) {
      val grid = if (comp == 0) st.cbTc else st.crTc
      var blk = 0
      while (blk < 4) {
        val gx = mbX * 2 + (blk & 1); val gy = mbY * 2 + (blk >> 1)
        if (cbpC == 2) {
          val scan = ac(comp)(blk)
          H264Cavlc.writeResidualBlock(w, scan, 15, st.chromaNc(grid, gx, gy))
          grid(gy)(gx) = scan.count(_ != 0)
        } else grid(gy)(gx) = 0
        blk += 1
      }
      comp += 1
    }
  }
}
