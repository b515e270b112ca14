package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264, H264Coded, Multimodal}
import graft.sources.H264Coded.{I16x16Mb, I4x4Mb, MbSpec, PcmMb}

/** Transform-coded H.264 decode correctness. Golden residual values come
  * from tools/h264_residual_ref.py — an INDEPENDENT python implementation
  * of the spec's dequant/IDCT/Hadamard equations — so these tests are a
  * cross-implementation check, not the decoder testing itself.
  */
class H264CodedSpec extends AnyFunSuite {

  // tools/h264_residual_ref.py output: R[qp][pid] as 4x4 row-major
  private val golden: Map[(Int, Int), Array[Int]] = Map(
    (28, 0) -> Array(13, 6, -6, -12, 6, 3, -3, -6, -6, -3, 3, 6, -12, -6, 6, 13),
    (28, 1) -> Array(-7, -11, 1, 18, -4, -6, 1, 9, 4, 6, -1, -9, 8, 11, -1, -17),
    (28, 2) -> Array(-12, 10, 20, -17, -10, 13, 3, -5, 5, -2, -12, 10, 18, -20, -10, 13),
    (28, 3) -> Array(18, 11, -11, -18, 24, 14, -14, -24, -19, -24, 24, 19, -23, -1, 1, 23),
    (31, 0) -> Array(18, 9, -9, -18, 9, 5, -4, -9, -9, -4, 5, 9, -18, -9, 9, 18),
    (31, 1) -> Array(-11, -16, 2, 25, -5, -8, 1, 13, 6, 8, -1, -12, 11, 16, -2, -25),
    (31, 2) -> Array(-17, 14, 28, -24, -14, 18, 4, -7, 7, -3, -17, 14, 25, -28, -14, 18),
    (31, 3) -> Array(26, 16, -16, -26, 35, 20, -20, -35, -28, -34, 34, 28, -33, -2, 2, 33))
  private val goldenFlat: Map[(Int, Int), Int] = Map(
    (28, 40) -> 3, (28, 80) -> 5, (28, 120) -> 8, (28, 160) -> 10, (28, 200) -> 13,
    (31, 40) -> 3, (31, 80) -> 7, (31, 120) -> 10, (31, 160) -> 14, (31, 200) -> 17)

  private def pattern(pid: Int): Array[Int] = {
    val scan = new Array[Int](16)
    Multimodal.residualPatterns(pid).foreach { case (i, v) => scan(i) = v }
    scan
  }

  private def i4x4AllPattern(pid: Int): I4x4Mb =
    I4x4Mb(Array.fill(16)(2), Array.fill(16)(pattern(pid)),
      Array(Array(2, 0, 0, 0), Array(-2, 1, 0, 0)), null)

  private def decode(w: Int, h: Int, qp: Int, mbs: Seq[MbSpec]): H264.Frame =
    H264.decodeIdr(H264Coded.encodeIdrCoded(w, h, qp, mbs))
      .getOrElse(fail(s"decode failed (w=$w h=$h qp=$qp)"))

  test("I_4x4 single-pattern frames reconstruct 128 + golden residual (both QPs)") {
    for (qp <- Seq(28, 31); pid <- 0 until 4) {
      val f = decode(16, 16, qp, Seq(i4x4AllPattern(pid)))
      val r = golden((qp, pid))
      for (y <- 0 until 16; x <- 0 until 16) {
        val got = f.y(y * 16 + x) & 0xff
        assert(got === 128 + r((y % 4) * 4 + (x % 4)),
          s"qp=$qp pid=$pid pixel ($x,$y)")
      }
    }
  }

  test("I_4x4 mixed-pattern frame keeps every DC prediction at 128") {
    // the mm9 shape: pattern id varies per block
    val coeffs = Array.tabulate(16)(b => pattern(b % 4))
    val mb = I4x4Mb(Array.fill(16)(2), coeffs,
      Array(Array(2, 0, 0, 0), Array(-2, 1, 0, 0)), null)
    val f = decode(16, 16, 28, Seq(mb))
    for (y <- 0 until 16; x <- 0 until 16) {
      // block index is QUAD order (6.4.3), not raster
      val bx = x / 4; val by = y / 4
      val b = 4 * ((by >> 1) * 2 + (bx >> 1)) + (by & 1) * 2 + (bx & 1)
      val pid = b % 4
      val got = f.y(y * 16 + x) & 0xff
      assert(got === 128 + golden((28, pid))((y % 4) * 4 + (x % 4)),
        s"pixel ($x,$y) pid=$pid")
    }
  }

  test("I_16x16 DC-only frames are flat 128 + golden value") {
    for (qp <- Seq(28, 31); l <- Seq(40, 80, 120, 160, 200)) {
      val dc = new Array[Int](16); dc(0) = l
      val mb = I16x16Mb(2, dc, null, Array(Array(5, 0, 0, 0), Array(-5, 0, 0, 0)), null)
      val f = decode(16, 16, qp, Seq(mb))
      val want = 128 + goldenFlat((qp, l))
      assert(f.y.forall(b => (b & 0xff) == want), s"qp=$qp L=$l")
    }
  }

  test("chroma AC presence changes bits but not luma (parse exactness)") {
    val withAc = I4x4Mb(Array.fill(16)(2), Array.fill(16)(pattern(3)),
      Array(Array(2, 0, 0, 0), Array(-2, 1, 0, 0)),
      Array.tabulate(2, 4) { (c, b) =>
        val a = new Array[Int](15); if (b == c) { a(0) = 3; a(2) = -1 }; a
      })
    val f = decode(16, 16, 31, Seq(withAc))
    val r = golden((31, 3))
    for (y <- 0 until 16; x <- 0 until 16)
      assert((f.y(y * 16 + x) & 0xff) === 128 + r((y % 4) * 4 + (x % 4)))
  }

  test("cropping applies to coded frames (the mm9 w x h windows)") {
    for (id <- 0L until 12L) {
      val w = 8 + (id % 4).toInt * 2; val h = 6 + (id % 3).toInt * 2
      val f = decode(w, h, 28, Seq(i4x4AllPattern(((id % 4)).toInt)))
      assert(f.width === w && f.height === h)
      val r = golden((28, (id % 4).toInt))
      for (y <- 0 until h; x <- 0 until w)
        assert((f.y(y * w + x) & 0xff) === 128 + r((y % 4) * 4 + (x % 4)))
    }
  }

  test("PCM and coded macroblocks mix in one slice; PCM neighbors feed nC/prediction") {
    // 2x1 MB frame: left PCM constant 77, right I_4x4 all-DC zero residual
    // -> right MB must flat-fill with DC of its left neighbor edge = 77
    val mbs = Seq(
      PcmMb((_, _) => 77),
      I4x4Mb(Array.fill(16)(2), Array.fill(16)(new Array[Int](16)), null, null))
    val f = decode(32, 16, 28, mbs)
    for (y <- 0 until 16; x <- 0 until 32)
      assert((f.y(y * 32 + x) & 0xff) === 77, s"($x,$y)")
  }

  test("zero-residual directional 4x4 modes replicate PCM neighbor pixels") {
    // left MB: PCM with a horizontal gradient; right MB mode 1 (horizontal)
    // copies each row's left edge across
    val grad = PcmMb((x, y) => 60 + y * 3)
    val zero16 = Array.fill(16)(new Array[Int](16))
    val hMb = I4x4Mb(Array.fill(16)(1), zero16, null, null)
    val fH = decode(32, 16, 28, Seq(grad, hMb))
    for (y <- 0 until 16; x <- 16 until 32)
      assert((fH.y(y * 32 + x) & 0xff) === 60 + y * 3, s"H ($x,$y)")
    // top MB: PCM with a vertical-stripe gradient; bottom MB mode 0
    // (vertical) copies each column down (1x2 MB grid)
    val vstripes = PcmMb((x, _) => 40 + x * 2)
    val vMb = I4x4Mb(Array.fill(16)(0), zero16, null, null)
    val fV = decode(16, 32, 28, Seq(vstripes, vMb))
    for (y <- 16 until 32; x <- 0 until 16)
      assert((fV.y(y * 16 + x) & 0xff) === 40 + x * 2, s"V ($x,$y)")
  }

  test("all nine 4x4 modes and 16x16 V/H/plane are exact on constant neighbors") {
    // every prediction formula is a weighted mean, so constant-121
    // neighbors must reproduce 121 exactly through every mode
    val const = PcmMb((_, _) => 121)
    val zero16 = Array.fill(16)(new Array[Int](16))
    for (mode <- 0 to 8) {
      // 2x2 MB grid: three PCM MBs, bottom-right runs the mode under test
      // (interior position => left/top/top-left all available; top-right
      // unavailable for the bottom-right MB's rightmost blocks exercises
      // the t(3) replication rule)
      val mbs = Seq(const, const, const,
        I4x4Mb(Array.fill(16)(mode), zero16, null, null))
      val f = decode(32, 32, 28, mbs)
      for (y <- 16 until 32; x <- 16 until 32)
        assert((f.y(y * 32 + x) & 0xff) === 121, s"mode=$mode ($x,$y)")
    }
    for (mode16 <- 0 to 3) {
      val dc = new Array[Int](16)
      val mbs = Seq(const, const, const, I16x16Mb(mode16, dc, null, null, null))
      val f = decode(32, 32, 28, mbs)
      for (y <- 16 until 32; x <- 16 until 32)
        assert((f.y(y * 32 + x) & 0xff) === 121, s"mode16=$mode16 ($x,$y)")
    }
  }

  test("multi-MB coded frames with cross-MB nC adaptation round-trip") {
    // 3x2 grid of I_4x4 pattern MBs: neighbor totalCoeff flows across MB
    // boundaries, pushing coeff_token into the nC>=2 tables
    val mbs = (0 until 6).map(i => i4x4AllPattern(i % 4))
    val f = decode(48, 32, 31, mbs)
    for (my <- 0 until 2; mx <- 0 until 3) {
      val r = golden((31, (my * 3 + mx) % 4))
      for (y <- 0 until 16; x <- 0 until 16) {
        val got = f.y((my * 16 + y) * 48 + mx * 16 + x) & 0xff
        assert(got === 128 + r((y % 4) * 4 + (x % 4)), s"MB($mx,$my) ($x,$y)")
      }
    }
  }

  test("mm9 fixture AUs decode for every media/frame shape") {
    for (id <- Seq(1L, 5L, 9L, 13L, 17L, 21L, 101L, 1001L); k <- 0 until 4) {
      if (k < Multimodal.vidNFrames(id)) {
        val au = Multimodal.residualAu(id, k)
        val f = H264.decodeIdr(au).getOrElse(fail(s"id=$id k=$k failed"))
        assert(f.width === 8 + (id % 4) * 2 && f.height === 6 + (id % 3) * 2)
      }
    }
  }

  // ---- chroma reconstruction (round 15). Goldens from
  // tools/h264_residual_ref.py's independent chroma derivation. ------------

  private def chromaMb(dc: Array[Array[Int]], ac: Array[Array[Array[Int]]],
      mode: Int = 0): I4x4Mb =
    I4x4Mb(Array.fill(16)(2), Array.fill(16)(new Array[Int](16)), dc, ac, mode)

  test("chroma DC-only blocks reconstruct 128 + golden per-block residual") {
    val goldCr = Map(28 -> Array(0, -1, 0, -1), 31 -> Array(-1, -2, -1, -2))
    for (qp <- Seq(28, 31)) {
      val f = decode(16, 16, qp,
        Seq(chromaMb(Array(Array(8, 0, 0, 0), Array(-8, 4, 0, 0)), null)))
      assert(f.chromaWidth === 8 && f.chromaHeight === 8)
      for (cy <- 0 until 8; cx <- 0 until 8) {
        val blk = (cy / 4) * 2 + cx / 4
        assert((f.cb(cy * 8 + cx) & 0xff) === 129, s"qp=$qp Cb ($cx,$cy)")
        assert((f.cr(cy * 8 + cx) & 0xff) === 128 + goldCr(qp)(blk),
          s"qp=$qp Cr ($cx,$cy)")
      }
    }
  }

  test("chroma DC+AC blocks match the python reference per position") {
    val ac = Array.tabulate(2, 4) { (c, b) =>
      val a = new Array[Int](15)
      a(0) = 2 + c + b; a(2) = -(1 + ((c + b) % 2)); a
    }
    val f = decode(16, 16, 28,
      Seq(chromaMb(Array(Array(8, 0, 0, 0), Array(-8, 4, 0, 0)), ac)))
    val goldCb0 = Array(7, 2, -8, -13, 15, 10, 0, -5, 15, 10, 0, -5, 7, 2, -8, -13)
    val goldCr3 = Array(25, 10, -20, -35, 33, 18, -12, -27, 33, 18, -12, -27,
      25, 10, -20, -35)
    for (cy <- 0 until 4; cx <- 0 until 4) {
      assert((f.cb(cy * 8 + cx) & 0xff) === 128 + goldCb0(cy * 4 + cx),
        s"Cb blk0 ($cx,$cy)")
      assert((f.cr((4 + cy) * 8 + 4 + cx) & 0xff) === 128 + goldCr3(cy * 4 + cx),
        s"Cr blk3 ($cx,$cy)")
    }
  }

  test("chroma_qp_index_offset drives QPc through Table 8-15") {
    // qp 31 + offset 12 -> qPI 43 -> QPc 37 (table tail); -12 -> 19 (identity)
    val dc = Array(Array(8, 0, 0, 0), Array(8, 0, 0, 0))
    val fPlus = H264.decodeIdr(H264Coded.encodeIdrCoded(16, 16, 31,
      Seq(chromaMb(dc, null)), chromaQpOffset = 12)).get
    assert(fPlus.cb.forall(b => (b & 0xff) == 131), "offset +12: res 3")
    val fMinus = H264.decodeIdr(H264Coded.encodeIdrCoded(16, 16, 31,
      Seq(chromaMb(dc, null)), chromaQpOffset = -12)).get
    assert(fMinus.cb.forall(b => (b & 0xff) == 128), "offset -12: res 0")
  }

  test("I_PCM chroma samples pass through to the chroma planes") {
    val f = decode(16, 16, 28,
      Seq(PcmMb((_, _) => 50, (comp, x, y) => 10 + comp * 100 + x + 8 * y)))
    for (cy <- 0 until 8; cx <- 0 until 8) {
      assert((f.cb(cy * 8 + cx) & 0xff) === 10 + cx + 8 * cy, s"Cb ($cx,$cy)")
      assert((f.cr(cy * 8 + cx) & 0xff) === 110 + cx + 8 * cy, s"Cr ($cx,$cy)")
    }
  }

  test("chroma prediction modes replicate PCM neighbors (H, V, DC, plane)") {
    // horizontal: left PCM MB with per-row chroma gradient; right MB mode 1
    val grad = PcmMb((_, _) => 90, (comp, _, y) => 40 + comp * 20 + y * 3)
    val fH = decode(32, 16, 28, Seq(grad, chromaMb(null, null, mode = 1)))
    for (cy <- 0 until 8; cx <- 8 until 16) {
      assert((fH.cb(cy * 16 + cx) & 0xff) === 40 + cy * 3, s"H Cb ($cx,$cy)")
      assert((fH.cr(cy * 16 + cx) & 0xff) === 60 + cy * 3, s"H Cr ($cx,$cy)")
    }
    // vertical: top PCM MB with per-column stripes; bottom MB mode 2
    val stripes = PcmMb((_, _) => 90, (comp, x, _) => 30 + comp * 10 + x * 2)
    val fV = decode(16, 32, 28, Seq(stripes, chromaMb(null, null, mode = 2)))
    for (cy <- 8 until 16; cx <- 0 until 8) {
      assert((fV.cb(cy * 8 + cx) & 0xff) === 30 + cx * 2, s"V Cb ($cx,$cy)")
      assert((fV.cr(cy * 8 + cx) & 0xff) === 40 + cx * 2, s"V Cr ($cx,$cy)")
    }
    // DC and plane are weighted means: constant-95 neighbors reproduce 95
    val const = PcmMb((_, _) => 95, (_, _, _) => 95)
    for (mode <- Seq(0, 3)) {
      val f = decode(32, 32, 28,
        Seq(const, const, const, chromaMb(null, null, mode = mode)))
      for (cy <- 8 until 16; cx <- 8 until 16) {
        assert((f.cb(cy * 16 + cx) & 0xff) === 95, s"mode=$mode Cb ($cx,$cy)")
        assert((f.cr(cy * 16 + cx) & 0xff) === 95, s"mode=$mode Cr ($cx,$cy)")
      }
    }
  }

  test("chroma DC prediction edge preference: top-right block uses top, " +
    "bottom-left uses left") {
    // top neighbor only (1x2 grid, predicting MB is the BOTTOM one): its
    // blk2 (bottom-left) has no left edge -> falls back to top; per-block
    // DC sums come from the top MB's column stripes
    val stripes = PcmMb((_, _) => 90, (_, x, _) => 100 + x * 4)
    val f = decode(16, 32, 28, Seq(stripes, chromaMb(null, null)))
    // top edge values 100,104,...,128; blk0/blk2 use cols 0-3 (mean 106),
    // blk1/blk3 use cols 4-7 (mean 122)
    for (cy <- 8 until 16; cx <- 0 until 8) {
      val want = if (cx < 4) 106 else 122
      assert((f.cb(cy * 8 + cx) & 0xff) === want, s"Cb ($cx,$cy)")
    }
  }

  test("fuzz: corrupted residual streams never throw (quarantine contract)") {
    val rnd = new scala.util.Random(20260815L)
    val base = Multimodal.residualAu(5L, 0)
    var decoded = 0
    for (_ <- 0 until 2000) {
      val b = base.clone()
      val flips = 1 + rnd.nextInt(6)
      for (_ <- 0 until flips) {
        val i = rnd.nextInt(b.length)
        b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      if (H264.decodeIdr(b).isDefined) decoded += 1
    }
    // truncations too
    for (len <- 0 until base.length by 3)
      H264.decodeIdr(java.util.Arrays.copyOf(base, len))
    assert(decoded >= 0) // reaching here without a throw is the contract
  }
}
