package graft.sources

/** Intra-only H.264/AVC (ITU-T H.264 | ISO/IEC 14496-10) decoder for IDR
  * pictures — the temporal-codec step for the video family (the reference
  * pipeline treats video as opaque bytes; see /root/reference/
  * download/ingest scope). Round 11 built the I_PCM path; round 14 added
  * transform-coded macroblocks (Intra_4x4 + Intra_16x16 with CAVLC
  * residuals — see H264Cavlc/H264Coded).
  *
  * What is REAL here (the full syntax stack a conformant stream carries):
  *   - Annex-B byte-stream parsing: 3- and 4-byte start codes, NAL header
  *     (forbidden bit, nal_ref_idc, nal_unit_type),
  *   - RBSP extraction with EMULATION-PREVENTION removal (00 00 03 -> 00 00)
  *     and its exact inverse on the writer side — the part of H.264 framing
  *     that hand-rolled tooling most often gets wrong,
  *   - Exp-Golomb (ue/se) entropy decoding — H.264's header entropy layer
  *     is algorithmic, not table-driven, so a from-scratch implementation
  *     can be verified from first principles,
  *   - SPS/PPS/IDR-slice-header parsing in spec field order, including
  *     frame cropping (CropUnit 2x2 at 4:2:0) — how a 10x12 frame really
  *     ships inside 16x16 macroblocks,
  *   - the CAVLC-mode macroblock loop: I_PCM (alignment bits, raw samples),
  *     Intra_4x4 (per-block prediction-mode signalling, Table 9-4 cbp,
  *     CAVLC luma residuals, dequant + inverse 4x4 transform, all nine
  *     prediction modes) and Intra_16x16 (DC Hadamard path, AC blocks,
  *     the four 16x16 modes); chroma fully reconstructed since round 15
  *     (DC butterfly + QPc dequant, 8.3.4 prediction, PCM passthrough —
  *     see H264Coded's scope notes).
  *
  * Honest boundaries that remain (documented in H264Cavlc/H264Coded):
  * the CAVLC tables are from-memory transcriptions machine-checked for
  * structure but not externally conformance-tested (driver-blocked
  * artifact), no deblocking filter (writer twin disables it; real streams
  * that leave it on decode to pre-filter reconstruction), CABAC / High
  * profiles / inter prediction quarantine as before.
  *
  * Decoder never throws on garbage input: every read is bounds-checked and
  * any malformation returns None (the media quarantine contract; fuzz-pinned
  * in H264Spec).
  */
private[graft] object H264 {

  /** Decoded picture: cropped luma plane plus (round 15) the cropped 4:2:0
    * chroma planes, each (width/2) x (height/2) — CropUnit 2 in luma is 1
    * in chroma, and cropped dims are even by construction.
    */
  final case class Frame(width: Int, height: Int, y: Array[Byte],
      cb: Array[Byte], cr: Array[Byte]) {
    def chromaWidth: Int = width / 2
    def chromaHeight: Int = height / 2
  }

  private[graft] final class ParseEnd extends RuntimeException(null, null, false, false)

  /** MSB-first bounds-checked bit reader over one RBSP. */
  private[graft] final class BitReader(b: Array[Byte]) {
    private var bit = 0
    def bitsLeft: Int = b.length * 8 - bit
    def u(n: Int): Int = {
      if (n < 0 || n > 31 || bitsLeft < n) throw new ParseEnd
      var v = 0
      var i = 0
      while (i < n) {
        v = (v << 1) | ((b(bit >> 3) >> (7 - (bit & 7))) & 1)
        bit += 1; i += 1
      }
      v
    }
    /** Exp-Golomb unsigned: z leading zeros, '1', z info bits. z is capped
      * at 30: z=31 would overflow `1 << z` to Int.MinValue and return a
      * negative value (spec-valid codes in SPS/PPS/slice headers are far
      * below 2^30, so the cap only rejects corrupt streams).
      */
    def ue(): Int = {
      var z = 0
      while (u(1) == 0) { z += 1; if (z > 30) throw new ParseEnd }
      if (z == 0) 0 else ((1 << z) | u(z)) - 1
    }
    /** Exp-Golomb signed: 0,1,-1,2,-2,... */
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    def byteAlign(): Unit = while ((bit & 7) != 0) { if (u(1) != 0) throw new ParseEnd }
    def alignedByte(): Int = {
      if ((bit & 7) != 0 || bitsLeft < 8) throw new ParseEnd
      val v = b(bit >> 3) & 0xff
      bit += 8
      v
    }
  }

  /** Split an Annex-B byte stream into NAL unit payloads (start codes
    * excluded, header byte included). Accepts 00 00 01 and 00 00 00 01.
    */
  private[sources] def splitNals(b: Array[Byte]): Seq[Array[Byte]] = {
    if (b == null) return Seq.empty
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 3 <= b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) { starts += i + 3; i += 3 }
      else i += 1
    }
    starts.toSeq.zipWithIndex.map { case (s, idx) =>
      var e = if (idx + 1 < starts.length) starts(idx + 1) - 3 else b.length
      // a 4-byte start code leaves one extra 00 at the end of the previous NAL
      while (e > s && b(e - 1) == 0) e -= 1
      java.util.Arrays.copyOfRange(b, s, e)
    }.filter(_.nonEmpty)
  }

  /** RBSP from a NAL payload: drop the emulation-prevention byte in every
    * 00 00 03 run (the 03 itself; the spec guarantees the next byte is
    * <= 0x03). Header byte is excluded from the result.
    */
  private[sources] def rbsp(nal: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length)
    var i = 1 // skip the NAL header byte
    var zeros = 0
    while (i < nal.length) {
      val v = nal(i) & 0xff
      if (zeros >= 2 && v == 3) zeros = 0 // emulation-prevention byte: drop
      else {
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  private final case class Sps(
      widthMbs: Int, heightMbs: Int, log2MaxFrameNum: Int, pocType: Int,
      log2MaxPocLsb: Int, cropL: Int, cropR: Int, cropT: Int, cropB: Int)

  private final case class Pps(picOrderPresent: Boolean, deblockPresent: Boolean,
      picInitQp: Int, chromaQpOffset: Int)

  /** Parses the SPS fields up to cropping; returns None on profiles or
    * shapes outside the intra-PCM subset (never throws).
    */
  private def parseSps(r: BitReader): Option[Sps] = {
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    r.u(8) // level_idc
    r.ue() // sps_id
    // High profiles (100+) insert chroma_format_idc/bit-depth/scaling-list
    // fields here — out of the subset, triage as unsupported
    if (profile >= 100) return None
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    var log2MaxPocLsb = 0
    if (pocType == 0) log2MaxPocLsb = r.ue() + 4
    else if (pocType == 1) return None // delta-based POC: out of subset
    r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed_flag
    val widthMbs = r.ue() + 1
    val heightMapUnits = r.ue() + 1
    val frameMbsOnly = r.u(1)
    if (frameMbsOnly == 0) return None // interlace: out of subset
    r.u(1) // direct_8x8_inference_flag
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (r.u(1) == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    // vui_parameters_present_flag and beyond: not needed for decode
    if (widthMbs <= 0 || widthMbs > 1024 || heightMapUnits <= 0 ||
        heightMapUnits > 1024) return None
    Some(Sps(widthMbs, heightMapUnits, log2MaxFrameNum, pocType,
      log2MaxPocLsb, cl, cr, ct, cb))
  }

  private def parsePps(r: BitReader): Option[Pps] = {
    r.ue(); r.ue() // pps_id, sps_id
    if (r.u(1) == 1) return None // entropy_coding_mode: CABAC out of subset
    val picOrderPresent = r.u(1) == 1
    if (r.ue() != 0) return None // slice groups (FMO): out of subset
    r.ue(); r.ue() // num_ref_idx_l{0,1}_default_active_minus1
    r.u(1); r.u(2) // weighted_pred_flag, weighted_bipred_idc
    val picInitQp = 26 + r.se() // pic_init_qp_minus26
    r.se() // pic_init_qs_minus26
    val chromaQpOffset = r.se() // chroma_qp_index_offset (7.4.2.2: -12..12)
    val deblockPresent = r.u(1) == 1
    r.u(1); r.u(1) // constrained_intra_pred, redundant_pic_cnt_present
    if (picInitQp < 0 || picInitQp > 51) return None
    if (chromaQpOffset < -12 || chromaQpOffset > 12) return None
    Some(Pps(picOrderPresent, deblockPresent, picInitQp, chromaQpOffset))
  }

  /** Decodes the first IDR picture of an Annex-B stream — I_PCM,
    * Intra_4x4, and Intra_16x16 macroblocks in any mix (CAVLC entropy;
    * round 14 closed the I_PCM-only boundary). Returns the CROPPED luma
    * plane. None on anything malformed or outside the subset.
    */
  def decodeIdr(annexB: Array[Byte]): Option[Frame] = decodeIdrPcm(annexB)

  /** Historic name of [[decodeIdr]] (round-11 API, kept for the mm8
    * fixtures' call sites; since round 14 it decodes coded MBs too).
    */
  def decodeIdrPcm(annexB: Array[Byte]): Option[Frame] = {
    try {
      var sps: Option[Sps] = None
      var pps: Option[Pps] = None
      splitNals(annexB).foreach { nal =>
        if ((nal(0) & 0x80) != 0) return None // forbidden_zero_bit set
        val nalType = nal(0) & 0x1f
        nalType match {
          case 7 => sps = parseSps(new BitReader(rbsp(nal)))
          case 8 => pps = parsePps(new BitReader(rbsp(nal)))
          case 5 =>
            (sps, pps) match {
              case (Some(s), Some(p)) =>
                return decodeIdrSlice(new BitReader(rbsp(nal)), s, p)
              case _ => return None // slice before its parameter sets
            }
          case _ => () // SEI / AUD / filler: skip
        }
      }
      None
    // IndexOutOfBoundsException, not its Array subclass: System.arraycopy
    // only guarantees the parent type, and a corrupt-offset copy must stay
    // inside the decoder's own None contract, not escape to the caller.
    } catch { case _: ParseEnd | _: IndexOutOfBoundsException => None }
  }

  private def decodeIdrSlice(r: BitReader, sps: Sps, pps: Pps): Option[Frame] = {
    val firstMb = r.ue()
    val sliceType = r.ue()
    if (sliceType != 2 && sliceType != 7) return None // I slices only
    if (firstMb != 0) return None // single-slice subset
    r.ue() // pps_id
    r.u(sps.log2MaxFrameNum) // frame_num
    r.ue() // idr_pic_id
    if (sps.pocType == 0) {
      r.u(sps.log2MaxPocLsb) // pic_order_cnt_lsb
      if (pps.picOrderPresent) r.se() // delta_pic_order_cnt_bottom
    }
    // dec_ref_pic_marking for IDR
    r.u(1); r.u(1) // no_output_of_prior_pics_flag, long_term_reference_flag
    val sliceQp = pps.picInitQp + r.se() // slice_qp_delta
    if (sliceQp < 0 || sliceQp > 51) return None
    if (pps.deblockPresent) {
      val idc = r.ue()
      if (idc != 1) { r.se(); r.se() }
    }
    // --- slice data: I_PCM / Intra_4x4 / Intra_16x16 macroblock loop ---
    val wMb = sps.widthMbs; val hMb = sps.heightMbs
    val st = new H264Coded.SliceState(wMb, hMb, sliceQp, pps.chromaQpOffset)
    val lumaW = st.lumaW; val lumaH = st.lumaH
    val yPlane = st.y
    var mb = 0
    val nMbs = wMb * hMb
    while (mb < nMbs) {
      val mbType = r.ue()
      val mbX = mb % wMb; val mbY = mb / wMb
      if (mbType == 25) { // I_PCM
        r.byteAlign() // pcm_alignment_zero_bit(s)
        val mbx = mbX * 16; val mby = mbY * 16
        var i = 0
        while (i < 256) { // pcm_sample_luma, raster within the MB
          yPlane((mby + i / 16) * lumaW + mbx + (i % 16)) =
            r.alignedByte().toByte
          i += 1
        }
        var c = 0
        while (c < 128) { // pcm_sample_chroma: 64 Cb then 64 Cr, 8x8 raster
          val plane = if (c < 64) st.cb else st.cr
          val idx = c & 63
          st.setCPix(plane, mbX * 8 + (idx % 8), mbY * 8 + idx / 8,
            r.alignedByte())
          c += 1
        }
        st.markPcm(mbX, mbY)
      } else if (mbType == 0) H264Coded.decodeI4x4Mb(r, st, mbX, mbY)
      else if (mbType >= 1 && mbType <= 24) H264Coded.decodeI16x16Mb(r, st, mbX, mbY, mbType)
      else return None // not an I-slice mb_type
      mb += 1
    }
    // crop window (CropUnitX = CropUnitY = 2 at 4:2:0 frame-only)
    val x0 = 2 * sps.cropL; val y0 = 2 * sps.cropT
    val w = lumaW - 2 * (sps.cropL + sps.cropR)
    val h = lumaH - 2 * (sps.cropT + sps.cropB)
    if (w <= 0 || h <= 0 || x0 + w > lumaW || y0 + h > lumaH) return None
    val out = new Array[Byte](w * h)
    var yy = 0
    while (yy < h) {
      System.arraycopy(yPlane, (y0 + yy) * lumaW + x0, out, yy * w, w)
      yy += 1
    }
    // chroma crop: CropUnit 2 in luma == 1 chroma sample; cropped luma dims
    // are even, so the chroma window is exactly (w/2) x (h/2)
    val cw = w / 2; val ch = h / 2
    val cx0 = sps.cropL; val cy0 = sps.cropT
    val outCb = new Array[Byte](cw * ch)
    val outCr = new Array[Byte](cw * ch)
    var cy = 0
    while (cy < ch) {
      System.arraycopy(st.cb, (cy0 + cy) * st.chromaW + cx0, outCb, cy * cw, cw)
      System.arraycopy(st.cr, (cy0 + cy) * st.chromaW + cx0, outCr, cy * cw, cw)
      cy += 1
    }
    Some(Frame(w, h, out, outCb, outCr))
  }

  // ------------------------------------------------------------------ writer

  /** MSB-first bit writer. */
  private[graft] final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nb += 1
        if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def ue(v: Int): Unit = {
      val code = v + 1
      val z = 31 - Integer.numberOfLeadingZeros(code)
      u(0, z); u(code, z + 1)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def byteAlignZero(): Unit = while (nb != 0) u(0, 1)
    def trailing(): Unit = { u(1, 1); byteAlignZero() } // rbsp_stop_one_bit
    def bytes: Array[Byte] = { require(nb == 0); buf.toByteArray }
  }

  /** NAL serialization: header byte + RBSP with emulation-prevention bytes
    * inserted (00 00 followed by 00/01/02/03 gets a 03 spacer).
    */
  private def nal(header: Int, rbspBytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbspBytes.length + 8)
    out.write(0); out.write(0); out.write(0); out.write(1) // start code
    out.write(header)
    var zeros = 0
    rbspBytes.foreach { b =>
      val v = b & 0xff
      if (zeros >= 2 && v <= 3) { out.write(3); zeros = 0 }
      out.write(v)
      zeros = if (v == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** [SPS][PPS][IDR] Annex-B serialization from three RBSPs. */
  private[sources] def nalUnits(sps: Array[Byte], pps: Array[Byte],
      idr: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // nal_ref_idc 3 for SPS/PPS/IDR (reference material)
    out.write(nal(0x67, sps)); out.write(nal(0x68, pps))
    out.write(nal(0x65, idr))
    out.toByteArray
  }

  /** One self-contained Annex-B access unit ([SPS][PPS][IDR]) carrying the
    * given luma plane as I_PCM macroblocks over an arbitrary macroblock
    * grid, cropped to (w, h) via the SPS cropping window. Chroma is the
    * constant mid-gray 128. `w`/`h` must be even (CropUnit is 2 at 4:2:0).
    */
  private[graft] def encodeIdrPcm(w: Int, h: Int, luma: (Int, Int) => Int,
      idrPicId: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0)
    val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
    // SPS
    val sw = new BitWriter
    sw.u(66, 8) // profile_idc: Baseline
    sw.u(0, 8) // constraint flags + reserved zeros
    sw.u(10, 8) // level_idc 1.0
    sw.ue(0) // sps_id
    sw.ue(0) // log2_max_frame_num_minus4
    sw.ue(2) // pic_order_cnt_type 2 (derived POC: no further fields)
    sw.ue(0) // max_num_ref_frames
    sw.u(0, 1) // gaps_in_frame_num_value_allowed_flag
    sw.ue(mbW - 1) // pic_width_in_mbs_minus1
    sw.ue(mbH - 1) // pic_height_in_map_units_minus1
    sw.u(1, 1) // frame_mbs_only_flag
    sw.u(1, 1) // direct_8x8_inference_flag
    sw.u(1, 1) // frame_cropping_flag
    sw.ue(0); sw.ue((mbW * 16 - w) / 2) // crop left, right (units of 2 px)
    sw.ue(0); sw.ue((mbH * 16 - h) / 2) // crop top, bottom
    sw.u(0, 1) // vui_parameters_present_flag
    sw.trailing()
    // PPS
    val pw = new BitWriter
    pw.ue(0); pw.ue(0) // pps_id, sps_id
    pw.u(0, 1) // entropy_coding_mode_flag: CAVLC
    pw.u(0, 1) // bottom_field_pic_order_in_frame_present_flag
    pw.ue(0) // num_slice_groups_minus1
    pw.ue(0); pw.ue(0) // num_ref_idx defaults
    pw.u(0, 1); pw.u(0, 2) // weighted_pred_flag, weighted_bipred_idc
    pw.se(0); pw.se(0); pw.se(0) // init qp/qs, chroma_qp_offset
    pw.u(0, 1) // deblocking_filter_control_present_flag
    pw.u(0, 1) // constrained_intra_pred_flag
    pw.u(0, 1) // redundant_pic_cnt_present_flag
    pw.trailing()
    // IDR slice
    val iw = new BitWriter
    iw.ue(0) // first_mb_in_slice
    iw.ue(7) // slice_type: I (all slices of the picture)
    iw.ue(0) // pps_id
    iw.u(0, 4) // frame_num (log2MaxFrameNum = 4)
    iw.ue(idrPicId & 0xffff)
    iw.u(0, 1); iw.u(0, 1) // dec_ref_pic_marking (IDR)
    iw.se(0) // slice_qp_delta
    // all-I_PCM macroblocks in raster order
    var mb = 0
    while (mb < mbW * mbH) {
      val bx = (mb % mbW) * 16; val by = (mb / mbW) * 16
      iw.ue(25) // mb_type I_PCM
      iw.byteAlignZero() // pcm_alignment_zero_bit(s)
      var i = 0
      while (i < 256) {
        val x = bx + i % 16; val y = by + i / 16
        iw.u(if (x < w && y < h) luma(x, y) & 0xff else 0, 8)
        i += 1
      }
      var c = 0
      while (c < 128) { iw.u(128, 8); c += 1 }
      mb += 1
    }
    iw.trailing()
    nalUnits(sw.bytes, pw.bytes, iw.bytes)
  }
}
