package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{H264, Multimodal}

/** The H.264 intra (I_PCM) codec twin: exact round-trip across every
  * fixture frame geometry, emulation-prevention correctness on the byte
  * patterns PCM payloads actually produce, start-code splitting, the
  * unsupported-shape triage, and the never-throw fuzz contract.
  */
class H264Spec extends AnyFunSuite {

  test("encode/decode round-trips every fixture geometry exactly") {
    // ids 0..11 cover all (w, h) = (8+2*(id%4), 6+2*(id%3)) combinations,
    // i.e. cropping from 2 to 8 luma columns/rows off the 16x16 macroblock
    for (id <- 0L to 11L; k <- 0 until Multimodal.vidNFrames(id)) {
      val w = Multimodal.frameW(id); val h = Multimodal.frameH(id)
      val au = H264.encodeIdrPcm(w, h, Multimodal.framePix(id, k, _, _), k)
      val f = H264.decodeIdrPcm(au).getOrElse(
        fail(s"id=$id k=$k failed to decode"))
      assert(f.width == w && f.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((f.y(y * w + x) & 0xff) == Multimodal.framePix(id, k, x, y),
          s"pixel ($x,$y) of id=$id k=$k")
    }
  }

  test("multi-macroblock grids round-trip (the loop one-MB fixtures never hit)") {
    // 40x34 = 3x3 macroblocks with asymmetric right/bottom cropping;
    // also a wide 1xN and tall Nx1 grid
    for ((w, h) <- Seq((40, 34), (48, 16), (16, 48), (34, 40))) {
      val au = H264.encodeIdrPcm(w, h, (x, y) => (x * 31 + y * 17 + 5) % 251)
      val f = H264.decodeIdrPcm(au).getOrElse(fail(s"${w}x$h failed"))
      assert(f.width == w && f.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((f.y(y * w + x) & 0xff) == (x * 31 + y * 17 + 5) % 251,
          s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("emulation prevention: zero-run PCM payloads survive the byte stream") {
    // an all-zero luma plane makes the raw RBSP carry long 00 runs that
    // MUST be escaped — otherwise they read back as start codes
    val au = H264.encodeIdrPcm(16, 16, (_, _) => 0)
    // inside NAL payloads (between start codes) no 00 00 0x with x <= 1 may
    // survive: 00 00 00 / 00 00 01 would terminate or resync the NAL
    val starts = (0 until au.length - 3).filter(i =>
      au(i) == 0 && au(i + 1) == 0 && au(i + 2) == 0 && au(i + 3) == 1)
    assert(starts.size == 3, "three NAL units expected")
    for (i <- 0 until au.length - 2) {
      val isStart = starts.exists(s => i >= s && i < s + 4)
      if (!isStart)
        assert(!(au(i) == 0 && au(i + 1) == 0 && (au(i + 2) & 0xfe) == 0),
          s"unescaped zero-run at byte $i")
    }
    val f = H264.decodeIdrPcm(au).get
    assert(f.y.forall(_ == 0))
    // and a plane full of 0x03s (the escape byte itself) round-trips too
    val au3 = H264.encodeIdrPcm(16, 16, (_, _) => 3)
    assert(H264.decodeIdrPcm(au3).get.y.forall(_ == 3))
  }

  test("3-byte start codes decode identically to 4-byte ones") {
    val au4 = H264.encodeIdrPcm(8, 6, (x, y) => (x * 3 + y * 5) % 251)
    // rewrite every 00 00 00 01 start code to the short 00 00 01 form
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < au4.length) {
      if (i + 4 <= au4.length && au4(i) == 0 && au4(i + 1) == 0 &&
          au4(i + 2) == 0 && au4(i + 3) == 1) {
        out.write(0); out.write(0); out.write(1); i += 4
      } else { out.write(au4(i)); i += 1 }
    }
    val a = H264.decodeIdrPcm(au4).get
    val b = H264.decodeIdrPcm(out.toByteArray).get
    assert(a.width == b.width && a.height == b.height &&
      java.util.Arrays.equals(a.y, b.y))
  }

  test("unsupported shapes triage to None, never wrong pixels") {
    val au = H264.encodeIdrPcm(8, 6, (_, _) => 7)
    // slice arriving before its parameter sets: drop SPS+PPS (keep the
    // IDR NAL only)
    val idrStart = {
      val starts = (0 until au.length - 3).filter(i =>
        au(i) == 0 && au(i + 1) == 0 && au(i + 2) == 0 && au(i + 3) == 1)
      starts(2)
    }
    assert(H264.decodeIdrPcm(java.util.Arrays.copyOfRange(
      au, idrStart, au.length)).isEmpty)
    // empty / garbage inputs
    assert(H264.decodeIdrPcm(Array.emptyByteArray).isEmpty)
    assert(H264.decodeIdrPcm(Array.fill[Byte](64)(0x5a)).isEmpty)
  }

  test("fuzz: corrupted streams return None or a frame, never throw") {
    val rnd = new scala.util.Random(11)
    val base = H264.encodeIdrPcm(12, 10, (x, y) => (x * 7 + y * 11) % 251)
    var decoded = 0
    for (_ <- 1 to 2000) {
      val b = base.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips) {
        val i = rnd.nextInt(b.length)
        b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      // must not throw — None or Some are both acceptable outcomes
      if (H264.decodeIdrPcm(b).isDefined) decoded += 1
    }
    // truncations too
    for (len <- 0 until base.length)
      H264.decodeIdrPcm(java.util.Arrays.copyOf(base, len))
    assert(decoded >= 0) // the assertion is "we got here without throwing"
  }

  test("mp4-wrapped h264 samples decode through videoFrames with quarantine") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("kind", StringType),
      StructField("payload", BinaryType)))
    val good = Multimodal.framedMp4BytesCodec(5L, "h264")
    // poison ONE frame's bytes in a second video: its other frames and the
    // good video must still decode (per-frame quarantine)
    val bad = Multimodal.framedMp4BytesCodec(8L, "h264")
    val info = Multimodal.Mp4.parse(bad).get
    val f0 = info.chunkOff.toInt
    java.util.Arrays.fill(bad, f0, f0 + info.sampleSizes(0).toInt, 0x11.toByte)
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        Row(5L, "video", good), Row(8L, "video", bad))), schema)
    val rows = Multimodal.videoFrames(df).collect()
    val byId = rows.groupBy(_.getLong(0))
    assert(byId(5L).length == Multimodal.vidNFrames(5L))
    assert(byId(8L).length == Multimodal.vidNFrames(8L) - 1) // frame 0 gone
    // spot-check one decoded sum against the closed form
    val r0 = byId(5L).minBy(_.getLong(1))
    val w = Multimodal.frameW(5L); val h = Multimodal.frameH(5L)
    val expect = (for (x <- 0 until w; y <- 0 until h)
      yield Multimodal.framePix(5L, 0, x, y).toLong).sum
    assert(r0.getLong(5) == expect)
  }
}
