package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264, H264Cavlc}

/** Machine checks on the CAVLC layer: every VLC table prefix-free, every
  * (coefficient pattern, context) round-trips bit-exactly through the
  * writer/decoder pair, and the adaptive level machinery survives extreme
  * magnitudes. These catch structural transcription damage in the
  * from-memory tables (the conformance boundary H264Cavlc documents);
  * value-for-value conformance against real encoders still needs the
  * driver-blocked external artifact.
  */
class H264CavlcSpec extends AnyFunSuite {

  test("every VLC table is prefix-free") {
    for ((name, entries) <- H264Cavlc.allTables) {
      val codes = entries.map { case (_, l, c) => (l, c) }
      for (Seq((l1, c1), (l2, c2)) <- codes.combinations(2)) {
        val (shortL, shortC, longL, longC) =
          if (l1 <= l2) (l1, c1, l2, c2) else (l2, c2, l1, c1)
        assert(!(longL > shortL && (longC >> (longL - shortL)) == shortC) &&
          !(longL == shortL && longC == shortC),
          s"$name: code ($shortL,$shortC) is a prefix of ($longL,$longC)")
      }
      assert(entries.forall { case (_, l, c) => l >= 1 && l <= 16 && c >= 0 && c < (1 << l) },
        s"$name: a code is out of its bit-length range")
    }
  }

  private def roundTrip(coeff: Array[Int], maxCoeff: Int, nC: Int): Unit = {
    val w = new H264.BitWriter
    H264Cavlc.writeResidualBlock(w, coeff, maxCoeff, nC)
    w.trailing()
    val r = new H264.BitReader(w.bytes)
    val (got, tc) = H264Cavlc.residualBlock(r, maxCoeff, nC)
    assert(got.toSeq === coeff.toSeq,
      s"round trip failed (maxCoeff=$maxCoeff nC=$nC): ${coeff.toSeq} -> ${got.toSeq}")
    assert(tc === coeff.count(_ != 0))
  }

  test("exhaustive coeff_token coverage: every (totalCoeff, trailingOnes) x every nC regime") {
    // construct, for each (tc, t1), a canonical block: t1 trailing +/-1s at
    // the high end, larger magnitudes below, nonzeros packed at the top so
    // any tc up to maxCoeff is reachable
    for (nC <- Seq(-1, 0, 1, 2, 3, 4, 7, 8, 31)) {
      val maxCoeff = if (nC == -1) 4 else 16
      for (tc <- 0 to maxCoeff; t1 <- 0 to math.min(3, tc)) {
        val coeff = new Array[Int](maxCoeff)
        var i = 0
        // low->high: (tc - t1) big levels then t1 ones at the highest idx
        while (i < tc - t1) { coeff(maxCoeff - tc + i) = (i % 2 * 2 - 1) * (2 + i); i += 1 }
        while (i < tc) { coeff(maxCoeff - tc + i) = if (i % 2 == 0) 1 else -1; i += 1 }
        // only test patterns whose trailing-one count is exactly t1: when
        // tc == t1 everything is +/-1 and the writer derives t1 = min(3, tc)
        val derivedT1 = {
          val idx = (0 until maxCoeff).filter(coeff(_) != 0).reverse
          var d = 0
          while (d < math.min(3, idx.length) && math.abs(coeff(idx(d))) == 1) d += 1
          d
        }
        if (derivedT1 == t1) roundTrip(coeff, maxCoeff, nC)
      }
    }
  }

  test("total_zeros and run_before coverage: randomized sparse patterns") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 0 until 4000) {
      val nC = Seq(-1, 0, 2, 4, 9)(rnd.nextInt(5))
      val maxCoeff = if (nC == -1) 4 else Seq(15, 16)(rnd.nextInt(2))
      val coeff = new Array[Int](maxCoeff)
      val n = rnd.nextInt(maxCoeff + 1)
      val pos = rnd.shuffle((0 until maxCoeff).toList).take(n)
      pos.foreach { p =>
        var v = 0
        while (v == 0) v = rnd.nextInt(9) - 4
        coeff(p) = v
      }
      roundTrip(coeff, maxCoeff, nC)
    }
  }

  test("level escape paths: large magnitudes through every suffix regime") {
    for (mag <- Seq(8, 16, 30, 100, 2048, 4100, 20000, 65000)) {
      for (sign <- Seq(1, -1)) {
        val coeff = new Array[Int](16)
        coeff(0) = sign * mag
        roundTrip(coeff, 16, 0)
        // with company that drives suffixLength up
        val c2 = new Array[Int](16)
        c2(0) = sign * mag; c2(1) = -sign * (mag / 2 + 2); c2(2) = 7; c2(3) = 1
        roundTrip(c2, 16, 0)
      }
    }
  }

  test("garbage bits quarantine instead of throwing arbitrary exceptions") {
    val rnd = new scala.util.Random(7L)
    var quarantined = 0
    for (_ <- 0 until 2000) {
      val bytes = new Array[Byte](rnd.nextInt(8) + 1)
      rnd.nextBytes(bytes)
      val nC = rnd.nextInt(10) - 1
      val maxCoeff = if (nC == -1) 4 else 16
      try {
        H264Cavlc.residualBlock(new H264.BitReader(bytes), maxCoeff, nC)
      } catch {
        case _: H264.ParseEnd => quarantined += 1
      }
    }
    assert(quarantined > 0) // some inputs must hit the bounded-parse guard
  }
}
