package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Dsp, Iir}

/** Property tests: every design produced over a space of legal band
  * specs must be stable and meet its own specifications — guards the
  * design math against parameter corners (steep/shallow transitions,
  * low/high cutoffs, odd/even orders).
  */
class DesignPropertySpec extends AnyFunSuite {

  private val fs = 100.0
  /** Seeded sweep over the legal band-spec space. */
  private def bands(n: Int): Seq[(Double, Double)] = {
    val rnd = new scala.util.Random(1234)
    Seq.fill(n) {
      val fp = 4.0 + rnd.nextDouble() * 31.0
      val width = 3.0 + rnd.nextDouble() * 9.0
      (fp, math.min(fp + width, 48.0))
    }
  }

  test("kaiser lowpass: unit DC gain, symmetric, meets stopband") {
    for ((fp, fst) <- bands(25) if fst > fp + 1.0) {
      {
        val h = Dsp.firDesign("kaiser", Seq(fp), Seq(fst), fs, gpass = 1.0, gstop = 40.0)
        assert(h.length % 2 == 1)
        assert(math.abs(h.sum - 1.0) < 1e-9)
        h.indices.foreach(i => assert(math.abs(h(i) - h(h.length - 1 - i)) < 1e-12))
        // check attenuation at a frequency well inside the stopband
        val fchk = math.min(fst + 2.0, 49.0)
        val w = 2 * math.Pi * fchk / fs
        val g = {
          var re = 0.0; var im = 0.0
          h.indices.foreach { k => re += h(k) * math.cos(w * k); im -= h(k) * math.sin(w * k) }
          math.hypot(re, im)
        }
        assert(-20 * math.log10(g + 1e-300) > 30.0, s"fp=$fp fst=$fst gain=$g")
      }
    }
  }

  test("butterworth designs over the spec space are stable and meet edges") {
    for ((fp, fst) <- bands(25) if fst > fp + 1.0 && fst < 46.0) {
      {
        val sos = Iir.butterSos(fp, fst, 1.0, 40.0, fs)
        sos.foreach { s =>
          assert(math.abs(s(5)) < 1.0 + 1e-12 && math.abs(s(4)) < 1.0 + s(5) + 1e-9,
            s"unstable at fp=$fp fst=$fst: ${s.mkString(",")}")
        }
        val gp = Iir.sosGain(sos, math.Pi * fp / (fs / 2))
        val gs = Iir.sosGain(sos, math.Pi * fst / (fs / 2))
        assert(-20 * math.log10(gp) <= 1.0 + 1e-6, s"pass ripple at fp=$fp: $gp")
        assert(-20 * math.log10(gs) >= 40.0 - 1e-6, s"stop att at fst=$fst: $gs")
      }
    }
  }

  /** Seeded sweep over legal 2-element band specs: returns
    * (passLo, passHi, stopLo, stopHi) with stop strictly outside pass
    * (bandpass) — swap roles for bandstop.
    */
  private def bandSpecs(n: Int): Seq[(Double, Double, Double, Double)] = {
    val rnd = new scala.util.Random(4321)
    Seq.fill(n) {
      val p0 = 8.0 + rnd.nextDouble() * 12.0
      val p1 = p0 + 4.0 + rnd.nextDouble() * 10.0
      val s0 = math.max(1.5, p0 - 3.0 - rnd.nextDouble() * 4.0)
      val s1 = math.min(46.0, p1 + 3.0 + rnd.nextDouble() * 5.0)
      (p0, p1, s0, s1)
    }
  }

  private def stable(sos: Array[Array[Double]], tag: String): Unit =
    sos.foreach(s => assert(math.abs(s(5)) < 1.0 + 1e-12 && math.abs(s(4)) < 1.0 + s(5) + 1e-9,
      s"unstable $tag: ${s.mkString(",")}"))

  private def db(sos: Array[Array[Double]], f: Double): Double =
    -20 * math.log10(Iir.sosGain(sos, math.Pi * f / (fs / 2)) + 1e-300)

  test("band designs over the spec space are stable and meet their guaranteed edges") {
    for ((p0, p1, s0, s1) <- bandSpecs(20)) {
      // bandpass: pass [p0,p1], stop outside [s0,s1]
      val bp = (p0, p1); val bpStop = (s0, s1)
      val bsPass = (s0, s1); val bsStop = (p0, p1) // bandstop: roles swapped
      val tag = f"p=[$p0%.2f,$p1%.2f] s=[$s0%.2f,$s1%.2f]"

      val bwp = Iir.butterBandSos(bp, bpStop, 1.0, 40.0, fs)
      stable(bwp, s"butter bp $tag")
      assert(db(bwp, p0) <= 1.0 + 1e-6 && db(bwp, p1) <= 1.0 + 1e-6, s"butter bp pass $tag")
      assert(db(bwp, s0) >= 40.0 - 1e-6 && db(bwp, s1) >= 40.0 - 1e-6, s"butter bp stop $tag")

      // bandstop: the fminbound-adjusted edges keep the attenuation
      // guarantee for butter (order AND transform use adjusted edges)
      val bws = Iir.butterBandSos(bsPass, bsStop, 1.0, 40.0, fs)
      stable(bws, s"butter bs $tag")
      assert(db(bws, s0) <= 1.0 + 1e-6 && db(bws, s1) <= 1.0 + 1e-6, s"butter bs pass $tag")
      assert(db(bws, p0) >= 40.0 - 1e-6 && db(bws, p1) >= 40.0 - 1e-6, s"butter bs stop $tag")

      val c1p = Iir.cheby1BandSos(bp, bpStop, 1.0, 40.0, fs)
      stable(c1p, s"cheby1 bp $tag")
      assert(math.abs(db(c1p, p0) - 1.0) < 1e-6 && math.abs(db(c1p, p1) - 1.0) < 1e-6, s"cheby1 bp edges $tag")
      assert(db(c1p, s0) >= 40.0 - 1e-6 && db(c1p, s1) >= 40.0 - 1e-6, s"cheby1 bp stop $tag")

      val c2p = Iir.cheby2BandSos(bp, bpStop, 1.0, 40.0, fs)
      stable(c2p, s"cheby2 bp $tag")
      assert(db(c2p, p0) <= 1.0 + 1e-6 && db(c2p, p1) <= 1.0 + 1e-6, s"cheby2 bp pass $tag")
      assert(db(c2p, s0) >= 40.0 - 1e-6 && db(c2p, s1) >= 40.0 - 1e-6, s"cheby2 bp stop $tag")

      val c2s = Iir.cheby2BandSos(bsPass, bsStop, 1.0, 40.0, fs)
      stable(c2s, s"cheby2 bs $tag")
      assert(db(c2s, s0) <= 1.0 + 1e-6 && db(c2s, s1) <= 1.0 + 1e-6, s"cheby2 bs pass $tag")
      assert(db(c2s, p0) >= 40.0 - 1e-6 && db(c2s, p1) >= 40.0 - 1e-6, s"cheby2 bs stop $tag")

      // cheby1/ellip bandstop reproduce scipy's order-only optimization
      // (design keeps user edges): exact -gpass pass edges; attenuation
      // guaranteed at the band center, stop edges only scipy-close
      val c1s = Iir.cheby1BandSos(bsPass, bsStop, 1.0, 40.0, fs)
      stable(c1s, s"cheby1 bs $tag")
      assert(math.abs(db(c1s, s0) - 1.0) < 1e-6 && math.abs(db(c1s, s1) - 1.0) < 1e-6, s"cheby1 bs edges $tag")
      val wCenter = (fs / math.Pi) * math.atan(math.sqrt(
        math.tan(math.Pi * p0 / fs) * math.tan(math.Pi * p1 / fs)))
      assert(db(c1s, wCenter) >= 40.0 - 1e-6, s"cheby1 bs center $tag: ${db(c1s, wCenter)}")
    }
  }

  test("cheby1 designs are stable and meet the passband edge") {
    for ((fp, fst) <- bands(25) if fst > fp + 1.0 && fst < 46.0) {
      {
        val sos = Iir.cheby1Sos(fp, fst, 1.0, 40.0, fs)
        sos.foreach(s => assert(math.abs(s(5)) < 1.0 + 1e-12 && math.abs(s(4)) < 1.0 + s(5) + 1e-9))
        assert(-20 * math.log10(Iir.sosGain(sos, math.Pi * fp / (fs / 2))) <= 1.0 + 1e-6)
        assert(-20 * math.log10(Iir.sosGain(sos, math.Pi * fst / (fs / 2))) >= 40.0 - 1e-6)
      }
    }
  }
}
