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
