package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Remez

class RemezSpec extends AnyFunSuite {

  test("bellanger estimate matches the reference formula") {
    // gpass=1 dB -> dp=0.1087; gstop=40 dB -> ds=0.01; fs=100, width=10
    val dp = 1.0 - math.pow(10.0, -1.0 / 20)
    assert(Remez.bellangerTaps(dp, 0.01, 100, 10) % 2 == 1)
  }

  test("remez lowpass meets its band specs") {
    val h = Remez.lowpass(fpass = 10, fstop = 20, fs = 100, gpass = 1.0, gstop = 40.0)
    assert(h.length % 2 == 1)
    // linear phase (symmetric)
    h.indices.foreach(i => assert(math.abs(h(i) - h(h.length - 1 - i)) < 1e-9))
    val dp = 1.0 - math.pow(10.0, -1.0 / 20)
    // passband ripple within ~delta_p (small numeric slack)
    for (f <- Seq(0.0, 2.0, 5.0, 8.0, 10.0)) {
      val g = Remez.firGain(h, f, 100)
      assert(math.abs(g - 1.0) <= dp * 1.2, s"pass $f Hz: $g")
    }
    // stopband attenuation ~40 dB (Bellanger estimate can undershoot a
    // couple dB; require >= 34 dB everywhere and >= 38 dB past the edge)
    for (f <- Seq(20.0, 25.0, 30.0, 40.0, 49.0)) {
      val att = -20 * math.log10(Remez.firGain(h, f, 100) + 1e-300)
      assert(att >= 34.0, s"stop $f Hz: $att dB")
    }
    val att25 = -20 * math.log10(Remez.firGain(h, 25.0, 100) + 1e-300)
    assert(att25 >= 36.0, s"stop 25 Hz: $att25 dB")
  }

  test("remez bandpass meets its band specs") {
    val h = Remez.bandpass(5, 10, 20, 30, fs = 100, gpass = 1.0, gstop = 40.0)
    assert(h.length % 2 == 1)
    h.indices.foreach(i => assert(math.abs(h(i) - h(h.length - 1 - i)) < 1e-9))
    val dp = 1.0 - math.pow(10.0, -1.0 / 20)
    for (f <- Seq(10.0, 12.0, 15.0, 18.0, 20.0)) {
      val g = Remez.firGain(h, f, 100)
      assert(math.abs(g - 1.0) <= dp * 1.2, s"pass $f Hz: $g")
    }
    // same Bellanger slack policy as the lowpass spec
    for (f <- Seq(0.0, 3.0, 5.0, 30.0, 35.0, 45.0)) {
      val att = -20 * math.log10(Remez.firGain(h, f, 100) + 1e-300)
      assert(att >= 34.0, s"stop $f Hz: $att dB")
    }
  }

  test("equiripple: passband error alternates near the ripple bound") {
    val h = Remez.lowpass(10, 20, 100, 1.0, 40.0)
    val errs = (0 to 100).map(i => Remez.firGain(h, i * 0.1, 100) - 1.0)
    val maxAbs = errs.map(math.abs).max
    // several near-extremal touches of the ripple bound
    val touches = errs.count(e => math.abs(e) > maxAbs * 0.9)
    assert(touches >= 2, s"only $touches ripple touches")
  }
}
