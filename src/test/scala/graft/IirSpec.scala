package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Iir
import graft.operators.IirOps

class IirDesignSpec extends AnyFunSuite {

  test("butterworth meets band specs (-1 dB pass, -40 dB stop)") {
    val sos = IirOps.butterLp // fpass=10, fstop=20 @ fs=100
    val gPass = Iir.sosGain(sos, math.Pi * 0.2)
    val gStop = Iir.sosGain(sos, math.Pi * 0.4)
    assert(math.abs(-20 * math.log10(gPass) - 1.0) < 1e-6, s"pass ripple ${gPass}")
    assert(-20 * math.log10(gStop) >= 40.0, s"stop attenuation ${gStop}")
    assert(math.abs(Iir.sosGain(sos, 1e-12) - 1.0) < 1e-9)
  }

  test("cheby1 meets band specs and equiripple at passband edge") {
    val sos = IirOps.cheby1Lp
    val gPass = Iir.sosGain(sos, math.Pi * 0.2)
    assert(math.abs(-20 * math.log10(gPass) - 1.0) < 1e-6)
    assert(-20 * math.log10(Iir.sosGain(sos, math.Pi * 0.4)) >= 40.0)
  }

  test("notch nulls f0 and passes elsewhere") {
    val sos = IirOps.notch15
    assert(Iir.sosGain(sos, math.Pi * 0.3) < 1e-10) // 15 Hz @ fs=100
    assert(Iir.sosGain(sos, math.Pi * 0.1) > 0.99)
    assert(Iir.sosGain(sos, math.Pi * 0.5) > 0.99)
  }

  test("butter bandpass meets band specs (exact -1 dB at both edges, -40 dB stops)") {
    val sos = IirOps.butterBp // pass 10-20, stop <5/>30 @ fs=100
    def db(wNorm: Double) = -20 * math.log10(Iir.sosGain(sos, math.Pi * wNorm))
    assert(math.abs(db(0.2) - 1.0) < 1e-6, s"low edge ${db(0.2)}")
    assert(math.abs(db(0.4) - 1.0) < 1e-6, s"high edge ${db(0.4)}")
    assert(db(0.1) >= 40.0, s"low stop ${db(0.1)}")
    assert(db(0.6) >= 40.0, s"high stop ${db(0.6)}")
    // band center ~ geometric mean: essentially unity gain
    val wc = 2.0 * math.atan(math.sqrt(math.tan(math.Pi * 0.1) * math.tan(math.Pi * 0.2)))
    assert(db(wc / math.Pi) < 0.05, s"center ${db(wc / math.Pi)}")
    // DC and Nyquist are hard zeros (zeros at z=+1 and z=-1)
    assert(Iir.sosGain(sos, 1e-9) < 1e-6)
    assert(Iir.sosGain(sos, math.Pi * (1 - 1e-9)) < 1e-6)
  }

  test("elliptic bandstop meets band specs (-1 dB pass edges, -40 dB inside stop)") {
    val sos = IirOps.ellipBs // pass outside 10/30, stop 15-25 @ fs=100
    def db(wNorm: Double) = -20 * math.log10(Iir.sosGain(sos, math.Pi * wNorm))
    assert(db(0.2) <= 1.0 + 1e-9, s"low pass edge ${db(0.2)}")
    assert(db(0.6) <= 1.0 + 1e-9, s"high pass edge ${db(0.6)}")
    assert(db(0.3) >= 40.0, s"low stop edge ${db(0.3)}")
    assert(db(0.5) >= 40.0, s"high stop edge ${db(0.5)}")
    // stop-band center: >= gstop attenuation (even-order elliptic has no
    // fill zeros at +-j*wo, so an equiripple floor, not a hard null)
    val wc = 2.0 * math.atan(math.sqrt(math.tan(math.Pi * 0.1) * math.tan(math.Pi * 0.3)))
    assert(db(wc / math.Pi) >= 40.0 - 1e-9, s"center ${db(wc / math.Pi)}")
  }

  test("degenerate band specs fail fast at the API boundary") {
    // non-increasing edges
    intercept[IllegalArgumentException](Iir.butterBandSos((20.0, 10.0), (5.0, 30.0), 1.0, 40.0, 100.0))
    // stop band not nested in the pass band (and vice versa)
    intercept[IllegalArgumentException](Iir.butterBandSos((10.0, 20.0), (15.0, 30.0), 1.0, 40.0, 100.0))
    // edges at/above Nyquist
    intercept[IllegalArgumentException](Iir.cheby1BandSos((10.0, 20.0), (5.0, 50.0), 1.0, 40.0, 100.0))
    // zero-width transition: selectivity <= 1
    intercept[IllegalArgumentException](Iir.cheby2BandSos((10.0, 20.0), (10.0, 20.0), 1.0, 40.0, 100.0))
  }

  test("fminbound finds bounded minima (scipy Brent/FMIN)") {
    assert(math.abs(Iir.fminbound(x => (x - 2.0) * (x - 2.0), 0.0, 5.0) - 2.0) < 1e-4)
    assert(math.abs(Iir.fminbound(x => math.cos(x), 0.0, 6.0) - math.Pi) < 1e-4)
    // monotone objective: minimum at the boundary, within xatol
    assert(math.abs(Iir.fminbound(x => x, 1.0, 3.0) - 1.0) < 1e-4)
  }

  test("bandstop passband-edge optimization lowers the butter order and keeps specs") {
    // symmetric-ish spec: optimized order 8 (unoptimized selectivity
    // 1.902 would need ceil(4.587 / (2·log10 1.902)) = 9) — scipy parity
    val sos = Iir.butterBandSos((10.0, 30.0), (15.0, 25.0), 1.0, 40.0, 100.0)
    assert(sos.length == 8, s"expected order 8, got ${sos.length}")
    def db(wNorm: Double) = -20 * math.log10(Iir.sosGain(sos, math.Pi * wNorm))
    assert(db(0.2) <= 1.0 + 1e-9, s"low pass edge ${db(0.2)}")
    assert(db(0.6) <= 1.0 + 1e-9 && db(0.6) > 0.9, s"high (binding) pass edge ${db(0.6)}")
    assert(db(0.3) >= 40.0, s"low stop edge ${db(0.3)}")
    assert(db(0.5) >= 40.0, s"high stop edge ${db(0.5)}")
    // strongly asymmetric spec: designable at order 3 only because the
    // passband edges move toward the stop band; real-pole splitting in
    // the wide-band transform exercises the real-pole-pair sections
    val asym = Iir.butterBandSos((5.0, 40.0), (20.0, 25.0), 1.0, 40.0, 100.0)
    assert(asym.length == 3, s"expected order 3, got ${asym.length}")
    def dbA(wNorm: Double) = -20 * math.log10(Iir.sosGain(asym, math.Pi * wNorm))
    assert(dbA(0.1) <= 1.0 + 1e-9 && dbA(0.8) <= 1.0 + 1e-9, s"pass ${dbA(0.1)}/${dbA(0.8)}")
    assert(dbA(0.4) >= 40.0 && dbA(0.5) >= 40.0, s"stop ${dbA(0.4)}/${dbA(0.5)}")
  }

  test("cheby1 bandpass meets band specs (exact -1 dB equiripple edges)") {
    val sos = IirOps.cheby1Bp // pass 10-20, stop <5/>30 @ fs=100
    def db(wNorm: Double) = -20 * math.log10(Iir.sosGain(sos, math.Pi * wNorm))
    assert(math.abs(db(0.2) - 1.0) < 1e-6, s"low edge ${db(0.2)}")
    assert(math.abs(db(0.4) - 1.0) < 1e-6, s"high edge ${db(0.4)}")
    assert(db(0.1) >= 40.0, s"low stop ${db(0.1)}")
    assert(db(0.6) >= 40.0, s"high stop ${db(0.6)}")
    // fewer sections than the same-band butter: equiripple buys order
    assert(sos.length < IirOps.butterBp.length, s"${sos.length} vs ${IirOps.butterBp.length}")
  }

  test("cheby2 bandstop meets band specs (flat pass, equiripple -40 dB stop)") {
    val sos = IirOps.cheby2Bs // pass outside 10/30, stop 15-25 @ fs=100
    def db(wNorm: Double) = -20 * math.log10(Iir.sosGain(sos, math.Pi * wNorm))
    assert(db(0.2) <= 1.0 + 1e-9, s"low pass edge ${db(0.2)}")
    assert(db(0.6) <= 1.0 + 1e-9, s"high pass edge ${db(0.6)}")
    assert(db(0.3) >= 40.0 - 1e-6, s"low stop edge ${db(0.3)}")
    assert(db(0.5) >= 40.0 - 1e-6, s"high stop edge ${db(0.5)}")
    val wc = 2.0 * math.atan(math.sqrt(math.tan(math.Pi * 0.1) * math.tan(math.Pi * 0.3)))
    assert(db(wc / math.Pi) >= 40.0 - 1e-6, s"center ${db(wc / math.Pi)}")
    // DC and Nyquist pass flat (type II: no passband ripple)
    assert(Iir.sosGain(sos, 1e-9) > 0.99)
    assert(Iir.sosGain(sos, math.Pi * (1 - 1e-9)) > 0.99)
  }

  test("all designed filters are stable (poles inside unit circle)") {
    for (
      sos <- Seq(IirOps.butterLp, IirOps.cheby1Lp, IirOps.notch15, IirOps.butterBp, IirOps.ellipBs,
        IirOps.cheby1Bp, IirOps.cheby2Bs);
      s <- sos
    ) {
      val a1 = s(4); val a2 = s(5)
      // stability triangle for z^2 + a1 z + a2
      assert(math.abs(a2) < 1.0 && math.abs(a1) < 1.0 + a2, s"unstable section ${s.mkString(",")}")
    }
  }

  test("sosfilt_zi gives steady state: constant input stays constant") {
    val sos = IirOps.butterLp
    val zi = Iir.sosfiltZi(sos)
    val c = 3.7
    val z1 = zi.map(_(0) * c).toArray
    val z2 = zi.map(_(1) * c).toArray
    var out = 0.0
    for (_ <- 0 until 50) {
      var u = c
      for (s <- sos.indices) {
        val Array(b0, b1, b2, _, a1, a2) = sos(s)
        val y = b0 * u + z1(s)
        z1(s) = b1 * u + z2(s) - a1 * y
        z2(s) = b2 * u - a2 * y
        u = y
      }
      out = u
    }
    assert(math.abs(out - c) < 1e-9, s"steady state drifted: $out vs $c")
  }
}

class IirApplySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("distributed sosfilt matches sequential reference per channel") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      ch <- Seq("a", "b", "c")
      i <- 0 until 200
    } yield (ch, i.toLong, rnd.nextDouble() * 100 - 50)
    val df = rows.toDF("channel", "n", "x")
    val sos = IirOps.butterLp
    val got = IirOps
      .sosfilt(df, sos)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // sequential reference
    for (ch <- Seq("a", "b", "c")) {
      val xs = rows.filter(_._1 == ch).sortBy(_._2).map(_._3).toArray
      val z1 = new Array[Double](sos.length); val z2 = new Array[Double](sos.length)
      xs.zipWithIndex.foreach { case (x, i) =>
        var u = x
        for (s <- sos.indices) {
          val Array(b0, b1, b2, _, a1, a2) = sos(s)
          val y = b0 * u + z1(s)
          z1(s) = b1 * u + z2(s) - a1 * y
          z2(s) = b2 * u - a2 * y
          u = y
        }
        assert(math.abs(got((ch, i.toLong)) - u) < 1e-12, s"$ch[$i]")
      }
    }
  }

  test("sosfiltfilt of a constant signal is that constant (zero transient)") {
    val df = (0 until 300).map(i => ("k", i.toLong, 5.5)).toDF("channel", "n", "x")
    val out = IirOps.sosfiltfilt(df, IirOps.butterLp).select("y").as[Double].collect()
    out.foreach(v => assert(math.abs(v - 5.5) < 1e-8, s"transient leaked: $v"))
  }
}
