package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Iir
import graft.operators.{IirOps, ResponseOps}

class ResponseSpec extends AnyFunSuite {
  import TestSpark._

  test("sosfreqz of the butter bandpass meets its design band specs") {
    val resp = ResponseOps
      .sosFreqz(spark, IirOps.butterBp, 100.0, 512)
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // pass 10–20 Hz within gpass=1 dB; stop <5 / >30 Hz below −40 dB
    val pass = resp.filter { case (f, _, _) => f >= 10.0 && f <= 20.0 }
    val stop = resp.filter { case (f, _, _) => f <= 5.0 || f >= 30.0 }
    assert(pass.nonEmpty && stop.nonEmpty)
    assert(pass.forall(_._3 >= -1.01), s"passband dips below gpass: ${pass.minBy(_._3)}")
    assert(stop.forall(_._3 <= -39.9), s"stopband leaks: ${stop.maxBy(_._3)}")
    // mag and db columns agree: db = 20·log10(mag) where the 6 dp
    // rounding of mag can't distort the log (mag not near zero)
    resp.filter(_._2 > 0.1).foreach { case (_, m, d) =>
      assert(math.abs(20 * math.log10(m) - d) < 0.01)
    }
  }

  test("freqz matches the closed-form sosGain at the grid points") {
    val (b, a) = IirOps.butterBa
    val got = ResponseOps
      .freqz(spark, b, a, 100.0, 128)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    for (k <- Seq(0, 13, 26, 64, 127)) {
      val w = math.Pi * k / 128
      val expect = Iir.sosGain(Iir.zpk2sos(Iir.bilinear(Iir.lp2lp(Iir.buttap(3), 4.0 * math.tan(math.Pi * 0.2 / 2)))), w)
      assert(math.abs(got(k) - expect) < 1e-5, s"k=$k: ${got(k)} vs $expect")
    }
    // order-3 butter at its 10 Hz cutoff: −3 dB point
    val atCut = got(26) // freq = 26·100/256 ≈ 10.16 Hz
    assert(math.abs(atCut - 1.0 / math.sqrt(2)) < 0.03, s"cutoff gain $atCut")
  }

  test("notch response dips only at its center frequency") {
    // worN = 640 puts 15 Hz exactly on the grid (k = 192), where the
    // notch zero sits on the unit circle — gain is exactly 0
    val resp = ResponseOps
      .sosFreqz(spark, IirOps.notch15, 100.0, 640)
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val atCenter = resp.minBy(p => math.abs(p._1 - 15.0))
    assert(atCenter._1 == 15.0 && atCenter._2 < 1e-6, s"notch center not rejected: $atCenter")
    val away = resp.filter(p => math.abs(p._1 - 15.0) > 5.0)
    assert(away.forall(_._2 > 0.9), s"notch too wide: ${away.minBy(_._2)}")
  }

  test("ba-form and sos-form freqz agree on the same design") {
    val proto = Iir.bilinear(Iir.lp2lp(Iir.buttap(3), 4.0 * math.tan(math.Pi * 0.2 / 2)))
    val (b, a) = Iir.zpk2tf(proto)
    val sos = Iir.zpk2sos(proto)
    val viaBa = ResponseOps
      .freqz(spark, b, a, 100.0, 128)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    val viaSos = ResponseOps
      .sosFreqz(spark, sos, 100.0, 128)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    for (k <- 0 until 128)
      assert(math.abs(viaBa(k.toLong) - viaSos(k.toLong)) <= 1e-6, s"k=$k")
  }

  test("FIR impulse response is the taps; SOS impulse sum is the DC gain") {
    val taps = Array(0.25, 0.5, 0.25)
    val h = ResponseOps
      .impulseFir(spark, taps, 100.0)
      .orderBy("n")
      .collect()
      .map(_.getDouble(1))
    assert(h.length == 100)
    assert(h.take(3).sameElements(taps) && h.drop(3).forall(_ == 0.0))

    val hs = ResponseOps
      .impulseSos(spark, IirOps.butterLp, 100.0)
      .agg(sum(col("h")))
      .head()
      .getDouble(0)
    val dc = Iir.sosGain(IirOps.butterLp, 0.0)
    assert(math.abs(hs - dc) < 1e-3, s"impulse sum $hs vs DC gain $dc")
  }
}
