package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Iir
import graft.operators.IirOps

class IirBaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("cheby2 highpass meets band specs") {
    val sos = IirOps.cheby2Hp // fpass=20, fstop=10 @ fs=100
    assert(-20 * math.log10(Iir.sosGain(sos, math.Pi * 0.2)) >= 39.999, "stopband")
    val gp = Iir.sosGain(sos, math.Pi * 0.4)
    assert(gp > 0.89, s"passband edge gain $gp") // within 1 dB
    assert(Iir.sosGain(sos, math.Pi * 0.99) > 0.95, "near-nyquist gain")
  }

  test("ba-form lfilter matches sosfilt for a 2nd-order butter") {
    val proto = Iir.bilinear(Iir.lp2lp(Iir.buttap(2), 4.0 * math.tan(math.Pi * 0.2 / 2)))
    val (b, a) = Iir.zpk2tf(proto)
    val sos = Iir.zpk2sos(proto)
    val rnd = new scala.util.Random(9)
    val df = (0 until 300).map(i => ("c", i.toLong, rnd.nextDouble() * 10)).toDF("channel", "n", "x")
    val viaBa = IirOps.lfilter(df, b, a).orderBy("n").select("y").as[Double].collect()
    val viaSos = IirOps.sosfilt(df, sos).orderBy("n").select("y").as[Double].collect()
    viaBa.zip(viaSos).zipWithIndex.foreach { case ((x, y), i) =>
      assert(math.abs(x - y) < 1e-9, s"sample $i: $x vs $y")
    }
  }

  test("filtfiltBa of a constant is that constant") {
    val proto = Iir.bilinear(Iir.lp2lp(Iir.buttap(3), 4.0 * math.tan(math.Pi * 0.15)))
    val (b, a) = Iir.zpk2tf(proto)
    val df = (0 until 200).map(i => ("c", i.toLong, 2.5)).toDF("channel", "n", "x")
    val out = IirOps.filtfiltBa(df, b, a).select("y").as[Double].collect()
    out.foreach(v => assert(math.abs(v - 2.5) < 1e-7, s"leak: $v"))
  }
}

class AnnotationsSpec extends AnyFunSuite {
  import TestSpark._

  test("pinnacle TSV parses and as_mask marks the right samples") {
    val dir = java.nio.file.Files.createTempDirectory("anno").toString
    val lines =
      Seq.fill(6)("meta\tstuff") ++
        Seq("Number\tStart\tTime From Start\tTime To\tAnnotation\tChannel") ++
        Seq(
          "0\tx\t1.0\t2.0\tseizure\tEEG1",
          "1\tx\t5.0\t5.5\tartifact\tEEG2"
        )
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/p.tsv"),
      lines.mkString("\n").getBytes
    )
    val annos = graft.sources.Annotations.pinnacle(spark, s"$dir/p.tsv")
    val got = annos.orderBy("start_s").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "seizure" && got(0).getDouble(3) == 1.0)
    val mask = graft.sources.Annotations
      .asMask(spark, annos, size = 70, fs = 10.0)
      .filter("mask")
      .orderBy("n")
      .collect()
      .map(_.getLong(0))
    // seizure: samples 10..19; artifact: 50..54
    assert(mask.toSeq == ((10L to 19L) ++ (50L to 54L)).toSeq)
  }
}

class SessionizeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("gap-based sessionization splits on >30min gaps (batch mode)") {
    val m = 60L * 1000000000L // one minute in ns
    val rows = Seq(
      (1L, 0 * m), (1L, 10 * m), (1L, 20 * m), // session 1: 3 events
      (1L, 60 * m), (1L, 65 * m), // session 2: 2 events
      (2L, 5 * m) // user 2: 1 session
    ).map { case (u, t) => (t, u, "e", 0.0) }
    val df = rows.toDF("ts_ns", "user_id", "event_type", "value")
    val got = graft.streaming.StreamOps
      .sessionize(df)
      .orderBy("user_id", "start_ns")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) / m, r.getLong(2) / m, r.getInt(3)))
    assert(got.toSeq == Seq((1L, 0L, 20L, 3), (1L, 60L, 65L, 2), (2L, 5L, 5L, 1)))
  }
}

class EllipticSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.core.{Elliptic, Iir}

  test("elliptic machinery: K, sn, cd known values") {
    assert(math.abs(Elliptic.ellipK(0.5) - 1.6857503548125961) < 1e-12)
    assert(math.abs(Elliptic.sne(Iir.Complex.real(1.0), 0.7).re - 1.0) < 1e-12)
    assert(math.abs(Elliptic.cde(Iir.Complex.real(0.0), 0.7).re - 1.0) < 1e-12)
  }

  test("elliptic lowpass: minimal order, equiripple bands") {
    val sos = graft.operators.IirOps.ellipLp // fpass=10 fstop=20, 1/40 dB @ fs=100
    assert(sos.length == 2, s"order ${sos.length * 2} expected 4")
    // equiripple passband: -1 dB at DC (even order) and at the edge
    assert(math.abs(-20 * math.log10(Iir.sosGain(sos, 1e-9)) - 1.0) < 1e-6)
    assert(math.abs(-20 * math.log10(Iir.sosGain(sos, math.Pi * 0.2)) - 1.0) < 1e-6)
    // stopband >= 40 dB from fstop to nyquist
    for (f <- 40 to 99) {
      val att = -20 * math.log10(Iir.sosGain(sos, math.Pi * f / 100.0) + 1e-300)
      assert(att >= 39.99, s"f=${f / 2.0} Hz: $att dB")
    }
    // poles stable
    sos.foreach(s => assert(math.abs(s(5)) < 1.0 && math.abs(s(4)) < 1.0 + s(5)))
  }
}

class PacSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.PacOps

  test("carrier FIR stays under the 128-term oracle lag-sum bound") {
    assert(PacOps.carrierH.length <= 127, s"${PacOps.carrierH.length} taps")
  }

  test("pac_demo: envelope peaks at the modulator phase crest, troughs opposite") {
    val rows = SparkEntry
      .queries("pac_demo")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(rows.keySet == (0 until PacOps.nBins).map(_.toLong).toSet, "one row per phase bin")
    val crest = rows.maxBy(_._2)._1
    val trough = rows.minBy(_._2)._1
    // sin(phi) peaks at phi = pi/2 (bin 4 of 18) and bottoms at 3pi/2 (bin 13)
    assert(math.abs(crest - 4L) <= 1, s"crest at bin $crest")
    assert(math.abs(trough - 13L) <= 1, s"trough at bin $trough")
    // strength 0.8 gives a 5x modulation depth; demand most of it survive
    assert(rows(crest) / rows(trough) > 2.5, s"depth ${rows(crest) / rows(trough)}")
  }
}
