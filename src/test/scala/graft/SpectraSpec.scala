package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpectraOps

class SpectraSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 15 Hz unit sine at fs=100: power A²/2 = 0.5, peak at 15/1.5625 = bin 9.6
  private lazy val sine = (0 until 2048)
    .map(i => ("s0", i.toLong, math.sin(2 * math.Pi * 15.0 * i / 100.0)))
    .toDF("channel", "n", "x")

  test("coherence: scaled copy fully coherent, independent noise is not") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 2048).flatMap { i =>
      val x = math.sin(2 * math.Pi * 15.0 * i / 100.0) + 0.3 * rnd.nextGaussian()
      val z = rnd.nextGaussian()
      Seq(("a", i.toLong, x), ("b", i.toLong, 2.5 * x), ("c", i.toLong, z))
    }.toDF("channel", "n", "x")
    val coh = graft.operators.SpectraOps
      .coherence(rows)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getInt(2)) -> r.getDouble(3))
      .toMap
    // a vs b: identical up to scale -> coherence 1 at every bin
    val ab = (0 to 32).map(f => coh(("a", "b"), f))
    assert(ab.forall(c => c > 0.999), s"scaled copy should be fully coherent: ${ab.min}")
    // a vs c: independent noise -> low average coherence
    val ac = (0 to 32).map(f => coh(("a", "c"), f))
    assert(ac.sum / ac.length < 0.3, s"independent channels too coherent: ${ac.sum / ac.length}")
  }

  test("dpss tapers: orthonormal, and the multitaper PSD peaks at the sine bin") {
    val t = graft.core.Dsp.dpss(64, 4.0, 3)
    assert(t.length == 3 && t.forall(_.length == 64))
    for (i <- 0 until 3; j <- i until 3) {
      val dot = t(i).zip(t(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<t$i, t$j> = $dot")
    }
    // taper 0 is the most spectrally concentrated: bell-shaped, no zero
    // crossing; taper 1 is odd (one crossing)
    assert(t(0).forall(_ >= 0.0) || t(0).forall(_ <= 0.0), "t0 must not change sign")
    assert(t(1).sliding(2).count(p => p(0) * p(1) < 0) == 1, "t1 crosses zero once")
    val psd = SpectraOps
      .psdMultitaper(sine)
      .collect()
      .map(r => r.getLong(1) -> r.getDouble(3))
      .toMap
    // 15 Hz at fs=100, nfft=64 → bin 9.6. The nw=4 concentration band
    // spreads the line over ±4 bins (the multitaper resolution/variance
    // trade), so assert band concentration, not a single-bin peak:
    // bins 5..14 must carry > 95% of total power
    val total = psd.values.sum
    val band = (5L to 14L).map(psd).sum
    assert(band / total > 0.95, s"band share ${band / total}")
    assert(psd.values.max == (5L to 14L).map(psd).max, "max bin inside the band")
  }

  test("haar dwt: energy preserved, constant signal concentrates in a3, tail dropped") {
    import org.apache.spark.sql.functions._
    // 16 samples + a 3-sample incomplete tail that must be dropped
    val vals = Seq(1.0, 3.0, -2.0, 4.0, 0.5, -1.5, 2.0, 2.0,
      5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 9.0, 9.0, 9.0)
    val sig = vals.zipWithIndex.map { case (x, i) => ("c0", i.toLong, x) }
      .toDF("channel", "n", "x")
    val out = SpectraOps.dwtHaar(sig).collect()
      .map(r => (r.getString(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(out.size == 16, s"two complete groups x 8 coefs, tail dropped: ${out.size}")
    // orthonormal transform: Parseval within each complete group (to round6)
    val eIn = vals.take(8).map(v => v * v).sum
    val eOut = (0 until 4).map(j => out(("d1", j.toLong))).map(v => v * v).sum +
      (0 until 2).map(j => out(("d2", j.toLong))).map(v => v * v).sum +
      math.pow(out(("d3", 0L)), 2) + math.pow(out(("a3", 0L)), 2)
    assert(math.abs(eIn - eOut) < 1e-4, s"Parseval violated: $eIn vs $eOut")
    // group 2 is constant 5: all details 0, a3 = 5*8/ (2*sqrt2*... ) = 5*2^{3/2}
    assert((0 until 4).forall(j => out(("d1", (4 + j).toLong)) == 0.0))
    assert((0 until 2).forall(j => out(("d2", (2 + j).toLong)) == 0.0))
    assert(out(("d3", 1L)) == 0.0)
    assert(math.abs(out(("a3", 1L)) - 5.0 * math.pow(2.0, 1.5)) < 1e-6)
  }

  test("welch PSD of a sine peaks at its frequency bin") {
    val psd = SpectraOps
      .psdWelch(sine)
      .orderBy(org.apache.spark.sql.functions.desc("psd"))
      .select("f")
      .as[Long]
      .take(2)
    assert(psd.toSet.subsetOf(Set(9L, 10L)), s"peak bins ${psd.toSeq}")
  }

  test("integrated PSD recovers sine power (Parseval)") {
    val rows = SpectraOps.psdWelch(sine).select("f", "psd").as[(Long, Double)].collect()
    val df = 100.0 / 64
    // trapezoid is fine for a sanity bound
    val total = rows.map(_._2).sum * df
    assert(math.abs(total - 0.5) < 0.05, s"total power $total, want ~0.5")
  }

  test("stft segments tile the padded signal") {
    val n = SpectraOps
      .stft(sine)
      .select("s")
      .distinct()
      .count()
    // nsegs = ceil(2048/32) + 1 = 65
    assert(n == 65, s"got $n segments")
  }

  test("psd_banded assembles the psd_ci rows into f-ascending plot arrays") {
    import org.apache.spark.sql.functions._
    val flat = SpectraOps
      .psdCi(sine)
      .orderBy("f")
      .collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val banded = SpectraOps.psdBanded(sine).collect()
    assert(banded.length == 1)
    val row = banded(0)
    val freqs = row.getSeq[Int](1)
    val lower = row.getSeq[Double](2)
    val upper = row.getSeq[Double](3)
    assert(freqs == flat.map(_._1).toSeq, "freqs array out of order or wrong")
    assert(lower == flat.map(_._2).toSeq)
    assert(upper == flat.map(_._3).toSeq)
    assert(freqs.sorted == freqs, "fill_between x-axis must ascend")
  }

  test("psd_ci bounds are ordered and nonnegative") {
    val bad = SpectraOps.psdCi(sine).filter("ci_lo > ci_hi OR ci_lo < 0").count()
    assert(bad == 0, s"$bad rows with inverted/negative CI")
  }

  test("band_power_tc tracks a mid-recording in-band burst") {
    // 15 Hz tone (inside the 9.4–31 Hz Simpson band) present ONLY in
    // the middle third — the time course must light up there and stay
    // near zero elsewhere
    val burst = (0 until 2048)
      .map { i =>
        val on = i >= 683 && i < 1365
        ("s0", i.toLong, if (on) math.sin(2 * math.Pi * 15.0 * i / 100.0) else 0.0)
      }
      .toDF("channel", "n", "x")
    val tc = SpectraOps
      .bandPowerTc(burst)
      .collect()
      .map(r => r.getAs[Long]("s") -> r.getAs[Double]("band_power"))
      .toMap
    val frames = tc.keys.toSeq.sorted
    val mid = frames.filter(s => s >= 24 && s <= 40) // frames fully inside the burst
    val edge = frames.filter(s => s <= 18 || s >= 46)
    val midMin = mid.map(tc).min
    val edgeMax = edge.map(tc).max
    assert(midMin > 10 * math.max(edgeMax, 1e-9), s"burst not tracked: mid>=$midMin edge<=$edgeMax")
  }
}
