package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.IcaOps

/** FastICA on planted mixtures: the fit must recover independent
  * super-Gaussian sources up to sign/permutation, and zeroing the
  * artifact component must clean every channel while preserving the
  * neural content — the contract an EEG artifact-removal step carries.
  */
class IcaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val n = 6000
  private val rnd = new scala.util.Random(31)

  // independent super-Gaussian sources: Laplace via sign·ln(u)
  private def laplace(): Double = {
    val u = rnd.nextDouble()
    val e = -math.log(rnd.nextDouble() + 1e-12)
    if (u < 0.5) -e else e
  }

  private def mix(sources: Array[Array[Double]], a: Array[Array[Double]]): Seq[(String, Long, Double)] = {
    val c = a.length
    (0 until n).flatMap { t =>
      (0 until c).map { i =>
        var x = 0.0
        for (j <- 0 until c) x += a(i)(j) * sources(j)(t)
        (s"c$i", t.toLong, x)
      }
    }
  }

  private def corr(a: Array[Double], b: Array[Double]): Double = {
    val (ma, mb) = (a.sum / a.length, b.sum / b.length)
    var (sab, saa, sbb) = (0.0, 0.0, 0.0)
    for (i <- a.indices) {
      val (da, db) = (a(i) - ma, b(i) - mb)
      sab += da * db; saa += da * da; sbb += db * db
    }
    sab / math.sqrt(saa * sbb)
  }

  test("fastIca recovers planted Laplace sources up to sign/permutation") {
    val c = 4
    val src = Array.fill(c)(Array.fill(n)(laplace()))
    val a = Array(
      Array(1.0, 0.5, 0.3, 0.2),
      Array(0.4, 1.0, 0.6, 0.1),
      Array(0.2, 0.3, 1.0, 0.5),
      Array(0.6, 0.1, 0.4, 1.0)
    )
    val sig = mix(src, a).toDF("channel", "n", "x")
    val model = IcaOps.fastIca(sig)
    val est = IcaOps
      .sources(sig, model)
      .collect()
      .map(r => (r.getAs[Int]("comp"), r.getAs[Long]("n"), r.getAs[Double]("s")))
      .groupBy(_._1)
      .map { case (p, rows) => p -> rows.sortBy(_._2).map(_._3) }
    // every true source must be matched by some estimated component
    // with |corr| >= 0.95 (sign and order are ICA's inherent ambiguity)
    src.zipWithIndex.foreach { case (s, j) =>
      val best = est.values.map(e => math.abs(corr(e, s))).max
      assert(best >= 0.95, s"source $j best |corr| = $best")
    }
  }

  test("removing the blink component cleans all channels and keeps the rest") {
    val c = 4
    // source 0 is an ocular-artifact proxy: sparse heavy spikes;
    // 1..3 are ordinary Laplace "neural" sources
    val blink = Array.fill(n)(if (rnd.nextDouble() < 0.01) 40.0 + 10.0 * rnd.nextDouble() else 0.0)
    val neural = Array.fill(c - 1)(Array.fill(n)(laplace()))
    val src = blink +: neural
    val a = Array(
      Array(1.0, 0.5, 0.3, 0.2),
      Array(0.8, 1.0, 0.6, 0.1),
      Array(0.7, 0.3, 1.0, 0.5),
      Array(0.9, 0.1, 0.4, 1.0)
    )
    val sig = mix(src, a).toDF("channel", "n", "x")
    val model = IcaOps.fastIca(sig)
    // identify the blink component as the one most correlated with the
    // planted artifact time course
    val est = IcaOps
      .sources(sig, model)
      .collect()
      .map(r => (r.getAs[Int]("comp"), r.getAs[Long]("n"), r.getAs[Double]("s")))
      .groupBy(_._1)
      .map { case (p, rows) => p -> rows.sortBy(_._2).map(_._3) }
    val (blinkComp, blinkCorr) = est.map { case (p, e) => p -> math.abs(corr(e, blink)) }.maxBy(_._2)
    assert(blinkCorr >= 0.95, s"blink component not isolated: $blinkCorr")
    val cleaned = IcaOps
      .removeComponents(sig, model, Set(blinkComp))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (ch, rows) => ch -> rows.sortBy(_._2).map(_._3) }
    // the cleaned long layout must feed the DSP stack unchanged
    val psd = graft.operators.SpectraOps
      .psdWelch(IcaOps.removeComponents(sig, model, Set(blinkComp)))
    assert(psd.count() > 0, "cleaned signal did not flow into psd_welch")
    (0 until c).foreach { i =>
      val cleanCh = cleaned(s"c$i")
      // the blink must be gone from every channel...
      val blinkLeft = math.abs(corr(cleanCh, blink))
      assert(blinkLeft < 0.1, s"channel $i still carries the blink: $blinkLeft")
      // ...and the channel's blink-free content preserved
      val want = Array.tabulate(n) { t =>
        var x = 0.0
        for (j <- 1 until c) x += a(i)(j) * src(j)(t)
        x
      }
      val kept = corr(cleanCh, want)
      assert(kept >= 0.95, s"channel $i neural content degraded: $kept")
    }
  }
}
