package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.expr

import graft.core.Dsp
import graft.operators.FirOps

class DspDesignSpec extends AnyFunSuite {

  test("besselI0 matches known values") {
    // I0(0)=1; I0(1)=1.2660658777520082; I0(5)=27.239871823604442
    assert(Dsp.besselI0(0.0) == 1.0)
    assert(math.abs(Dsp.besselI0(1.0) - 1.2660658777520082) < 1e-14)
    assert(math.abs(Dsp.besselI0(5.0) - 27.239871823604442) < 1e-11)
  }

  test("kaiser beta and order match scipy formulas") {
    // kaiser_beta(40) = 0.5842*19^0.4 + 0.07886*19
    val b = Dsp.kaiserBeta(40.0)
    assert(math.abs(b - (0.5842 * math.pow(19, 0.4) + 0.07886 * 19)) < 1e-12)
    // kaiserord(40, 0.2): ceil((40-7.95)/2.285/(pi*0.2) + 1) = 24
    assert(Dsp.kaiserord(40.0, 0.2) == 24)
  }

  test("designed lowpass filters have unit DC gain and symmetry") {
    for (h <- Seq(FirOps.rect, FirOps.bartlettLp, FirOps.hammingLp, FirOps.kaiserLp)) {
      assert(h.length % 2 == 1, "Type I filters must have odd taps")
      assert(math.abs(h.sum - 1.0) < 1e-12, s"DC gain ${h.sum}")
      h.indices.foreach(i => assert(math.abs(h(i) - h(h.length - 1 - i)) < 1e-12))
    }
  }

  test("highpass has unit gain at Nyquist, bandpass at band center") {
    val hp = FirOps.blackmanHp
    val gNyq = hp.indices.map(i => hp(i) * math.cos(math.Pi * (i - (hp.length - 1) / 2))).sum
    assert(math.abs(math.abs(gNyq) - 1.0) < 1e-12)
    val bp = FirOps.hannBp
    // cutoffs 7.5 and 22.5 Hz at fs=100 -> center 15 Hz = 0.3 of Nyquist
    val g = bp.indices.map(i => bp(i) * math.cos(math.Pi * (i - (bp.length - 1) / 2) * 0.3)).sum
    assert(math.abs(math.abs(g) - 1.0) < 1e-12)
  }

  test("kaiser bandstop: unit DC gain, >=40 dB rejection inside the stop band") {
    val h = FirOps.kaiserBs // pass <5/>30, stop 10-25 Hz @ fs=100
    assert(h.length % 2 == 1 && h.length <= 128, s"taps ${h.length}")
    assert(math.abs(h.sum - 1.0) < 1e-12, s"DC gain ${h.sum}")
    def db(fHz: Double): Double = {
      val w = math.Pi * fHz / 50.0
      val c = (h.length - 1) / 2
      val g = h.indices.map(i => h(i) * math.cos(w * (i - c))).sum
      -20 * math.log10(math.abs(g))
    }
    for (f <- Seq(12.5, 15.0, 17.5, 20.0, 22.5)) assert(db(f) >= 40.0, s"stop $f Hz: ${db(f)}")
    for (f <- Seq(2.0, 40.0)) assert(db(f) <= 0.2, s"pass $f Hz: ${db(f)}")
  }

  test("tap counts match reference formulas") {
    assert(FirOps.rect.length == 21)
    assert(FirOps.bartlettLp.length == 41)
    assert(FirOps.hammingLp.length == 41)
    assert(FirOps.hannBp.length == 81)
    assert(FirOps.blackmanHp.length == 61)
    assert(FirOps.kaiserLp.length == 25)
  }
}

class FirApplySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val xs = Array(1.0, -2.0, 3.0, 0.5, 4.0, -1.5, 2.5, 0.0, 1.0, -3.0)
  private val h = Array(0.25, 0.5, 0.25)

  private def sigDf = xs.zipWithIndex
    .map { case (x, i) => ("c0", i.toLong, x) }
    .toSeq
    .toDF("channel", "n", "x")

  /** Brute-force full convolution, zero-extended. */
  private def convFull(x: Array[Double], h: Array[Double]): Array[Double] =
    Array.tabulate(x.length + h.length - 1) { j =>
      h.indices.map(k => if (j - k >= 0 && j - k < x.length) h(k) * x(j - k) else 0.0).sum
    }

  private def got(df: org.apache.spark.sql.DataFrame): Array[Double] =
    df.orderBy("n").select("y").as[Double].collect()

  test("full mode matches brute-force convolution") {
    val want = convFull(xs, h).map(v => math.rint(v * 1e6) / 1e6)
    assert(got(operators.FirOps.full(sigDf, h)).toSeq == want.toSeq)
  }

  test("same mode is the centered slice of full") {
    val fullv = convFull(xs, h)
    val l = (h.length - 1) / 2
    val want = fullv.slice(l, l + xs.length).map(v => math.rint(v * 1e6) / 1e6)
    assert(got(operators.FirOps.same(sigDf, h)).toSeq == want.toSeq)
  }

  test("valid mode keeps only complete overlaps") {
    val fullv = convFull(xs, h)
    val want = fullv.slice(h.length - 1, xs.length).map(v => math.rint(v * 1e6) / 1e6)
    assert(got(operators.FirOps.valid(sigDf, h)).toSeq == want.toSeq)
  }

  test("sameFast 1-tap kernel survives exact block-boundary drain (ADVICE r13)") {
    // l == 0 makes extLen == segLen, so with a channel longer than one
    // 65536-sample read block the emit round drains the rolling buffer
    // EXACTLY at the block boundary mid-channel; the old xs.isEmpty
    // sentinel then re-initialized the channel state and emitted
    // duplicate segment ids with misplaced data. 70000 > 65536 samples.
    val cnt = 70000
    val big = spark
      .range(cnt)
      .selectExpr("'c0' as channel", "id as n", "cast(id % 7 as double) as x")
    val out = operators.FirOps.sameFast(big, Array(2.0)).cache()
    try {
      assert(out.count() == cnt, "row count must equal the signal length (no duplicates)")
      assert(out.select("n").distinct().count() == cnt, "every n exactly once")
      val bad = out.filter(expr("abs(y - 2.0 * (n % 7)) > 1e-9")).count()
      assert(bad == 0, s"$bad samples misplaced after the block-boundary drain")
    } finally { out.unpersist(); () }
  }
}
