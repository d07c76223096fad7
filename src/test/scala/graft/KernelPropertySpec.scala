package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{FirOps, ResampleOps}

/** Property checks for the block-streaming kernels against naive
  * reference implementations — block/halo indexing across channel
  * boundaries, short channels (< taps), and non-multiple-of-block
  * lengths are exactly where off-by-ones would hide.
  */
class KernelPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def naiveSame(x: Array[Double], h: Array[Double]): Array[Double] = {
    val m = h.length; val l = (m - 1) / 2
    Array.tabulate(x.length) { i =>
      var acc = 0.0
      for (k <- 0 until m) {
        val idx = i + l - k
        val t = h(k) * (if (idx >= 0 && idx < x.length) x(idx) else 0.0)
        acc = if (k == 0) t else acc + t
      }
      acc
    }
  }

  private def naivePoly(x: Array[Double], L: Int, M: Int, h: Array[Double]): Array[Double] = {
    val hl = if (L > 1) h.map(_ * L) else h
    val grid = new Array[Double](x.length * L)
    for (i <- x.indices) grid(i * L) = x(i)
    val conv = naiveSame(grid, hl)
    (0 until (grid.length + M - 1) / M).map(j => conv(j * M)).toArray
  }

  private val rnd = new scala.util.Random(21)
  // lengths straddle taps count and are mutually unequal
  private val chans: Seq[(String, Array[Double])] = Seq(
    "a" -> Array.fill(7)(rnd.nextDouble() * 10 - 5),     // shorter than taps
    "b" -> Array.fill(333)(rnd.nextDouble() * 10 - 5),
    "c" -> Array.fill(41)(rnd.nextDouble() * 10 - 5),
    "d" -> Array.fill(1024)(rnd.nextDouble() * 10 - 5)
  )
  private def sigDf = chans
    .flatMap { case (ch, xs) => xs.zipWithIndex.map { case (v, i) => (ch, i.toLong, v) } }
    .toDF("channel", "n", "x")

  test("convPlus matches the naive same-mode convolution on every channel") {
    val h = Array.tabulate(25)(k => math.sin(k + 1.0) / (k + 1.0))
    val got = FirOps
      .convPlus(sigDf, h)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    for ((ch, xs) <- chans) {
      val want = naiveSame(xs, h)
      assert(got.count(_._1._1 == ch) == xs.length, s"$ch row count")
      want.indices.foreach { i =>
        assert(got((ch, i.toLong)) == want(i), s"$ch[$i]") // bit-exact
      }
    }
  }

  test("convPlus block/halo handoff: tiny blocks equal whole-channel results") {
    val h = Array.tabulate(9)(k => (k - 4) * 0.37)
    // blockSizeHint floors at 4·taps = 36: channels b (333) and d (1024)
    // cross many block boundaries
    val whole = FirOps.convPlus(sigDf, h).collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val blocked = FirOps
      .convPlus(sigDf, h, blockSizeHint = 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    assert(blocked == whole) // bit-exact across block boundaries
  }

  test("polyResample block/halo handoff: tiny blocks equal large-block results") {
    val h = Array.tabulate(21)(k => math.sin(k * 1.3))
    val whole = ResampleOps.polyResample(sigDf, 3, 2, h).collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val blocked = ResampleOps
      .polyResample(sigDf, 3, 2, h, blockSizeHint = 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(blocked == whole)
  }

  test("polyResample matches naive zero-stuff → conv → decimate for several L/M") {
    for ((l, m) <- Seq((1, 2), (3, 1), (3, 2), (2, 3))) {
      val h = Array.tabulate(31)(k => math.cos(k * 0.7) / (k + 2.0))
      val got = ResampleOps
        .polyResample(sigDf, l, m, h)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      for ((ch, xs) <- chans) {
        val want = naivePoly(xs, l, m, h).map(v => math.rint(v * 1e6) / 1e6)
        assert(got.count(_._1._1 == ch) == want.length, s"L=$l M=$m $ch count")
        want.indices.foreach { j =>
          val g = got((ch, j.toLong))
          assert(math.abs(g - want(j)) <= 1e-6, s"L=$l M=$m $ch[$j]: $g vs ${want(j)}")
        }
      }
    }
  }
}

/** Non-power-of-two nfft goes through SpectrumSeg's direct-DFT branch;
  * verify the full Welch pipeline against an independent naive
  * implementation at nfft=48.
  */
class OddNfftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("psdWelch at nfft=48 matches a naive single-machine Welch") {
    val rnd = new scala.util.Random(31)
    val xs = Array.fill(480)(rnd.nextDouble() * 4 - 2)
    val df = xs.zipWithIndex.toSeq.map { case (v, i) => ("c", i.toLong, v) }.toDF("channel", "n", "x")
    val cfg = graft.operators.SpectraOps.WelchCfg(nfft = 48, hop = 24)
    val got = graft.operators.SpectraOps
      .psdWelch(df, cfg)
      .collect()
      .map(r => r.getInt(1).toLong -> r.getDouble(3))
      .toMap
    // naive welch: hann(periodic), constant detrend, density scaling
    val n = 48; val hop = 24
    val win = Array.tabulate(n)(p => 0.5 - 0.5 * math.cos(2.0 * math.Pi * p / n))
    val norm = 1.0 / (100.0 * win.map(w => w * w).sum)
    val nsegs = (xs.length - n) / hop + 1
    val acc = new Array[Double](n / 2 + 1)
    for (s <- 0 until nsegs) {
      val seg = xs.slice(s * hop, s * hop + n)
      val m = seg.sum / n
      val xw = seg.zip(win).map { case (v, w) => (v - m) * w }
      for (f <- 0 to n / 2) {
        var re = 0.0; var im = 0.0
        for (p <- 0 until n) {
          re += xw(p) * math.cos(2.0 * math.Pi * f * p / n)
          im -= xw(p) * math.sin(2.0 * math.Pi * f * p / n)
        }
        val one = (re * re + im * im) * norm
        acc(f) += (if (f == 0 || f == n / 2) one else one * 2.0)
      }
    }
    for (f <- 0 to n / 2) {
      val want = acc(f) / nsegs
      assert(math.abs(got(f.toLong) - want) < 1e-5, s"f=$f: ${got(f.toLong)} vs $want")
    }
  }

  test("audioVad kernel ≡ declarative frame/segment aggregation (r17 fusion)") {
    // clip shapes straddle the frame boundary cases: exact multiples of
    // 32, a ragged tail frame, all-silent, all-active, single sample,
    // and alternating silence runs (segment counting)
    val clips: Seq[(Long, Array[Short])] = Seq(
      1L -> Array.tabulate(128)(t => if ((t / 32) % 3 == 0) 0 else ((t * 37) % 2003 - 1001).toShort),
      2L -> Array.tabulate(100)(t => if ((t / 32) % 2 == 0) 0 else ((t * 11) % 997 - 498).toShort), // ragged tail
      3L -> Array.fill[Short](96)(0), // all silent
      4L -> Array.tabulate(64)(t => (t + 1).toShort), // all active
      5L -> Array[Short](7), // single sample, single frame
      6L -> Array.tabulate(193)(t => if ((t / 32) % 3 == 2) ((t * 5) % 101 + 1).toShort else 0)
    )
    val media = clips
      .map { case (id, s) => (id, llm.Multimodal.encodeWav(s)) }
      .toDF("media_id", "payload")
    val got = llm.Multimodal
      .audioVad(media)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == clips.map(_._1).toSet)
    for ((id, s) <- clips) {
      // declarative reference: exactly the pre-r17 frame aggregation +
      // lag-window run counting, computed naively
      val frames = s.grouped(32).toArray
      val energies = frames.map(_.map(v => v.toLong * v.toLong).sum)
      val acts = energies.map(_ > 0L)
      val nSeg = acts.zip(false +: acts.dropRight(1).toSeq).count { case (a, p) => a && !p }
      val want = (frames.length.toLong, acts.count(identity).toLong, nSeg.toLong, energies.sum)
      assert(got(id) == want, s"media $id: ${got(id)} vs $want")
    }
  }
}
