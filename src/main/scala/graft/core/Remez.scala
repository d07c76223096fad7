package graft.core

import scala.math.{abs, ceil, cos, log10, Pi}

/** Parks–McClellan equiripple FIR design (Remez exchange), Type I
  * (odd taps, even symmetry) — the design behind openseize
  * `filtering/fir.py:483` Remez (which calls scipy.signal.remez).
  * Textbook algorithm: dense frequency grid per band, barycentric
  * Chebyshev interpolation over trial extrema, alternation-enforcing
  * exchange until the ripple stabilizes.
  */
object Remez {

  /** Bellanger tap estimate (fir.py:626): −2/3·log10(10·δp·δs)·fs/width,
    * forced odd.
    */
  def bellangerTaps(deltaPass: Double, deltaStop: Double, fs: Double, width: Double): Int = {
    val n = ceil(-2.0 / 3.0 * log10(10.0 * deltaPass * deltaStop) * fs / width).toInt
    if (n % 2 == 0) n + 1 else n
  }

  /** Equiripple design.
    * @param numtaps  odd filter length
    * @param bands    (lo, hi) band edges in Hz, disjoint ascending
    * @param desired  target amplitude per band (1/0 for pass/stop)
    * @param weight   error weight per band (reference uses 1/δ)
    */
  def remez(
      numtaps: Int,
      bands: Seq[(Double, Double)],
      desired: Seq[Double],
      weight: Seq[Double],
      fs: Double,
      gridDensity: Int = 16,
      maxIter: Int = 25
  ): Array[Double] = {
    require(numtaps % 2 == 1, "Type I requires odd numtaps")
    val r = (numtaps - 1) / 2 + 1 // cosine basis size

    // dense grid (normalized f in cycles/sample, [0, 0.5])
    val df = 0.5 / (r * gridDensity)
    val gf = scala.collection.mutable.ArrayBuffer[Double]()
    val gd = scala.collection.mutable.ArrayBuffer[Double]()
    val gw = scala.collection.mutable.ArrayBuffer[Double]()
    bands.indices.foreach { b =>
      val lo = bands(b)._1 / fs
      val hi = bands(b)._2 / fs
      var f = lo
      while (f <= hi + 1e-12) {
        gf += f; gd += desired(b); gw += weight(b)
        f += df
      }
    }
    val m = gf.length
    require(m > r + 1, s"grid too sparse: $m points for ${r + 1} extrema")
    val gx = gf.map(f => cos(2.0 * Pi * f)).toArray

    // initial extrema: evenly spread grid indices
    var ext = Array.tabulate(r + 1)(k => k * (m - 1) / r)
    var lastDelta = 0.0

    var iter = 0
    var converged = false
    val aCache = new Array[Double](m)
    while (iter < maxIter && !converged) {
      // barycentric weights over extremal abscissae
      val xe = ext.map(gx)
      val gamma = Array.tabulate(r + 1) { k =>
        var p = 1.0
        for (j <- 0 to r if j != k) p *= (xe(k) - xe(j))
        1.0 / p
      }
      // ripple
      var num = 0.0; var den = 0.0
      for (k <- 0 to r) {
        num += gamma(k) * gd(ext(k))
        den += (if (k % 2 == 0) 1.0 else -1.0) * gamma(k) / gw(ext(k))
      }
      val delta = num / den
      // interpolation values at first r extrema
      val ye = Array.tabulate(r) { k =>
        gd(ext(k)) - (if (k % 2 == 0) 1.0 else -1.0) * delta / gw(ext(k))
      }
      val bw = Array.tabulate(r) { k =>
        var p = 1.0
        for (j <- 0 until r if j != k) p *= (xe(k) - xe(j))
        1.0 / p
      }
      def aOf(x: Double): Double = {
        var n0 = 0.0; var d0 = 0.0; var hit = -1
        var k = 0
        while (k < r) {
          val dx = x - xe(k)
          if (abs(dx) < 1e-14) hit = k
          else { val t = bw(k) / dx; n0 += t * ye(k); d0 += t }
          k += 1
        }
        if (hit >= 0) ye(hit) else n0 / d0
      }
      var i = 0
      while (i < m) { aCache(i) = aOf(gx(i)); i += 1 }
      val err = Array.tabulate(m)(i => gw(i) * (aCache(i) - gd(i)))

      // candidate extrema: local maxima of |err| plus band endpoints
      val cand = scala.collection.mutable.ArrayBuffer[Int]()
      i = 0
      while (i < m) {
        val le = if (i == 0) Double.NegativeInfinity else abs(err(i - 1))
        val re = if (i == m - 1) Double.NegativeInfinity else abs(err(i + 1))
        val edge = i == 0 || i == m - 1 || abs(gf(i) - gf(i - 1)) > 2 * df || abs(gf(i + 1) - gf(i)) > 2 * df
        if ((abs(err(i)) >= le && abs(err(i)) >= re) || (edge && abs(err(i)) > abs(delta) * 0.5))
          cand += i
        i += 1
      }
      // enforce sign alternation: among same-sign runs keep the largest
      val alt = scala.collection.mutable.ArrayBuffer[Int]()
      for (c <- cand) {
        if (alt.isEmpty) alt += c
        else if (math.signum(err(alt.last)) == math.signum(err(c))) {
          if (abs(err(c)) > abs(err(alt.last))) alt(alt.length - 1) = c
        } else alt += c
      }
      // trim to r+1 keeping alternation: drop smallest endpoint(s)
      while (alt.length > r + 1) {
        if (abs(err(alt.head)) <= abs(err(alt.last))) alt.remove(0) else alt.remove(alt.length - 1)
      }
      if (alt.length < r + 1) {
        // degenerate iteration — keep previous extrema and stop
        converged = true
      } else {
        val next = alt.toArray
        converged = next.sameElements(ext) || abs(abs(delta) - abs(lastDelta)) < 1e-12 * abs(delta)
        ext = next
        lastDelta = delta
      }
      iter += 1
    }

    // final response on the r extremal points → impulse response via
    // inverse cosine series sampled at numtaps uniform frequencies
    val xe = ext.take(r).map(gx)
    val gammaF = Array.tabulate(r) { k =>
      var p = 1.0
      for (j <- 0 until r if j != k) p *= (xe(k) - xe(j))
      1.0 / p
    }
    val ye = Array.tabulate(r) { k =>
      gd(ext(k)) - (if (k % 2 == 0) 1.0 else -1.0) * lastDelta / gw(ext(k))
    }
    def aOfFinal(x: Double): Double = {
      var n0 = 0.0; var d0 = 0.0; var hit = -1
      var k = 0
      while (k < r) {
        val dx = x - xe(k)
        if (abs(dx) < 1e-14) hit = k
        else { val t = gammaF(k) / dx; n0 += t * ye(k); d0 += t }
        k += 1
      }
      if (hit >= 0) ye(hit) else n0 / d0
    }
    val nf = numtaps
    val a = Array.tabulate(r)(i => aOfFinal(cos(2.0 * Pi * i / nf)))
    val mHalf = (nf - 1) / 2
    Array.tabulate(nf) { k =>
      var s = a(0)
      var i = 1
      while (i < r) {
        s += 2.0 * a(i) * cos(2.0 * Pi * i * (k - mHalf) / nf)
        i += 1
      }
      s / nf
    }
  }

  /** Reference-style lowpass Remez from band specs (fir.py Remez with
    * bands [(0,fpass),(fstop,fs/2)], desired [1,0], weight 1/δ).
    */
  def lowpass(fpass: Double, fstop: Double, fs: Double, gpass: Double, gstop: Double): Array[Double] = {
    val dp = 1.0 - math.pow(10.0, -gpass / 20.0)
    val ds = math.pow(10.0, -gstop / 20.0)
    val n = bellangerTaps(dp, ds, fs, fstop - fpass)
    remez(
      n,
      Seq((0.0, fpass), (fstop, fs / 2.0)),
      Seq(1.0, 0.0),
      Seq(1.0 / dp, 1.0 / ds),
      fs
    )
  }

  /** Parks–McClellan bandpass — the scipy `remez` multiband call shape
    * (reference routes arbitrary band layouts through the same
    * exchange core): pass [fpass1, fpass2], stop below fstop1 / above
    * fstop2, weights 1/δ per band, taps from the Bellanger estimate at
    * the narrower transition.
    */
  def bandpass(
      fstop1: Double,
      fpass1: Double,
      fpass2: Double,
      fstop2: Double,
      fs: Double,
      gpass: Double,
      gstop: Double
  ): Array[Double] = {
    require(fstop1 < fpass1 && fpass1 < fpass2 && fpass2 < fstop2, "bandpass edges must nest")
    val dp = 1.0 - math.pow(10.0, -gpass / 20.0)
    val ds = math.pow(10.0, -gstop / 20.0)
    val n = bellangerTaps(dp, ds, fs, math.min(fpass1 - fstop1, fstop2 - fpass2))
    remez(
      n,
      Seq((0.0, fstop1), (fpass1, fpass2), (fstop2, fs / 2.0)),
      Seq(0.0, 1.0, 0.0),
      Seq(1.0 / ds, 1.0 / dp, 1.0 / ds),
      fs
    )
  }

  /** |H(e^{2πif/fs})| of a linear-phase FIR. */
  def firGain(h: Array[Double], fHz: Double, fs: Double): Double = {
    val w = 2.0 * Pi * fHz / fs
    var re = 0.0; var im = 0.0
    h.indices.foreach { k => re += h(k) * cos(w * k); im -= h(k) * math.sin(w * k) }
    math.sqrt(re * re + im * im)
  }
}
