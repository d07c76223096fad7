package graft.core

import scala.math.{Pi, abs, ceil, cos, log10, pow, sin, sqrt}

/** Driver-side filter design math (pure Scala, no Spark).
  *
  * Re-derives the designs the reference obtains from scipy:
  * windowed-sinc FIRs (openseize `filtering/bases.py:347` `FIR._build` →
  * `scipy.signal.firwin`) with the window families of
  * `filtering/fir.py`, and the Kaiser order/beta estimate
  * (`fir.py:123` → `scipy.signal.kaiserord`).
  *
  * Coefficient arrays are tiny (tens of taps) and computed once on the
  * driver; they are embedded as literals into both the Spark plan and the
  * generated DuckDB oracle SQL, so both engines evaluate the identical
  * arithmetic.
  */
object Dsp {

  /** Normalized sinc: sin(pi x)/(pi x). */
  def sinc(x: Double): Double = if (x == 0.0) 1.0 else sin(Pi * x) / (Pi * x)

  /** Modified Bessel function of the first kind, order zero (power
    * series; converges for all finite x, terms added until they vanish).
    */
  def besselI0(x: Double): Double = {
    val halfX = x / 2.0
    var term = 1.0
    var sum = 1.0
    var k = 1
    while (term > sum * 1e-17 && k < 1000) {
      val t = halfX / k
      term *= t * t
      sum += term
      k += 1
    }
    sum
  }

  /** Symmetric window of length n. Families mirror openseize's FIR
    * window types (numpy/scipy symmetric definitions).
    */
  def window(name: String, n: Int, beta: Double = 0.0): Array[Double] = {
    require(n >= 1)
    val den = (n - 1).toDouble.max(1.0)
    Array.tabulate(n) { i =>
      name match {
        case "rectangular" => 1.0
        case "bartlett" => 1.0 - abs(2.0 * i / den - 1.0)
        case "hann" => 0.5 - 0.5 * cos(2.0 * Pi * i / den)
        case "hamming" => 0.54 - 0.46 * cos(2.0 * Pi * i / den)
        case "blackman" =>
          0.42 - 0.5 * cos(2.0 * Pi * i / den) + 0.08 * cos(4.0 * Pi * i / den)
        case "kaiser" =>
          val r = 2.0 * i / den - 1.0
          besselI0(beta * sqrt((1.0 - r * r).max(0.0))) / besselI0(beta)
        case other => throw new IllegalArgumentException(s"unknown window $other")
      }
    }
  }

  /** Kaiser window beta from desired attenuation (scipy.signal.kaiser_beta). */
  def kaiserBeta(a: Double): Double =
    if (a > 50) 0.1102 * (a - 8.7)
    else if (a > 21) 0.5842 * pow(a - 21, 0.4) + 0.07886 * (a - 21)
    else 0.0

  /** Kaiser filter order estimate (scipy.signal.kaiserord): taps needed
    * for `ripple` dB attenuation over transition `widthNorm` (fraction of
    * the Nyquist band).
    */
  def kaiserord(ripple: Double, widthNorm: Double): Int = {
    require(ripple > 8, "kaiserord requires ripple > ~8 dB")
    val numtaps = (ripple - 7.95) / 2.285 / (Pi * widthNorm) + 1
    ceil(numtaps).toInt
  }

  /** Max passband ripple gpass (dB) → passband attenuation (dB)
    * (openseize `filtering/bases.py` FIR.pass_attenuation).
    */
  def passAttenuation(gpass: Double): Double =
    -20.0 * log10(1.0 - pow(10.0, -gpass / 20.0))

  /** Windowed-sinc FIR design (scipy.signal.firwin semantics).
    *
    * @param numtaps  filter length (odd for Type I linear phase)
    * @param cutoffHz -6 dB cutoff(s) in Hz, monotonically increasing
    * @param win      window values, length numtaps
    * @param passZero band type: "lowpass" | "highpass" | "bandpass" | "bandstop"
    * @param fs       sampling rate
    */
  def firwin(
      numtaps: Int,
      cutoffHz: Seq[Double],
      win: Array[Double],
      passZero: String,
      fs: Double
  ): Array[Double] = {
    require(win.length == numtaps)
    val nyq = fs / 2.0
    val c = cutoffHz.map(_ / nyq)
    require(c.forall(x => x > 0 && x < 1), s"cutoffs must lie inside (0, nyq): $cutoffHz")
    // band edges in normalized [0, 1]; passbands as (left, right) pairs
    val bands: Seq[(Double, Double)] = passZero match {
      case "lowpass" =>
        require(c.length == 1); Seq((0.0, c.head))
      case "highpass" =>
        require(c.length == 1); Seq((c.head, 1.0))
      case "bandpass" =>
        require(c.length == 2); Seq((c(0), c(1)))
      case "bandstop" =>
        require(c.length == 2); Seq((0.0, c(0)), (c(1), 1.0))
      case other => throw new IllegalArgumentException(s"unknown band type $other")
    }
    val alpha = 0.5 * (numtaps - 1)
    val h = Array.tabulate(numtaps) { i =>
      val m = i - alpha
      bands.map { case (l, r) => r * sinc(r * m) - l * sinc(l * m) }.sum
    }
    var i = 0
    while (i < numtaps) { h(i) *= win(i); i += 1 }
    // scale so the response is exactly 1 at the center of the first passband
    val (l0, r0) = bands.head
    val fScale = if (l0 == 0.0) 0.0 else if (r0 == 1.0) 1.0 else 0.5 * (l0 + r0)
    var s = 0.0
    i = 0
    while (i < numtaps) { s += h(i) * cos(Pi * (i - alpha) * fScale); i += 1 }
    h.map(_ / s)
  }

  /** Full reference-style FIR design from band specs.
    *
    * @param ftype window family name ("kaiser" uses gpass/gstop for beta)
    */
  def firDesign(
      ftype: String,
      fpass: Seq[Double],
      fstop: Seq[Double],
      fs: Double,
      gpass: Double = 1.0,
      gstop: Double = 40.0
  ): Array[Double] = {
    require(fpass.length == fstop.length)
    val nyq = fs / 2.0
    val width = fpass.zip(fstop).map { case (p, s) => abs(s - p) }.min
    val widthNorm = width / nyq
    val btype =
      if (fpass.length == 1) { if (fpass.head < fstop.head) "lowpass" else "highpass" }
      else if (fpass.head < fstop.head) "bandstop"
      else "bandpass"
    // -6 dB cutoffs at transition-band midpoints (bases.py FIR.cutoff)
    val cutoff = fpass.zip(fstop).map { case (p, s) => math.min(p, s) + abs(s - p) / 2.0 }
    val (numtaps0, beta) = ftype match {
      case "rectangular" => ((4.0 / widthNorm).toInt, 0.0)
      case "bartlett" | "hann" | "hamming" => ((8.0 / widthNorm).toInt, 0.0)
      case "blackman" => ((12.0 / widthNorm).toInt, 0.0)
      case "kaiser" =>
        val ripple = math.max(passAttenuation(gpass), gstop)
        (kaiserord(ripple, widthNorm), kaiserBeta(ripple))
      case other => throw new IllegalArgumentException(s"unknown FIR type $other")
    }
    val numtaps = if (numtaps0 % 2 == 0) numtaps0 + 1 else numtaps0 // Type I
    firwin(numtaps, cutoff, window(ftype, numtaps, beta), btype, fs)
  }

  /** Shortest round-trip literal for embedding in SQL. Always emits an
    * exponent so DuckDB parses it as DOUBLE — a plain decimal literal
    * would become DECIMAL and silently switch the expression to decimal
    * arithmetic.
    */
  def lit(d: Double): String = {
    val s = d.toString
    if (s.contains("E")) s.replace("E", "e") else s + "e0"
  }

  /** Engine-identical 6 dp rounding: floor(x·10⁶ + 0.5)/10⁶ with the
    * same IEEE ops on both engines. Native round() half-case behavior
    * differs between engines (Spark converts the double to an exact
    * BigDecimal then HALF_UPs; DuckDB multiplies then nearbyints), so
    * values landing exactly on a .xxxxxx5 boundary — e.g. any k/64
    * ratio — hash-mismatch, and round() also preserves -0.0 while this
    * normalizes it to +0.0 (floor(±0 + 0.5) = 0). Use for outputs whose
    * value class makes half-boundaries or signed zeros likely.
    */
  def round6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.floor(c * 1e6 + 0.5).cast("double") / 1e6

  def round6Sql(e: String): String = s"(floor(($e) * 1.0e6 + 0.5e0) / 1.0e6)"

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * driver-side design math (the DPSS taper solve). Deterministic:
    * fixed sweep order, fixed convergence threshold. Returns
    * (eigenvalues, eigenvectors as rows of the second array), unsorted.
    */
  private def jacobiEig(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var converged = false
    while (sweep < 100 && !converged) {
      var off = 0.0
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) { off += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      if (off < 1e-22) converged = true
      else {
        p = 0
        while (p < n) {
          var q = p + 1
          while (q < n) {
            if (math.abs(a(p)(q)) > 1e-300) {
              val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
              val t =
                if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
              val c = 1.0 / math.sqrt(t * t + 1.0)
              val s = t * c
              val apq = a(p)(q)
              val app = a(p)(p); val aqq = a(q)(q)
              a(p)(p) = app - t * apq
              a(q)(q) = aqq + t * apq
              a(p)(q) = 0.0; a(q)(p) = 0.0
              var i = 0
              while (i < n) {
                if (i != p && i != q) {
                  val aip = a(i)(p); val aiq = a(i)(q)
                  a(i)(p) = c * aip - s * aiq; a(p)(i) = a(i)(p)
                  a(i)(q) = s * aip + c * aiq; a(q)(i) = a(i)(q)
                }
                val vip = v(i)(p); val viq = v(i)(q)
                v(i)(p) = c * vip - s * viq
                v(i)(q) = s * vip + c * viq
                i += 1
              }
            }
            q += 1
          }
          p += 1
        }
        sweep += 1
      }
    }
    val evals = Array.tabulate(n)(i => a(i)(i))
    val evecs = Array.tabulate(n)(k => Array.tabulate(n)(i => v(i)(k)))
    (evals, evecs)
  }

  /** Discrete prolate spheroidal sequences (Slepian tapers) — the
    * multitaper windows. Top-k eigenvectors of Slepian's symmetric
    * tridiagonal commuting matrix (Percival & Walden 1993 §8.3; the
    * same construction scipy.signal.windows.dpss uses): diagonal
    * ((n−1−2i)/2)²·cos(2πW), off-diagonal (i+1)(n−1−i)/2, W = nw/n.
    * Unit-l2-normalized with a deterministic sign convention (positive
    * sum, else positive first significant element).
    */
  def dpss(n: Int, nw: Double, k: Int): Array[Array[Double]] = {
    require(k >= 1 && k < n && nw > 0 && nw < n / 2.0, s"dpss($n, $nw, $k)")
    val w = nw / n
    val cw = math.cos(2.0 * math.Pi * w)
    val m = Array.fill(n)(new Array[Double](n))
    var i = 0
    while (i < n) {
      m(i)(i) = math.pow((n - 1 - 2.0 * i) / 2.0, 2) * cw
      if (i < n - 1) {
        val e = (i + 1.0) * (n - 1.0 - i) / 2.0
        m(i)(i + 1) = e; m(i + 1)(i) = e
      }
      i += 1
    }
    val (evals, evecs) = jacobiEig(m)
    val order = evals.indices.sortBy(j => -evals(j))
    order.take(k).map { j =>
      val t = evecs(j)
      val nrm = math.sqrt(t.map(x => x * x).sum)
      val sum = t.sum
      val sgn =
        if (math.abs(sum) > 1e-9) math.signum(sum)
        else math.signum(t.find(x => math.abs(x) > 1e-9).getOrElse(1.0))
      t.map(x => x * sgn / nrm)
    }.toArray
  }
}
