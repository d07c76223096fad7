package graft.core

import scala.math.{atan2, ceil, cos, hypot, log, pow, sin, sqrt, Pi}

import Iir.{Complex, Zpk}

/** Elliptic (Cauer) filter design via Landen iterations and Jacobi
  * elliptic functions — the design behind openseize
  * `filtering/iir.py:277` Ellip (scipy ellipap). Public-textbook
  * formulation (Orfanidis, "Lecture Notes on Elliptic Filter Design"):
  * degree equation with complete elliptic integrals; zeros from sn on
  * the real axis; poles from cd at the complex offset v0.
  */
object Elliptic {

  // ---- complex helpers beyond Iir.Complex ----

  private def cAbs(z: Complex): Double = hypot(z.re, z.im)

  private def cSqrt(z: Complex): Complex = Iir.csqrt(z)

  private def cLog(z: Complex): Complex = Complex(log(cAbs(z)), atan2(z.im, z.re))

  /** asin(z) = −i·ln(iz + sqrt(1−z²)). */
  private def cAsin(z: Complex): Complex = {
    val iz = Complex(-z.im, z.re)
    val s = cSqrt(Complex(1.0, 0.0) - z * z)
    val l = cLog(iz + s)
    Complex(l.im, -l.re)
  }

  private def cSin(z: Complex): Complex =
    Complex(sin(z.re) * math.cosh(z.im), cos(z.re) * math.sinh(z.im))

  private def cCos(z: Complex): Complex =
    Complex(cos(z.re) * math.cosh(z.im), -sin(z.re) * math.sinh(z.im))

  // ---- Landen / elliptic machinery ----

  /** Descending Landen sequence of moduli starting AFTER k. */
  def landen(k: Double, tol: Double = 1e-20): Array[Double] = {
    val buf = scala.collection.mutable.ArrayBuffer[Double]()
    var v = k
    var i = 0
    while (v > tol && i < 64) {
      val kp = sqrt((1.0 - v) * (1.0 + v))
      v = pow(v / (1.0 + kp), 2.0)
      buf += v
      i += 1
    }
    buf.toArray
  }

  /** Complete elliptic integral K(k) via the Landen product. */
  def ellipK(k: Double): Double =
    if (k <= 0.0) Pi / 2
    else if (k >= 1.0) Double.PositiveInfinity
    else landen(k).foldLeft(Pi / 2)((acc, v) => acc * (1.0 + v))

  def ellipKp(k: Double): Double = ellipK(sqrt((1.0 - k) * (1.0 + k)))

  /** Jacobi cd(u·K(k), k), u normalized, complex. */
  def cde(u: Complex, k: Double): Complex = {
    val vs = landen(k)
    var w = cCos(u * (Pi / 2.0))
    var i = vs.length - 1
    while (i >= 0) {
      val v = vs(i)
      w = (w * (1.0 + v)) / (Complex.one + w * w * v)
      i -= 1
    }
    w
  }

  /** Jacobi sn(u·K(k), k), u normalized, complex. */
  def sne(u: Complex, k: Double): Complex = {
    val vs = landen(k)
    var w = cSin(u * (Pi / 2.0))
    var i = vs.length - 1
    while (i >= 0) {
      val v = vs(i)
      w = (w * (1.0 + v)) / (Complex.one + w * w * v)
      i -= 1
    }
    w
  }

  /** Inverse sn: u with sn(u·K(k), k) = w (normalized u, complex). */
  def asne(w0: Complex, k: Double): Complex = {
    val vs = landen(k)
    var w = w0
    var prev = k
    for (v <- vs) {
      val s = cSqrt(Complex.one - w * w * (prev * prev))
      w = (w + w) / ((Complex.one + s) * (1.0 + v))
      prev = v
    }
    cAsin(w) * (2.0 / Pi)
  }

  /** Solve the degree equation for k given N and k1 (Orfanidis
    * ellipdeg): kc = k1′^N · Π sn(uᵢ·K(k1′), k1′)⁴, k = √(1−kc²).
    */
  def ellipdeg(n: Int, k1: Double): Double = {
    val l = n / 2
    val k1p = sqrt((1.0 - k1) * (1.0 + k1))
    var prod = 1.0
    for (i <- 1 to l) {
      val u = (2.0 * i - 1.0) / n
      val s = sne(Complex.real(u), k1p).re
      prod *= s * s * s * s
    }
    val kc = pow(k1p, n.toDouble) * prod
    sqrt((1.0 - kc) * (1.0 + kc))
  }

  /** Analog elliptic lowpass prototype (scipy ellipap): passband edge 1
    * rad/s, ripple rp dB, stopband attenuation rs dB.
    */
  def ellipap(n: Int, rp: Double, rs: Double): Zpk = {
    val ep = sqrt(pow(10.0, 0.1 * rp) - 1.0)
    val es = sqrt(pow(10.0, 0.1 * rs) - 1.0)
    val k1 = ep / es
    val k = ellipdeg(n, k1)
    val l = n / 2
    val us = (1 to l).map(i => (2.0 * i - 1.0) / n)
    val zeros = us.flatMap { u =>
      val zi = 1.0 / (k * sne(Complex.real(u), k).re)
      Seq(Complex(0.0, zi), Complex(0.0, -zi))
    }
    // v0 = -j·asne(j/ep, k1)/N
    val a = asne(Complex(0.0, 1.0 / ep), k1)
    val v0 = Complex(a.im / n, -a.re / n) // (-j*a)/n
    val polePairs = us.flatMap { u =>
      val p = cde(Complex(u, 0.0) - Complex(0.0, 1.0) * v0, k)
      val pj = Complex(-p.im, p.re) // j*p
      Seq(pj, pj.conj)
    }
    val poles =
      if (n % 2 == 1) {
        val p0 = sne(Complex(0.0, 1.0) * v0, k)
        polePairs :+ Complex(-p0.im, p0.re) // j*sn(j v0) — real negative
      } else polePairs
    val num = zeros.map(z => -z).foldLeft(Complex.one)(_ * _)
    val den = poles.map(p => -p).foldLeft(Complex.one)(_ * _)
    var gain = (den / num).re
    if (n % 2 == 0) gain /= sqrt(1.0 + ep * ep)
    Zpk(zeros, poles, gain)
  }

  /** Minimal elliptic order for digital band specs (frequencies
    * normalized to Nyquist).
    */
  def ellipord(wp: Double, ws: Double, gpass: Double, gstop: Double): (Int, Double) = {
    val highpass = wp > ws
    def warp(w: Double) = math.tan(Pi * w / 2.0)
    val (wpw, wsw) = (warp(wp), warp(ws))
    val k = if (highpass) wsw / wpw else wpw / wsw
    val ep = sqrt(pow(10.0, 0.1 * gpass) - 1.0)
    val es = sqrt(pow(10.0, 0.1 * gstop) - 1.0)
    val k1 = ep / es
    val n = ceil(ellipK(k) * ellipKp(k1) / (ellipKp(k) * ellipK(k1))).toInt
    (n, wp)
  }

  /** Elliptic band SOS from 2-element corners in Hz — mirrors openseize
    * `iir.py:277` Ellip(fpass=[f1,f2], …): ellipord with array edges,
    * then ellipap + lp2bp/lp2bs. The elliptic prototype already passes
    * exactly −gpass dB at its edge (no cutoff adjustment needed); order
    * comes from the degree equation at the fminbound-OPTIMIZED bandstop
    * selectivity (scipy ellipord's band_stop_obj pass), while the band
    * transform keeps the USER passband edges (ellipord returns wn = wp)
    * — scipy quirk faithfully reproduced: strongly asymmetric bandstop
    * specs can undershoot gstop at the far stop edge exactly as scipy
    * does.
    */
  def ellipBandSos(
      fpass: (Double, Double),
      fstop: (Double, Double),
      gpass: Double,
      gstop: Double,
      fs: Double
  ): Array[Array[Double]] = {
    val g = Iir.bandNat(fpass, fstop, gpass, gstop, fs, "ellip")
    val ep = sqrt(pow(10.0, 0.1 * gpass) - 1.0)
    val es = sqrt(pow(10.0, 0.1 * gstop) - 1.0)
    val k = 1.0 / g.nat
    val k1 = ep / es
    val n = ceil(ellipK(k) * ellipKp(k1) / (ellipKp(k) * ellipK(k1))).toInt
    val proto = ellipap(n, gpass, gstop)
    val analog = if (g.bandstop) Iir.lp2bs(proto, g.wo, g.bw) else Iir.lp2bp(proto, g.wo, g.bw)
    Iir.zpk2sos(Iir.bilinear(analog))
  }

  /** Elliptic SOS meeting digital band specs at rate fs — mirrors
    * openseize `iir.py:277` Ellip (ellipord + iirfilter).
    */
  def ellipSos(fpass: Double, fstop: Double, gpass: Double, gstop: Double, fs: Double): Array[Array[Double]] = {
    val nyq = fs / 2.0
    val (n, wn) = ellipord(fpass / nyq, fstop / nyq, gpass, gstop)
    val warped = 4.0 * math.tan(Pi * wn / 2.0)
    val proto = ellipap(n, gpass, gstop)
    val analog = if (fpass > fstop) Iir.lp2hp(proto, warped) else Iir.lp2lp(proto, warped)
    Iir.zpk2sos(Iir.bilinear(analog))
  }
}
