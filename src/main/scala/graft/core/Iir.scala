package graft.core

import scala.math.{Pi, atan, ceil, cos, cosh, log, log10, pow, sin, sinh, sqrt, tan}

/** IIR filter design (pure Scala, driver-side).
  *
  * Re-derives the designs the reference gets from scipy
  * (`filtering/iir.py`: Butter, Cheby1, Notch — `buttord`/`cheb1ord`
  * order selection, analog prototype, bilinear transform, second-order
  * sections). Coefficients feed both the distributed sosfilt and the
  * DuckDB recursive-CTE oracle.
  */
object Iir {

  private def asinh(x: Double): Double = log(x + sqrt(x * x + 1.0))
  private def acosh(x: Double): Double = log(x + sqrt(x * x - 1.0))

  final case class Complex(re: Double, im: Double) {
    def +(o: Complex): Complex = Complex(re + o.re, im + o.im)
    def -(o: Complex): Complex = Complex(re - o.re, im - o.im)
    def *(o: Complex): Complex = Complex(re * o.re - im * o.im, re * o.im + im * o.re)
    def /(o: Complex): Complex = {
      val d = o.re * o.re + o.im * o.im
      Complex((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
    }
    def *(s: Double): Complex = Complex(re * s, im * s)
    def unary_- : Complex = Complex(-re, -im)
    def conj: Complex = Complex(re, -im)
    def abs2: Double = re * re + im * im
  }
  object Complex {
    val one: Complex = Complex(1.0, 0.0)
    def real(x: Double): Complex = Complex(x, 0.0)
  }

  /** Zeros-poles-gain filter representation (analog or digital). */
  final case class Zpk(zeros: Seq[Complex], poles: Seq[Complex], gain: Double)

  // ---- analog prototypes ----

  /** Butterworth analog lowpass prototype (scipy buttap). */
  def buttap(n: Int): Zpk = {
    val poles = (1 to n).map { k =>
      val theta = Pi * (2 * k + n - 1) / (2.0 * n)
      Complex(cos(theta), sin(theta)) // = -exp(i*pi*(2k-n-1)/(2n)), left half-plane
    }
    Zpk(Nil, poles, 1.0)
  }

  /** Chebyshev type I analog lowpass prototype (scipy cheb1ap). */
  def cheb1ap(n: Int, rp: Double): Zpk = {
    val eps = sqrt(pow(10.0, 0.1 * rp) - 1.0)
    val mu = asinh(1.0 / eps) / n
    val poles = (1 to n).map { k =>
      val theta = Pi * (2 * k - 1) / (2.0 * n)
      Complex(-sinh(mu) * sin(theta), cosh(mu) * cos(theta))
    }
    val prod = poles.map(p => -p).foldLeft(Complex.one)(_ * _)
    val gain = if (n % 2 == 0) prod.re / sqrt(1.0 + eps * eps) else prod.re
    Zpk(Nil, poles, gain)
  }

  // ---- frequency transforms (analog, rad/s) ----

  /** Complex square root, principal branch (im sign follows input). */
  def csqrt(z: Complex): Complex = {
    val r = math.hypot(z.re, z.im)
    val re = sqrt(math.max(0.0, (r + z.re) / 2.0))
    val im = sqrt(math.max(0.0, (r - z.re) / 2.0))
    Complex(re, if (z.im >= 0) im else -im)
  }

  def lp2lp(z: Zpk, wo: Double): Zpk = {
    val degree = z.poles.length - z.zeros.length
    Zpk(z.zeros.map(_ * wo), z.poles.map(_ * wo), z.gain * pow(wo, degree))
  }

  def lp2hp(z: Zpk, wo: Double): Zpk = {
    val woC = Complex.real(wo)
    val zeros = z.zeros.map(woC / _) ++ Seq.fill(z.poles.length - z.zeros.length)(Complex(0, 0))
    val poles = z.poles.map(woC / _)
    val num = z.zeros.map(x => -x).foldLeft(Complex.one)(_ * _)
    val den = z.poles.map(x => -x).foldLeft(Complex.one)(_ * _)
    Zpk(zeros, poles, z.gain * (num / den).re)
  }

  /** Lowpass prototype → bandpass at center wo, width bw (scipy
    * lp2bp_zpk): each root r maps to the pair r·bw/2 ± √((r·bw/2)²−wo²);
    * the degree deficit becomes zeros at the origin; gain scales by
    * bw^degree. Conjugate closure is preserved bit-exactly (csqrt
    * mirrors the imaginary sign), so zpk2sos pairing stays valid.
    */
  def lp2bp(z: Zpk, wo: Double, bw: Double): Zpk = {
    val degree = z.poles.length - z.zeros.length
    val wo2 = Complex.real(wo * wo)
    def split(r: Complex): Seq[Complex] = {
      val rl = r * (bw / 2.0)
      val d = csqrt(rl * rl - wo2)
      Seq(rl + d, rl - d)
    }
    Zpk(
      z.zeros.flatMap(split) ++ Seq.fill(degree)(Complex(0.0, 0.0)),
      z.poles.flatMap(split),
      z.gain * pow(bw, degree)
    )
  }

  /** Lowpass prototype → bandstop at center wo, width bw (scipy
    * lp2bs_zpk): roots invert first (r → (bw/2)/r) then split as in
    * lp2bp; the degree deficit becomes zero pairs at ±j·wo on the
    * stop-band center; gain scales by Π(−z)/Π(−p) of the prototype.
    */
  def lp2bs(z: Zpk, wo: Double, bw: Double): Zpk = {
    val degree = z.poles.length - z.zeros.length
    val half = Complex.real(bw / 2.0)
    val wo2 = Complex.real(wo * wo)
    def split(r: Complex): Seq[Complex] = {
      val rh = half / r
      val d = csqrt(rh * rh - wo2)
      Seq(rh + d, rh - d)
    }
    val num = z.zeros.map(x => -x).foldLeft(Complex.one)(_ * _)
    val den = z.poles.map(x => -x).foldLeft(Complex.one)(_ * _)
    Zpk(
      z.zeros.flatMap(split) ++
        (1 to degree).flatMap(_ => Seq(Complex(0.0, wo), Complex(0.0, -wo))),
      z.poles.flatMap(split),
      z.gain * (num / den).re
    )
  }

  /** Bounded scalar minimization — Brent's FMIN (golden-section +
    * successive parabolic interpolation, Forsythe–Malcolm–Moler,
    * "Computer Methods for Mathematical Computations" 1977), the
    * algorithm behind scipy `optimize.fminbound` with its default
    * xatol=1e-5. Returns the abscissa of the minimum of f on [ax, bx].
    */
  def fminbound(
      f: Double => Double,
      ax: Double,
      bx: Double,
      xatol: Double = 1e-5,
      maxFun: Int = 500
  ): Double = {
    require(ax < bx, s"fminbound needs ax < bx, got [$ax, $bx]")
    val goldenMean = 0.5 * (3.0 - sqrt(5.0))
    val sqrtEps = sqrt(2.220446049250313e-16)
    var a = ax; var b = bx
    var xf = a + goldenMean * (b - a)
    var nfc = xf; var fulc = xf
    var rat = 0.0; var e = 0.0
    var fx = f(xf)
    var num = 1
    var ffulc = fx; var fnfc = fx
    var xm = 0.5 * (a + b)
    var tol1 = sqrtEps * math.abs(xf) + xatol / 3.0
    var tol2 = 2.0 * tol1
    while (math.abs(xf - xm) > (tol2 - 0.5 * (b - a)) && num < maxFun) {
      var golden = true
      if (math.abs(e) > tol1) { // try a parabolic fit through (xf, nfc, fulc)
        var r = (xf - nfc) * (fx - ffulc)
        var q = (xf - fulc) * (fx - fnfc)
        var p = (xf - fulc) * q - (xf - nfc) * r
        q = 2.0 * (q - r)
        if (q > 0.0) p = -p
        q = math.abs(q)
        r = e
        e = rat
        if (math.abs(p) < math.abs(0.5 * q * r) && p > q * (a - xf) && p < q * (b - xf)) {
          golden = false
          rat = p / q
          val x = xf + rat
          if ((x - a) < tol2 || (b - x) < tol2) rat = tol1 * (if (xm - xf >= 0.0) 1.0 else -1.0)
        }
      }
      if (golden) { // golden-section step into the larger interval
        e = if (xf >= xm) a - xf else b - xf
        rat = goldenMean * e
      }
      val x = xf + (if (rat >= 0.0) 1.0 else -1.0) * math.max(math.abs(rat), tol1)
      val fu = f(x)
      num += 1
      if (fu <= fx) {
        if (x >= xf) a = xf else b = xf
        fulc = nfc; ffulc = fnfc
        nfc = xf; fnfc = fx
        xf = x; fx = fu
      } else {
        if (x < xf) a = x else b = x
        if (fu <= fnfc || nfc == xf) {
          fulc = nfc; ffulc = fnfc
          nfc = x; fnfc = fu
        } else if (fu <= ffulc || fulc == xf || fulc == nfc) {
          fulc = x; ffulc = fu
        }
      }
      xm = 0.5 * (a + b)
      tol1 = sqrtEps * math.abs(xf) + xatol / 3.0
      tol2 = 2.0 * tol1
    }
    xf
  }

  /** Fractional band order as a function of prototype selectivity nat —
    * scipy `band_stop_obj`'s per-family order formulas (buttord /
    * cheb1ord / ellipord internals).
    */
  private def bandFracOrder(kind: String, gpass: Double, gstop: Double): Double => Double = {
    val gp = pow(10.0, 0.1 * gpass) - 1.0
    val gs = pow(10.0, 0.1 * gstop) - 1.0
    kind match {
      case "butter" => nat => log10(gs / gp) / (2.0 * log10(nat))
      case "cheby"  => nat => acosh(sqrt(gs / gp)) / acosh(nat)
      case "ellip" =>
        nat => {
          val k = 1.0 / nat
          val k1 = sqrt(gp / gs)
          Elliptic.ellipK(k) * Elliptic.ellipKp(k1) / (Elliptic.ellipKp(k) * Elliptic.ellipK(k1))
        }
      case other => throw new IllegalArgumentException(s"unknown band order kind: $other")
    }
  }

  /** Warped analog band geometry for 2-element band specs: `wo`/`bw`
    * are center/width at the USER passband edges (they map to ±1 in the
    * lowpass-prototype domain); `woAdj`/`bwAdj` at the scipy-optimized
    * bandstop passband edges (identical to wo/bw for bandpass); `nat`
    * is the optimized prototype selectivity that sets the order.
    */
  private[core] final case class BandGeom(
      wo: Double,
      bw: Double,
      woAdj: Double,
      bwAdj: Double,
      nat: Double,
      bandstop: Boolean
  )

  /** Band geometry + selectivity for 2-element band specs (Hz) — scipy's
    * band `buttord`/`cheb1ord`/`ellipord` math INCLUDING the bandstop
    * passband-edge optimization: each passband edge of a bandstop spec
    * is free to move toward the stop band (the spec only bounds ripple
    * OUTSIDE the user edges), and scipy picks the pair minimizing the
    * fractional order via `fminbound` over `band_stop_obj`. One scipy
    * divergence: trial edges that cross the band center make nat ≤ 1
    * (scipy lets the objective go negative there and can return garbage
    * orders for extreme specs); we reject such trials outright, which
    * matches scipy everywhere scipy itself is well-defined.
    */
  private[core] def bandNat(
      fpass: (Double, Double),
      fstop: (Double, Double),
      gpass: Double,
      gstop: Double,
      fs: Double,
      kind: String
  ): BandGeom = {
    require(
      fpass._1 < fpass._2 && fstop._1 < fstop._2,
      s"band edges must be increasing: fpass=$fpass fstop=$fstop"
    )
    val bandstop = fpass._1 < fstop._1 // passband surrounds the stopband
    require(
      if (bandstop) fpass._1 < fstop._1 && fstop._2 < fpass._2
      else fstop._1 < fpass._1 && fpass._2 < fstop._2,
      s"stopband and passband must nest: fpass=$fpass fstop=$fstop"
    )
    val nyq = fs / 2.0
    require(fpass._2 < nyq && fstop._2 < nyq, s"band edges must lie below Nyquist $nyq Hz")
    def w(f: Double) = 4.0 * tan(Pi * (f / nyq) / 2.0)
    val (p0, p1) = (w(fpass._1), w(fpass._2))
    val (s0, s1) = (w(fstop._1), w(fstop._2))
    def natAt(q0: Double, q1: Double): Double = {
      val wo2 = q0 * q1
      val b = q1 - q0
      def om(x: Double) =
        if (bandstop) b * x / (wo2 - x * x) else (x * x - wo2) / (b * x)
      math.min(math.abs(om(s0)), math.abs(om(s1)))
    }
    val natUser = natAt(p0, p1)
    require(natUser > 1.0, s"degenerate band spec (selectivity $natUser <= 1): fpass=$fpass fstop=$fstop")
    if (!bandstop) BandGeom(sqrt(p0 * p1), p1 - p0, sqrt(p0 * p1), p1 - p0, natUser, bandstop = false)
    else {
      val frac = bandFracOrder(kind, gpass, gstop)
      def obj(q0: Double, q1: Double): Double = {
        val nat = natAt(q0, q1)
        if (nat <= 1.0) Double.MaxValue else frac(nat)
      }
      // sequential, like scipy: the wp1 search uses the optimized wp0
      val q0 = fminbound(x => obj(x, p1), p0, s0 - 1e-12)
      val q1 = fminbound(x => obj(q0, x), s1 + 1e-12, p1)
      val nat = natAt(q0, q1)
      require(nat > 1.0, s"degenerate band spec after edge optimization: fpass=$fpass fstop=$fstop")
      BandGeom(sqrt(p0 * p1), p1 - p0, sqrt(q0 * q1), q1 - q0, nat, bandstop = true)
    }
  }

  /** Butterworth band SOS from 2-element corners in Hz — mirrors
    * openseize `filtering/iir.py:44` Butter(fpass=[f1,f2], …), which the
    * reference routes through scipy buttord with array edges. fpass
    * inside fstop → bandpass; fpass outside → bandstop. The prototype
    * cutoff is adjusted (bw·W0 / bw÷W0) so the response passes exactly
    * −gpass dB at the passband edges, as scipy's Wn does. Bandstop uses
    * the fminbound-optimized passband edges for BOTH the order and the
    * band transform (scipy buttord returns WN from the adjusted passb),
    * so the attenuation guarantee holds at the lower order.
    */
  def butterBandSos(
      fpass: (Double, Double),
      fstop: (Double, Double),
      gpass: Double,
      gstop: Double,
      fs: Double
  ): Array[Array[Double]] = {
    val g = bandNat(fpass, fstop, gpass, gstop, fs, "butter")
    val gstopL = pow(10.0, 0.1 * gstop) - 1
    val gpassL = pow(10.0, 0.1 * gpass) - 1
    val n = ceil(log10(gstopL / gpassL) / (2.0 * log10(g.nat))).toInt
    val w0 = pow(gpassL, -1.0 / (2.0 * n)) // prototype cutoff > 1
    val proto = buttap(n)
    val analog = if (g.bandstop) lp2bs(proto, g.woAdj, g.bwAdj / w0) else lp2bp(proto, g.wo, g.bw * w0)
    zpk2sos(bilinear(analog))
  }

  /** Chebyshev I band SOS — scipy cheb1ord + cheby1 with 2-element
    * edges. The order comes from the OPTIMIZED bandstop selectivity but
    * the band transform keeps the USER passband edges (scipy cheb1ord
    * returns wn = wp), giving exact −gpass equiripple at the given
    * edges; scipy quirk faithfully reproduced: on strongly asymmetric
    * bandstop specs the far stop edge can undershoot gstop by the same
    * margin scipy's design does.
    */
  def cheby1BandSos(
      fpass: (Double, Double),
      fstop: (Double, Double),
      gpass: Double,
      gstop: Double,
      fs: Double
  ): Array[Array[Double]] = {
    val g = bandNat(fpass, fstop, gpass, gstop, fs, "cheby")
    val gstopL = pow(10.0, 0.1 * gstop) - 1
    val gpassL = pow(10.0, 0.1 * gpass) - 1
    val n = ceil(acosh(sqrt(gstopL / gpassL)) / acosh(g.nat)).toInt
    val proto = cheb1ap(n, gpass)
    val analog = if (g.bandstop) lp2bs(proto, g.wo, g.bw) else lp2bp(proto, g.wo, g.bw)
    zpk2sos(bilinear(analog))
  }

  /** Chebyshev II band SOS — scipy cheb2ord + cheby2. The type-II
    * prototype reaches exactly −gpass at frequency 1/newFreq where
    * newFreq = cosh(acosh√(gs/gp)/n) absorbs the integer-order slack,
    * so scaling the (adjusted-edge) band width by newFreq (bandpass) or
    * 1/newFreq (bandstop) pins the passband edges at exactly −gpass and
    * puts the −gstop corners strictly inside the user stop band — the
    * closed form behind cheb2ord's nat[] corner formulas.
    */
  def cheby2BandSos(
      fpass: (Double, Double),
      fstop: (Double, Double),
      gpass: Double,
      gstop: Double,
      fs: Double
  ): Array[Array[Double]] = {
    val g = bandNat(fpass, fstop, gpass, gstop, fs, "cheby")
    val gstopL = pow(10.0, 0.1 * gstop) - 1
    val gpassL = pow(10.0, 0.1 * gpass) - 1
    val n = ceil(acosh(sqrt(gstopL / gpassL)) / acosh(g.nat)).toInt
    val newFreq = cosh(acosh(sqrt(gstopL / gpassL)) / n)
    val proto = cheb2ap(n, gstop)
    val analog =
      if (g.bandstop) lp2bs(proto, g.woAdj, g.bwAdj / newFreq)
      else lp2bp(proto, g.woAdj, g.bwAdj * newFreq)
    zpk2sos(bilinear(analog))
  }

  /** Bilinear transform, fs = 2 (scipy convention after prewarp). */
  def bilinear(z: Zpk, fs: Double = 2.0): Zpk = {
    val fs2 = Complex.real(2.0 * fs)
    val mapped = (c: Complex) => (fs2 + c) / (fs2 - c)
    val zerosD = z.zeros.map(mapped) ++
      Seq.fill(z.poles.length - z.zeros.length)(Complex(-1.0, 0.0))
    val polesD = z.poles.map(mapped)
    val num = z.zeros.map(fs2 - _).foldLeft(Complex.one)(_ * _)
    val den = z.poles.map(fs2 - _).foldLeft(Complex.one)(_ * _)
    Zpk(zerosD, polesD, z.gain * (num / den).re)
  }

  // ---- zpk → second-order sections ----

  /** Pair conjugate roots into biquads. Assumes roots are either real or
    * come in conjugate pairs (true for all designs here). Overall gain is
    * folded into the first section's numerator. Each row is
    * (b0, b1, b2, a0=1, a1, a2).
    */
  def zpk2sos(z: Zpk): Array[Array[Double]] = {
    def pairs(roots: Seq[Complex]): (Seq[(Complex, Complex)], Seq[Double]) = {
      val (cplx, real) = roots.partition(r => math.abs(r.im) > 1e-12)
      val upper = cplx.filter(_.im > 0).sortBy(c => (-c.abs2, -c.re))
      require(upper.length * 2 == cplx.length, "complex roots must pair")
      (upper.map(c => (c, c.conj)), real.map(_.re).sorted)
    }
    val (zp, zr0) = pairs(z.zeros)
    val (pp, pr0) = pairs(z.poles)
    require(z.zeros.length <= z.poles.length, "more zeros than poles")

    val sections = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    var zrs = zr0 // real zeros yet to be placed
    var zps = zp // conjugate zero pairs yet to be placed
    def takeZeroPair(): Array[Double] = zps match {
      case (zc, _) +: rest =>
        zps = rest; Array(1.0, -2.0 * zc.re, zc.abs2)
      case _ =>
        zrs match {
          case r1 +: r2 +: rest =>
            zrs = rest; Array(1.0, -(r1 + r2), r1 * r2)
          case r1 +: rest =>
            zrs = rest; Array(1.0, -r1, 0.0)
          case _ => Array(1.0, 0.0, 0.0)
        }
    }
    // conjugate pole pairs: prefer a conjugate zero pair, else two (or
    // fewer) real zeros — keeps section count at ceil(order/2)
    for ((c, _) <- pp) {
      val b = takeZeroPair()
      sections += Array(b(0), b(1), b(2), 1.0, -2.0 * c.re, c.abs2)
    }
    // real poles two at a time (wide band transforms split a real
    // prototype pole into two real poles): a biquad that can still host
    // a conjugate zero pair, as scipy's zpk2sos pairing does
    var prs = pr0
    while (prs.length >= 2) {
      val (p1, p2) = (prs.head, prs.tail.head)
      prs = prs.tail.tail
      val b = takeZeroPair()
      sections += Array(b(0), b(1), b(2), 1.0, -(p1 + p2), p1 * p2)
    }
    // odd leftover real pole: first-order section, one real zero
    for (p <- prs) {
      val b = zrs match {
        case r +: rest => zrs = rest; Array(1.0, -r, 0.0)
        case _ => Array(1.0, 0.0, 0.0)
      }
      sections += Array(b(0), b(1), 0.0, 1.0, -p, 0.0)
    }
    require(zrs.isEmpty && zps.isEmpty, "unplaced zeros in zpk2sos")
    val out = sections.toArray
    // fold gain into first section numerator
    var j = 0
    while (j < 3) { out(0)(j) *= z.gain; j += 1 }
    out
  }

  // ---- order selection (scipy buttord / cheb1ord, digital) ----

  private def warp(w: Double): Double = tan(Pi * w / 2.0)

  /** Butterworth minimal order meeting band specs; frequencies normalized
    * to Nyquist (0..1). Returns (order, Wn normalized).
    */
  def buttord(wp: Double, ws: Double, gpass: Double, gstop: Double): (Int, Double) = {
    val highpass = wp > ws
    val (wpw, wsw) = (warp(wp), warp(ws))
    val nat = if (highpass) wpw / wsw else wsw / wpw
    val gstopL = pow(10.0, 0.1 * gstop) - 1
    val gpassL = pow(10.0, 0.1 * gpass) - 1
    val n = ceil(log10(gstopL / gpassL) / (2.0 * log10(nat))).toInt
    // exact passband-edge match: W0 = wpw * gpassL^{∓1/(2n)}
    val w0 = if (highpass) wpw * pow(gpassL, 1.0 / (2.0 * n)) else wpw * pow(gpassL, -1.0 / (2.0 * n))
    (n, 2.0 / Pi * atan(w0))
  }

  /** Chebyshev type II analog lowpass prototype (scipy cheb2ap):
    * equiripple stopband, zeros on the imaginary axis.
    */
  def cheb2ap(n: Int, rs: Double): Zpk = {
    val de = 1.0 / sqrt(pow(10.0, 0.1 * rs) - 1.0)
    val mu = asinh(1.0 / de) / n
    // zeros: +-i/cos(theta_k); odd n skips the infinite zero at theta=pi/2
    val ks = (1 to n).filter(k => 2 * k - 1 != n)
    val zeros = ks.map { k =>
      val theta = Pi * (2 * k - 1) / (2.0 * n)
      Complex(0.0, 1.0 / cos(theta))
    }
    // poles: reciprocal of the type-I style poles
    val poles = (1 to n).map { k =>
      val theta = Pi * (2 * k - 1) / (2.0 * n)
      val p = Complex(-sinh(mu) * sin(theta), cosh(mu) * cos(theta))
      Complex.one / p
    }
    val num = zeros.map(z => -z).foldLeft(Complex.one)(_ * _)
    val den = poles.map(p => -p).foldLeft(Complex.one)(_ * _)
    Zpk(zeros, poles, (den / num).re)
  }

  /** Chebyshev II minimal order; Wn is where the analog response first
    * reaches −gstop at the integer order (scipy cheb2ord): newFreq =
    * cosh(acosh√(gs/gp)/n) is the prototype frequency of exact −gpass,
    * so mapping the passband edge through it gives a stop corner at or
    * inside the user edge — the ceil slack goes to the stop side and
    * the design passes exactly −gpass at wp.
    */
  def cheb2ord(wp: Double, ws: Double, gpass: Double, gstop: Double): (Int, Double) = {
    val highpass = wp > ws
    val (wpw, wsw) = (warp(wp), warp(ws))
    val nat = if (highpass) wpw / wsw else wsw / wpw
    val gstopL = pow(10.0, 0.1 * gstop) - 1
    val gpassL = pow(10.0, 0.1 * gpass) - 1
    val n = ceil(acosh(sqrt(gstopL / gpassL)) / acosh(nat)).toInt
    val newFreq = cosh(acosh(sqrt(gstopL / gpassL)) / n)
    val natAdj = if (highpass) wpw / newFreq else wpw * newFreq
    (n, 2.0 / Pi * atan(natAdj))
  }

  /** Chebyshev II SOS — mirrors openseize `iir.py:200` Cheby2. */
  def cheby2Sos(fpass: Double, fstop: Double, gpass: Double, gstop: Double, fs: Double): Array[Array[Double]] = {
    val nyq = fs / 2.0
    val (n, wn) = cheb2ord(fpass / nyq, fstop / nyq, gpass, gstop)
    val warped = 4.0 * tan(Pi * wn / 2.0)
    val proto = cheb2ap(n, gstop)
    val analog = if (fpass > fstop) lp2hp(proto, warped) else lp2lp(proto, warped)
    zpk2sos(bilinear(analog))
  }

  /** Chebyshev I minimal order; Wn = passband edge. */
  def cheb1ord(wp: Double, ws: Double, gpass: Double, gstop: Double): (Int, Double) = {
    val highpass = wp > ws
    val (wpw, wsw) = (warp(wp), warp(ws))
    val nat = if (highpass) wpw / wsw else wsw / wpw
    val gstopL = pow(10.0, 0.1 * gstop) - 1
    val gpassL = pow(10.0, 0.1 * gpass) - 1
    val n = ceil(acosh(sqrt(gstopL / gpassL)) / acosh(nat)).toInt
    (n, wp)
  }

  // ---- top-level designs (digital, frequencies in Hz) ----

  /** Butterworth SOS meeting (fpass, fstop, gpass, gstop) at rate fs —
    * mirrors openseize `iir.py:44` Butter (buttord + iirfilter).
    */
  def butterSos(fpass: Double, fstop: Double, gpass: Double, gstop: Double, fs: Double): Array[Array[Double]] = {
    val nyq = fs / 2.0
    val (n, wn) = buttord(fpass / nyq, fstop / nyq, gpass, gstop)
    butter(n, wn, highpass = fpass > fstop)
  }

  /** Butterworth SOS of given order at normalized (to Nyquist) cutoff. */
  def butter(n: Int, wn: Double, highpass: Boolean): Array[Array[Double]] = {
    val warped = 4.0 * tan(Pi * wn / 2.0) // 2 * fs * tan(pi*wn/fs), fs=2
    val proto = buttap(n)
    val analog = if (highpass) lp2hp(proto, warped) else lp2lp(proto, warped)
    zpk2sos(bilinear(analog))
  }

  /** Chebyshev I SOS — mirrors openseize `iir.py:123` Cheby1. */
  def cheby1Sos(fpass: Double, fstop: Double, gpass: Double, gstop: Double, fs: Double): Array[Array[Double]] = {
    val nyq = fs / 2.0
    val (n, wn) = cheb1ord(fpass / nyq, fstop / nyq, gpass, gstop)
    val warped = 4.0 * tan(Pi * wn / 2.0)
    val proto = cheb1ap(n, gpass)
    val analog = if (fpass > fstop) lp2hp(proto, warped) else lp2lp(proto, warped)
    zpk2sos(bilinear(analog))
  }

  /** Notch biquad (scipy iirnotch / RBJ cookbook) — openseize `iir.py:354`. */
  def notchSos(f0: Double, q: Double, fs: Double): Array[Array[Double]] = {
    val w0 = 2.0 * Pi * f0 / fs
    val alpha = sin(w0) / (2.0 * q)
    val a0 = 1.0 + alpha
    Array(
      Array(1.0 / a0, -2.0 * cos(w0) / a0, 1.0 / a0, 1.0, -2.0 * cos(w0) / a0, (1.0 - alpha) / a0)
    )
  }

  /** Steady-state initial conditions (scipy sosfilt_zi): per-section
    * (z1, z2) for unit input; caller scales by the first sample.
    */
  def sosfiltZi(sos: Array[Array[Double]]): Array[Array[Double]] = {
    var scale = 1.0
    sos.map { s =>
      val Array(b0, b1, b2, _, a1, a2) = s
      // solve (I - A^T) zi = B, A = companion([1,a1,a2]).T
      // [[1+a1, -1], [a2, 1]] [z1, z2] = [b1 - a1*b0, b2 - a2*b0]
      val c1 = 1.0 + a1
      val det = c1 * 1.0 - (-1.0) * a2
      val r1 = (b1 - a1 * b0) * scale
      val r2 = (b2 - a2 * b0) * scale
      val z1 = (r1 * 1.0 - (-1.0) * r2) / det
      val z2 = (c1 * r2 - a2 * r1) / det
      scale *= (b0 + b1 + b2) / (1.0 + a1 + a2)
      Array(z1, z2)
    }
  }

  /** Polynomial with given roots (complex-conjugate-closed set → real
    * coefficients), leading coefficient 1. For zpk → transfer-function
    * conversion.
    */
  def polyFromRoots(roots: Seq[Complex]): Array[Double] = {
    var acc = Array(Complex.one)
    for (r <- roots) {
      val next = Array.fill(acc.length + 1)(Complex(0.0, 0.0))
      for (i <- acc.indices) {
        next(i) = next(i) + acc(i)
        next(i + 1) = next(i + 1) - acc(i) * r
      }
      acc = next
    }
    acc.map(_.re)
  }

  /** zpk → (b, a) transfer function coefficients. */
  def zpk2tf(z: Zpk): (Array[Double], Array[Double]) =
    (polyFromRoots(z.zeros).map(_ * z.gain), polyFromRoots(z.poles))

  /** Steady state for a ba-form filter (scipy lfilter_zi): solve
    * (I − Aᵀ)zi = B with A = companion(a), B = b[1:] − a[1:]·b0.
    * Gaussian elimination; orders here are single digits.
    */
  def lfilterZi(b0: Array[Double], a0: Array[Double]): Array[Double] = {
    val n = math.max(b0.length, a0.length)
    val b = java.util.Arrays.copyOf(b0, n)
    val a = java.util.Arrays.copyOf(a0, n)
    val m = n - 1
    // M = I - companion(a).T ; companion first row = -a[1:], subdiag = 1
    val mat = Array.tabulate(m, m) { (i, j) =>
      val comp = if (j == 0) -a(i + 1) else if (i == j - 1) 1.0 else 0.0 // companion.T[i][j]
      (if (i == j) 1.0 else 0.0) - comp
    }
    val rhs = Array.tabulate(m)(i => b(i + 1) - a(i + 1) * b(0))
    // Gaussian elimination with partial pivoting
    for (col <- 0 until m) {
      var piv = col
      for (r <- col + 1 until m) if (math.abs(mat(r)(col)) > math.abs(mat(piv)(col))) piv = r
      val tr = mat(col); mat(col) = mat(piv); mat(piv) = tr
      val tv = rhs(col); rhs(col) = rhs(piv); rhs(piv) = tv
      for (r <- col + 1 until m) {
        val f = mat(r)(col) / mat(col)(col)
        for (c <- col until m) mat(r)(c) -= f * mat(col)(c)
        rhs(r) -= f * rhs(col)
      }
    }
    val zi = new Array[Double](m)
    for (r <- m - 1 to 0 by -1) {
      var s = rhs(r)
      for (c <- r + 1 until m) s -= mat(r)(c) * zi(c)
      zi(r) = s / mat(r)(r)
    }
    zi
  }

  /** |H(e^{iw})| of an SOS cascade at normalized frequency w (rad/sample). */
  def sosGain(sos: Array[Array[Double]], w: Double): Double = {
    val ejw = Complex(cos(-w), sin(-w))
    val ej2w = ejw * ejw
    sos.foldLeft(1.0) { (g, s) =>
      val num = Complex.real(s(0)) + ejw * s(1) + ej2w * s(2)
      val den = Complex.real(s(3)) + ejw * s(4) + ej2w * s(5)
      g * sqrt((num / den).abs2)
    }
  }
}
