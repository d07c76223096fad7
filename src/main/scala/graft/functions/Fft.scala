package graft.functions

/** Iterative radix-2 FFT (pure JVM, allocation-light) — the vectorized
  * kernel behind the segmented spectral/convolution fast paths.
  * Public-textbook Cooley–Tukey; no external deps.
  */
object Fft {

  /** In-place radix-2 FFT over interleaved (re, im) arrays, length 2^k. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"FFT length must be a power of two, got $n")
    if (n <= 1) return
    // bit reversal
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val i0 = base + k
          val i1 = base + k + len / 2
          val xr = re(i1) * cr - im(i1) * ci
          val xi = re(i1) * ci + im(i1) * cr
          re(i1) = re(i0) - xr; im(i1) = im(i0) - xi
          re(i0) = re(i0) + xr; im(i0) = im(i0) + xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** |RFFT(x)|² for bins 0..n/2 (one-sided), x length 2^k. */
  def rfftMag2(x: Array[Double]): Array[Double] = {
    val n = x.length
    val re = java.util.Arrays.copyOf(x, n)
    val im = new Array[Double](n)
    fft(re, im)
    Array.tabulate(n / 2 + 1)(f => re(f) * re(f) + im(f) * im(f))
  }

  /** Linear convolution x ⊛ h via zero-padded FFT (length 2^k ≥ nx+nh−1). */
  def convolve(x: Array[Double], h: Array[Double]): Array[Double] = {
    val outLen = x.length + h.length - 1
    var n = 1
    while (n < outLen) n <<= 1
    val xr = java.util.Arrays.copyOf(x, n); val xi = new Array[Double](n)
    val hr = java.util.Arrays.copyOf(h, n); val hi = new Array[Double](n)
    fft(xr, xi); fft(hr, hi)
    var i = 0
    while (i < n) {
      val r = xr(i) * hr(i) - xi(i) * hi(i)
      val im = xr(i) * hi(i) + xi(i) * hr(i)
      xr(i) = r; xi(i) = im
      i += 1
    }
    // inverse via conjugate trick
    i = 0
    while (i < n) { xi(i) = -xi(i); i += 1 }
    fft(xr, xi)
    val inv = 1.0 / n
    Array.tabulate(outLen)(k => xr(k) * inv)
  }
}
