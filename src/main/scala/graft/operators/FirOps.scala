package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Dsp, Signal}

/** FIR filtering over the long-format signal.
  *
  * Reference: openseize `filtering/fir.py` (window families) applied via
  * `core/numerical.py:158` `oaconvolve` with numpy modes full/same/valid.
  *
  * Spark-first shape: a linear convolution y[n] = Σ_k h[k]·x[n−k+Δ] is a
  * fixed pattern of `lag`/`lead` references within one
  * `PARTITION BY channel ORDER BY n` window — a single shuffle+sort, then
  * whole-stage-codegen'd arithmetic; no UDFs, no state. Edge samples use
  * zero extension (numpy conv semantics) via `coalesce(·, 0)`.
  *
  * The same coefficient array also renders the DuckDB oracle expression,
  * term-for-term in the same left-associated order, so both engines agree to the
  * last ulp; outputs are rounded to 6 dp on both sides to make the
  * comparison hash-stable.
  *
  * Scale: one window sort per channel partition; the M lag references are
  * per-row O(M) work with no extra shuffle. For M ≳ 128 the segmented
  * overlap-add FFT path (`functions.SegConv`) is preferred.
  */
object FirOps {

  private def chanWindow = Window.partitionBy(col("channel")).orderBy(col("n"))

  /** x[n + j] as a Column (j may be negative = past). */
  private def shifted(j: Int): Column =
    if (j > 0) lead(col("x"), j).over(chanWindow)
    else if (j < 0) lag(col("x"), -j).over(chanWindow)
    else col("x")

  private def shiftedSql(j: Int): String =
    if (j > 0) s"lead(x, $j) OVER w"
    else if (j < 0) s"lag(x, ${-j}) OVER w"
    else "x"

  /** Same-mode convolution of column x as a reusable Column expression.
    * Kernels ≤128 taps sum left-associated (matching the SQL oracle's
    * parse order term-for-term); longer kernels use a balanced reduction
    * to bound expression-tree depth (those run through the FFT fast path
    * or rows-only checks, so cross-engine order parity is not needed).
    */
  def sameExpr(h: Array[Double]): Column = {
    val l = (h.length - 1) / 2
    val terms = h.zipWithIndex
      .map { case (c, k) => lit(c) * coalesce(shifted(l - k), lit(0.0)) }
    if (terms.length <= 128) terms.reduceLeft(_ + _)
    else {
      def bal(ts: Array[Column]): Column =
        if (ts.length == 1) ts(0)
        else {
          val (a, b) = ts.splitAt(ts.length / 2)
          bal(a) + bal(b)
        }
      bal(terms)
    }
  }

  /** SQL twin of [[sameExpr]]; expects window `w` over (channel, n). */
  def sameExprSql(h: Array[Double]): String = {
    val l = (h.length - 1) / 2
    h.zipWithIndex
      .map { case (c, k) => s"${Dsp.lit(c)} * coalesce(${shiftedSql(l - k)}, 0.0)" }
      .mkString(" + ")
  }

  /** Centered ('same') convolution: y[n] = Σ_k h[k]·x[n − k + L], L = (M−1)/2. */
  def same(sig: DataFrame, h: Array[Double]): DataFrame =
    sig.select(col("channel"), col("n"), round(sameExpr(h), 6).as("y"))

  def sameSql(h: Array[Double]): String =
    s"${Signal.sigCte} SELECT channel, n, round(${sameExprSql(h)}, 6) AS y FROM sig " +
      "WINDOW w AS (PARTITION BY channel ORDER BY n)"

  /** 'valid' convolution: y[j] = Σ_k h[k]·x[j + M−1 − k], only full overlaps. */
  def valid(sig: DataFrame, h: Array[Double]): DataFrame = {
    val m = h.length
    val y = h.zipWithIndex
      .map { case (c, k) => lit(c) * coalesce(shifted(m - 1 - k), lit(0.0)) }
      .reduceLeft(_ + _)
    val last = lead(col("x"), m - 1).over(chanWindow)
    sig
      .select(col("channel"), col("n"), round(y, 6).as("y"), last.as("_last"))
      .filter(col("_last").isNotNull)
      .drop("_last")
  }

  def validSql(h: Array[Double]): String = {
    val m = h.length
    val expr = h.zipWithIndex
      .map { case (c, k) => s"${Dsp.lit(c)} * coalesce(${shiftedSql(m - 1 - k)}, 0.0)" }
      .mkString(" + ")
    s"${Signal.sigCte} SELECT channel, n, y FROM (" +
      s"SELECT channel, n, round($expr, 6) AS y, lead(x, ${m - 1}) OVER w AS _last FROM sig " +
      "WINDOW w AS (PARTITION BY channel ORDER BY n)) WHERE _last IS NOT NULL"
  }

  /** 'full' convolution: y[j] = Σ_k h[k]·x[j−k], j ∈ [0, len+M−2] — the
    * signal is extended with M−1 trailing null rows per channel so the
    * window lag terms cover the kernel run-out.
    */
  def full(sig: DataFrame, h: Array[Double]): DataFrame = {
    val m = h.length
    val bounds = sig.groupBy(col("channel")).agg(max(col("n")).as("max_n"))
    val tail = bounds.select(
      col("channel"),
      explode(sequence(col("max_n") + 1, col("max_n") + (m - 1))).as("n"),
      lit(null).cast("double").as("x")
    )
    val ext = sig.unionByName(tail)
    val w = Window.partitionBy(col("channel")).orderBy(col("n"))
    val y = h.zipWithIndex
      .map { case (c, k) =>
        val t = if (k == 0) col("x") else lag(col("x"), k).over(w)
        lit(c) * coalesce(t, lit(0.0))
      }
      .reduceLeft(_ + _)
    ext.select(col("channel"), col("n"), round(y, 6).as("y"))
  }

  def fullSql(h: Array[Double]): String = {
    val m = h.length
    val expr = h.zipWithIndex
      .map { case (c, k) =>
        val t = if (k == 0) "x" else s"lag(x, $k) OVER w"
        s"${Dsp.lit(c)} * coalesce($t, 0.0)"
      }
      .mkString(" + ")
    s"${Signal.sigCte}, bounds AS (SELECT channel, max(n) AS max_n FROM sig GROUP BY channel), " +
      s"ext AS (SELECT channel, n, x FROM sig UNION ALL " +
      s"SELECT channel, max_n + gs.g AS n, CAST(NULL AS DOUBLE) AS x FROM bounds, generate_series(1, ${m - 1}) gs(g)) " +
      s"SELECT channel, n, round($expr, 6) AS y FROM ext WINDOW w AS (PARTITION BY channel ORDER BY n)"
  }

  /** Segmented overlap-add fast path for 'same' convolution — the
    * reference's `oaconvolve` (numerical.py:158) re-expressed for
    * Spark: samples scatter into fixed segments plus L-sample halos on
    * both sides (explode, no neighbor shuffle beyond the channel
    * partitioning), each extended segment runs one FFT convolution
    * inside the custom `SegConv` expression, and the core region
    * explodes back to rows. O(log S) per sample vs O(M) for the
    * lag-sum path — the win for kernels with hundreds+ taps.
    */
  /** The scatter/assemble half of [[sameFast]]: samples land in their
    * own segment plus L-sample halos of both neighbors, and each
    * (channel, s) group densifies into the `segLen + 2l`-long `xs`
    * array. Shared by any long-kernel consumer that wants SEVERAL
    * convolutions per assembled segment (the long-scale CWT runs the
    * re and im Morlet kernels over one assembly).
    */
  /** Halo-extended segment assembly — (channel, s, xs[segLen + 2l])
    * where xs covers global positions [s·segLen − l, s·segLen + segLen
    * + l), zero-padded outside the signal. REQUIRES the Signal
    * contract: contiguous n = 0..cnt−1 per channel (both call sites —
    * sameFast and cwtMorletLong — feed it).
    *
    * STREAMING SCAN (r13): the original form scattered every sample
    * into its 3 destination segments (core + two halos) and
    * reassembled with a groupBy(collect_list + sort_array) — a 3n-row
    * shuffle whose aggregation buffers spilled 17.6 GB at the
    * 128M-sample decade. This is the same explode-assembly shape the
    * r5 frameScan rewrite removed from the periodogram path, so the
    * same fix applies: one channel-partitioned sort (zero extra
    * exchanges when the caller pre-sorts), then a rolling iterator
    * emits each segment once with its halos — task memory
    * O(block + extLen) at any channel length, no shuffle of scattered
    * rows at all. Segment arrays are value-identical to the scatter
    * form (zeros and sample placement agree position-for-position);
    * trailing segments whose core lies wholly past the signal end were
    * only ever dropped by the callers' n ≤ max_n clip and are simply
    * not emitted.
    */
  private[graft] def segAssemble(
      sig: DataFrame,
      l: Int,
      segLen: Int,
      presorted: Boolean = false
  ): DataFrame = {
    require(segLen > 2 * l, s"segLen $segLen must exceed kernel overlap ${2 * l}")
    val spark = sig.sparkSession
    import spark.implicits._
    val extLen = segLen + 2 * l
    val blockSize = math.max(1 << 16, 4 * extLen)
    val typed = sig.select(col("channel"), col("n"), col("x")).as[(String, Long, Double)]
    val ordered =
      if (presorted) typed
      else typed.repartition(col("channel")).sortWithinPartitions(col("channel"), col("n"))
    ordered
      .mapPartitions { (it0: Iterator[(String, Long, Double)]) =>
        val in = it0.buffered
        new Iterator[Iterator[(String, Long, Array[Double])]] {
          private var ch: String = null
          // extended coordinates m = n + l; segment s occupies
          // m ∈ [s·segLen, s·segLen + extLen)
          private val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
          private var base = 0L
          private var s = 0L
          private var nData = 0L
          // channel-in-progress flag: xs.isEmpty is NOT a safe sentinel —
          // with l == 0 (1–2-tap kernels) extLen == segLen and an emit
          // round can drain the buffer exactly at a block boundary
          // mid-channel, which would re-initialize state for the same
          // channel and emit duplicate segment ids (ADVICE r13).
          private var active = false
          def hasNext: Boolean = in.hasNext || active

          def next(): Iterator[(String, Long, Array[Double])] = {
            if (!active) {
              active = true
              ch = in.head._1; base = 0L; s = 0L; nData = 0L
              var i = 0
              while (i < l) { xs += 0.0; i += 1 } // head halo zeros
            }
            var read = 0
            while (read < blockSize && in.hasNext && in.head._1 == ch) {
              xs += in.next()._3; nData += 1; read += 1
            }
            val channelDone = !in.hasNext || in.head._1 != ch
            if (channelDone) {
              // pad the tail so the LAST core segment (s_max = (cnt−1)
              // div segLen) completes: extended length E = s_max·segLen
              // + extLen
              val e = ((nData - 1).max(0L) / segLen) * segLen + extLen
              var i = base + xs.length
              while (i < e) { xs += 0.0; i += 1 }
            }
            val avail = base + xs.length
            val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Array[Double])]
            // only segments with in-signal core: s ≤ (cnt−1) div segLen
            while (s * segLen + extLen <= avail && (!channelDone || s <= (nData - 1).max(0L) / segLen)) {
              val seg = new Array[Double](extLen)
              var i = 0
              while (i < extLen) { seg(i) = xs((s * segLen + i - base).toInt); i += 1 }
              out += ((ch, s, seg))
              s += 1
            }
            if (channelDone) { xs.clear(); active = false }
            else {
              val dropTo = math.max(base, s * segLen)
              val dropCount = (dropTo - base).toInt
              if (dropCount > 0) { xs.remove(0, dropCount); base = dropTo }
            }
            out.iterator
          }
        }.flatten
      }
      .toDF("channel", "s", "xs")
  }

  def sameFast(sig: DataFrame, h: Array[Double], segLen: Int = 1024): DataFrame = {
    val m = h.length
    val l = (m - 1) / 2
    // full conv of xs (extLen) with h → index j = p + 2l maps to sample
    // n = s*segLen + p
    val conv = segAssemble(sig, l, segLen).select(
      col("channel"),
      col("s"),
      graft.functions.exprs.seg_conv(col("xs"), h).as("ys")
    )
    val bounds = sig.groupBy(col("channel")).agg(max(col("n")).as("max_n"))
    conv
      .select(col("channel"), col("s"), posexplode(col("ys")).as(Seq("j", "y")))
      .filter(col("j") >= 2 * l && col("j") < segLen + 2 * l)
      .select(
        col("channel"),
        (col("s") * segLen + col("j") - 2 * l).cast("bigint").as("n"),
        round(col("y"), 6).as("y")
      )
      .join(broadcast(bounds), Seq("channel"))
      .filter(col("n") <= col("max_n")) // trailing zero-padded positions
      .drop("max_n")
  }

  /** 'same'-mode convolution as a channel-parallel mapPartitions scan,
    * bit-exact with [[sameExpr]]: terms accumulate in ascending-k
    * left-associated order with literal 0.0 contributions outside the
    * signal, so any oracle written against the lag-sum stays valid.
    *
    * Why it exists: WindowExec evaluates each lag/lead as an interpreted
    * per-row frame — at 100+ taps (Hilbert chains) that interpretive
    * overhead dominates. Here the kernel is one JIT'd loop; channels
    * remain the parallel unit exactly like the IIR scan.
    *
    * Memory-bounded: samples are consumed in fixed blocks with an
    * (m-1)-sample halo carried between blocks, so peak task memory is
    * O(blockSize + m) regardless of channel length — a channel of
    * billions of samples never materializes in one task.
    * Output: (channel, n, x, y).
    */
  def convPlus(
      sig: DataFrame,
      h: Array[Double],
      presorted: Boolean = false,
      blockSizeHint: Int = 1 << 16
  ): DataFrame = {
    val spark = sig.sparkSession
    import spark.implicits._
    val hl = h.clone()
    val m = hl.length
    val l = (m - 1) / 2
    val blockSize = math.max(blockSizeHint, 4 * m)
    val typed = sig
      .select(col("channel"), col("n"), col("x"))
      .as[(String, Long, Double)]
    // presorted: caller guarantees channel-partitioned, (channel, n)-
    // sorted input — true when chaining directly off a convPlus output
    // (mapPartitions emits in order and Catalyst can't see it) — so the
    // redundant exchange+sort is skipped
    val ordered =
      if (presorted) typed
      else typed.repartition(col("channel")).sortWithinPartitions(col("channel"), col("n"))
    ordered
      .mapPartitions { (it: Iterator[(String, Long, Double)]) =>
        val in = it.buffered
        new Iterator[Iterator[(String, Long, Double, Double)]] {
          private val lb = m - 1 - l // left lookback per output
          private var ch: String = null
          private val ns = scala.collection.mutable.ArrayBuffer.empty[Long]
          private val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
          private var base = 0L    // channel-absolute index of xs(0)
          private var nextOut = 0L // channel-absolute index of next un-emitted output

          def hasNext: Boolean = in.hasNext || xs.nonEmpty

          def next(): Iterator[(String, Long, Double, Double)] = {
            if (xs.isEmpty) { ch = in.head._1; base = 0L; nextOut = 0L }
            var read = 0
            while (read < blockSize && in.hasNext && in.head._1 == ch) {
              val row = in.next(); ns += row._2; xs += row._3; read += 1
            }
            val channelDone = !in.hasNext || in.head._1 != ch
            val avail = base + xs.length // inputs read so far (channel-absolute)
            val lastOut = if (channelDone) avail - 1 else avail - 1 - l
            val nOut = math.max(0L, lastOut - nextOut + 1).toInt
            val out = new Array[(String, Long, Double, Double)](nOut)
            var j = 0
            while (j < nOut) {
              val i = nextOut + j
              var acc = 0.0
              var k = 0
              while (k < m) {
                val idx = i + l - k
                val t = hl(k) * (if (idx >= 0 && idx < avail) xs((idx - base).toInt) else 0.0)
                acc = if (k == 0) t else acc + t
                k += 1
              }
              val rel = (i - base).toInt
              out(j) = (ch, ns(rel), xs(rel), acc)
              j += 1
            }
            nextOut = lastOut + 1
            if (channelDone && nextOut >= avail) {
              ns.clear(); xs.clear() // channel finished
            } else {
              val dropTo = math.max(0L, nextOut - lb) // keep lookback halo
              val dropCount = (dropTo - base).toInt
              if (dropCount > 0) { ns.remove(0, dropCount); xs.remove(0, dropCount); base = dropTo }
            }
            out.iterator
          }
        }.flatten
      }
      .toDF("channel", "n", "x", "y")
  }

  // ---- designed filters over the test signal (fs nominal 100 Hz) ----

  private val fs = 100.0

  /** Designs (window family, fpass, fstop[, gpass, gstop]) mirroring the
    * reference's constructors; taps counts: rect 21, bartlett 41,
    * hamming 41, hann-bandpass 81, blackman-highpass 61, kaiser 25.
    */
  lazy val rect: Array[Double] = Dsp.firDesign("rectangular", Seq(10), Seq(20), fs)
  lazy val bartlettLp: Array[Double] = Dsp.firDesign("bartlett", Seq(15), Seq(25), fs)
  lazy val hammingLp: Array[Double] = Dsp.firDesign("hamming", Seq(10), Seq(20), fs)
  lazy val hannBp: Array[Double] = Dsp.firDesign("hann", Seq(10, 20), Seq(5, 25), fs)
  lazy val blackmanHp: Array[Double] = Dsp.firDesign("blackman", Seq(20), Seq(10), fs)
  lazy val kaiserLp: Array[Double] =
    Dsp.firDesign("kaiser", Seq(10), Seq(20), fs, gpass = 1.0, gstop = 40.0)

  /** Kaiser bandstop: pass below 5 / above 30 Hz, reject 10–25 Hz —
    * exercises the firwin "bandstop" band assembly (two passbands, DC
    * normalization), the one designed band type no other query covers.
    */
  lazy val kaiserBs: Array[Double] =
    Dsp.firDesign("kaiser", Seq(5, 30), Seq(10, 25), fs, gpass = 1.0, gstop = 40.0)
  lazy val remezLp: Array[Double] =
    graft.core.Remez.lowpass(fpass = 10, fstop = 20, fs = fs, gpass = 1.0, gstop = 40.0)

  /** Remez bandpass 10–20 Hz (stop <5, >30): the multiband
    * Parks–McClellan call shape (three bands, per-band weights).
    */
  lazy val remezBp: Array[Double] =
    graft.core.Remez.bandpass(5, 10, 20, 30, fs = fs, gpass = 1.0, gstop = 40.0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fir_oa_fast" -> { (s, dir) => sameFast(Signal.long(s, dir), kaiserLp) },
    "fir_rect" -> { (s, dir) => same(Signal.long(s, dir), rect) },
    "fir_rect_valid" -> { (s, dir) => valid(Signal.long(s, dir), rect) },
    "fir_rect_full" -> { (s, dir) => full(Signal.long(s, dir), rect) },
    "fir_bartlett_lp" -> { (s, dir) => same(Signal.long(s, dir), bartlettLp) },
    "fir_hamming_lp" -> { (s, dir) => same(Signal.long(s, dir), hammingLp) },
    "fir_hann_bp" -> { (s, dir) => same(Signal.long(s, dir), hannBp) },
    "fir_blackman_hp" -> { (s, dir) => same(Signal.long(s, dir), blackmanHp) },
    "fir_kaiser_lp" -> { (s, dir) => same(Signal.long(s, dir), kaiserLp) },
    "fir_kaiser_bs" -> { (s, dir) => same(Signal.long(s, dir), kaiserBs) },
    "fir_remez_lp" -> { (s, dir) => same(Signal.long(s, dir), remezLp) },
    "fir_remez_bp" -> { (s, dir) => same(Signal.long(s, dir), remezBp) }
  )

  def oracleSql: Map[String, String] = Map(
    // the FFT fast path computes the same 'same'-mode convolution as the
    // lag-sum; both round to 6 dp, well above FFT rounding error
    "fir_oa_fast" -> sameSql(kaiserLp),
    "fir_rect" -> sameSql(rect),
    "fir_rect_valid" -> validSql(rect),
    "fir_rect_full" -> fullSql(rect),
    "fir_bartlett_lp" -> sameSql(bartlettLp),
    "fir_hamming_lp" -> sameSql(hammingLp),
    "fir_hann_bp" -> sameSql(hannBp),
    "fir_blackman_hp" -> sameSql(blackmanHp),
    "fir_kaiser_lp" -> sameSql(kaiserLp),
    "fir_kaiser_bs" -> sameSql(kaiserBs),
    "fir_remez_lp" -> sameSql(remezLp),
    "fir_remez_bp" -> sameSql(remezBp)
  )
}
