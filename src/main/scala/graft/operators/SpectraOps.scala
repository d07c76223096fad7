package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Dsp, Signal}

/** Spectral estimation (reference: openseize `spectra/estimators.py`
  * psd/stft over `core/numerical.py` modified_dft/periodogram/welch).
  *
  * Welch semantics mirrored exactly: segments of nfft samples at hop
  * nfft·(1−overlap); per segment constant-detrend, periodic-hann window,
  * real DFT, density scaling 1/(fs·Σw²), one-sided doubling except DC and
  * Nyquist; PSD = mean over segments. STFT adds the reference's
  * boundary (nfft/2 zero-extension) + zero padding, no doubling.
  *
  * Spark-first shape: a sample row fans out to the ≤ nfft/hop segments
  * containing it (explode), the DFT is an explicit inner product over
  * (frame, freq) groups — everything is groupBy aggregation with map-side
  * partial combine, shrinking data by ~nfft per shuffle hop. Window and
  * twiddle factors are array literals indexed by position, identical in
  * the generated DuckDB oracle. The per-segment radix-2 FFT fast path
  * for large nfft is the planned round-2 `functions.Fft` expression.
  */
object SpectraOps {

  private val fsv = 100.0
  val nfft = 64
  val hop = 32 // overlap 0.5
  val nFreq: Int = nfft / 2 + 1

  /** Periodic ('fftbins') Hann, as scipy get_window returns. */
  lazy val hannWin: Array[Double] =
    Array.tabulate(nfft)(p => 0.5 - 0.5 * math.cos(2.0 * math.Pi * p / nfft))
  lazy val winSumSq: Double = hannWin.map(w => w * w).sum
  lazy val densityNorm: Double = 1.0 / (fsv * winSumSq)
  lazy val cosTab: Array[Double] = Array.tabulate(nfft)(k => math.cos(2.0 * math.Pi * k / nfft))
  lazy val sinTab: Array[Double] = Array.tabulate(nfft)(k => math.sin(2.0 * math.Pi * k / nfft))

  private def arrLit(xs: Array[Double]): Column = array(xs.map(lit): _*)
  private def arrSql(xs: Array[Double]): String = xs.map(Dsp.lit).mkString("[", ", ", "]")

  /** Welch/stft estimator parameters mirroring the reference psd()
    * surface (estimators.py:60): window family, overlap (as hop),
    * detrend ('constant' | 'linear'), scaling ('density' | 'spectrum').
    * The default is the reference's default combination.
    */
  final case class WelchCfg(
      nfft: Int = 64,
      hop: Int = 32,
      winName: String = "hann",
      scaling: String = "density",
      detrend: String = "constant"
  ) {
    /** Periodic ('fftbins') window, as scipy get_window returns. */
    lazy val win: Array[Double] = Dsp.window(winName, nfft + 1).take(nfft)
    lazy val norm: Double = scaling match {
      case "density" => 1.0 / (fsv * win.map(w => w * w).sum)
      case "spectrum" => 1.0 / (win.sum * win.sum)
      case other => throw new IllegalArgumentException(s"unknown scaling $other")
    }
    lazy val cosT: Array[Double] = Array.tabulate(nfft)(k => math.cos(2.0 * math.Pi * k / nfft))
    lazy val sinT: Array[Double] = Array.tabulate(nfft)(k => math.sin(2.0 * math.Pi * k / nfft))
    val pBar: Double = (nfft - 1) / 2.0
    /** population variance of positions 0..nfft-1 */
    val pVar: Double = (nfft - 1.0) * (2.0 * nfft - 1.0) / 6.0 - pBar * pBar
  }

  /** Modified periodograms per (channel, seg, f).
    * boundary=false → welch framing; true → stft framing (zero-extended
    * by nfft/2, padded to cover the tail).
    */
  def periodograms(
      sig: DataFrame,
      boundary: Boolean,
      doubled: Boolean,
      cfg: WelchCfg = WelchCfg()
  ): DataFrame = {
    val nfftP = cfg.nfft
    val hopP = cfg.hop
    // boundary (stft): zero-extend nfft/2 at the head and pad the tail to
    // the next full segment — as explicit zero rows, so per-segment
    // detrending sees the zeros exactly like the reference does.
    val base =
      if (!boundary) sig.select(col("channel"), col("n").as("m"), col("x"))
      else {
        val data = sig.select(col("channel"), (col("n") + nfftP / 2).as("m"), col("x"))
        val bounds = sig.groupBy(col("channel")).agg(count(lit(1)).as("cnt"))
        // extended length E = ceil(cnt/hop)*hop + nfft
        val e = (ceil(col("cnt") / hopP) * hopP + nfftP).cast("bigint")
        val head = bounds.select(
          col("channel"),
          explode(sequence(lit(0L), lit(nfftP / 2 - 1L))).as("m"),
          lit(0.0).as("x")
        )
        val tail = bounds.select(
          col("channel"),
          explode(sequence(col("cnt") + nfftP / 2, e - 1)).as("m"),
          lit(0.0).as("x")
        )
        data.unionByName(head).unionByName(tail)
      }
    // per-channel segment count via a tiny aggregate + broadcast join:
    // a count() over Window.partitionBy(channel) would buffer the whole
    // channel in WindowExec — a memory cliff at millions of samples per
    // channel (measured: 26 s vs 7 s at 16M samples)
    val counts = base.groupBy(col("channel")).agg(count(lit(1)).as("_cnt"))
    val nsegs = floor((col("_cnt") - nfftP) / hopP) + 1
    val frames = base
      .join(broadcast(counts), Seq("channel"))
      .select(col("channel"), col("m"), col("x"), nsegs.cast("bigint").as("nsegs"))
      .select(col("*"), explode(sequence(lit(0), lit(nfftP / hopP - 1))).as("d"))
      .select(
        col("channel"),
        col("x"),
        (col("m") / hopP).cast("bigint").minus(col("d")).as("s"),
        col("m"),
        col("nsegs")
      )
      .filter(col("s") >= 0 && col("s") < col("nsegs"))
      .select(col("channel"), col("s"), (col("m") - col("s") * hopP).cast("int").as("p"), col("x"))
    // segment assembly + one fused FFT kernel per segment (r3: replaces
    // the explicit-DFT term explosion — ×(nfft/2+1) rows per sample —
    // and the per-segment WindowExec detrend; the explicit-DFT SQL
    // remains the oracle, agreeing after 6 dp rounding exactly like the
    // FFT fast path always has)
    require(cfg.detrend == "constant" || cfg.detrend == "linear", s"unknown detrend ${cfg.detrend}")
    val segs = frames
      .groupBy(col("channel"), col("s"))
      .agg(
        transform(sort_array(collect_list(struct(col("p"), col("x")))), e => e.getField("x"))
          .as("xs")
      )
    segs
      .select(
        col("channel"),
        col("s"),
        posexplode(
          graft.functions.exprs.spectrum_seg(col("xs"), cfg.win, cfg.detrend, cfg.norm, doubled)
        ).as(Seq("f", "p2"))
      )
  }

  /** SQL twin of [[periodograms]] as a CTE chain ending in
    * `pgram(channel, s, f, p2)`. Expects `sig` CTE in scope. Takes the
    * same [[WelchCfg]] so every (window, overlap, detrend, scaling)
    * variant — and the FFT fast path's larger nfft — gets the identical
    * explicit-DFT oracle.
    */
  def periodogramsSql(
      boundary: Boolean,
      doubled: Boolean,
      cfg: WelchCfg = WelchCfg()
  ): String = {
    val nfftP = cfg.nfft
    val hopP = cfg.hop
    val baseExpr =
      if (!boundary) "SELECT channel, n AS m, x FROM sig"
      else
        s"SELECT channel, n + ${nfftP / 2} AS m, x FROM sig " +
          s"UNION ALL SELECT channel, h.g AS m, 0.0 AS x FROM bounds, generate_series(0, ${nfftP / 2 - 1}) h(g) " +
          s"UNION ALL SELECT channel, cnt + ${nfftP / 2} + t.g AS m, 0.0 AS x FROM bounds, " +
          s"generate_series(0, ${nfftP - 1}) t(g) " +
          s"WHERE cnt + ${nfftP / 2} + t.g < CAST(ceil(cnt / $hopP) * $hopP AS BIGINT) + $nfftP"
    val boundsCte =
      if (boundary) "bounds AS (SELECT channel, count(*) AS cnt FROM sig GROUP BY channel), "
      else ""
    val nsegsExpr =
      s"CAST(floor((count(*) OVER (PARTITION BY channel) - $nfftP) / $hopP) + 1 AS BIGINT)"
    val detrendExpr = cfg.detrend match {
      case "constant" => "x - avg(x) OVER sw"
      case "linear" =>
        val slope =
          s"((avg(p * x) OVER sw) - ${Dsp.lit(cfg.pBar)} * (avg(x) OVER sw)) / ${Dsp.lit(cfg.pVar)}"
        s"x - ((avg(x) OVER sw) + ($slope) * (p - ${Dsp.lit(cfg.pBar)}))"
      case other => throw new IllegalArgumentException(s"unknown detrend $other")
    }
    val oneExpr = s"(xre * xre + xim * xim) * ${Dsp.lit(cfg.norm)}"
    val p2Expr =
      if (doubled)
        s"CASE WHEN f = 0 OR f = ${nfftP / 2} THEN $oneExpr ELSE ($oneExpr) * 2.0 END"
      else oneExpr
    boundsCte +
      s"ext AS ($baseExpr), " +
      s"marked AS (SELECT channel, m, x, $nsegsExpr AS nsegs FROM ext), " +
      s"frames AS (SELECT channel, s, CAST(m - s * $hopP AS INT) AS p, x FROM " +
      s"(SELECT channel, x, m // $hopP - d.g AS s, m, nsegs FROM marked, generate_series(0, ${nfftP / hopP - 1}) d(g)) " +
      "WHERE s >= 0 AND s < nsegs), " +
      s"windowed AS (SELECT channel, s, p, ($detrendExpr) * " +
      s"list_extract(${arrSql(cfg.win)}, p + 1) AS xw FROM frames " +
      "WINDOW sw AS (PARTITION BY channel, s)), " +
      s"terms AS (SELECT channel, s, f.g AS f, xw * list_extract(${arrSql(cfg.cosT)}, CAST((f.g * p) % $nfftP + 1 AS INT)) AS tre, " +
      s"-xw * list_extract(${arrSql(cfg.sinT)}, CAST((f.g * p) % $nfftP + 1 AS INT)) AS tim " +
      s"FROM windowed, generate_series(0, ${nfftP / 2}) f(g)), " +
      "spec AS (SELECT channel, s, f, sum(tre) AS xre, sum(tim) AS xim FROM terms GROUP BY channel, s, f), " +
      s"pgram AS (SELECT channel, s, f, $p2Expr AS p2 FROM spec)"
  }

  /** Welch PSD per (channel, f). */
  def psdWelch(sig: DataFrame, cfg: WelchCfg = WelchCfg()): DataFrame =
    periodograms(sig, boundary = false, doubled = true, cfg)
      .groupBy(col("channel"), col("f"))
      .agg(avg(col("p2")).as("psd"), count(lit(1)).as("nsegs"))
      .select(
        col("channel"),
        col("f"),
        round(col("f") * (fsv / cfg.nfft), 4).as("freq_hz"),
        round(col("psd"), 6).as("psd"),
        col("nsegs")
      )

  def psdWelchSql(cfg: WelchCfg = WelchCfg()): String =
    s"${Signal.sigCte}, ${periodogramsSql(boundary = false, doubled = true, cfg)}, " +
      "welch AS (SELECT channel, f, avg(p2) AS psd, count(*) AS nsegs FROM pgram GROUP BY channel, f) " +
      s"SELECT channel, f, round(f * ${Dsp.lit(fsv / cfg.nfft)}, 4) AS freq_hz, round(psd, 6) AS psd, nsegs FROM welch"

  /** STFT spectrogram |X|² per (channel, s, f), boundary + padded. */
  def stft(sig: DataFrame): DataFrame =
    periodograms(sig, boundary = true, doubled = false)
      .select(col("channel"), col("s"), col("f"), round(col("p2"), 6).as("sxx"))

  def stftSql: String =
    s"${Signal.sigCte}, ${periodogramsSql(boundary = true, doubled = false)} " +
      "SELECT channel, s, f, round(p2, 6) AS sxx FROM pgram"

  // ---- metrics (spectra/metrics.py) ----

  /** Composite-Simpson weights over freq indices [a, b] (b−a even). */
  private def simpsonWeight(fCol: Column, a: Int, b: Int): Column =
    when(col("f") === a || col("f") === b, 1.0)
      .otherwise(when((fCol - a) % 2 === 1, 4.0).otherwise(2.0))

  private def simpsonWeightSql(a: Int, b: Int): String =
    s"CASE WHEN f = $a OR f = $b THEN 1.0 WHEN (f - $a) % 2 = 1 THEN 4.0 ELSE 2.0 END"

  private val df = fsv / nfft // frequency step, Hz
  private val bandA = 6 // 9.375 Hz
  private val bandB = 20 // 31.25 Hz  (14 intervals, even, Simpson-exact)

  /** Integrated band power per channel (metrics.power, Simpson rule). */
  def bandPower(sig: DataFrame): DataFrame =
    psdWelch(sig)
      .filter(col("f") >= bandA && col("f") <= bandB)
      .groupBy(col("channel"))
      .agg(
        round(sum(col("psd") * simpsonWeight(col("f"), bandA, bandB)) * (df / 3.0), 6)
          .as("band_power")
      )

  def bandPowerSql: String =
    s"${Signal.sigCte}, ${periodogramsSql(boundary = false, doubled = true)}, " +
      "welch AS (SELECT channel, f, round(avg(p2), 6) AS psd FROM pgram GROUP BY channel, f) " +
      s"SELECT channel, round(sum(psd * ${simpsonWeightSql(bandA, bandB)}) * ${Dsp.lit(df / 3.0)}, 6) AS band_power " +
      s"FROM welch WHERE f >= $bandA AND f <= $bandB GROUP BY channel"

  /** PSD normalized by total power over the full band (metrics.power_norm). */
  def psdNorm(sig: DataFrame): DataFrame = {
    val psd = psdWelch(sig).select(col("channel"), col("f"), col("psd"))
    val cw = Window.partitionBy(col("channel"))
    psd
      .select(
        col("channel"),
        col("f"),
        round(
          col("psd") / (sum(col("psd") * simpsonWeight(col("f"), 0, nfft / 2)).over(cw) * (df / 3.0)),
          6
        ).as("psd_norm")
      )
  }

  def psdNormSql: String =
    s"${Signal.sigCte}, ${periodogramsSql(boundary = false, doubled = true)}, " +
      "welch AS (SELECT channel, f, round(avg(p2), 6) AS psd FROM pgram GROUP BY channel, f) " +
      s"SELECT channel, f, round(psd / (sum(psd * ${simpsonWeightSql(0, nfft / 2)}) OVER (PARTITION BY channel) * ${Dsp.lit(df / 3.0)}), 6) AS psd_norm FROM welch"

  /** Chi-squared 95% CI factors via the Wilson–Hilferty approximation
    * (reference metrics.confidence_interval uses exact chi2.ppf; WH is
    * accurate to ~1e-3 at the dof here and is evaluated identically on
    * both engines from the dof column).
    */
  private val z975 = 1.959963985 // N(0,1) 97.5% quantile
  private def wilsonHilferty(dof: Column, z: Double): Column = {
    val t = lit(1.0) - lit(2.0) / (lit(9.0) * dof) + lit(z) * sqrt(lit(2.0) / (lit(9.0) * dof))
    dof * t * t * t
  }
  private def whSql(dofExpr: String, z: String): String =
    s"($dofExpr) * power(1.0 - 2.0 / (9.0 * ($dofExpr)) + ($z) * sqrt(2.0 / (9.0 * ($dofExpr))), 3)"

  /** 95% CI bounds per (channel, f) (metrics.confidence_interval). */
  def psdCi(sig: DataFrame): DataFrame = {
    val psd = psdWelch(sig)
    val dof = (col("nsegs") * 2).cast("double")
    psd.select(
      col("channel"),
      col("f"),
      round(col("psd") * dof / wilsonHilferty(dof, z975), 6).as("ci_lo"),
      round(col("psd") * dof / wilsonHilferty(dof, -z975), 6).as("ci_hi")
    )
  }

  def psdCiSql: String = {
    val dof = "CAST(nsegs * 2 AS DOUBLE)"
    s"${Signal.sigCte}, ${periodogramsSql(boundary = false, doubled = true)}, " +
      "welch AS (SELECT channel, f, round(avg(p2), 6) AS psd, count(*) AS nsegs FROM pgram GROUP BY channel, f) " +
      s"SELECT channel, f, round(psd * $dof / (${whSql(dof, Dsp.lit(z975))}), 6) AS ci_lo, " +
      s"round(psd * $dof / (${whSql(dof, Dsp.lit(-z975))}), 6) AS ci_hi FROM welch"
  }

  /** Segmented FFT Welch PSD — the large-nfft scale path. Frames are
    * assembled by one channel-partitioned groupBy (no extra shuffle on
    * top of the signal's partitioning); each frame runs detrend, window
    * and |RFFT|² inside the custom `RfftMag2` expression, O(nfft·log
    * nfft) instead of the O(nfft·nfreq) explicit inner product. Output
    * matches [[psdWelch]] (for the same nfft) to FFT rounding error.
    */
  def psdWelchFast(sig: DataFrame, nfftF: Int): DataFrame = {
    require((nfftF & (nfftF - 1)) == 0)
    val hopF = nfftF / 2
    val win = Array.tabulate(nfftF)(p => 0.5 - 0.5 * math.cos(2.0 * math.Pi * p / nfftF))
    val norm = 1.0 / (fsv * win.map(w => w * w).sum)
    // tiny aggregate + broadcast join, not a channel-window count (see
    // periodograms — WindowExec would buffer whole channels)
    val counts = sig.groupBy(col("channel")).agg(count(lit(1)).as("_cnt"))
    val nsegs = (floor((col("_cnt") - nfftF) / hopF) + 1).cast("bigint")
    val frames = sig
      .join(broadcast(counts), Seq("channel"))
      .select(col("channel"), col("n"), col("x"), nsegs.as("nsegs"))
      .select(col("*"), explode(sequence(lit(0), lit(nfftF / hopF - 1))).as("d"))
      .select(
        col("channel"),
        col("x"),
        ((col("n") / hopF).cast("bigint") - col("d")).as("s"),
        col("n"),
        col("nsegs")
      )
      .filter(col("s") >= 0 && col("s") < col("nsegs"))
      .select(col("channel"), col("s"), (col("n") - col("s") * hopF).cast("int").as("p"), col("x"))
    val segs = frames
      .groupBy(col("channel"), col("s"))
      .agg(
        transform(sort_array(collect_list(struct(col("p"), col("x")))), e => e.getField("x"))
          .as("xs")
      )
    val p2s = segs.select(
      col("channel"),
      col("s"),
      graft.functions.exprs.win_rfft_mag2(col("xs"), win, demean = true).as("p2s")
    )
    p2s
      .select(col("channel"), posexplode(col("p2s")).as(Seq("f", "p2raw")))
      .select(
        col("channel"),
        col("f").cast("bigint").as("f"),
        (col("p2raw") * norm *
          when(col("f") === 0 || col("f") === (nfftF / 2), 1.0).otherwise(2.0)).as("p2")
      )
      .groupBy(col("channel"), col("f"))
      .agg(round(avg(col("p2")), 6).as("psd"), count(lit(1)).as("nsegs"))
  }

  /** Explicit-DFT oracle for [[psdWelchFast]]: same framing/detrend/
    * window/density math at nfftF, agreeing with the FFT path to
    * rounding error (outputs rounded to 6 dp on both engines).
    */
  def psdWelchFastSql(nfftF: Int): String =
    s"${Signal.sigCte}, ${periodogramsSql(boundary = false, doubled = true, WelchCfg(nfft = nfftF, hop = nfftF / 2))} " +
      "SELECT channel, f, round(avg(p2), 6) AS psd, count(*) AS nsegs FROM pgram GROUP BY channel, f"

  /** Reference-psd parameter variants (estimators.py:60): scaling=
    * 'spectrum', hamming window at 75% overlap, detrend='linear'.
    */
  val cfgSpectrum: WelchCfg = WelchCfg(scaling = "spectrum")
  val cfgHamm75: WelchCfg = WelchCfg(winName = "hamming", hop = 16)
  val cfgLinear: WelchCfg = WelchCfg(detrend = "linear")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "psd_welch_fast" -> { (s, dir) => psdWelchFast(Signal.long(s, dir), 128) },
    "psd_welch" -> { (s, dir) => psdWelch(Signal.long(s, dir)) },
    "psd_welch_spectrum" -> { (s, dir) => psdWelch(Signal.long(s, dir), cfgSpectrum) },
    "psd_welch_hamm75" -> { (s, dir) => psdWelch(Signal.long(s, dir), cfgHamm75) },
    "psd_welch_linear" -> { (s, dir) => psdWelch(Signal.long(s, dir), cfgLinear) },
    "stft64" -> { (s, dir) => stft(Signal.long(s, dir)) },
    "band_power" -> { (s, dir) => bandPower(Signal.long(s, dir)) },
    "psd_norm" -> { (s, dir) => psdNorm(Signal.long(s, dir)) },
    "psd_ci" -> { (s, dir) => psdCi(Signal.long(s, dir)) }
  )

  def oracleSql: Map[String, String] = Map(
    "psd_welch_fast" -> psdWelchFastSql(128),
    "psd_welch" -> psdWelchSql(),
    "psd_welch_spectrum" -> psdWelchSql(cfgSpectrum),
    "psd_welch_hamm75" -> psdWelchSql(cfgHamm75),
    "psd_welch_linear" -> psdWelchSql(cfgLinear),
    "stft64" -> stftSql,
    "band_power" -> bandPowerSql,
    "psd_norm" -> psdNormSql,
    "psd_ci" -> psdCiSql
  )
}
