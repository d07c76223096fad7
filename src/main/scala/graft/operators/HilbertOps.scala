package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Dsp, Signal}

/** Analytic signal via a Type III FIR Hilbert transformer and the
  * phase-locking value between channel pairs.
  *
  * Reference: openseize `filtering/special.py:16` Hilbert (Kaiser-windowed
  * truncated impulse response h[t] = (1−cos(πt))/(πt), h[0]=0, odd taps),
  * `experimental/coupling/transforms.py:109` Analytic
  * (x + i·H{x} → amplitude envelope + phase in [0, 2π)), and the
  * phase-synchrony core of `experimental/coupling/estimators.py:26`
  * PhaseLock (the windowed phase-to-power Canolty estimator builds on the
  * same analytic transform; its Monte-Carlo surrogate machinery is
  * round-2 work).
  *
  * Spark shape: the Hilbert FIR is one more lag-sum in the channel
  * window — envelope and phase are row-local expressions on top; PLV is
  * a channel-pair equi-join on n followed by one aggregation.
  */
object HilbertOps {

  private val fs = 100.0

  /** Kaiser-windowed Type III Hilbert coefficients (width=5 Hz, 0.01 dB
    * ripple, 60 dB attenuation → 75 taps at fs=100).
    */
  lazy val hilbertH: Array[Double] = hilbertDesign(width = 5.0, fs = fs)

  def hilbertDesign(width: Double, fs: Double, gpass: Double = 0.01, gstop: Double = 60.0): Array[Double] = {
    val nyq = fs / 2.0
    val ripple = math.max(Dsp.passAttenuation(gpass), gstop)
    val n0 = Dsp.kaiserord(ripple, width / nyq)
    val numtaps = if (n0 % 2 == 0) n0 + 1 else n0
    val beta = Dsp.kaiserBeta(ripple)
    val win = Dsp.window("kaiser", numtaps, beta)
    val order = numtaps - 1
    Array.tabulate(numtaps) { i =>
      val t = i - order / 2.0
      val h = if (t == 0.0) 0.0 else (1.0 - math.cos(t * math.Pi)) / (t * math.Pi)
      h * win(i)
    }
  }

  /** (channel, n, x, hx, env, phase): analytic amplitude and phase in
    * [0, 2π), reference Analytic semantics.
    */
  def analytic(sig: DataFrame): DataFrame = {
    val hx = FirOps.sameExpr(hilbertH)
    val withH = sig.select(col("channel"), col("n"), col("x"), hx.as("hx"))
    val ph = atan2(col("hx"), col("x"))
    withH.select(
      col("channel"),
      col("n"),
      col("x"),
      col("hx"),
      sqrt(col("x") * col("x") + col("hx") * col("hx")).as("env"),
      when(ph < 0, ph + 2 * math.Pi).otherwise(ph).as("phase")
    )
  }

  private def analyticCteSql: String =
    s"${Signal.sigCte}, hil AS (SELECT channel, n, x, ${FirOps.sameExprSql(hilbertH)} AS hx " +
      "FROM sig WINDOW w AS (PARTITION BY channel ORDER BY n)), " +
      "ana AS (SELECT channel, n, x, hx, sqrt(x * x + hx * hx) AS env, " +
      "CASE WHEN atan2(hx, x) < 0 THEN atan2(hx, x) + 2 * pi() ELSE atan2(hx, x) END AS phase FROM hil)"

  /** Envelope + phase per sample. */
  def hilbertEnv(sig: DataFrame): DataFrame =
    analytic(sig).select(
      col("channel"),
      col("n"),
      round(col("env"), 6).as("env"),
      round(col("phase"), 6).as("phase")
    )

  def hilbertEnvSql: String =
    s"$analyticCteSql SELECT channel, n, round(env, 6) AS env, round(phase, 6) AS phase FROM ana"

  /** Phase-locking value |⟨e^{i(φa−φb)}⟩| for every ordered channel pair. */
  def plv(sig: DataFrame): DataFrame = {
    val ana = analytic(sig).select(col("channel"), col("n"), col("phase"))
    val a = ana.select(col("channel").as("ch_a"), col("n"), col("phase").as("pa"))
    val b = ana.select(col("channel").as("ch_b"), col("n"), col("phase").as("pb"))
    a.join(b, Seq("n"))
      .filter(col("ch_a") < col("ch_b"))
      .groupBy(col("ch_a"), col("ch_b"))
      .agg(
        round(
          sqrt(
            pow(avg(cos(col("pa") - col("pb"))), 2) + pow(avg(sin(col("pa") - col("pb"))), 2)
          ),
          6
        ).as("plv"),
        count(lit(1)).as("n_samples")
      )
  }

  def plvSql: String =
    s"$analyticCteSql " +
      "SELECT a.channel AS ch_a, b.channel AS ch_b, " +
      "round(sqrt(power(avg(cos(a.phase - b.phase)), 2) + power(avg(sin(a.phase - b.phase)), 2)), 6) AS plv, " +
      "count(*) AS n_samples " +
      "FROM ana a JOIN ana b ON a.n = b.n AND a.channel < b.channel " +
      "GROUP BY a.channel, b.channel"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hilbert_env" -> { (s, dir) => hilbertEnv(Signal.long(s, dir)) },
    "plv" -> { (s, dir) => plv(Signal.long(s, dir)) }
  )

  def oracleSql: Map[String, String] = Map(
    "hilbert_env" -> hilbertEnvSql,
    "plv" -> plvSql
  )
}
