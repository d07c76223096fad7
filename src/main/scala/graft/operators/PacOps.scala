package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Dsp

/** Phase–amplitude-coupling demo: the reference's synthetic PAC signal
  * (demos/signals.py:7 `PAC` — a slow oscillation whose phase modulates
  * the amplitude of a fast carrier) generated in-plan and analyzed with
  * the coupling machinery (experimental/coupling): carrier-band FIR →
  * Hilbert envelope → mean envelope per modulator-phase bin. The output
  * is the PAC comodulogram row: envelope rises where the modulating
  * phase peaks.
  *
  * Parity design (filter_response precedent): the generator is ONE
  * closed-form SQL expression string evaluated by BOTH engines, the two
  * convolutions are the established left-associated lag-sum twins
  * (convPlus ≡ sameExprSql), the phase bin is INTEGER arithmetic
  * ((fp·n mod fs) scaled — the modulator phase is known in closed form,
  * 8·n mod 500, so no atan2 crosses an engine boundary), and the
  * per-bin mean runs on integer micros (eeg_workflow precedent — avg of
  * doubles coin-flips exact-half roundings between engines).
  *
  * Scale shape: the demo is a fixed 2000-sample single-channel signal
  * (a generator, not a corpus scan); the analysis chain itself is the
  * same one-shuffle-per-chain stack every DSP query uses, so the
  * pattern transfers unchanged to a real corpus-scale signal.
  */
object PacOps {

  val nSamples = 2000
  val fs = 500.0
  val fp = 8.0 // modulating (phase) frequency, Hz
  val fa = 80.0 // modulated (amplitude) frequency, Hz
  val ampP = 1.0
  val ampA = 0.5
  val strength = 0.8 // reference `strength`; chi = 1 - strength
  val nBins = 18

  private val chi = 1.0 - strength
  private val wp = 2.0 * math.Pi * fp / fs
  private val wa = 2.0 * math.Pi * fa / fs

  /** The PAC waveform (shift = 0, sigma = None → fully deterministic):
    * amp_a · ((1−chi)·sin(ωp·n) + 1 + chi)/2 · sin(ωa·n) + amp_p·sin(ωp·n)
    * — reference PAC.modulated + PAC.phasic (signals.py:56,78). One
    * string, both dialects.
    */
  val sigExprSql: String =
    s"(${Dsp.lit(ampA)} * (((${Dsp.lit(1.0 - chi)} * sin(${Dsp.lit(wp)} * CAST(n AS DOUBLE)) + " +
      s"${Dsp.lit(1.0 + chi)})) / 2.0e0) * sin(${Dsp.lit(wa)} * CAST(n AS DOUBLE)) + " +
      s"${Dsp.lit(ampP)} * sin(${Dsp.lit(wp)} * CAST(n AS DOUBLE)))"

  /** Carrier-band Kaiser FIR (70–90 Hz pass, 55–105 stop at fs=500) —
    * wide transition keeps the lag-sum under the 128-term oracle bound.
    */
  lazy val carrierH: Array[Double] =
    Dsp.firDesign("kaiser", Seq(70.0, 90.0), Seq(55.0, 105.0), fs, gpass = 1.0, gstop = 40.0)

  /** (channel='pac', n, x) generated in-plan. */
  def pacSignal(spark: SparkSession): DataFrame =
    spark
      .range(0, nSamples.toLong)
      .select(col("id").cast("bigint").as("n"))
      .selectExpr("'pac' AS channel", "n", s"$sigExprSql AS x")

  /** (bin, mean_env, n_samples): mean carrier-band Hilbert envelope per
    * modulator-phase bin. bin = (((8·n) mod 500)·nBins) div 500 — the
    * closed-form phase of the modulating oscillation, integral on both
    * engines.
    */
  def pacDemo(spark: SparkSession): DataFrame = {
    val bp = FirOps
      .convPlus(pacSignal(spark), carrierH)
      .select(col("channel"), col("n"), col("y").as("x"))
    val hx = FirOps
      .convPlus(bp, HilbertOps.hilbertH, presorted = true)
      .withColumnRenamed("y", "hx")
    hx
      .select(
        expr(s"(((8 * n) % 500) * $nBins) div 500").as("bin"),
        floor(sqrt(col("x") * col("x") + col("hx") * col("hx")) * lit(1.0e6) + lit(0.5))
          .cast("bigint")
          .as("micro")
      )
      .groupBy(col("bin"))
      .agg(
        Dsp
          .round6(sum(col("micro")).cast("double") / count(lit(1)) / lit(1.0e6))
          .as("mean_env"),
        count(lit(1)).as("n_samples")
      )
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pac_demo" -> { (s, _) => pacDemo(s) }
  )

  def oracleSql: Map[String, String] = Map(
    "pac_demo" -> {
      val w = "WINDOW w AS (PARTITION BY channel ORDER BY n)"
      s"WITH sig AS (SELECT 'pac' AS channel, CAST(g.n AS BIGINT) AS n, $sigExprSql AS x " +
        s"FROM generate_series(0, ${nSamples - 1}) g(n)), " +
        s"bp AS (SELECT channel, n, ${FirOps.sameExprSql(carrierH)} AS x FROM sig $w), " +
        s"hc AS (SELECT channel, n, x, ${FirOps.sameExprSql(HilbertOps.hilbertH)} AS hx FROM bp $w), " +
        s"mb AS (SELECT (((8 * n) % 500) * $nBins) // 500 AS bin, " +
        "CAST(floor(sqrt(x * x + hx * hx) * 1.0e6 + 0.5e0) AS BIGINT) AS micro FROM hc) " +
        "SELECT bin, " +
        Dsp.round6Sql("CAST(sum(micro) AS DOUBLE) / count(*) / 1.0e6") + " AS mean_env, " +
        "count(*) AS n_samples FROM mb GROUP BY bin"
    }
  )
}
