package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Dsp

/** Filter introspection surface — frequency response (freqz/sosfreqz)
  * and impulse response of a designed filter as DataFrames: the graft
  * twin of the reference viewer mixins (filtering/mixins.py:226,240,277,
  * 288) minus the matplotlib rendering. A user debugging a misbehaving
  * filter reads these tables (or plots them with any tool) instead of
  * calling `.plot()`.
  *
  * The response over a worN-point grid in [0, Nyquist) is closed-form
  * trig in the filter coefficients. Both the Spark query and the DuckDB
  * oracle evaluate the SAME expression strings (cos/sin/sqrt/log10/
  * greatest/floor parse identically in the two dialects and the
  * coefficient literals are `Dsp.lit`-rendered), so cross-engine parity
  * reduces to libm last-ulp noise under the shared `round6` formula.
  */
object ResponseOps {

  /** Shared per-grid-point expression strings (freq, mag, db) for a SOS
    * cascade; `k` (the grid index, 0 ≤ k < worN) must be in scope.
    * Per section H_s = (b0 + b1·e^{-jw} + b2·e^{-j2w}) / (1 + a1·e^{-jw}
    * + a2·e^{-j2w}); |H|² multiplies the per-section ratios so no
    * complex cross-products are needed. dB gain clamps at the rope
    * (region of practical equivalence) floor like the reference viewer.
    */
  private def sosRespExprs(
      sos: Array[Array[Double]],
      fs: Double,
      worN: Int,
      ropeDb: Double
  ): (String, String, String) = {
    val w = s"(${Dsp.lit(math.Pi)} * k / $worN)"
    val ratios = sos.map { case Array(b0, b1, b2, _, a1, a2) =>
      val reN = s"(${Dsp.lit(b0)} + ${Dsp.lit(b1)} * cos($w) + ${Dsp.lit(b2)} * cos(2 * $w))"
      val imN = s"(${Dsp.lit(b1)} * sin($w) + ${Dsp.lit(b2)} * sin(2 * $w))"
      val reD = s"(1.0e0 + ${Dsp.lit(a1)} * cos($w) + ${Dsp.lit(a2)} * cos(2 * $w))"
      val imD = s"(${Dsp.lit(a1)} * sin($w) + ${Dsp.lit(a2)} * sin(2 * $w))"
      s"(($reN * $reN + $imN * $imN) / ($reD * $reD + $imD * $imD))"
    }
    finishExprs(ratios.mkString("(", " * ", ")"), fs, worN, ropeDb)
  }

  /** ba-form twin: |H|² = |Σ b_j e^{-jjw}|² / |Σ a_j e^{-jjw}|² with
    * left-associated term order (the cross-engine sum-order rule).
    */
  private def baRespExprs(
      b: Array[Double],
      a: Array[Double],
      fs: Double,
      worN: Int,
      ropeDb: Double
  ): (String, String, String) = {
    val w = s"(${Dsp.lit(math.Pi)} * k / $worN)"
    def poly(c: Array[Double], f: String): String =
      c.zipWithIndex
        .map { case (cj, j) =>
          if (j == 0) Dsp.lit(cj) else s"${Dsp.lit(cj)} * $f($j * $w)"
        }
        .mkString("(", " + ", ")")
    def polySin(c: Array[Double]): String = {
      val terms =
        c.zipWithIndex.collect { case (cj, j) if j > 0 => s"${Dsp.lit(cj)} * sin($j * $w)" }
      // a = [1.0] (pure-FIR denominator) has no j>0 sin terms — emit a
      // literal zero, not the unparseable "()"
      if (terms.isEmpty) "(0.0e0)" else terms.mkString("(", " + ", ")")
    }
    val mag2 =
      s"((${poly(b, "cos")} * ${poly(b, "cos")} + ${polySin(b)} * ${polySin(b)}) / " +
        s"(${poly(a, "cos")} * ${poly(a, "cos")} + ${polySin(a)} * ${polySin(a)}))"
    finishExprs(mag2, fs, worN, ropeDb)
  }

  private def finishExprs(
      mag2: String,
      fs: Double,
      worN: Int,
      ropeDb: Double
  ): (String, String, String) = {
    val mag = s"sqrt($mag2)"
    val ropeLin = Dsp.lit(math.pow(10.0, ropeDb / 20.0))
    val db = s"(20 * log10(greatest($mag, $ropeLin)))"
    // k·fs is exact (integer × small double) and /(2·worN) is the same
    // IEEE divide on both engines — no rounding needed
    val freq = s"(k * ${Dsp.lit(fs)} / ${2 * worN})"
    (freq, Dsp.round6Sql(mag), Dsp.round6Sql(db))
  }

  private def respDf(spark: SparkSession, worN: Int, e: (String, String, String)): DataFrame =
    spark
      .range(worN)
      .selectExpr("id AS k")
      .selectExpr("k", s"${e._1} AS freq", s"${e._2} AS mag", s"${e._3} AS db")

  private def respSql(worN: Int, e: (String, String, String)): String =
    s"SELECT k, ${e._1} AS freq, ${e._2} AS mag, ${e._3} AS db " +
      s"FROM generate_series(0, ${worN - 1}) g(k)"

  /** sosfreqz: (k, freq, mag, db) over worN points in [0, fs/2) —
    * reference IIRViewer.frequency_response (mixins.py:240) for
    * fmt="sos", scales "abs" and "dB" side by side.
    */
  def sosFreqz(
      spark: SparkSession,
      sos: Array[Array[Double]],
      fs: Double,
      worN: Int = 512,
      ropeDb: Double = -120.0
  ): DataFrame = respDf(spark, worN, sosRespExprs(sos, fs, worN, ropeDb))

  /** freqz for ba-form (FIR taps: a = [1]) — FIRViewer/IIRViewer
    * frequency_response for fmt="ba" (mixins.py:288).
    */
  def freqz(
      spark: SparkSession,
      b: Array[Double],
      a: Array[Double],
      fs: Double,
      worN: Int = 512,
      ropeDb: Double = -120.0
  ): DataFrame = respDf(spark, worN, baRespExprs(b, a, fs, worN, ropeDb))

  /** Impulse response of a SOS cascade: a 1-second unit pulse through
    * the transposed direct-form II recurrence, driver-side (fs samples —
    * mixins.py:226; the reference also computes this on the driver).
    */
  def impulseSos(spark: SparkSession, sos: Array[Array[Double]], fs: Double): DataFrame = {
    val n = fs.toInt
    val z1 = Array.fill(sos.length)(0.0)
    val z2 = Array.fill(sos.length)(0.0)
    val h = Array.tabulate(n) { i =>
      var u = if (i == 0) 1.0 else 0.0
      for (s <- sos.indices) {
        val Array(b0, b1, b2, _, a1, a2) = sos(s)
        val y = b0 * u + z1(s)
        z1(s) = b1 * u + z2(s) - a1 * y
        z2(s) = b2 * u - a2 * y
        u = y
      }
      u
    }
    import spark.implicits._
    h.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq.toDF("n", "h")
  }

  /** Impulse response of an FIR filter: the taps themselves, padded to
    * fs samples (mixins.py:277 — full convolution with a unit pulse).
    */
  def impulseFir(spark: SparkSession, taps: Array[Double], fs: Double): DataFrame = {
    import spark.implicits._
    val n = math.max(fs.toInt, taps.length)
    (0 until n).map(i => (i.toLong, if (i < taps.length) taps(i) else 0.0)).toDF("n", "h")
  }

  /** Gate: dB + magnitude response of the Butter 10–20 Hz bandpass (the
    * flagship band-isolation design) on a 512-point grid.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_response" -> { (s, _) => sosFreqz(s, IirOps.butterBp, 100.0, 512) },
    "filter_response_ba" -> { (s, _) =>
      freqz(s, IirOps.butterBa._1, IirOps.butterBa._2, 100.0, 256)
    }
  )

  def oracleSql: Map[String, String] = Map(
    "filter_response" -> respSql(512, sosRespExprs(IirOps.butterBp, 100.0, 512, -120.0)),
    "filter_response_ba" ->
      respSql(256, baRespExprs(IirOps.butterBa._1, IirOps.butterBa._2, 100.0, 256, -120.0))
  )
}
