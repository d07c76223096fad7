package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Dsp, Signal}

/** Rational resampling (reference: openseize `resampling/resampling.py`
  * downsample/upsample/resample via `core/numerical.py:523`
  * polyphase_resample = scipy resample_poly).
  *
  * Semantics (derived from upfirdn with scipy's centering):
  * y[j] = L · Σ_i x[i] · h[c + jM − iL], c = (len(h)−1)/2, zero-extended,
  * j ∈ [0, ceil(n·L/M)). Equivalently: zero-stuff by L → centered FIR
  * with gain L → keep every Mth sample. The anti-alias/interpolation
  * Kaiser is designed exactly as the reference defaults:
  * cutoff = fs/(2·max(L,M)), fpass/fstop = cutoff ∓ cutoff/10,
  * gpass = 0.1 dB, gstop = 40 dB.
  *
  * Spark shape: the zero-stuffed grid is an explode (row-local), the
  * convolution one channel-sorted window pass, decimation a filter that
  * Catalyst pushes into the same stage — one shuffle total. A true
  * polyphase split (computing only surviving phases) is the planned
  * round-2 optimization; it cuts the conv work by M but changes nothing
  * in the shuffle structure.
  */
object ResampleOps {

  private val fs = 100.0

  /** Reference-default Kaiser for a rational L/M stage. */
  def antiAlias(l: Int, m: Int, fs: Double = fs): Array[Double] = {
    val cutoff = fs / (2.0 * math.max(l, m))
    Dsp.firDesign(
      "kaiser",
      Seq(cutoff - cutoff / 10.0),
      Seq(cutoff + cutoff / 10.0),
      fs,
      gpass = 0.1,
      gstop = 40.0
    )
  }

  lazy val hDown2: Array[Double] = antiAlias(1, 2)
  lazy val hUp3: Array[Double] = antiAlias(3, 1)
  lazy val hRes32: Array[Double] = antiAlias(3, 2)

  /** Zero-stuffed signal: t = n·L + r, value x when r = 0 else 0. */
  private def zeroStuff(sig: DataFrame, l: Int): DataFrame =
    sig
      .select(
        col("channel"),
        col("n"),
        col("x"),
        explode(sequence(lit(0), lit(l - 1))).as("r")
      )
      .select(
        col("channel"),
        (col("n") * l + col("r")).as("n"),
        when(col("r") === 0, col("x")).otherwise(lit(0.0)).as("x")
      )

  private def zeroStuffSql(l: Int): String =
    s"SELECT channel, n * $l + r.g AS n, CASE WHEN r.g = 0 THEN x ELSE 0.0 END AS x " +
      s"FROM sig, generate_series(0, ${l - 1}) r(g)"

  /** Keep every Mth sample of the (already filtered) grid. */
  private def decimate(df: DataFrame, m: Int): DataFrame =
    df.filter(col("n") % m === 0)
      .select(col("channel"), (col("n") / m).cast("bigint").as("n"), col("y"))

  def downsample(sig: DataFrame, m: Int, h: Array[Double]): DataFrame =
    decimate(FirOps.same(sig, h), m)

  def upsample(sig: DataFrame, l: Int, h: Array[Double]): DataFrame =
    FirOps.same(zeroStuff(sig, l), h.map(_ * l))

  def resample(sig: DataFrame, l: Int, m: Int, h: Array[Double]): DataFrame =
    decimate(FirOps.same(zeroStuff(sig, l), h.map(_ * l)), m)

  // ---- oracle SQL twins (reuse FirOps expression rendering) ----

  private def sameExprSql(h: Array[Double]): String = {
    val l = (h.length - 1) / 2
    h.zipWithIndex
      .map { case (c, k) =>
        val j = l - k
        val t =
          if (j > 0) s"lead(x, $j) OVER w"
          else if (j < 0) s"lag(x, ${-j}) OVER w"
          else "x"
        s"${Dsp.lit(c)} * coalesce($t, 0.0)"
      }
      .mkString(" + ")
  }

  def downsampleSql(m: Int, h: Array[Double]): String =
    s"${Signal.sigCte}, conv AS (SELECT channel, n, round(${sameExprSql(h)}, 6) AS y " +
      "FROM sig WINDOW w AS (PARTITION BY channel ORDER BY n)) " +
      s"SELECT channel, n // $m AS n, y FROM conv WHERE n % $m = 0"

  def upsampleSql(l: Int, h: Array[Double]): String =
    s"${Signal.sigCte}, stuffed AS (${zeroStuffSql(l)}) " +
      s"SELECT channel, n, round(${sameExprSql(h.map(_ * l))}, 6) AS y " +
      "FROM stuffed WINDOW w AS (PARTITION BY channel ORDER BY n)"

  def resampleSql(l: Int, m: Int, h: Array[Double]): String =
    s"${Signal.sigCte}, stuffed AS (${zeroStuffSql(l)}), " +
      s"conv AS (SELECT channel, n, round(${sameExprSql(h.map(_ * l))}, 6) AS y " +
      "FROM stuffed WINDOW w AS (PARTITION BY channel ORDER BY n)) " +
      s"SELECT channel, n // $m AS n, y FROM conv WHERE n % $m = 0"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "down_2" -> { (s, dir) => downsample(Signal.long(s, dir), 2, hDown2) },
    "up_3" -> { (s, dir) => upsample(Signal.long(s, dir), 3, hUp3) },
    "resample_3_2" -> { (s, dir) => resample(Signal.long(s, dir), 3, 2, hRes32) }
  )

  def oracleSql: Map[String, String] = Map(
    "down_2" -> downsampleSql(2, hDown2),
    "up_3" -> upsampleSql(3, hUp3),
    "resample_3_2" -> resampleSql(3, 2, hRes32)
  )
}
