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

  private def zeroStuffSql(l: Int): String =
    s"SELECT channel, n * $l + r.g AS n, CASE WHEN r.g = 0 THEN x ELSE 0.0 END AS x " +
      s"FROM sig, generate_series(0, ${l - 1}) r(g)"

  /** True polyphase rational resampler: y[j] = Σ_k h'(k)·g(jM + c − k)
    * where g is the L-stuffed zero-extended grid, h' = L·h (L>1),
    * c = (taps−1)/2 — evaluated directly on the ORIGINAL samples for the
    * surviving output phases only. vs the naive stuff→conv→decimate:
    * M× fewer conv evaluations AND the shuffle moves n rows, not n·L
    * (the stuffed grid never exists as rows). Term order matches the
    * lag-sum oracle exactly (ascending k, left-associated, literal 0.0
    * for stuffed/out-of-range slots) so hashes are unchanged.
    *
    * Memory-bounded like FirOps.convPlus: fixed input blocks with a
    * taps-wide halo; peak task memory O(block + taps) regardless of
    * channel length. Assumes dense per-channel n starting at 0 (the
    * producer contract).
    */
  def polyResample(
      sig: DataFrame,
      l: Int,
      m: Int,
      h: Array[Double],
      blockSizeHint: Int = 1 << 16,
      presorted: Boolean = false
  ): DataFrame = {
    val spark = sig.sparkSession
    import spark.implicits._
    val hl = if (l > 1) h.map(_ * l) else h.clone()
    val taps = hl.length
    val c = (taps - 1) / 2
    val L = l.toLong
    val M = m.toLong
    val blockSize = math.max(blockSizeHint, 4 * taps)
    val typed = sig
      .select(col("channel"), col("n"), col("x"))
      .as[(String, Long, Double)]
    val ordered =
      if (presorted) typed
      else typed.repartition(col("channel")).sortWithinPartitions(col("channel"), col("n"))
    ordered
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[Iterator[(String, Long, Double)]] {
          private var ch: String = null
          private val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
          private var base = 0L  // input-absolute index of xs(0)
          private var nextJ = 0L // next un-emitted output index

          def hasNext: Boolean = in.hasNext || xs.nonEmpty

          def next(): Iterator[(String, Long, Double)] = {
            if (xs.isEmpty) { ch = in.head._1; base = 0L; nextJ = 0L }
            var read = 0
            while (read < blockSize && in.hasNext && in.head._1 == ch) {
              xs += in.next()._3; read += 1
            }
            val channelDone = !in.hasNext || in.head._1 != ch
            val avail = base + xs.length
            val gridLen = avail * L
            // without full right context, output j needs grid up to jM + c
            val lastGrid = if (channelDone) gridLen - 1 else gridLen - 1 - c
            val lastJ = if (lastGrid < 0) -1L else lastGrid / M
            val nOut = math.max(0L, lastJ - nextJ + 1).toInt
            val out = new Array[(String, Long, Double)](nOut)
            var q = 0
            while (q < nOut) {
              val j = nextJ + q
              val t = j * M
              var acc = 0.0
              var k = 0
              while (k < taps) {
                val g = t + c - k
                val v =
                  if (g < 0 || g >= gridLen || g % L != 0L) 0.0
                  else xs(((g / L) - base).toInt)
                val term = hl(k) * v
                acc = if (k == 0) term else acc + term
                k += 1
              }
              out(q) = (ch, j, acc)
              q += 1
            }
            nextJ = lastJ + 1
            if (channelDone) {
              xs.clear() // all outputs emitted; channel finished
            } else {
              val dropTo = math.max(0L, Math.floorDiv(nextJ * M + c - (taps - 1), L))
              val dropCount = (dropTo - base).toInt
              if (dropCount > 0) { xs.remove(0, dropCount); base = dropTo }
            }
            out.iterator
          }
        }.flatten
      }
      .toDF("channel", "n", "y")
      .select(col("channel"), col("n"), Dsp.round6(col("y")).as("y"))
  }

  def downsample(sig: DataFrame, m: Int, h: Array[Double], presorted: Boolean = false): DataFrame =
    polyResample(sig, 1, m, h, presorted = presorted)

  def upsample(sig: DataFrame, l: Int, h: Array[Double], presorted: Boolean = false): DataFrame =
    polyResample(sig, l, 1, h, presorted = presorted)

  def resample(
      sig: DataFrame,
      l: Int,
      m: Int,
      h: Array[Double],
      presorted: Boolean = false
  ): DataFrame =
    polyResample(sig, l, m, h, presorted = presorted)

  // ---- oracle SQL twins (reuse FirOps expression rendering) ----

  private[graft] def sameExprSql(h: Array[Double]): String = {
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
    s"${Signal.sigCte}, conv AS (SELECT channel, n, ${Dsp.round6Sql(sameExprSql(h))} AS y " +
      "FROM sig WINDOW w AS (PARTITION BY channel ORDER BY n)) " +
      s"SELECT channel, n // $m AS n, y FROM conv WHERE n % $m = 0"

  def upsampleSql(l: Int, h: Array[Double]): String =
    s"${Signal.sigCte}, stuffed AS (${zeroStuffSql(l)}) " +
      s"SELECT channel, n, ${Dsp.round6Sql(sameExprSql(h.map(_ * l)))} AS y " +
      "FROM stuffed WINDOW w AS (PARTITION BY channel ORDER BY n)"

  def resampleSql(l: Int, m: Int, h: Array[Double]): String =
    s"${Signal.sigCte}, stuffed AS (${zeroStuffSql(l)}), " +
      s"conv AS (SELECT channel, n, ${Dsp.round6Sql(sameExprSql(h.map(_ * l)))} AS y " +
      "FROM stuffed WINDOW w AS (PARTITION BY channel ORDER BY n)) " +
      s"SELECT channel, n // $m AS n, y FROM conv WHERE n % $m = 0"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // presorted: Signal.long leaves the data channel-partitioned and
    // (channel, n)-sorted — the polyphase scan adds no exchange
    "down_2" -> { (s, dir) => downsample(Signal.long(s, dir), 2, hDown2, presorted = true) },
    "up_3" -> { (s, dir) => upsample(Signal.long(s, dir), 3, hUp3, presorted = true) },
    "resample_3_2" -> { (s, dir) => resample(Signal.long(s, dir), 3, 2, hRes32, presorted = true) }
  )

  def oracleSql: Map[String, String] = Map(
    "down_2" -> downsampleSql(2, hDown2),
    "up_3" -> upsampleSql(3, hUp3),
    "resample_3_2" -> resampleSql(3, 2, hRes32)
  )
}
