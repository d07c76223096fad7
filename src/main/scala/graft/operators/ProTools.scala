package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Signal

/** Producer-tools surface (reference: openseize `core/protools.py`).
  *
  * Element-wise and whole-signal utilities over the long-format signal
  * `(channel, n, x)`. Everything is a window/group expression — one
  * shuffle on channel, then whole-stage codegen; no driver-side state.
  *
  * - mean / std (protools.py:500,546): per-channel scalar aggregates.
  * - standardize (protools.py:598): (x-μ)/σ with window aggregates —
  *   the two-pass of the reference collapses into one shuffled pass.
  * - pad (protools.py:182): zero rows prepended/appended per channel via
  *   `sequence` + explode; indices shift by `left`.
  * - slice_along_axis (protools.py:428): start/stop/step reindex.
  * - add / multiply (protools.py:72,127): element-wise combine of two
  *   channels aligned on n (co-partitioned equi-join).
  * - MaskedProducer (producer.py:379): boolean-mask sample selection
  *   with dense reindexing.
  */
object ProTools {

  private val padLeft = 3
  private val padRight = 2
  private val sliceStart = 5L
  private val sliceStop = 1005L
  private val sliceStep = 3L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pro_mean" -> { (s, dir) =>
      Signal
        .long(s, dir)
        .groupBy(col("channel"))
        .agg(round(avg(col("x")), 6).as("mean_x"), count(lit(1)).as("n_samples"))
    },
    "pro_std" -> { (s, dir) =>
      Signal
        .long(s, dir)
        .groupBy(col("channel"))
        .agg(round(stddev_pop(col("x")), 6).as("std_x"))
    },
    "pro_standardize" -> { (s, dir) =>
      val w = Window.partitionBy(col("channel"))
      Signal
        .long(s, dir)
        .select(
          col("channel"),
          col("n"),
          round((col("x") - avg(col("x")).over(w)) / stddev_pop(col("x")).over(w), 6).as("z")
        )
    },
    "pro_pad" -> { (s, dir) =>
      val sig = Signal.long(s, dir)
      val shifted = sig.select(col("channel"), (col("n") + padLeft).as("n"), col("x"))
      val bounds = sig.groupBy(col("channel")).agg(max(col("n")).as("max_n"))
      val left = bounds.select(
        col("channel"),
        explode(sequence(lit(0L), lit(padLeft - 1L))).as("n"),
        lit(0.0).as("x")
      )
      val right = bounds.select(
        col("channel"),
        explode(
          sequence(col("max_n") + padLeft + 1, col("max_n") + padLeft + padRight)
        ).as("n"),
        lit(0.0).as("x")
      )
      shifted.unionByName(left).unionByName(right)
    },
    "pro_slice" -> { (s, dir) =>
      Signal
        .long(s, dir)
        .filter(
          col("n") >= sliceStart && col("n") < sliceStop &&
            (col("n") - sliceStart) % sliceStep === 0
        )
        .select(col("channel"), ((col("n") - sliceStart) / sliceStep).cast("bigint").as("n"), col("x"))
    },
    "pro_combine" -> { (s, dir) =>
      val sig = Signal.long(s, dir)
      val a = sig.filter(col("channel") === "error").select(col("n"), col("x").as("xa"))
      val b = sig.filter(col("channel") === "purchase").select(col("n"), col("x").as("xb"))
      a.join(b, Seq("n"))
        .select(
          col("n"),
          round(col("xa") + col("xb"), 6).as("x_add"),
          round(col("xa") * col("xb"), 6).as("x_mul")
        )
    },
    "pro_mulaxis" -> { (s, dir) =>
      // multiply_along_axis (protools.py:343) on the production axis:
      // y[n] = x[n] · w[n] with a deterministic weight profile standing
      // in for the reference's arbitrary 1-D multiplier array.
      val w = lit(1.0) + lit(0.5) * sin(col("n").cast("double") * lit(2.0 * math.Pi / 256.0))
      Signal
        .long(s, dir)
        .select(col("channel"), col("n"), round(col("x") * w, 6).as("y"))
    },
    "pro_mask" -> { (s, dir) =>
      // Mask = keep samples with amplitude above threshold; reindex densely
      // (reference MaskedProducer yields only unmasked samples, in order).
      val w = Window.partitionBy(col("channel")).orderBy(col("n"))
      Signal
        .long(s, dir)
        .filter(col("x") > 50.0)
        .select(col("channel"), (row_number().over(w) - 1).cast("bigint").as("n"), col("x"))
    },
    "car_reref" -> { (s, dir) => carReref(Signal.long(s, dir)) },
    "montage_bipolar" -> { (s, dir) => montageBipolar(Signal.long(s, dir)) },
    "artifact_mask" -> { (s, dir) => artifactMask(Signal.long(s, dir)) },
    "detect_peaks" -> { (s, dir) => detectPeaks(Signal.long(s, dir)) },
    "pro_extend" -> { (s, dir) => proExtend(Signal.long(s, dir)) }
  )

  val peakThreshold = 1.5 // z threshold, shared with the oracle
  val peakHalfW = 3 // local-max half window

  /** Threshold-crossing peak detection (spike screening): a sample is a
    * peak iff its ROUNDED z-score exceeds [[peakThreshold]] (ulp-proof
    * compare, artifact_mask precedent) and it is the maximum of the
    * ±[[peakHalfW]]-sample neighborhood (plateau samples all flag —
    * deterministic on both engines; the comparison is between stored
    * doubles, no arithmetic). Stats via tiny aggregate + broadcast join;
    * the neighborhood max is one more frame in the channel window every
    * FIR already rides — zero extra shuffles.
    */
  def detectPeaks(sig: DataFrame): DataFrame = {
    val stats = sig
      .groupBy(col("channel"))
      .agg(avg(col("x")).as("mu"), stddev_pop(col("x")).as("sd"))
    val w = Window
      .partitionBy(col("channel"))
      .orderBy(col("n"))
      .rowsBetween(-peakHalfW, peakHalfW)
    sig
      .join(broadcast(stats), Seq("channel"))
      .select(
        col("channel"),
        col("n"),
        col("x"),
        graft.core.Dsp.round6((col("x") - col("mu")) / col("sd")).as("z")
      )
      .withColumn("wmax", max(col("x")).over(w))
      .filter(col("z") > peakThreshold && col("x") >= col("wmax"))
      .select(col("channel"), col("n"), col("z"))
  }

  /** Boundary extension (arraytools.py:183,207,235,271 — zero/edge/
    * even/odd extend; scipy's `*_ext` family, the filtfilt edge
    * treatment). Gate shape: the first [[extLen]] samples per channel
    * are extended by [[extN]] values at each end under all four modes.
    *
    * Scale shape: ONE tiny per-channel aggregate collects the ordered
    * boundary slice (bounded: extLen values/channel); the four
    * extensions are a row-local explode of a LITERAL coefficient map —
    * x_out = sc·xs[si] + bc·xs[bi] covers every mode (odd extension is
    * 2·boundary − mirror, i.e. bc=2, sc=−1) — so the whole operator
    * adds zero shuffles beyond the slice agg. At production scale only
    * the two boundary windows of each channel feed this; the interior
    * never moves.
    */
  private val extLen = 16
  private val extN = 4

  /** (mode, n_out, si, sc, bi, bc): x_out = sc·xs[si] + bc·xs[bi],
    * 0-based indices into the length-[[extLen]] head slice. One shared
    * structure renders into BOTH plans, so the engines cannot drift.
    */
  private val extMap: Seq[(String, Int, Int, Double, Int, Double)] = {
    val L = extLen
    Seq("zero", "edge", "even", "odd").flatMap { mode =>
      val left = (1 to extN).map { j =>
        mode match {
          case "zero" => (mode, -j, 0, 0.0, 0, 0.0)
          case "edge" => (mode, -j, 0, 1.0, 0, 0.0)
          case "even" => (mode, -j, j, 1.0, 0, 0.0)
          case "odd" => (mode, -j, j, -1.0, 0, 2.0)
        }
      }
      val right = (1 to extN).map { j =>
        mode match {
          case "zero" => (mode, L - 1 + j, 0, 0.0, 0, 0.0)
          case "edge" => (mode, L - 1 + j, L - 1, 1.0, 0, 0.0)
          case "even" => (mode, L - 1 + j, L - 1 - j, 1.0, 0, 0.0)
          case "odd" => (mode, L - 1 + j, L - 1 - j, -1.0, L - 1, 2.0)
        }
      }
      val interior = (0 until L).map(i => (mode, i, i, 1.0, 0, 0.0))
      left ++ interior ++ right
    }
  }

  def proExtend(sig: DataFrame): DataFrame = {
    val mapExpr = extMap
      .map { case (m, no, si, sc, bi, bc) =>
        s"named_struct('mode', '$m', 'n_out', $no, 'si', $si, " +
          s"'sc', ${graft.core.Dsp.lit(sc)}, 'bi', $bi, 'bc', ${graft.core.Dsp.lit(bc)})"
      }
      .mkString("array(", ", ", ")")
    sig
      .filter(col("n") < extLen)
      .groupBy(col("channel"))
      .agg(array_sort(collect_list(struct(col("n"), col("x")))).as("sx"))
      .select(col("channel"), expr("transform(sx, e -> e.x)").as("xs"))
      .select(col("channel"), col("xs"), explode(expr(mapExpr)).as("m"))
      .select(
        col("channel"),
        col("m.mode").as("mode"),
        col("m.n_out").cast("bigint").as("n"),
        // Dsp.round6, not round(): zero-mode outputs are 0·x sums, the
        // signed-zero class where native round() preserves -0.0
        graft.core.Dsp
          .round6(
            col("m.sc") * element_at(col("xs"), col("m.si") + 1) +
              col("m.bc") * element_at(col("xs"), col("m.bi") + 1)
          )
          .as("x")
      )
  }

  /** DuckDB twin of [[proExtend]]'s literal map: a VALUES table off the
    * same Scala structure.
    */
  private def extMapSql: String =
    extMap
      .map { case (m, no, si, sc, bi, bc) =>
        s"('$m', $no, $si, ${graft.core.Dsp.lit(sc)}, $bi, ${graft.core.Dsp.lit(bc)})"
      }
      .mkString("m(mode, n_out, si, sc, bi, bc) AS (VALUES ", ", ", ")")

  def proExtendSql: String =
    s"${Signal.sigCte}, head AS (SELECT channel, list(x ORDER BY n) AS xs " +
      s"FROM sig WHERE n < $extLen GROUP BY channel), $extMapSql " +
      "SELECT channel, mode, CAST(n_out AS BIGINT) AS n, " +
      graft.core.Dsp.round6Sql(
        "sc * list_extract(xs, si + 1) + bc * list_extract(xs, bi + 1)"
      ) + " AS x FROM head, m"

  /** Common-average re-reference (EEG montage step beyond the
    * reference's own tools): subtract the cross-channel mean at each
    * sample. Inherently a channel→sample transpose — the per-sample
    * mean aggregates across channels, so the shuffle keys on n (at
    * corpus scale the production layout blocks n to keep partitions
    * bounded; per-recording channel counts are small constants).
    */
  def carReref(sig: DataFrame): DataFrame = {
    val m = sig.groupBy(col("n")).agg(avg(col("x")).as("car"))
    sig
      .join(m, Seq("n"))
      .select(col("channel"), col("n"), graft.core.Dsp.round6(col("x") - col("car")).as("y"))
  }

  /** Longitudinal bipolar montage (beyond reference; the standard
    * clinical EEG derivation): each output channel is the difference of
    * two ADJACENT electrodes in channel order — "chA-chB" = x_A − x_B.
    * One (n)-keyed transpose shuffle (car_reref precedent), pairs
    * expand row-locally from the sorted per-sample struct array; docs
    * with a single channel emit nothing (the size guard also dodges the
    * descending-sequence gotcha). The oracle replays it as a rank
    * self-join — same arithmetic, both sides Dsp.round6.
    */
  def montageBipolar(sig: DataFrame): DataFrame = {
    import sig.sparkSession.implicits._
    // GLOBAL channel ranks from a bounded collect (channels ≤ dozens) —
    // a per-sample transpose would pair across gaps when a channel
    // misses a sample, and a rank window over the distinct frame would
    // be a partition-less window (the audited class)
    val chs = sig.select(col("channel")).distinct().collect().map(_.getString(0)).sorted
    val rkDf = broadcast(chs.zipWithIndex.toSeq.toDF("channel", "rk"))
    val s2 = sig.join(rkDf, Seq("channel"))
    val a = s2.select(col("channel").as("ca"), col("rk"), col("n"), col("x").as("xa"))
    val b = s2.select(col("channel").as("cb"), (col("rk") - 1).as("rk"), col("n"), col("x").as("xb"))
    a.join(b, Seq("rk", "n"))
      .select(
        concat(col("ca"), lit("-"), col("cb")).as("channel"),
        col("n"),
        graft.core.Dsp.round6(col("xa") - col("xb")).as("y")
      )
  }

  def montageBipolarSql: String =
    s"${Signal.sigCte}, " +
      "r AS (SELECT channel, dense_rank() OVER (ORDER BY channel) AS rk " +
      "FROM (SELECT DISTINCT channel FROM sig)), " +
      "s2 AS (SELECT s.channel, r.rk, s.n, s.x FROM sig s JOIN r USING (channel)) " +
      "SELECT a.channel || '-' || b.channel AS channel, a.n, " +
      s"${graft.core.Dsp.round6Sql("a.x - b.x")} AS y " +
      "FROM s2 a JOIN s2 b ON b.n = a.n AND b.rk = a.rk + 1"

  /** Artifact screen: per-channel z-score with the flag computed from
    * the ROUNDED z on both engines, so the threshold compare can never
    * straddle an engine ulp. Stats via tiny aggregate + broadcast join
    * (never a Window buffer over the signal).
    */
  val artifactThreshold = 2.5 // shared by the gate query AND its oracle

  def artifactMask(sig: DataFrame, threshold: Double = artifactThreshold): DataFrame = {
    val stats = sig
      .groupBy(col("channel"))
      .agg(avg(col("x")).as("mu"), stddev_pop(col("x")).as("sd"))
    sig
      .join(broadcast(stats), Seq("channel"))
      .select(
        col("channel"),
        col("n"),
        graft.core.Dsp.round6((col("x") - col("mu")) / col("sd")).as("z")
      )
      .withColumn("is_artifact", abs(col("z")) > threshold)
  }

  def oracleSql: Map[String, String] = {
    val cte = Signal.sigCte
    Map(
      "pro_mean" ->
        s"$cte SELECT channel, round(avg(x), 6) AS mean_x, count(*) AS n_samples FROM sig GROUP BY channel",
      "pro_std" ->
        s"$cte SELECT channel, round(stddev_pop(x), 6) AS std_x FROM sig GROUP BY channel",
      "pro_standardize" ->
        (s"$cte SELECT channel, n, round((x - avg(x) OVER (PARTITION BY channel)) / " +
          "stddev_pop(x) OVER (PARTITION BY channel), 6) AS z FROM sig"),
      "pro_pad" ->
        (s"$cte, bounds AS (SELECT channel, max(n) AS max_n FROM sig GROUP BY channel) " +
          s"SELECT channel, n + $padLeft AS n, x FROM sig " +
          s"UNION ALL SELECT channel, gs.g AS n, 0.0 AS x FROM bounds, generate_series(0, ${padLeft - 1}) gs(g) " +
          s"UNION ALL SELECT channel, max_n + $padLeft + gs.g AS n, 0.0 AS x FROM bounds, generate_series(1, $padRight) gs(g)"),
      "pro_slice" ->
        (s"$cte SELECT channel, (n - $sliceStart) // $sliceStep AS n, x FROM sig " +
          s"WHERE n >= $sliceStart AND n < $sliceStop AND (n - $sliceStart) % $sliceStep = 0"),
      "pro_combine" ->
        (s"$cte SELECT a.n, round(a.x + b.x, 6) AS x_add, round(a.x * b.x, 6) AS x_mul " +
          "FROM sig a JOIN sig b ON a.n = b.n WHERE a.channel = 'error' AND b.channel = 'purchase'"),
      "pro_mulaxis" ->
        (s"$cte SELECT channel, n, round(x * (1.0 + 0.5 * sin(CAST(n AS DOUBLE) * " +
          s"${graft.core.Dsp.lit(2.0 * math.Pi / 256.0)})), 6) AS y FROM sig"),
      "pro_mask" ->
        (s"$cte SELECT channel, CAST(row_number() OVER (PARTITION BY channel ORDER BY n) - 1 AS BIGINT) AS n, x " +
          "FROM sig WHERE x > 50.0"),
      "montage_bipolar" -> montageBipolarSql,
      "car_reref" ->
        (s"$cte, m AS (SELECT n, avg(x) AS car FROM sig GROUP BY n) " +
          s"SELECT s.channel, s.n, ${graft.core.Dsp.round6Sql("s.x - m.car")} AS y " +
          "FROM sig s JOIN m ON m.n = s.n"),
      "artifact_mask" ->
        (s"$cte, st AS (SELECT channel, avg(x) AS mu, stddev_pop(x) AS sd FROM sig GROUP BY channel) " +
          s"SELECT channel, n, z, abs(z) > ${graft.core.Dsp.lit(artifactThreshold)} AS is_artifact FROM (" +
          s"SELECT s.channel, s.n, ${graft.core.Dsp.round6Sql("(s.x - st.mu) / st.sd")} AS z " +
          "FROM sig s JOIN st ON st.channel = s.channel)"),
      "detect_peaks" ->
        (s"$cte, st AS (SELECT channel, avg(x) AS mu, stddev_pop(x) AS sd FROM sig GROUP BY channel), " +
          s"zx AS (SELECT s.channel, s.n, s.x, ${graft.core.Dsp.round6Sql("(s.x - st.mu) / st.sd")} AS z " +
          "FROM sig s JOIN st ON st.channel = s.channel), " +
          "wm AS (SELECT channel, n, x, z, max(x) OVER (PARTITION BY channel ORDER BY n " +
          s"ROWS BETWEEN $peakHalfW PRECEDING AND $peakHalfW FOLLOWING) AS wmax FROM zx) " +
          s"SELECT channel, n, z FROM wm WHERE z > ${graft.core.Dsp.lit(peakThreshold)} AND x >= wmax"),
      "pro_extend" -> proExtendSql
    )
  }
}
