package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Signal, Tables}

/** Annotation-to-mask machinery (reference: openseize
  * `file_io/annotations.py:130` `as_mask`: annotation intervals
  * (start time, duration) → per-sample boolean mask at a given rate).
  *
  * The test-corpus stand-in for an annotation file: every 'error' event
  * row k (ordered by event_id) marks an interval [4k, 4k+10) on the
  * sample axis; the mask is evaluated over the 'click' channel. The
  * interval join broadcasts the (small) annotation side; at scale this is
  * the standard broadcast range-join shape.
  */
object AnnoOps {

  private[graft] val strideMul = 4L
  private val dur = 10L
  private val rankBucket = 4096L // ≤4096 ids per rank partition

  /** Global 0-based rank of `idCol` without a partition-less window
    * (which would sort ALL rows on one reducer): per-bucket row_number
    * where bucket = id/width, plus each bucket's offset = total count of
    * earlier buckets, combined arithmetically. The offset side is one
    * row per bucket — broadcast-joined, never a global sort.
    */
  private[graft] def globalRank(df: DataFrame, idCol: String): DataFrame = {
    val bucketed = df.withColumn("b", (col(idCol) / rankBucket).cast("bigint"))
    val wb = Window.partitionBy(col("b")).orderBy(col(idCol))
    val rn = bucketed.withColumn("rn", row_number().over(wb).cast("bigint"))
    val counts = bucketed.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    val offs = counts
      .alias("a")
      .join(broadcast(counts.alias("c")), col("c.b") < col("a.b"), "left_outer")
      .groupBy(col("a.b").as("b"))
      .agg(sum(coalesce(col("c.cnt"), lit(0L))).as("off"))
    rn.join(broadcast(offs), Seq("b"))
      .select(col(idCol), (coalesce(col("off"), lit(0L)) + col("rn") - 1).as("k"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "anno_mask" -> { (s, dir) =>
      val sig = Signal.long(s, dir).filter(col("channel") === "click")
      val errs = Tables.events(s, dir).filter(col("event_type") === "error").select(col("event_id"))
      val anno = globalRank(errs, "event_id")
        .select((col("k") * strideMul).as("lo"), (col("k") * strideMul + dur).as("hi"))
      val hit = sig
        .join(broadcast(anno), col("n") >= col("lo") && col("n") < col("hi"), "left_outer")
        .groupBy(col("n"), col("x"))
        .agg(max(col("lo").isNotNull).as("in_anno"))
      hit.select(col("n"), col("x"), col("in_anno"))
    },
    "anno_pinnacle" -> { (s, dir) => pinnacleRoundtrip(s, dir) },
    "epoch_extract" -> { (s, dir) => epochs(s, dir) },
    "epoch_average" -> { (s, dir) =>
      // Evoked response (ERP): the canonical follow-on to epoching —
      // average the epoch stack across events per (channel, relative
      // sample). One more aggregation on the epoch join's output; at
      // scale it SHRINKS data to channels × (pre+post) rows, map-side
      // combined.
      epochs(s, dir)
        .groupBy(col("channel"), col("rel_n"))
        .agg(
          graft.core.Dsp.round6(avg(col("x"))).as("erp"),
          count(lit(1)).as("n_epochs")
        )
    },
    "anno_merge" -> { (s, dir) =>
      // Overlapping-interval union (artifact/annotation coalescing —
      // the preprocessing step between annotation ingest and as_mask):
      // gap-and-islands over per-label ordered intervals. The window is
      // partitioned by label (at production: (recording, label) — the
      // annotation side of a recording is the small human-produced
      // side); intervals are DISTINCT first so the ordering is tie-free
      // on both engines.
      val iv = Tables
        .events(s, dir)
        .select(col("event_type").as("label"), expr("ts_ns div 1000").as("lo"))
        .distinct()
        .withColumn("hi", col("lo") + lit(mergeGapUs))
      mergeIntervals(iv)
    }
  )

  /** Union of overlapping [lo, hi) intervals per label. Expects tie-free
    * (label, lo) — pre-distinct the input.
    */
  def mergeIntervals(iv: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("label")).orderBy(col("lo"))
    val prevMax = max(col("hi")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    iv
      .withColumn("ni", when(col("lo") > coalesce(prevMax, lit(0L)), 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("label"), col("island"))
      .agg(
        min(col("lo")).as("start_us"),
        max(col("hi")).as("stop_us"),
        count(lit(1)).as("n_merged")
      )
      .select(col("label"), col("island").as("island_id"), col("start_us"), col("stop_us"), col("n_merged"))
  }

  /** Event-related epoching (the reference's canonical analysis
    * pattern: slice [-pre, +post) samples around each annotation,
    * every channel, relative-indexed). Scale-safe join shape as
    * q9_range: bucketize the sample axis at the epoch span, explode
    * each annotation into its ≤2 touched buckets, broadcast
    * equi-join + exact predicate — a BroadcastHashJoin, never a
    * nested-loop range join over the signal.
    */
  private def epochs(s: SparkSession, dir: String): DataFrame = {
    val sig = Signal.long(s, dir)
    val errs = Tables.events(s, dir).filter(col("event_type") === "error").select(col("event_id"))
    val anno = globalRank(errs, "event_id")
      .select(col("k"), (col("k") * strideMul).as("center"))
      .withColumn(
        "bucket",
        explode(
          array(
            expr(s"(center - $epochPre) div $epochSpan"),
            expr(s"(center + $epochPost - 1) div $epochSpan")
          )
        )
      )
      .dropDuplicates()
    sig
      .withColumn("bucket", expr(s"n div $epochSpan"))
      .join(broadcast(anno), Seq("bucket"))
      .filter(col("n") >= col("center") - epochPre && col("n") < col("center") + epochPost)
      .select(
        col("k").as("epoch_id"),
        col("channel"),
        (col("n") - col("center")).as("rel_n"),
        col("x")
      )
  }

  private val mergeGapUs = 1200000000L // 20 min — mean event gap is ~21.5 min

  private val epochPre = 4L
  private val epochPost = 8L
  private val epochSpan = 16L // bucket width ≥ pre+post so ≤2 buckets per epoch

  /** Pinnacle round-trip: the error events render as a Pinnacle-style
    * TSV (preamble + header + one row per annotation at the anno_mask
    * intervals, in seconds at fs=100), `Annotations.pinnacle` parses it
    * back, and the oracle re-derives the same rows from the events
    * table. The TSV write is driver-side by design: annotation files
    * are the small human-produced side of a recording.
    */
  private val annoFs = 100.0

  def pinnacleRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables
      .events(s, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id"))
      .orderBy(col("event_id"))
      .collect()
      .map(_.getLong(0))
    val lines =
      Seq.fill(6)("meta\tvalue") ++
        Seq("Number\tStart\tTime From Start\tTime To\tAnnotation\tChannel") ++
        ids.zipWithIndex.map { case (_, k) =>
          val start = (k.toLong * strideMul).toDouble / annoFs
          val stop = (k.toLong * strideMul + dur).toDouble / annoFs
          s"$k\tx\t$start\t$stop\terror\tclick"
        }
    val tmp = java.nio.file.Files.createTempDirectory("graft_anno")
    java.nio.file.Files.write(tmp.resolve("p.tsv"), lines.mkString("\n").getBytes("UTF-8"))
    graft.sources.Annotations
      .pinnacle(s, tmp.resolve("p.tsv").toString)
      .select(
        col("label"),
        round(col("start_s"), 6).as("start_s"),
        round(col("stop_s"), 6).as("stop_s"),
        round(col("duration_s"), 6).as("duration_s"),
        col("channel")
      )
  }

  def oracleSql: Map[String, String] = Map(
    "anno_pinnacle" ->
      (s"WITH e AS (SELECT row_number() OVER (ORDER BY event_id) - 1 AS k FROM events WHERE event_type = 'error') " +
        s"SELECT 'error' AS label, round(CAST(k * $strideMul AS DOUBLE) / 100.0, 6) AS start_s, " +
        s"round(CAST(k * $strideMul + $dur AS DOUBLE) / 100.0, 6) AS stop_s, " +
        s"round(CAST(k * $strideMul + $dur AS DOUBLE) / 100.0 - CAST(k * $strideMul AS DOUBLE) / 100.0, 6) AS duration_s, " +
        "'click' AS channel FROM e"),
    "anno_mask" ->
      (s"${Signal.sigCte}, anno AS (SELECT (row_number() OVER (ORDER BY event_id) - 1) * $strideMul AS lo, " +
        s"(row_number() OVER (ORDER BY event_id) - 1) * $strideMul + $dur AS hi " +
        "FROM events WHERE event_type = 'error') " +
        "SELECT n, x, EXISTS (SELECT 1 FROM anno a WHERE sig.n >= a.lo AND sig.n < a.hi) AS in_anno " +
        "FROM sig WHERE channel = 'click'"),
    "epoch_extract" ->
      (s"$epochCteSql " +
        "SELECT epoch_id, channel, rel_n, x FROM ep"),
    "epoch_average" ->
      (s"$epochCteSql " +
        s"SELECT channel, rel_n, ${graft.core.Dsp.round6Sql("avg(x)")} AS erp, count(*) AS n_epochs " +
        "FROM ep GROUP BY channel, rel_n"),
    "anno_merge" ->
      (s"WITH iv AS (SELECT DISTINCT event_type AS label, epoch_us(ts) AS lo FROM events), " +
        s"iv2 AS (SELECT label, lo, lo + $mergeGapUs AS hi FROM iv), " +
        "f AS (SELECT label, lo, hi, CASE WHEN lo > coalesce(max(hi) OVER " +
        "(PARTITION BY label ORDER BY lo ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "THEN 1 ELSE 0 END AS ni FROM iv2), " +
        "g AS (SELECT label, lo, hi, sum(ni) OVER (PARTITION BY label ORDER BY lo " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM f) " +
        "SELECT label, CAST(island AS BIGINT) AS island_id, min(lo) AS start_us, max(hi) AS stop_us, " +
        "count(*) AS n_merged FROM g GROUP BY label, island")
  )

  private def epochCteSql: String =
    s"${Signal.sigCte}, anno AS (SELECT row_number() OVER (ORDER BY event_id) - 1 AS k, " +
      s"(row_number() OVER (ORDER BY event_id) - 1) * $strideMul AS center " +
      "FROM events WHERE event_type = 'error'), " +
      "ep AS (SELECT a.k AS epoch_id, s.channel, s.n - a.center AS rel_n, s.x " +
      s"FROM sig s JOIN anno a ON s.n >= a.center - $epochPre AND s.n < a.center + $epochPost)"
}
