package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Dsp, Signal}

/** Normalized cross-correlation between every channel pair at lags
  * −L..+L — the time-domain connectivity estimate complementing
  * [[SpectraOps]]' magnitude-squared coherence (beyond the reference's
  * own estimators; numpy-equivalent: `np.correlate(a, b, 'full')`
  * restricted to the center 2L+1 lags, "coeff" normalization by
  * √(Σa²·Σb²) with full-length energies — the biased estimator).
  *
  * Positive lag means ch_b's samples l steps in the FUTURE of ch_a's
  * (r[l] = Σ_n a[n]·b[n+l] / √(Ea·Eb)); tail samples with no l-step
  * neighbor drop out of the sum on both engines (NULL product).
  *
  * Spark shape (the [[HilbertOps.plv]] pattern): one channel-window pass
  * adds the L lead columns (no exchange — Signal.long leaves data
  * channel-partitioned and sorted), one shuffle keyed on n collects the
  * per-sample channel vector, ordered pairs expand row-locally, and one
  * (ch_a, ch_b) aggregation computes all 2L+1 lag sums map-side-combined
  * as columns (stacked to long form after — the shuffle never carries
  * the ×(2L+1) expansion). Energies are a tiny per-channel aggregate
  * broadcast back. At scale: per-n work is channels² (EEG montages are
  * ≤ a few hundred channels), partitioned across n.
  */
object XcorrOps {

  val maxLag = 10

  private def sName(l: Int): String = if (l < 0) s"s_m${-l}" else s"s_$l"

  def xcorr(sig: DataFrame, presorted: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("channel")).orderBy(col("n"))
    val led = sig.select(
      Seq(col("channel"), col("n"), col("x")) ++
        (1 to maxLag).map(l => lead(col("x"), l).over(w).as(s"x$l")): _*
    )
    val byN = led
      .groupBy(col("n"))
      .agg(
        collect_list(
          struct(Seq(col("channel"), col("x")) ++ (1 to maxLag).map(l => col(s"x$l")): _*)
        ).as("cs")
      )
    val pairs = byN
      .select(col("cs"), explode(col("cs")).as("a"))
      .select(col("a"), explode(col("cs")).as("b"))
      .filter(col("a.channel") < col("b.channel"))
    val aggs = (-maxLag to maxLag).map { l =>
      val term =
        if (l > 0) col("a.x") * col(s"b.x$l")
        else if (l < 0) col(s"a.x${-l}") * col("b.x")
        else col("a.x") * col("b.x")
      sum(term).as(sName(l))
    }
    val sums = pairs
      .groupBy(col("a.channel").as("ch_a"), col("b.channel").as("ch_b"))
      .agg(aggs.head, aggs.tail: _*)
    val en = sig.groupBy(col("channel")).agg(sum(col("x") * col("x")).as("e"))
    val stackExpr =
      s"stack(${2 * maxLag + 1}, " +
        (-maxLag to maxLag).map(l => s"$l, ${sName(l)}").mkString(", ") +
        ") AS (lag, s)"
    sums
      .join(broadcast(en.select(col("channel").as("ch_a"), col("e").as("ea"))), Seq("ch_a"))
      .join(broadcast(en.select(col("channel").as("ch_b"), col("e").as("eb"))), Seq("ch_b"))
      .select(col("ch_a"), col("ch_b"), col("ea"), col("eb"), expr(stackExpr))
      .select(
        col("ch_a"),
        col("ch_b"),
        col("lag"),
        Dsp.round6(col("s") / sqrt(col("ea") * col("eb"))).as("r")
      )
  }

  def xcorrSql: String = {
    val leads = (1 to maxLag).map(l => s"lead(x, $l) OVER w AS x$l").mkString(", ")
    val sumExprs = (-maxLag to maxLag)
      .map { l =>
        val term =
          if (l > 0) s"a.x * b.x$l"
          else if (l < 0) s"a.x${-l} * b.x"
          else "a.x * b.x"
        s"sum($term) AS ${sName(l)}"
      }
      .mkString(", ")
    val arms = (-maxLag to maxLag)
      .map(l => s"SELECT ch_a, ch_b, $l AS lag, ${sName(l)} AS s FROM sums")
      .mkString(" UNION ALL ")
    s"${Signal.sigCte}, " +
      s"led AS (SELECT channel, n, x, $leads FROM sig WINDOW w AS (PARTITION BY channel ORDER BY n)), " +
      "en AS MATERIALIZED (SELECT channel, sum(x * x) AS e FROM sig GROUP BY channel), " +
      s"sums AS MATERIALIZED (SELECT a.channel AS ch_a, b.channel AS ch_b, $sumExprs " +
      "FROM led a JOIN led b ON b.n = a.n AND a.channel < b.channel GROUP BY a.channel, b.channel), " +
      s"u AS ($arms) " +
      s"SELECT u.ch_a, u.ch_b, u.lag, ${Dsp.round6Sql("u.s / sqrt(ea.e * eb.e)")} AS r " +
      "FROM u JOIN en ea ON ea.channel = u.ch_a JOIN en eb ON eb.channel = u.ch_b"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "xcorr" -> { (s, dir) => xcorr(Signal.long(s, dir), presorted = true) }
  )

  def oracleSql: Map[String, String] = Map(
    "xcorr" -> xcorrSql
  )
}
