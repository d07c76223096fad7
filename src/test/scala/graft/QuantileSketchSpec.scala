package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.Sketches

/** Bounds and mergeability of the dyadic Count-Min quantile sketch
  * (sketch_quantile). The sketch is deterministic (fixed md5 hashes), so
  * every assertion here is exact-reproducible, not probabilistic.
  */
class QuantileSketchSpec extends AnyFunSuite {
  import TestSpark._

  /** Summed per-level CMS collision noise: each of the ≤ qLevels rank
    * lookups overcounts by at most ~e·n/w (d-row min, Markov), so the
    * closed-form rank estimate is within L·e·n/w of exact.
    */
  private def rankBound(n: Long): Long =
    math.ceil(Sketches.qLevels * math.E * n / Sketches.qWidth).toLong

  test("sketch_quantile rank estimate is one-sided and within the L*e*n/w bound") {
    val rows = Sketches.quantileRank(Tables.orders(spark, sf)).collect()
    assert(rows.length == 5, s"expected 5 priority groups, got ${rows.length}")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_orders")
      val exact = r.getAs[Long]("exact_rank")
      val est = r.getAs[Long]("est_rank")
      assert(est >= exact, s"${r.get(0)}: dyadic-CMS rank UNDERcounts ($est < $exact)")
      assert(
        est - exact <= rankBound(n),
        s"${r.get(0)}: est $est vs exact $exact exceeds bound ${rankBound(n)} (n=$n)"
      )
    }
  }

  test("dyadic counters from disjoint slices merge by plain addition") {
    val vals = Tables
      .orders(spark, sf)
      .select(
        col("o_orderpriority").as("g"),
        expr("CAST(floor(o_totalprice) AS BIGINT)").as("vi"),
        col("o_orderkey")
      )
    def grid(df: org.apache.spark.sql.DataFrame): Map[(String, Int, Int, Long), Long] =
      Sketches
        .dyadicCounters(df, col("g"), col("vi"))
        .collect()
        .map(r =>
          (r.getAs[String]("g"), r.getAs[Int]("lvl"), r.getAs[Int]("r"), r.getAs[Long]("b")) ->
            r.getAs[Long]("c")
        )
        .toMap
    val whole = grid(vals)
    val left = grid(vals.filter(col("o_orderkey") % 2 === 0))
    val right = grid(vals.filter(col("o_orderkey") % 2 === 1))
    val merged = (left.keySet ++ right.keySet).map { k =>
      k -> (left.getOrElse(k, 0L) + right.getOrElse(k, 0L))
    }.toMap
    assert(merged == whole, "slice-built counters + addition != single-pass counters")
  }

  test("corpus_profile agrees with its exact twins and the standalone sketches") {
    val docs = Tables.documents(spark, sf)
    val prof = Sketches
      .corpusProfile(docs)
      .collect()
      .map(r => r.getAs[String]("source") -> r)
      .toMap
    // n_docs / n_tokens equal corpus_stats' exact counts
    graft.llm.Curation.corpusStats(docs).collect().foreach { r =>
      val p = prof(r.getAs[String]("source"))
      assert(p.getAs[Long]("n_docs") == r.getAs[Long]("n_docs"))
      assert(p.getAs[Long]("n_tokens") == r.getAs[Long]("n_tokens"))
    }
    // the one-scan HLL registers are the SAME sketch hllDistinct builds
    Sketches.hllDistinct(docs).collect().foreach { r =>
      val p = prof(r.getAs[String]("source"))
      assert(
        p.getAs[Double]("est_hll") == r.getAs[Double]("est_hll"),
        s"${r.get(0)}: profile HLL ${p.getAs[Double]("est_hll")} != standalone ${r.getAs[Double]("est_hll")}"
      )
    }
    // length-rank estimates: one-sided over the exact counts, within
    // the single-lookup CMS bound (the probes are powers of two — one
    // dyadic node each)
    import org.apache.spark.sql.functions._
    val lens = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("len"))
      .collect()
      .groupBy(_.getAs[String]("source"))
    Sketches.profProbes.foreach { x =>
      lens.foreach { case (src, rs) =>
        val exact = rs.count(_.getAs[Long]("len") < x)
        val n = rs.length
        val est = prof(src).getAs[Long](s"est_lt_$x")
        val bound = math.ceil(math.E * n / Sketches.qWidth).toLong
        assert(est >= exact, s"$src est_lt_$x $est < exact $exact")
        assert(est - exact <= bound, s"$src est_lt_$x $est vs $exact exceeds bound $bound")
      }
    }
  }

  test("quantileFromCounters median descent lands within the rank bound of the exact median") {
    val orders = Tables.orders(spark, sf)
    val vals = orders
      .select(
        col("o_orderpriority").as("g"),
        expr("CAST(floor(o_totalprice) AS BIGINT)").as("vi")
      )
      .collect()
      .groupBy(_.getAs[String]("g"))
      .map { case (g, rs) => g -> rs.map(_.getAs[Long]("vi")).sorted }
    val counters = Sketches
      .dyadicCounters(
        orders.select(col("o_orderpriority").as("g"), expr("CAST(floor(o_totalprice) AS BIGINT)").as("vi")),
        col("g"),
        col("vi")
      )
      .collect()
      .map(r =>
        (r.getAs[String]("g"), r.getAs[Int]("lvl"), r.getAs[Int]("r"), r.getAs[Long]("b")) ->
          r.getAs[Long]("c")
      )
      .toMap
    vals.foreach { case (g, sorted) =>
      val n = sorted.length.toLong
      val target = math.max(1L, math.ceil(0.5 * n).toLong)
      val x = Sketches.quantileFromCounters(counters, g, n, 0.5)
      // rank semantics: |{v < x}| — the descent's skipped-sibling sum is
      // exactly the dyadic decomposition of [0, x), each term an
      // overcount, so the strict rank side is one-sided-exact
      val rankLt = sorted.count(_ < x).toLong
      val rankLe = sorted.count(_ <= x).toLong
      assert(rankLt < target, s"$g: descent overshoots — rank<x $rankLt >= target $target")
      assert(
        rankLe >= target - rankBound(n),
        s"$g: descent undershoots — rank<=x $rankLe < target $target - bound ${rankBound(n)}"
      )
      // and the leaf actually sits inside the value range it summarizes
      assert(x >= sorted.head && x <= sorted.last, s"$g: leaf $x outside [${sorted.head}, ${sorted.last}]")
    }
  }
}
