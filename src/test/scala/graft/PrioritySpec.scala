package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.WarcOps

/** Fused recrawl prioritization: publisher signal (sitemap lastmod)
  * over observed signal (CDX change rate).
  */
class PrioritySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def chainOf(rows: Seq[(String, String, String)]) =
    // (urlkey-suffix, ts, digest) on one host: site2.example.com
    rows
      .map { case (u, ts, d) =>
        (s"com,example,site2)/doc/$u", s"http://site2.example.com/doc/$u", ts, d)
      }
      .toDF("urlkey", "url", "cdx_ts", "digest")

  test("publisher-updated class-0 URL outranks a high-change-rate class-1 URL") {
    val chain = chainOf(
      Seq(
        // A: never changed (rate 0), but the sitemap says updated AFTER t2
        ("a", "20240101000000", "d1"),
        ("a", "20240201000000", "d1"),
        // B: changed every interval (rate 1e6), sitemap lastmod BEFORE t2
        ("b", "20240101000000", "x1"),
        ("b", "20240201000000", "x2"),
        // C: single capture, NOT listed in the sitemap at all
        ("c", "20240101000000", "y1")
      )
    )
    val sitemap = Seq(
      ("com,example,site2)/doc/a", "20240301000000"), // after a's latest
      ("com,example,site2)/doc/b", "20240115000000") // before b's latest
    ).toDF("urlkey", "sm_ts")
    val out = WarcOps
      .fusedSchedule(WarcOps.fusedPriority(chain, sitemap))
      .select("urlkey", "fresh_class", "rate_ppm", "slot")
      .as[(String, Int, Long, Long)]
      .collect()
      .sortBy(_._4)
    assert(out.length == 3)
    // A first despite rate 0 — the publisher signal is a CLASS, not a score
    assert(out(0) == (("com,example,site2)/doc/a", 0, 0L, 1L)))
    // then B (class 1, rate 1e6), then C (class 1, rate 0, unlisted)
    assert(out(1) == (("com,example,site2)/doc/b", 1, 1000000L, 2L)))
    assert(out(2) == (("com,example,site2)/doc/c", 1, 0L, 3L)))
  }

  test("a sitemap lastmod NOT newer than the latest capture does not promote") {
    val chain = chainOf(Seq(("a", "20240101000000", "d1"), ("a", "20240201000000", "d1")))
    val equalTs = Seq(("com,example,site2)/doc/a", "20240201000000")).toDF("urlkey", "sm_ts")
    val cls = WarcOps
      .fusedPriority(chain, equalTs)
      .select("fresh_class")
      .as[Int]
      .head()
    assert(cls == 1) // strictly-after wins; same-instant does not
  }

  test("gate shape: both classes populated and class boundary respects slots per host") {
    val out = WarcOps
      .crawlPriorityFusedGate(spark, sf)
      .cache()
    assert(out.filter(col("fresh_class") === 0).count() > 0)
    assert(out.filter(col("fresh_class") === 1).count() > 0)
    // within every host, no class-1 row may hold a smaller slot than a class-0 row
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("host"))
    val viol = out
      .withColumn("max0", max(when(col("fresh_class") === 0, col("slot"))).over(w))
      .withColumn("min1", min(when(col("fresh_class") === 1, col("slot"))).over(w))
      .filter(col("max0").isNotNull && col("min1").isNotNull && col("min1") < col("max0"))
      .count()
    assert(viol == 0)
  }
}
