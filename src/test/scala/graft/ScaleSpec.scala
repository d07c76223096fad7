package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{Scale, Tables}

class ScaleSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed join plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val joined = Scale.bucketedJoin(spark, li, o, "l_orderkey", 8, "b_li", "b_o")
    // disable broadcast so the bucketed SMJ path is what gets planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n${plan.take(800)}")
      assert(joined.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sf)
    val direct = li
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("c"))
      .collect()
      .map(r => r.getString(0) -> (math.rint(r.getDouble(1) * 100) / 100, r.getLong(2)))
      .toMap
    val salted = Scale
      .saltedSumCount(li, col("l_returnflag"), col("l_quantity"))
      .collect()
      .map(r => r.getString(0) -> (math.rint(r.getDouble(1) * 100) / 100, r.getLong(2)))
      .toMap
    assert(salted == direct)
  }
}
