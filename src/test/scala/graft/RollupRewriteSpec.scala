package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized-rollup matching rule end-to-end through a REAL
  * extensions-enabled session (spark.sql.extensions path): a
  * registered store replaces the base-table aggregate at optimization
  * time, results are identical, and the rewrite never fires with the
  * conf off, on non-matching shapes, or on type drift.
  */
class RollupRewriteSpec extends AnyFunSuite {
  import TestSpark._

  test("registered rollup store replaces the base aggregate; equal results; conservative misses") {
    val li = core.Tables.lineitem(spark, sf)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("x"), count(lit(1)).as("c"))
    val store = sources.Scratch.dir("rollup_rewrite_spec") + "/store"
    agg(li)
      .select(
        col("l_returnflag"),
        col("l_linestatus"),
        col("x").as("sum_qty"),
        col("c").as("n_rows")
      )
      .write
      .mode("overwrite")
      .parquet(store)
    plans.MaterializedRollups.register(
      "li_rollup",
      plans.MaterializedRollups.Spec(
        baseCols = Set("l_returnflag", "l_linestatus", "l_quantity"),
        groupCols = Set("l_returnflag", "l_linestatus"),
        sumCols = Map("l_quantity" -> "sum_qty"),
        countCol = Some("n_rows"),
        store = store
      )
    )
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val expected = agg(core.Tables.lineitem(spark, sf))
        .collect()
        .map(_.toSeq.mkString("|"))
        .sorted
        .toSeq
      val q = agg(core.Tables.lineitem(s2, sf))
      // conf off (default): the aggregate stays (base table scanned)
      assert(q.queryExecution.optimizedPlan.toString.contains("Aggregate"))
      s2.conf.set("spark.graft.rollupRewrite", "true")
      val q2 = agg(core.Tables.lineitem(s2, sf))
      val opt = q2.queryExecution.optimizedPlan.toString
      // substituted: no Aggregate left, the store's columns are read
      assert(!opt.contains("Aggregate"), s"aggregate not substituted:\n$opt")
      assert(opt.contains("sum_qty") && opt.contains("n_rows"), s"store not scanned:\n$opt")
      val got = q2.collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(got == expected, "rewritten results differ from the direct aggregate")
      // conservative misses: extra group key -> no rewrite
      val other = core.Tables
        .lineitem(s2, sf)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("x"))
      assert(other.queryExecution.optimizedPlan.toString.contains("Aggregate"))
      // filtered child -> no rewrite (store can't answer a predicate)
      val filtered = core.Tables
        .lineitem(s2, sf)
        .filter(col("l_orderkey") > 100)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("x"), count(lit(1)).as("c"))
      assert(filtered.queryExecution.optimizedPlan.toString.contains("Aggregate"))
    } finally {
      s2.conf.unset("spark.graft.rollupRewrite")
      plans.MaterializedRollups.clear()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
