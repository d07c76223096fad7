package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized-rollup matching rule end-to-end through a REAL
  * extensions-enabled session (spark.sql.extensions path): a
  * registered store replaces the base-table aggregate at optimization
  * time, results are identical, the lattice derivations (subset group
  * keys via store re-aggregation; avg from sum+count) fire, and the
  * rewrite never fires with the conf off, on non-matching shapes, on
  * type drift, on count(NULL), or on a SAME-SCHEMA relation read from
  * a different path (scan-identity binding).
  */
class RollupRewriteSpec extends AnyFunSuite {
  import TestSpark._

  test("registered rollup store replaces the base aggregate; subset keys + avg derive; conservative misses") {
    val li = core.Tables.lineitem(spark, sf)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("x"), count(lit(1)).as("c"))
    val scratch = sources.Scratch.dir("rollup_rewrite_spec")
    val store = scratch + "/store"
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
    // a SAME-SCHEMA copy of lineitem at another path — must NOT rewrite
    val liCopy = scratch + "/li_copy"
    li.limit(500).write.mode("overwrite").parquet(liCopy)
    plans.MaterializedRollups.register(
      "li_rollup",
      plans.MaterializedRollups.Spec(
        basePath = s"$sf/lineitem.parquet",
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
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
      val expected = rows(agg(core.Tables.lineitem(spark, sf)))
      val q = agg(core.Tables.lineitem(s2, sf))
      // conf off (default): the aggregate stays (base table scanned)
      assert(q.queryExecution.optimizedPlan.toString.contains("Aggregate"))
      s2.conf.set("spark.graft.rollupRewrite", "true")
      val q2 = agg(core.Tables.lineitem(s2, sf))
      val opt = q2.queryExecution.optimizedPlan.toString
      // substituted: no Aggregate left, the store's columns are read
      assert(!opt.contains("Aggregate"), s"aggregate not substituted:\n$opt")
      assert(opt.contains("sum_qty") && opt.contains("n_rows"), s"store not scanned:\n$opt")
      assert(rows(q2) == expected, "rewritten results differ from the direct aggregate")

      // SUBSET group keys: rolls the store up instead of the base —
      // plan = small re-aggregation over the store scan
      def subsetQ(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).as("x"), count(lit(1)).as("c"))
      val sub = subsetQ(core.Tables.lineitem(s2, sf))
      val subOpt = sub.queryExecution.optimizedPlan.toString
      assert(subOpt.contains("Aggregate"), s"subset hit should re-aggregate:\n$subOpt")
      assert(subOpt.contains("sum_qty") && !subOpt.contains("l_quantity"),
        s"subset hit should scan the store, not the base:\n$subOpt")
      assert(rows(sub) == rows(subsetQ(core.Tables.lineitem(spark, sf))),
        "subset rewrite results differ from the direct aggregate")

      // AVG from sum+count — exact-key and subset-key forms
      def avgQ(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(avg(col("l_quantity")).as("a"))
      val av = avgQ(core.Tables.lineitem(s2, sf))
      val avOpt = av.queryExecution.optimizedPlan.toString
      assert(!avOpt.contains("l_quantity") && avOpt.contains("sum_qty"),
        s"avg hit should scan the store:\n$avOpt")
      assert(rows(av) == rows(avgQ(core.Tables.lineitem(spark, sf))),
        "avg-from-store results differ from the direct aggregate")
      def avgSubQ(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
      assert(
        rows(avgSubQ(core.Tables.lineitem(s2, sf))) ==
          rows(avgSubQ(core.Tables.lineitem(spark, sf))),
        "subset avg-from-store results differ"
      )

      // FILTER SUBSUMPTION (r14): an equality/IN on registered GROUP
      // KEYS re-aggregates the store WITH the filter — exact because
      // store rows partition by the full key set
      def filteredQ(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("l_linestatus") === "F")
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).as("x"), count(lit(1)).as("c"), avg(col("l_quantity")).as("a"))
      val fq = filteredQ(core.Tables.lineitem(s2, sf))
      val fqOpt = fq.queryExecution.optimizedPlan.toString
      assert(!fqOpt.contains("l_quantity") && fqOpt.contains("sum_qty"),
        s"key-equality filter should rewrite over the store:\n$fqOpt")
      assert(rows(fq) == rows(filteredQ(core.Tables.lineitem(spark, sf))),
        "filtered rewrite results differ from the direct aggregate")
      // IN-list on a key, grouping on the OTHER key
      def inQ(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("l_returnflag").isin("A", "N"))
          .groupBy(col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("x"))
      val iq = inQ(core.Tables.lineitem(s2, sf))
      assert(!iq.queryExecution.optimizedPlan.toString.contains("l_quantity"),
        "key-IN filter should rewrite over the store")
      assert(rows(iq) == rows(inQ(core.Tables.lineitem(spark, sf))),
        "IN-filtered rewrite results differ")

      // conservative misses:
      // group key OUTSIDE the store's key set -> no rewrite
      val other = core.Tables
        .lineitem(s2, sf)
        .groupBy(col("l_shipdate"))
        .agg(sum(col("l_quantity")).as("x"))
      assert(other.queryExecution.optimizedPlan.toString.contains("l_shipdate"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("sum_qty"))
      // NON-KEY filter -> no rewrite (store can't answer a predicate
      // on a column it aggregated away)
      val filtered = core.Tables
        .lineitem(s2, sf)
        .filter(col("l_orderkey") > 100)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("x"), count(lit(1)).as("c"))
      assert(filtered.queryExecution.optimizedPlan.toString.contains("l_orderkey"))
      // EXPRESSION filter over a key -> no rewrite (only bare
      // key = literal / key IN (literals) subsume)
      val exprFiltered = core.Tables
        .lineitem(s2, sf)
        .filter(concat(col("l_linestatus"), lit("x")) === "Fx")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("x"))
      assert(exprFiltered.queryExecution.optimizedPlan.toString.contains("l_quantity"),
        "expression filter must refuse the rewrite")
      // HAVING composes for free: a Filter ABOVE the Aggregate
      // references the aggregate's output attrs, which the rewrite
      // preserves by exprId — the plan under it still rewrites
      def havingQ(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).as("x"), count(lit(1)).as("c"))
          .filter(col("c") > 100)
      val hq = havingQ(core.Tables.lineitem(s2, sf))
      val hqOpt = hq.queryExecution.optimizedPlan.toString
      assert(!hqOpt.contains("l_quantity") && hqOpt.contains("sum_qty"),
        s"HAVING-shaped filter must not block the rewrite:\n$hqOpt")
      assert(rows(hq) == rows(havingQ(core.Tables.lineitem(spark, sf))),
        "HAVING over the rewritten aggregate diverged")

      // RANGE predicate on a key (r15): FIRES — keys are stored
      // verbatim, so key >= lit AND key < lit partitions exactly like
      // IN over the store's key set
      def rangeQ(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("l_linestatus") > "A" && col("l_returnflag") >= "A" && col("l_returnflag") < "Z")
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).as("x"), count(lit(1)).as("c"))
      val rq = rangeQ(core.Tables.lineitem(s2, sf))
      val rqOpt = rq.queryExecution.optimizedPlan.toString
      assert(!rqOpt.contains("l_quantity") && rqOpt.contains("sum_qty"),
        s"key-range filter should rewrite over the store (r15):\n$rqOpt")
      assert(rows(rq) == rows(rangeQ(core.Tables.lineitem(spark, sf))),
        "range-filtered rewrite results differ from the direct aggregate")
      // key-to-KEY comparison (no literal) -> no rewrite: two-key
      // predicates still partition groups exactly, but the
      // conservative contract only derives literal comparisons
      val colCmp = core.Tables
        .lineitem(s2, sf)
        .filter(col("l_linestatus") > col("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("x"))
      assert(colCmp.queryExecution.optimizedPlan.toString.contains("l_quantity"),
        "column-to-column comparison must refuse the rewrite")
      // SAME SCHEMA, different path -> no rewrite (identity binding)
      val copied = agg(s2.read.parquet(liCopy))
      val copiedOpt = copied.queryExecution.optimizedPlan.toString
      assert(copiedOpt.contains("Aggregate") && !copiedOpt.contains("sum_qty"),
        s"copy relation must not substitute:\n$copiedOpt")
      // count(NULL) counts zero rows -> must not map to the count store col
      val nullCount = core.Tables
        .lineitem(s2, sf)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(null)).as("c"))
      val nc = nullCount.collect().map(_.getLong(2)).toSet
      assert(nc == Set(0L), s"count(NULL) must stay 0, got $nc")

      // EMPTY base + EMPTY grouping set: global count(*) is 0, and the
      // subset-keys derivation (Sum over the empty store) must coalesce
      // to 0, not return NULL (ADVICE r13)
      val emptyBase = scratch + "/empty_base"
      val emptyStore = scratch + "/empty_store"
      li.limit(0).write.mode("overwrite").parquet(emptyBase)
      agg(s2.read.parquet(emptyBase))
        .select(
          col("l_returnflag"),
          col("l_linestatus"),
          col("x").as("sum_qty"),
          col("c").as("n_rows")
        )
        .write
        .mode("overwrite")
        .parquet(emptyStore)
      plans.MaterializedRollups.register(
        "li_empty",
        plans.MaterializedRollups.Spec(
          basePath = emptyBase,
          baseCols = Set("l_returnflag", "l_linestatus", "l_quantity"),
          groupCols = Set("l_returnflag", "l_linestatus"),
          sumCols = Map("l_quantity" -> "sum_qty"),
          countCol = Some("n_rows"),
          store = emptyStore
        )
      )
      val globalCount =
        s2.read.parquet(emptyBase).agg(count(lit(1)).as("c"), sum(col("l_quantity")).as("x"))
      val gOpt = globalCount.queryExecution.optimizedPlan.toString
      assert(gOpt.contains("n_rows"), s"global agg over registered base should rewrite:\n$gOpt")
      val gRow = globalCount.collect().head
      assert(gRow.getLong(0) == 0L, s"rewritten global count over empty base must be 0, got $gRow")
      assert(gRow.isNullAt(1), s"rewritten global sum over empty base must stay NULL, got $gRow")
    } finally {
      s2.conf.unset("spark.graft.rollupRewrite")
      plans.MaterializedRollups.clear()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
