package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical 100TB-shape guard: every gate query's physical plan is
  * audited for scale anti-patterns. A query that reintroduces a
  * cartesian product, an unbounded nested-loop join, or a global
  * single-partition exchange fails here before it ever ships.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  // broadcast-nested-loop against literal/centroid sides ≤16 rows is the
  // intended shape for these (documented in SURVEY §5)
  private val bnljAllowed = Set("sim_ivf_topk", "sim_topk", "anno_mask")

  test("no gate query plans a cartesian product or global sort exchange") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      if (plan.contains("CartesianProduct")) offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
        offenders += s"$name: BroadcastNestedLoopJoin"
      if (plan.contains("Exchange SinglePartition") && !plan.contains("AdaptiveSparkPlan"))
        offenders += s"$name: Exchange SinglePartition"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("star join broadcasts its dimension sides") {
    val plan = SparkEntry.queries("q2_join")(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"q2_join should broadcast dims:\n${plan.take(600)}")
  }

  test("projection pruning reaches the parquet scan in q1_agg") {
    val plan = SparkEntry.queries("q1_agg")(spark, sf).queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // the scan must not read the full 16-column lineitem schema
    assert(!scan.contains("l_comment"), s"unpruned scan: $scan")
  }
}
