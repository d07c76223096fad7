package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-rollup REWRITE — the query-acceleration half of
  * `rollup_inc`'s maintenance half: once a rollup store is registered
  * (group keys + exactly which sum/count columns it carries over which
  * base table), any matching `Aggregate` is rewritten at OPTIMIZATION
  * time to scan the KB-sized store instead of the 100 TB base table.
  * The maintenance cadence (seed + delta merge, proven merge ≡
  * recompute by the rollup_inc gate oracle) keeps the store fresh;
  * this rule makes every dashboard query pay store-scan cost without
  * the query author knowing the store exists — the classic
  * materialized-view matching contract, scoped to the exact-match
  * aggregate shape (no partial rollup derivation).
  *
  * Matching is deliberately conservative (a rewrite that fires wrongly
  * is a correctness bug, one that doesn't fire is only a missed
  * speedup): the aggregate's child must be a bare relation (optionally
  * under a pruning Project) whose columns include the registered base
  * fingerprint; group keys must be exactly the registered key set;
  * every output must be a group key, `sum(col)`, or `count(*)`/
  * `count(1)` with a registered store column. Output attribute ids are
  * preserved by aliasing the store's columns to the ORIGINAL exprIds,
  * so parent operators resolve untouched.
  *
  * Enabled per session with `spark.graft.rollupRewrite=true`
  * (default off); stores register via [[MaterializedRollups.register]].
  */
object MaterializedRollups {

  /** @param baseCols    column-name fingerprint identifying the base
    *                    relation (a superset match on the scan output)
    * @param groupCols   the store's key columns (same names in store)
    * @param sumCols     base column → store column for sum() outputs
    * @param countCol    store column holding count(*) (None = not kept)
    * @param store       parquet path of the maintained rollup
    */
  final case class Spec(
      baseCols: Set[String],
      groupCols: Set[String],
      sumCols: Map[String, String],
      countCol: Option[String],
      store: String
  )

  private val specs = new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  def register(name: String, spec: Spec): Unit = { specs.put(name, spec); () }
  def unregister(name: String): Unit = { specs.remove(name); () }
  def clear(): Unit = specs.clear()
  def all: Seq[Spec] = {
    import scala.jdk.CollectionConverters._
    specs.values().asScala.toSeq
  }
}

case class RollupRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import MaterializedRollups.Spec

  private def enabled: Boolean =
    spark.conf.get("spark.graft.rollupRewrite", "false").toBoolean

  /** The aggregate child must be (a pruning Project over) a leaf
    * relation carrying the fingerprint columns — anything else
    * (filters, joins) would need store-side predicate derivation the
    * conservative contract refuses.
    */
  private def baseMatches(child: LogicalPlan, spec: Spec): Boolean = child match {
    case Project(projectList, grandchild)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      baseMatches(grandchild, spec)
    case leaf if leaf.children.isEmpty =>
      spec.baseCols.subsetOf(leaf.output.map(_.name).toSet)
    case _ => false
  }

  private def storeColFor(e: NamedExpression, spec: Spec): Option[(String, String)] =
    e match {
      case a: AttributeReference if spec.groupCols.contains(a.name) =>
        Some(a.name -> a.name)
      case Alias(AggregateExpression(Sum(c: AttributeReference, _), _, false, None, _), nm)
          if spec.sumCols.contains(c.name) =>
        Some(nm -> spec.sumCols(c.name))
      case Alias(AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _), nm) =>
        spec.countCol.map(nm -> _)
      case Alias(AggregateExpression(Count(Seq()), _, false, None, _), nm) =>
        spec.countCol.map(nm -> _)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || MaterializedRollups.all.isEmpty) plan
    else
      plan.transformUp {
        case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
          val keyNames = groupExprs.collect { case a: AttributeReference => a.name }.toSet
          MaterializedRollups.all
            .find { spec =>
              groupExprs.forall(_.isInstanceOf[AttributeReference]) &&
              keyNames == spec.groupCols &&
              baseMatches(child, spec) &&
              aggExprs.forall(e => storeColFor(e, spec).isDefined)
            }
            .flatMap { spec =>
              val mapping = aggExprs.map(e => e -> storeColFor(e, spec).get._2)
              val storePlan =
                spark.read.parquet(spec.store).queryExecution.analyzed
              val byName = storePlan.output.map(a => a.name -> a).toMap
              // refuse on any type drift between store and aggregate —
              // a silently-coerced rewrite is a correctness bug
              val typesOk = mapping.forall { case (orig, storeName) =>
                byName.get(storeName).exists(_.dataType == orig.dataType)
              }
              if (!typesOk) None
              else
                // alias to the ORIGINAL output exprIds so parents resolve
                Some(Project(
                  mapping.map { case (orig, storeName) =>
                    Alias(byName(storeName), orig.name)(exprId = orig.exprId)
                  },
                  storePlan
                ))
            }
            .getOrElse(agg)
      }
}
