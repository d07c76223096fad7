package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Divide, EqualTo, Expression, In, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DoubleType

/** Materialized-rollup REWRITE — the query-acceleration half of
  * `rollup_inc`'s maintenance half: once a rollup store is registered
  * (base location + group keys + exactly which sum/count columns it
  * carries), any matching `Aggregate` is rewritten at OPTIMIZATION
  * time to scan the KB-sized store instead of the 100 TB base table.
  * The maintenance cadence (seed + delta merge, proven merge ≡
  * recompute by the rollup_inc gate oracle) keeps the store fresh;
  * this rule makes every dashboard query pay store-scan cost without
  * the query author knowing the store exists — the classic
  * materialized-view matching contract, now with the two standard
  * lattice derivations:
  *
  *  - **subset group keys**: a query grouping on a SUBSET of the
  *    store's keys re-aggregates the store (sum of partial sums /
  *    sum of partial counts) — the rollup-lattice roll-up, still
  *    store-sized work instead of base-sized.
  *  - **avg from sum+count**: `avg(c)` answers as
  *    `sum_store / count_store` (double division, Spark's own
  *    Average(numeric) result type) when the store carries both.
  *
  * Matching is deliberately conservative (a rewrite that fires wrongly
  * is a correctness bug, one that doesn't fire is only a missed
  * speedup): the aggregate's child must be a bare relation (optionally
  * under a pruning Project) whose scan IDENTITY — the parquet root
  * path, not just a column-name fingerprint — equals the registered
  * base location (a same-schema table at another path/scale factor
  * must NOT substitute); group keys must be a subset of the registered
  * key set; every output must be a group key, `sum(col)`, `avg(col)`,
  * or a non-null `count(*)`/`count(lit)` with the needed store
  * columns. `count(NULL)` (counts zero rows — constant folding can
  * produce it) is explicitly refused. Output attribute ids are
  * preserved by aliasing to the ORIGINAL exprIds, so parent operators
  * resolve untouched; any type drift between store and query refuses
  * the rewrite.
  *
  * Enabled per session with `spark.graft.rollupRewrite=true`
  * (default off); stores register via [[MaterializedRollups.register]].
  */
object MaterializedRollups {

  /** @param basePath    parquet root path of the base table — the scan
    *                    identity the rewrite binds to (a column-name
    *                    fingerprint alone would silently substitute for
    *                    any same-schema relation)
    * @param baseCols    column-name sanity fingerprint (superset match
    *                    on the scan output, secondary to basePath)
    * @param groupCols   the store's key columns (same names in store)
    * @param sumCols     base column → store column for sum() outputs
    * @param countCol    store column holding count(*) (None = not kept)
    * @param store       parquet path of the maintained rollup
    */
  final case class Spec(
      basePath: String,
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

  /** scheme-insensitive path identity (file:/x vs /x) */
  private def uriPath(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** The aggregate child must be (a pruning Project and/or a
    * key-subsumable Filter over) a parquet scan whose root path IS the
    * registered base location — anything else (joins, other relations
    * with the same schema, non-key predicates) would need derivations
    * the conservative contract refuses. Returns the collected filter
    * predicates (empty = bare scan) or None on any non-match.
    *
    * FILTER SUBSUMPTION (r14, widened r15): a conjunction of
    * `key = literal` / `key IN (literals)` / `key <|<=|>|>= literal`
    * predicates on REGISTERED group keys is exact over the store —
    * store rows partition by the full key set with keys stored
    * verbatim, so filtering store rows on key predicates selects
    * precisely the groups the base filter would have kept. Anything
    * else (non-key columns, expressions over keys, column-to-column
    * comparisons, null literals, null-safe equality, disjunctions)
    * refuses.
    */
  private def baseMatches(child: LogicalPlan, spec: Spec): Option[Seq[Expression]] =
    child match {
      case Project(projectList, grandchild)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        baseMatches(grandchild, spec)
      case Filter(cond, grandchild) =>
        val preds = splitConjuncts(cond)
        if (preds.forall(keyPredicate(_, spec))) baseMatches(grandchild, spec).map(preds ++ _)
        else None
      case lr: LogicalRelation =>
        val pathOk = lr.relation match {
          case h: HadoopFsRelation =>
            val want = uriPath(spec.basePath)
            h.location.rootPaths.exists(p => p.toUri.getPath == want)
          case _ => false
        }
        if (pathOk && spec.baseCols.subsetOf(lr.output.map(_.name).toSet)) Some(Nil) else None
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  private def keyPredicate(e: Expression, spec: Spec): Boolean = e match {
    case In(a: AttributeReference, elems) =>
      spec.groupCols.contains(a.name) &&
      elems.forall { case Literal(v, _) => v != null; case _ => false }
    // InferFiltersFromConstraints plants isnotnull(key) next to the
    // equality — exact over the store (keys are stored verbatim)
    case org.apache.spark.sql.catalyst.expressions.IsNotNull(a: AttributeReference) =>
      spec.groupCols.contains(a.name)
    // =, <, <=, >, >= between a registered key and a non-null literal
    // (r15 range subsumption): keys are stored VERBATIM, so any plain
    // comparison selects exactly the store rows whose groups the base
    // filter would have kept — `key >= lit AND key < lit` partitions
    // like IN over the store's key set. EqualNullSafe stays refused
    // (NULL-keeping semantics — conservative arm).
    case cmp: org.apache.spark.sql.catalyst.expressions.BinaryComparison
        if !cmp.isInstanceOf[org.apache.spark.sql.catalyst.expressions.EqualNullSafe] =>
      (cmp.left, cmp.right) match {
        case (a: AttributeReference, l: Literal) =>
          spec.groupCols.contains(a.name) && l.value != null
        case (l: Literal, a: AttributeReference) =>
          spec.groupCols.contains(a.name) && l.value != null
        case _ => false
      }
    case _ => false
  }

  /** A key predicate with its attribute swapped for the store's
    * same-named column (types must agree — drift refuses). */
  private def rebasePred(p: Expression, byName: Map[String, Attribute]): Option[Expression] =
    p match {
      case In(a: AttributeReference, elems) =>
        byName.get(a.name).filter(_.dataType == a.dataType).map(sa => In(sa, elems))
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(a: AttributeReference) =>
        byName
          .get(a.name)
          .filter(_.dataType == a.dataType)
          .map(sa => org.apache.spark.sql.catalyst.expressions.IsNotNull(sa))
      // =, <, <=, >, >= (the r15 range subsumption, EqualTo included):
      // rebuild the SAME comparison node with the attribute swapped for
      // the store's same-named column — operand order preserved
      case cmp: org.apache.spark.sql.catalyst.expressions.BinaryComparison
          if !cmp.isInstanceOf[org.apache.spark.sql.catalyst.expressions.EqualNullSafe] =>
        (cmp.left, cmp.right) match {
          case (a: AttributeReference, l: Literal) =>
            byName
              .get(a.name)
              .filter(_.dataType == a.dataType)
              .map(sa => cmp.withNewChildren(Seq(sa, l)))
          case (l: Literal, a: AttributeReference) =>
            byName
              .get(a.name)
              .filter(_.dataType == a.dataType)
              .map(sa => cmp.withNewChildren(Seq(l, sa)))
          case _ => None
        }
      case _ => None
    }

  /** What a matched output translates to over the store. */
  private sealed trait Tx
  private case class KeyTx(storeCol: String) extends Tx
  private case class SumTx(storeCol: String) extends Tx
  private case object CountTx extends Tx
  private case class AvgTx(sumStoreCol: String) extends Tx

  private def txFor(e: NamedExpression, spec: Spec): Option[Tx] = e match {
    case a: AttributeReference if spec.groupCols.contains(a.name) =>
      Some(KeyTx(a.name))
    case Alias(AggregateExpression(Sum(c: AttributeReference, _), _, false, None, _), _)
        if spec.sumCols.contains(c.name) =>
      Some(SumTx(spec.sumCols(c.name)))
    case Alias(AggregateExpression(Average(c: AttributeReference, _), _, false, None, _), _)
        if spec.sumCols.contains(c.name) && spec.countCol.isDefined =>
      Some(AvgTx(spec.sumCols(c.name)))
    // count(lit): the literal must be NON-NULL — count(NULL) counts
    // zero rows and must never map to the count(*) store column
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _), _)
        if v != null =>
      spec.countCol.map(_ => CountTx)
    case Alias(AggregateExpression(Count(Seq()), _, false, None, _), _) =>
      spec.countCol.map(_ => CountTx)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || MaterializedRollups.all.isEmpty) plan
    else
      plan.transformUp {
        case agg @ Aggregate(groupExprs, aggExprs, child, _)
            if groupExprs.forall(_.isInstanceOf[AttributeReference]) =>
          val keyNames = groupExprs.collect { case a: AttributeReference => a.name }.toSet
          MaterializedRollups.all.view
            .flatMap { spec =>
              if (keyNames.subsetOf(spec.groupCols) &&
                aggExprs.forall(e => txFor(e, spec).isDefined))
                baseMatches(child, spec).map(preds => (spec, preds))
              else None
            }
            .headOption
            .flatMap { case (spec, preds) => rewrite(agg, keyNames, spec, preds) }
            .getOrElse(agg)
      }

  private def rewrite(
      agg: Aggregate,
      keyNames: Set[String],
      spec: Spec,
      preds: Seq[Expression]
  ): Option[LogicalPlan] = {
    val storeBase = spark.read.parquet(spec.store).queryExecution.analyzed
    val byName = storeBase.output.map(a => a.name -> a).toMap
    // rebase each key predicate onto the store's attribute of the same
    // name; a missing column (store schema drift) refuses the rewrite
    val rebased: Option[Seq[Expression]] = preds.foldLeft(Option(Vector.empty[Expression])) {
      case (acc, p) =>
        for {
          v <- acc
          rp <- rebasePred(p, byName)
        } yield v :+ rp
    }
    if (rebased.isEmpty) return None
    val storePlan =
      rebased.get.reduceOption(And) match {
        case Some(cond) => Filter(cond, storeBase)
        case None       => storeBase
      }
    val exact = keyNames == spec.groupCols
    val cnt = spec.countCol.flatMap(byName.get)

    def dbl(e: Expression): Expression = Cast(e, DoubleType)
    def sumOf(a: Attribute): Expression = Sum(a).toAggregateExpression()

    // exact match: the store row IS the group — plain column reads.
    // subset keys: re-aggregate the store (sum of partial sums/counts).
    // CountTx re-aggregation must coalesce to 0: a global count(*) over
    // an EMPTY base returns 0, but Sum(cnt) over the (empty) store
    // returns NULL (ADVICE r13). Avg is left as NULL/NULL ≡ the
    // original's NULL — coalescing its denominator to 0 would instead
    // throw DIVIDE_BY_ZERO under ANSI.
    def translate(tx: Tx): Option[Expression] = tx match {
      case KeyTx(n) => byName.get(n)
      case SumTx(n) => byName.get(n).map(a => if (exact) a else sumOf(a))
      case CountTx =>
        cnt.map { a =>
          if (exact) a
          else
            org.apache.spark.sql.catalyst.expressions
              .Coalesce(Seq(sumOf(a), Literal(0L)))
        }
      case AvgTx(n) =>
        for { s <- byName.get(n); c <- cnt } yield
          if (exact) Divide(dbl(s), dbl(c))
          else Divide(dbl(sumOf(s)), dbl(sumOf(c)))
    }

    val outs: Option[Seq[NamedExpression]] =
      agg.aggregateExpressions.foldLeft(Option(Vector.empty[NamedExpression])) {
        case (acc, orig) =>
          for {
            v <- acc
            tx <- txFor(orig, spec)
            ex <- translate(tx)
            // refuse on any type drift between store and aggregate —
            // a silently-coerced rewrite is a correctness bug
            if ex.dataType == orig.dataType
          } yield v :+ Alias(ex, orig.name)(exprId = orig.exprId)
      }
    val groupAttrs = keyNames.toSeq.sorted.flatMap(byName.get)
    outs.collect {
      case os if exact =>
        Project(os, storePlan)
      case os if groupAttrs.size == keyNames.size =>
        Aggregate(groupAttrs, os, storePlan)
    }
  }
}
