package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for graft's custom expressions, so plain
  * `spark.sql(...)` (and any SQL-first tooling) can call them:
  *
  *   - cluster deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  *   - existing session:   `graft.functions.GraftFunctions.register(spark)`
  *
  * Scalar parameters (shingle width, token caps) arrive as foldable int
  * literals and are extracted at resolution time — the expressions
  * themselves only carry data-dependent children.
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$fn: $arg must be an integer literal, got $other")
  }

  private def longArrayLit(e: Expression, fn: String, arg: String): Seq[Long] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _)
        if children.nonEmpty && children.forall(_.foldable) =>
      children.map(_.eval() match {
        case l: Long => l
        case i: Int  => i.toLong
        case other =>
          throw new IllegalArgumentException(s"$fn: $arg must be a bigint array literal, got $other")
      })
    case other =>
      throw new IllegalArgumentException(s"$fn: $arg must be a bigint array literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name) {
      override def getUsage: String = usage
    }

  /** (identifier, info, builder) triples in SparkSessionExtensions'
    * FunctionDescription shape.
    */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - left-associated dot product of two array<double>"),
      (cs: Seq[Expression]) => DotD(cs(0), cs(1))
    ),
    (
      FunctionIdentifier("graft_sq_dist"),
      info("graft_sq_dist", "graft_sq_dist(a, b) - squared euclidean distance of two array<double>"),
      (cs: Seq[Expression]) => SqDistD(cs(0), cs(1))
    ),
    (
      FunctionIdentifier("graft_rfft_mag2"),
      info("graft_rfft_mag2", "graft_rfft_mag2(xs) - |RFFT|^2 bin powers of a 2^k-length segment"),
      (cs: Seq[Expression]) => RfftMag2(cs(0))
    ),
    (
      FunctionIdentifier("graft_shingle_hashes"),
      info(
        "graft_shingle_hashes",
        "graft_shingle_hashes(toks, w, maxShingles) - distinct xxhash64 of w-word shingles"
      ),
      (cs: Seq[Expression]) =>
        ShingleHashSet(
          cs(0),
          intLit(cs(1), "graft_shingle_hashes", "w"),
          intLit(cs(2), "graft_shingle_hashes", "maxShingles")
        )
    ),
    (
      FunctionIdentifier("graft_simhash64"),
      info(
        "graft_simhash64",
        "graft_simhash64(toks, maxTokens) - [sim_hi, sim_lo] 32-bit halves of the 64-bit SimHash"
      ),
      (cs: Seq[Expression]) =>
        SimHash64(cs(0), intLit(cs(1), "graft_simhash64", "maxTokens"))
    ),
    (
      FunctionIdentifier("graft_minhash_sig"),
      info(
        "graft_minhash_sig",
        "graft_minhash_sig(toks, w, maxShingles, a, b) - k multiply-add-mod-2^32 minhash " +
          "minima over w-word shingles; a/b are bigint array literals (a_j odd)"
      ),
      (cs: Seq[Expression]) =>
        MinHashSig(
          cs(0),
          intLit(cs(1), "graft_minhash_sig", "w"),
          intLit(cs(2), "graft_minhash_sig", "maxShingles"),
          longArrayLit(cs(3), "graft_minhash_sig", "a"),
          longArrayLit(cs(4), "graft_minhash_sig", "b")
        )
    )
  )

  /** Register into an already-running session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, fi, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fi, builder)
    }
}

/** Analysis-time scale guardrail: a Window whose partition spec is
  * empty or entirely foldable (a constant key — Catalyst folds it to an
  * empty spec) funnels the ENTIRE input through one task for the sort.
  * This bit the repo in r9 (sim_ivf_layout's `partitionBy(lit(0))`
  * rank), and the only runtime signal was a WARN line in a bench log.
  * Installed via [[GraftExtensions]] the guard fails such a query at
  * ANALYSIS time — before a single task runs — when
  * `spark.graft.failOnGlobalWindow=true` (default false, matching
  * Spark's warn-only behavior). The check runs on the ANALYZED plan,
  * where constant keys are still visible (folding happens later).
  * PlanAuditSpec enforces the same invariant mechanically over every
  * gate plan regardless of this conf.
  */
case class GlobalWindowCheck(spark: SparkSession)
    extends (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan => Unit) {
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    if (spark.conf.get("spark.graft.failOnGlobalWindow", "false").toBoolean) {
      plan.foreach {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable) =>
          throw new IllegalStateException(
            "graft guardrail: partition-less window (every row moves through ONE task " +
              s"for the sort at any scale); window expressions: ${w.windowExpressions.map(_.sql).mkString(", ")}. " +
              "Partition by a real key, or use orderBy(...).limit(k) for a single-key top-k."
          )
        case _ => ()
      }
    }
}

/** `spark.sql.extensions` entry point (must live in a class with a
  * no-arg constructor).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectCheckRule(GlobalWindowCheck)
    // materialized-rollup matching (spark.graft.rollupRewrite=true +
    // MaterializedRollups.register) — rewrite matching aggregates to
    // scan the maintained KB-sized store instead of the base table
    ext.injectOptimizerRule(graft.plans.RollupRewrite)
  }
}
