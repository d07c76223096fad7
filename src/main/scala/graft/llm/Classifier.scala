package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** GPT-3-style quality classifier + importance sampling (Brown et al.
  * 2020, App. A): train a logistic-regression classifier to recognize
  * the curated slice of a corpus, score every document, and keep a doc
  * when `score > 1 - pareto(alpha=9)` — the published acceptance rule,
  * made deterministic here with the repo's md5-uniform convention.
  *
  * Features are PRESENCE bits over [[nBuckets]] hashed word-bigram
  * buckets (the [[Dsir]] bucket convention); the positive class is the
  * [[targetSource]] slice. Training is [[iters]] rounds of full-batch
  * gradient descent.
  *
  * Cross-engine exactness (the novel bit): every trained weight lives
  * on the integer-MICRO grid (bigint micro-units of the real weight).
  * Per round, the per-doc probability is rounded to micros
  * (`pm = floor(sigmoid(margin)*1e6 + 0.5)`), so the gradient
  * numerator `sum((pm - 1e6*y) * x_b)` is a pure BIGINT sum —
  * order-independent and exact on both engines — and the weight update
  * `floor(wm - eta*gb/N + 0.5)` is a fixed-order scalar expression with
  * no accumulation. The DuckDB oracle therefore RE-DERIVES the same
  * weights by replaying the unrolled iterations in SQL; the only
  * cross-engine noise is libm `exp` last-ulp under the micro rounding
  * (the filter_response precedent).
  *
  * Scale shape: the feature table is one row-local projection + one
  * (doc, bucket) aggregation, eager-checkpointed once; each training
  * round is one bounded scan whose result is a 65-number gradient
  * (tree-aggregated, collected to the driver) — the classic
  * distributed-LR shape. Scoring embeds the final weights as literals:
  * a projection, no join. At 100 TB the trained weight table is a
  * reusable artifact exactly like a deployed fastText classifier.
  */
object Classifier {

  val nBuckets = 64
  val targetSource = "src0"
  val iters = 3
  // eta = 0.5, embedded as 0.5e0 in both engines' update expressions

  /** sigmoid(sm/1e6) rounded to integer micros; `sm` is a BIGINT
    * micro-margin sub-expression. ONE string parsed by both engines. */
  private def pmExpr(sm: String): String =
    s"CAST(floor(1.0e0 / (1.0e0 + exp(-(CAST($sm AS DOUBLE) / 1.0e6))) * 1.0e6 + 0.5e0) AS BIGINT)"

  /** (doc_id, y, b, cnt): per-doc hashed-bigram bucket counts (cnt
    * feeds only the n_grams output; features are presence bits). */
  def features(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        when(col("source") === targetSource, 1L).otherwise(0L).as("y"),
        split(col("text"), " ").as("toks")
      )
      .filter(size(col("toks")) >= 2)
      .select(
        col("doc_id"),
        col("y"),
        explode(
          expr(s"transform(sequence(1, least(size(toks) - 1, ${TextStats.maxTokens})), i -> " +
            "concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")
        ).as("g")
      )
      .select(
        col("doc_id"),
        col("y"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % nBuckets).as("b")
      )
      .groupBy(col("doc_id"), col("y"), col("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Full-batch GD on the integer-micro grid; (bias, weights) in micros.
    *
    * r17: the bias gradient, row count and per-bucket gradients collect
    * in ONE action per round (bucket −1 carries g0, −2 carries n)
    * instead of two. (A broadcast-join weight table — stable plan,
    * codegen cached across rounds — was measured SLOWER than the
    * literal element_at array: the per-round broadcast build outweighs
    * the per-round janino compile at this stage size. Kept literal.)
    */
  def train(feat: DataFrame): (Long, Array[Long]) = {
    var w0m = 0L
    val wm = Array.fill(nBuckets)(0L)
    for (_ <- 1 to iters) {
      val wLit = array(wm.map(lit(_)): _*)
      val margins = feat
        .groupBy(col("doc_id"), col("y"))
        .agg((lit(w0m) + sum(element_at(wLit, (col("b") + 1).cast("int")))).as("sm"))
        .withColumn("pm", expr(pmExpr("sm")))
        .localCheckpoint(true) // referenced twice below (bias row + join)
      val resid = margins.select(col("doc_id"), (col("pm") - lit(1000000L) * col("y")).as("r"))
      val grads = feat
        .join(resid, "doc_id")
        .groupBy(col("b"))
        .agg(sum(col("r")).as("g"))
        .unionByName(resid.agg(lit(-1L).as("b"), sum(col("r")).as("g")))
        .unionByName(resid.agg(lit(-2L).as("b"), count(lit(1)).as("g")))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      val (g0, n) = (grads(-1L), grads(-2L))
      // identical fixed-order scalar arithmetic to the SQL update CTE
      w0m = math.floor(w0m.toDouble - 0.5 * g0.toDouble / n.toDouble + 0.5).toLong
      for (b <- 0 until nBuckets)
        wm(b) = math.floor(wm(b).toDouble - 0.5 * grads.getOrElse(b.toLong, 0L).toDouble / n.toDouble + 0.5).toLong
    }
    (w0m, wm)
  }

  /** (doc_id, n_grams, score, pred, kept): train on the corpus, score
    * every doc, apply the deterministic pareto acceptance rule. */
  def scores(docs: DataFrame): DataFrame = {
    val feat = features(docs).localCheckpoint(true) // 3 training rounds + scoring read it
    val (w0m, wm) = train(feat)
    val wLit = array(wm.map(lit(_)): _*)
    feat
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_grams"),
        (lit(w0m) + sum(element_at(wLit, (col("b") + 1).cast("int")))).as("sm")
      )
      .withColumn("pm", expr(pmExpr("sm")))
      .select(
        col("doc_id"),
        col("n_grams"),
        (col("pm").cast("double") / lit(1.0e6)).as("score"),
        when(col("pm") >= 500000L, 1).otherwise(0).as("pred"),
        expr(keptFor("spark")).as("kept")
      )
  }

  /** GPT-3 acceptance: keep iff score > 1 - pareto(9) sample, with the
    * pareto draw derived from a deterministic md5-uniform of doc_id via
    * the inverse CDF (u^(-1/9) - 1). The scalar arithmetic is one
    * shared string; only the md5-bucket syntax differs per engine. */
  private def keptFor(engine: String): String = {
    val u =
      if (engine == "spark")
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 1048576"
      else
        "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1048576"
    s"CASE WHEN CAST(pm AS DOUBLE) / 1.0e6 > " +
      s"1.0e0 - (pow(CAST(($u) + 1 AS DOUBLE) / 1048576.0e0, -(1.0e0 / 9.0e0)) - 1.0e0) " +
      "THEN 1 ELSE 0 END"
  }

  /** DuckDB oracle: replays feature extraction, the unrolled training
    * iterations (exact on the integer-micro grid), and scoring. */
  def scoresSql(table: String): String = {
    val sb = new StringBuilder
    sb ++= "WITH tl AS (SELECT doc_id, CASE WHEN source = '" + targetSource +
      "' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y, " +
      s"string_split(text, ' ') AS toks FROM $table), "
    sb ++= "gr AS (SELECT doc_id, y, " +
      "CAST(concat('0x', substr(md5(list_extract(toks, g.i) || ' ' || list_extract(toks, g.i + 1)), 1, 8)) AS BIGINT) " +
      s"% $nBuckets AS b " +
      s"FROM tl, generate_series(1, ${TextStats.maxTokens}) g(i) WHERE len(toks) >= 2 AND g.i <= len(toks) - 1), "
    sb ++= "feat AS MATERIALIZED (SELECT doc_id, y, b, CAST(count(*) AS BIGINT) AS cnt FROM gr GROUP BY doc_id, y, b), "
    sb ++= "nn AS MATERIALIZED (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM feat), "
    sb ++= s"w1 AS MATERIALIZED (SELECT CAST(g.b AS BIGINT) AS b, CAST(0 AS BIGINT) AS wm FROM generate_series(0, ${nBuckets - 1}) g(b)), "
    sb ++= "c1 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS w0m), "
    for (k <- 1 to iters) {
      sb ++= s"m$k AS MATERIALIZED (SELECT f.doc_id, f.y, " +
        pmExpr("c.w0m + sum(w.wm)") +
        s" AS pm FROM feat f JOIN w$k w ON w.b = f.b, c$k c GROUP BY f.doc_id, f.y, c.w0m), "
      sb ++= s"g$k AS MATERIALIZED (SELECT f.b, CAST(sum(m.pm - 1000000 * m.y) AS BIGINT) AS gb " +
        s"FROM feat f JOIN m$k m USING (doc_id) GROUP BY f.b), "
      sb ++= s"w${k + 1} AS MATERIALIZED (SELECT w.b, " +
        "CAST(floor(CAST(w.wm AS DOUBLE) - 0.5e0 * CAST(coalesce(g.gb, 0) AS DOUBLE) / CAST(nn.n AS DOUBLE) + 0.5e0) AS BIGINT) AS wm " +
        s"FROM w$k w LEFT JOIN g$k g ON g.b = w.b, nn), "
      sb ++= s"c${k + 1} AS MATERIALIZED (SELECT " +
        "CAST(floor(CAST(c.w0m AS DOUBLE) - 0.5e0 * CAST(gg.g0 AS DOUBLE) / CAST(nn.n AS DOUBLE) + 0.5e0) AS BIGINT) AS w0m " +
        s"FROM c$k c, (SELECT CAST(sum(pm - 1000000 * y) AS BIGINT) AS g0 FROM m$k) gg, nn), "
    }
    val wf = s"w${iters + 1}"
    val cf = s"c${iters + 1}"
    sb ++= s"sel AS (SELECT f.doc_id, CAST(sum(f.cnt) AS BIGINT) AS n_grams, " +
      pmExpr("c.w0m + sum(w.wm)") +
      s" AS pm FROM feat f JOIN $wf w ON w.b = f.b, $cf c GROUP BY f.doc_id, c.w0m) "
    sb ++= "SELECT doc_id, n_grams, CAST(pm AS DOUBLE) / 1.0e6 AS score, " +
      "CASE WHEN pm >= 500000 THEN 1 ELSE 0 END AS pred, " +
      keptFor("duckdb") + " AS kept FROM sel"
    sb.toString
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_classifier" -> { (s, dir) => scores(Tables.documents(s, dir)) }
  )

  def oracleSql: Map[String, String] = Map(
    "quality_classifier" -> scoresSql("documents")
  )
}
