package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data Selection with Importance Resampling (Xie et al., NeurIPS
  * 2023): score every raw document by its log importance weight
  * log p_target(doc) − log p_raw(doc) under bag-of-hashed-ngram
  * models — the standard cheap way to tilt a web-scale corpus toward
  * a target domain without training a classifier.
  *
  * Here the features are hashed word BIGRAMS (DSIR's default) bucketed
  * to [[nBuckets]] via the repo's deterministic md5 bucket (the
  * Curation.md5Bucket convention — identical arithmetic in DuckDB), and
  * the target distribution is the [[targetSource]] slice of the corpus
  * itself; both models use add-one smoothing over the bucket space.
  * Docs shorter than 2 tokens emit no row (filtered BEFORE the index
  * sequence — Spark's descending-sequence crash class).
  *
  * Scale shape: ONE pass over the gram stream builds both bucket
  * tables as a conditional aggregate (raw count + target count per
  * bucket — ≤ [[nBuckets]] rows, broadcast back); totals derive from
  * that bounded table, not a second corpus scan. The per-doc weight
  * sum is the one data-sized exchange. At 100 TB the target table is a
  * trained-once artifact exactly like a fastText/DSIR deployment.
  */
object Dsir {

  val nBuckets = 256
  val targetSource = "src0"

  /** (doc_id, source, b): hashed-bigram bucket stream, row-local. */
  private def grams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(
        col("doc_id"),
        col("source"),
        explode(
          expr(s"transform(sequence(1, least(size(toks) - 1, ${TextStats.maxTokens})), i -> " +
            "concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")
        ).as("g")
      )
      .select(
        col("doc_id"),
        col("source"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % nBuckets).as("b")
      )

  def weights(docs: DataFrame): DataFrame = {
    // scan fan-out (guide §2.5): both consumers of the gram stream do
    // their per-token md5 work before any exchange — single-file input
    // pins it to one task (measured r17: 2.1→1.5 s at sf0.1; no-op on
    // many-split production tables)
    val g = grams(Tables.fan(docs, "doc_id"))
    val counts = g
      .groupBy(col("b"))
      .agg(
        count(lit(1)).as("cr"),
        sum(when(col("source") === targetSource, 1L).otherwise(0L)).as("ct")
      )
    // totals from the ≤nBuckets-row table (1-row broadcast side — the
    // text_bm25 corpus-stats shape, allowlisted in PlanAuditSpec)
    val tot = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val table = counts
      .crossJoin(broadcast(tot))
      .select(
        col("b"),
        (log((col("ct") + 1).cast("double") / (col("nt") + nBuckets).cast("double")) -
          log((col("cr") + 1).cast("double") / (col("nr") + nBuckets).cast("double"))).as("lr")
      )
    g.join(broadcast(table), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        graft.core.Dsp.round6(sum(col("lr"))).as("log_weight")
      )
  }

  // def, not val: weightsSelect is declared below — a val here would
  // capture it as null during object initialization (found r7: the
  // dumped oracle string ended in "null" and DuckDB refused to parse)
  def weightsSql: String = "WITH " + weightsCtes("documents") + " " + weightsSelect

  /** CTE chain (tl/gr/c/t/tab) computing the weight table from `table`;
    * compose with [[weightsSelect]] or embed in a larger oracle. */
  def weightsCtes(table: String): String =
    s"tl AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM $table), " +
      "gr AS MATERIALIZED (SELECT doc_id, source, " +
      "CAST(concat('0x', substr(md5(list_extract(toks, g.i) || ' ' || list_extract(toks, g.i + 1)), 1, 8)) AS BIGINT) " +
      s"% $nBuckets AS b " +
      s"FROM tl, generate_series(1, ${TextStats.maxTokens}) g(i) WHERE len(toks) >= 2 AND g.i <= len(toks) - 1), " +
      "c AS MATERIALIZED (SELECT b, count(*) AS cr, " +
      s"CAST(sum(CASE WHEN source = '$targetSource' THEN 1 ELSE 0 END) AS BIGINT) AS ct FROM gr GROUP BY b), " +
      "t AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM c), " +
      s"tab AS (SELECT b, ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + $nBuckets AS DOUBLE)) - " +
      s"ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + $nBuckets AS DOUBLE)) AS lr FROM c, t)"

  val weightsSelect: String =
    "SELECT doc_id, count(*) AS n_grams, " +
      s"${graft.core.Dsp.round6Sql("sum(lr)")} AS log_weight " +
      "FROM gr JOIN tab USING (b) GROUP BY doc_id"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_dsir" -> { (s, dir) => weights(Tables.documents(s, dir)) }
  )

  def oracleSql: Map[String, String] = Map(
    "sample_dsir" -> weightsSql
  )
}
