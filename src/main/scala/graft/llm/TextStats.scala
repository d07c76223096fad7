package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis operators for training-data pipelines over `documents`:
  * token counting, language-ID heuristic, quality scoring, document
  * fingerprinting. All row-local or one-aggregation plans — at corpus
  * scale these are pure map-side work plus one shuffle at most.
  */
object TextStats {

  /** Tokenization shared by the text/dedup operators: whitespace split,
    * positional. Both engines index the split array 1-based via an
    * exploded index sequence (DuckDB's generate_series cannot take
    * lateral args, so the SQL twin cross-joins a fixed range and
    * filters).
    */
  val maxTokens = 1024

  def tokens(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        col("toks"),
        explode(sequence(lit(1), least(size(col("toks")), lit(maxTokens)))).as("i")
      )
      .select(col("doc_id"), col("i"), element_at(col("toks"), col("i")).as("tok"))

  val tokensSql: String =
    s"toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
      s"tokens AS (SELECT doc_id, g.i AS i, list_extract(toks, g.i) AS tok " +
      s"FROM toks, generate_series(1, $maxTokens) g(i) WHERE g.i <= len(toks))"

  /** Word w-shingles (w=3), keeping position. */
  def shingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        col("toks"),
        explode(
          sequence(lit(1), greatest(least(size(col("toks")) - 2, lit(maxTokens)), lit(0)))
        ).as("i")
      )
      .select(
        col("doc_id"),
        col("i"),
        concat_ws(
          " ",
          element_at(col("toks"), col("i")),
          element_at(col("toks"), col("i") + 1),
          element_at(col("toks"), col("i") + 2)
        ).as("sh")
      )

  val shinglesSql: String =
    s"toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
      s"shingles AS (SELECT doc_id, g.i AS i, " +
      "list_extract(toks, g.i) || ' ' || list_extract(toks, g.i + 1) || ' ' || list_extract(toks, g.i + 2) AS sh " +
      s"FROM toks, generate_series(1, $maxTokens) g(i) WHERE g.i <= len(toks) - 2)"

  private val stopwords =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for", "on", "with")
  private def stopInSql = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> { (s, dir) =>
      Tables
        .documents(s, dir)
        .select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          size(split(col("text"), " ")).as("n_ws"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n_alpha")
        )
    },
    "text_langid" -> { (s, dir) =>
      tokens(Tables.documents(s, dir))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_tok"),
          sum(when(col("tok").isin(stopwords: _*), 1L).otherwise(0L)).as("n_stop")
        )
        .select(
          col("doc_id"),
          col("n_tok"),
          col("n_stop"),
          round(col("n_stop") / col("n_tok"), 6).as("stop_ratio"),
          when(col("n_stop") / col("n_tok") > 0.04, "en").otherwise("unk").as("lang_pred")
        )
    },
    "text_quality" -> { (s, dir) =>
      val nTok = size(split(col("text"), " ")).cast("double")
      val nChars = length(col("text")).cast("double")
      val nDigit = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
      val nPunct = length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double")
      val awl = (nChars - (nTok - 1)) / nTok
      val score = greatest(
        lit(0.0),
        least(lit(1.0), lit(0.5) + lit(0.1) * (awl - 4.0) - nDigit / nChars - nPunct / nChars)
      )
      Tables
        .documents(s, dir)
        .select(
          col("doc_id"),
          graft.core.Dsp.round6(awl).as("avg_word_len"),
          graft.core.Dsp.round6(nDigit / nChars).as("digit_ratio"),
          graft.core.Dsp.round6(nPunct / nChars).as("punct_ratio"),
          graft.core.Dsp.round6(score).as("quality")
        )
    },
    "text_fingerprint" -> { (s, dir) =>
      shingles(Tables.documents(s, dir))
        .groupBy(col("doc_id"))
        .agg(min(md5(col("sh"))).as("fp"), count(lit(1)).as("n_shingles"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "text_tokens" ->
      ("SELECT doc_id, length(text) AS n_chars, len(string_split(text, ' ')) AS n_ws, " +
        "len(regexp_extract_all(text, '[a-z]+')) AS n_alpha FROM documents"),
    // CAST the integer sum to BIGINT: DuckDB sum(int) yields HUGEINT,
    // which pandas renders as float64 ("7.0" vs "7" → hash mismatch).
    "text_langid" ->
      (s"WITH $tokensSql, agg AS (SELECT doc_id, count(*) AS n_tok, " +
        s"CAST(sum(CASE WHEN tok IN $stopInSql THEN 1 ELSE 0 END) AS BIGINT) AS n_stop FROM tokens GROUP BY doc_id) " +
        "SELECT doc_id, n_tok, n_stop, round(n_stop / n_tok, 6) AS stop_ratio, " +
        "CASE WHEN n_stop / n_tok > 0.04e0 THEN 'en' ELSE 'unk' END AS lang_pred FROM agg"),
    "text_quality" ->
      ("WITH base AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS n_chars, " +
        "CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok, " +
        "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digit, " +
        "CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS n_punct FROM documents) " +
        s"SELECT doc_id, ${graft.core.Dsp.round6Sql("(n_chars - (n_tok - 1)) / n_tok")} AS avg_word_len, " +
        s"${graft.core.Dsp.round6Sql("n_digit / n_chars")} AS digit_ratio, ${graft.core.Dsp.round6Sql("n_punct / n_chars")} AS punct_ratio, " +
        s"${graft.core.Dsp.round6Sql("greatest(0.0e0, least(1.0e0, 0.5e0 + 0.1e0 * ((n_chars - (n_tok - 1)) / n_tok - 4.0e0) " +
        "- n_digit / n_chars - n_punct / n_chars))")} AS quality FROM base"),
    "text_fingerprint" ->
      (s"WITH $shinglesSql " +
        "SELECT doc_id, min(md5(sh)) AS fp, count(*) AS n_shingles FROM shingles GROUP BY doc_id")
  )
}
