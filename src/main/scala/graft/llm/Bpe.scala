package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Byte-pair-encoding subword tokenization (Sennrich et al. 2016) —
  * real token budgets for the packing/mixture arithmetic that
  * `text_pack`/`sample_mix` consume (whitespace counts misestimate
  * subword counts by 1.3–2× on natural text).
  *
  * Design for cross-engine parity: the merge table derives
  * DETERMINISTICALLY from the corpus (top-`vocabLimit` words by
  * (count DESC, word ASC), then `nMerges` rounds of
  * most-frequent-adjacent-pair with (count DESC, pair ASC) tie-break),
  * so the DuckDB oracle re-derives the identical table from the same
  * parquet — the pqCodebooks first-k-vectors pattern. Training state is
  * a sep-joined symbol string per word; a merge rewrites ALL
  * occurrences via left-to-right non-overlapping `replace` (identical
  * semantics in java.lang.String and DuckDB). Application replays the
  * merges IN TRAINING ORDER (the learn-time rewrite semantics) — a
  * fold of `nMerges` replaces, no recursion — via the row-local
  * [[graft.functions.BpeCount]] expression on the Spark side and
  * nested `replace()` in the oracle.
  *
  * Scale: training collects one BOUNDED word-frequency table
  * (`vocabLimit` rows — TakeOrdered, never the corpus) and iterates
  * driver-side over ≤ vocabLimit short strings; application is a pure
  * projection off the scan (no shuffle), and the per-doc count
  * aggregation is the only exchange. At 100 TB the merge table is a
  * trained-once artifact shipped as literals — exactly how production
  * tokenizers deploy their merges.txt.
  */
object Bpe {

  val nMerges = 32
  val vocabLimit = 512

  /** Symbol separator inside training state: below any corpus
    * character (text is split on U+0020 space, so tokens never contain
    * it). U+001E is the never-matching sentinel standing in for a merge
    * when a degenerate corpus runs out of pairs.
    */
  val sep = "\u001F"
  val sepChar = '\u001F'
  val nope = "\u001E"

  /** Deterministic BPE trainer over a (word, freq) table. Returns the
    * merge list as sep-joined pair strings, length exactly [[nMerges]]
    * (padded with [[nope]] when a tiny corpus exhausts its pairs —
    * mirroring the oracle's empty-best coalesce).
    */
  def train(words: Seq[(String, Long)]): Seq[String] = {
    var st: Array[(String, Long)] = words.map { case (w, f) =>
      val sb = new java.lang.StringBuilder(w.length * 2)
      var ci = 0
      while (ci < w.length) {
        val cp = w.codePointAt(ci)
        if (ci > 0) sb.append(sep)
        sb.appendCodePoint(cp)
        ci += Character.charCount(cp)
      }
      (sb.toString, f)
    }.toArray
    val merges = Seq.newBuilder[String]
    for (_ <- 0 until nMerges) {
      val pc = scala.collection.mutable.HashMap.empty[String, Long]
      for ((s, f) <- st) {
        val syms = s.split(sepChar)
        var i = 0
        while (i < syms.length - 1) {
          val p = syms(i) + sep + syms(i + 1)
          pc.update(p, pc.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (pc.isEmpty) merges += nope
      else {
        // (count DESC, pair ASC): sep < every corpus char, so comparing
        // the joined pair string equals comparing the (l, r) tuple
        val best = pc.toSeq.minBy { case (p, c) => (-c, p) }._1
        merges += best
        val m = best.replace(sep, "")
        st = st.map { case (s, f) => (s.replace(best, m), f) }
      }
    }
    merges.result()
  }

  /** Gate-config merges: trained on the dir's own documents through the
    * deterministic (count DESC, word ASC) top-[[vocabLimit]] vocabulary
    * — one bounded driver collect, the pqCodebooks shape.
    */
  def gateMerges(docs: DataFrame): Seq[String] = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok").asc)
      .limit(vocabLimit)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    train(words.toSeq)
  }

  /** (doc_id, n_ws, n_bpe): whitespace-token and BPE-subword counts per
    * document. n_bpe ≥ n_ws always (every word is ≥ 1 subword).
    */
  def tokensBpe(docs: DataFrame): DataFrame = {
    val merges = gateMerges(docs)
    docs.select(
      col("doc_id"),
      size(filter(split(col("text"), " "), t => t =!= "")).cast("bigint").as("n_ws"),
      graft.functions.exprs.bpe_count(split(col("text"), " "), merges).as("n_bpe")
    )
  }

  /** DuckDB trainer + per-doc-count CTE chain, shared by every
    * BPE-budgeted oracle: [[nMerges]] stages of pair-count → argmax →
    * replace-rewrite, application as nested replace() over every
    * distinct word, ending in `agg` = (doc_id, n_ws, n_bpe).
    */
  private def bpeCtes: Seq[String] = {
    val SEP = "chr(31)"
    val NOPE = "chr(30)"
    val parts = Seq.newBuilder[String]
    parts += "toks AS MATERIALIZED (SELECT doc_id, u.tok AS tok FROM documents, " +
      "unnest(string_split(text, ' ')) AS u(tok) WHERE u.tok <> '')"
    parts += s"vocab AS MATERIALIZED (SELECT tok AS word, count(*) AS freq FROM toks " +
      s"GROUP BY tok ORDER BY freq DESC, word ASC LIMIT $vocabLimit)"
    parts += s"st0 AS MATERIALIZED (SELECT array_to_string(string_split(word, ''), $SEP) AS syms, freq FROM vocab)"
    for (r <- 0 until nMerges) {
      val l = s"string_split(syms, $SEP)"
      val pairs = s"list_transform(generate_series(1, len($l) - 1), i -> $l[i] || $SEP || $l[i + 1])"
      parts += s"pc$r AS (SELECT u.p AS p, sum(freq) AS c FROM st$r, unnest($pairs) AS u(p) GROUP BY u.p)"
      parts += s"b$r AS MATERIALIZED (SELECT p, replace(p, $SEP, '') AS m FROM pc$r ORDER BY c DESC, p ASC LIMIT 1)"
      if (r < nMerges - 1)
        parts += s"st${r + 1} AS MATERIALIZED (SELECT replace(syms, coalesce((SELECT p FROM b$r), $NOPE), " +
          s"coalesce((SELECT m FROM b$r), $NOPE)) AS syms, freq FROM st$r)"
    }
    var app = s"array_to_string(string_split(word, ''), $SEP)"
    for (r <- 0 until nMerges)
      app = s"replace($app, coalesce((SELECT p FROM b$r), $NOPE), coalesce((SELECT m FROM b$r), $NOPE))"
    parts += s"app AS MATERIALIZED (SELECT word, len(string_split($app, $SEP)) AS n_sub " +
      "FROM (SELECT DISTINCT tok AS word FROM toks))"
    // CAST: DuckDB sum(BIGINT) yields HUGEINT → float64 in the row canon
    parts += "agg AS (SELECT t.doc_id AS doc_id, count(*) AS n_ws, CAST(sum(a.n_sub) AS BIGINT) AS n_bpe " +
      "FROM toks t JOIN app a ON t.tok = a.word GROUP BY t.doc_id)"
    parts.result()
  }

  val tokensBpeSql: String =
    "WITH " + bpeCtes.mkString(", ") +
      " SELECT d.doc_id AS doc_id, coalesce(g.n_ws, 0) AS n_ws, coalesce(g.n_bpe, 0) AS n_bpe " +
      "FROM documents d LEFT JOIN agg g ON d.doc_id = g.doc_id"

  /** The tokenizer's SEGMENTATION surface — what a packing-aware data
    * loader actually consumes: per doc the encoded form (subword
    * pieces joined by U+001F within words, words by ' ') hashed to a
    * scalar, the piece count, and the in-plan DECODE IDENTITY witness
    * `decode_ok` = [strip every U+001F → original text]. Both engines
    * build the encoded string with the same training-order replace
    * chain (per-token on Spark, whole-text in the oracle — equivalent
    * because merge patterns contain no space, so no occurrence spans a
    * word boundary), so `enc_md5` pins the exact segmentation, not
    * just its count. Row-local projection; no shuffle beyond the
    * bounded trainer collect.
    */
  def segmentsBpe(docs: DataFrame): DataFrame = {
    val merges = gateMerges(docs)
    val toks = split(col("text"), " ")
    val enc = graft.functions.exprs.bpe_encode(toks, merges)
    docs.select(
      col("doc_id"),
      graft.functions.exprs.bpe_count(toks, merges).as("n_pieces"),
      md5(enc.cast("binary")).as("enc_md5"),
      (translate(enc, sep, "") === col("text")).as("decode_ok")
    )
  }

  val segmentsBpeSql: String = {
    val SEP = "chr(31)"
    val NOPE = "chr(30)"
    // sep-join each word's characters, rejoin words with ' ' (empty
    // words survive as empty strings → exact spacing preserved), then
    // the same 32-stage replace chain the per-word app CTE uses —
    // patterns never contain a space, so whole-text replace ≡ per-word
    var e = s"array_to_string(list_transform(string_split(text, ' '), w -> " +
      s"array_to_string(string_split(w, ''), $SEP)), ' ')"
    for (r <- 0 until nMerges)
      e = s"replace($e, coalesce((SELECT p FROM b$r), $NOPE), coalesce((SELECT m FROM b$r), $NOPE))"
    "WITH " + bpeCtes.mkString(", ") +
      s", enc AS (SELECT d.doc_id AS doc_id, d.text AS text, $e AS e FROM documents d) " +
      "SELECT e.doc_id AS doc_id, coalesce(g.n_bpe, 0) AS n_pieces, md5(e.e) AS enc_md5, " +
      s"(replace(e.e, $SEP, '') = e.text) AS decode_ok " +
      "FROM enc e LEFT JOIN agg g ON e.doc_id = g.doc_id"
  }

  /** Sequence packing budgeted in REAL subword tokens — the text_pack
    * arithmetic (8 salted streams, 256-token bins) with the document
    * length measured by the trained BPE instead of whitespace words.
    * This is the count a data loader actually packs by: whitespace
    * budgeting under-fills bins by the subword inflation factor.
    * Integer-only on top of the per-doc BPE count, so the only float
    * surface is none; the merge-table projection adds no shuffle — the
    * salt window is the one exchange (same shape as text_pack).
    */
  val packCap = 256
  val packSalts = 8

  def packBpe(docs: DataFrame, cap: Int = packCap, nSalts: Int = packSalts): DataFrame = {
    val merges = gateMerges(docs)
    val dl = least(
      graft.functions.exprs.bpe_count(split(col("text"), " "), merges),
      lit(TextStats.maxTokens)
    ).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("salt"))
      .orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .select(col("doc_id"), (col("doc_id") % nSalts).as("salt"), dl.as("dl"))
      .select(col("doc_id"), col("salt"), col("dl"), (sum(col("dl")).over(w) - col("dl")).as("start"))
      .select(
        col("doc_id"),
        col("salt"),
        col("dl").as("n_tok"),
        expr(s"start div $cap").as("bin_id"),
        (col("start") % cap).as("bin_offset")
      )
  }

  def packBpeSql(cap: Int = packCap, nSalts: Int = packSalts): String =
    "WITH " + bpeCtes.mkString(", ") +
      s", d2 AS (SELECT d.doc_id AS doc_id, d.doc_id % $nSalts AS salt, " +
      s"CAST(least(coalesce(g.n_bpe, 0), ${TextStats.maxTokens}) AS BIGINT) AS dl " +
      "FROM documents d LEFT JOIN agg g ON d.doc_id = g.doc_id), " +
      "s AS (SELECT doc_id, salt, dl, CAST(sum(dl) OVER (PARTITION BY salt ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - dl AS start FROM d2) " +
      s"SELECT doc_id, salt, dl AS n_tok, start // $cap AS bin_id, start % $cap AS bin_offset FROM s"

  /** Temperature mixture weights budgeted in REAL subword tokens: the
    * sample_mix per-source deterministic sampling, but n^α is computed
    * over the SUM OF BPE TOKENS of the kept docs, not the doc count —
    * the quantity a trainer's sampler actually normalizes by (doc-count
    * weighting over-weights short-doc sources by their length skew).
    * Same scale shape as sample_mix: one corpus aggregation, a bounded
    * per-source table, the 1-row normalizer broadcast back.
    */
  def mixBpe(docs: DataFrame, alpha: Double = 0.7): DataFrame = {
    val merges = gateMerges(docs)
    val h1000 = conv(
      substring(md5(concat(col("doc_id").cast("string"), lit(":"), col("source"))), 1, 8),
      16,
      10
    ).cast("long") % 1000
    val rate = when(col("source") === "src0", 900)
      .when(col("source") === "src1", 500)
      .when(col("source") === "src2", 250)
      .otherwise(100)
    val nBpe = graft.functions.exprs.bpe_count(split(col("text"), " "), merges)
    val perSource = docs
      .select(col("source"), (h1000 < rate).as("kept"), nBpe.as("nb"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("nb")).otherwise(0L)).as("tok_kept")
      )
    val tot = perSource
      .agg(sum(pow(col("tok_kept"), alpha)).as("wsum"))
      .withColumn("k", lit(1))
    perSource
      .withColumn("k", lit(1))
      .join(broadcast(tot), Seq("k"))
      .select(
        col("source"),
        col("n_kept"),
        col("tok_kept"),
        graft.core.Dsp.round6(pow(col("tok_kept"), alpha) / col("wsum")).as("mix_weight")
      )
  }

  def mixBpeSql(alpha: Double = 0.7): String = {
    val h = "CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.source), 1, 8)) AS BIGINT) % 1000"
    val rate = "CASE d.source WHEN 'src0' THEN 900 WHEN 'src1' THEN 500 WHEN 'src2' THEN 250 ELSE 100 END"
    val a = graft.core.Dsp.lit(alpha)
    "WITH " + bpeCtes.mkString(", ") +
      s", k AS (SELECT d.source AS source, CAST(sum(CASE WHEN $h < $rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
      s"CAST(sum(CASE WHEN $h < $rate THEN coalesce(g.n_bpe, 0) ELSE 0 END) AS BIGINT) AS tok_kept " +
      "FROM documents d LEFT JOIN agg g ON d.doc_id = g.doc_id GROUP BY d.source) " +
      "SELECT source, n_kept, tok_kept, " +
      s"${graft.core.Dsp.round6Sql(s"pow(tok_kept, $a) / sum(pow(tok_kept, $a)) OVER ()")} AS mix_weight FROM k"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens_bpe" -> { (s, dir) => tokensBpe(Tables.documents(s, dir)) },
    "text_bpe_segments" -> { (s, dir) => segmentsBpe(Tables.documents(s, dir)) },
    "text_pack_bpe" -> { (s, dir) => packBpe(Tables.documents(s, dir)) },
    "sample_mix_bpe" -> { (s, dir) => mixBpe(Tables.documents(s, dir)) }
  )

  def oracleSql: Map[String, String] = Map(
    "text_tokens_bpe" -> tokensBpeSql,
    "text_bpe_segments" -> segmentsBpeSql,
    "text_pack_bpe" -> packBpeSql(),
    "sample_mix_bpe" -> mixBpeSql()
  )
}
