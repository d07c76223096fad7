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

  /** GPT-2's byte-to-unicode remap (Radford et al. 2019; the
    * `bytes_to_unicode` table every GPT-lineage tokenizer ships):
    * printable bytes — '!'..'~', '¡'..'¬', '®'..'ÿ' — map to their own
    * code point, every other byte (controls, space, 0x80–0xA0, 0xAD)
    * to 256+n in ascending byte order. The result is a BIJECTION from
    * bytes to 256 distinct printable single-UTF-16-char code points,
    * which makes byte-level BPE state ordinary strings the ENTIRE
    * existing trainer/encoder/oracle machinery runs on unchanged —
    * and lossless on ANY input, where char-level BPE documents its
    * ASCII/codepoint divergence (dedup_edit note).
    */
  private[graft] val byteToUnicode: Array[Char] = {
    val out = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      val keep = (b >= '!' && b <= '~') || (b >= 0xa1 && b <= 0xac) || (b >= 0xae && b <= 0xff)
      if (keep) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }
  private[graft] val unicodeToByte: Map[Char, Byte] =
    byteToUnicode.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** UTF-8 bytes of `s`, each remapped through [[byteToUnicode]]. */
  private[graft] def remapBytes(s: String): String = {
    val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bs.length)
    var i = 0
    while (i < bs.length) { sb.append(byteToUnicode(bs(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Inverse of [[remapBytes]]; chars outside the remap image (the
    * space separators a word-joined encode keeps raw, and the U+001F
    * piece marker) pass through as themselves, so
    * unremap(concat_ws(' ', remap(tok))) recovers the original text.
    */
  private[graft] def unremapBytes(s: String): String = {
    val buf = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      unicodeToByte.get(c) match {
        case Some(b) => buf.write(b & 0xff)
        case None =>
          // pass-through by CODE POINT (remap output never contains
          // astral chars, but a general caller's pass-through must not
          // split a surrogate pair into two replacement bytes)
          val cp = s.codePointAt(i)
          val one = new String(Character.toChars(cp))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          buf.write(one, 0, one.length)
          i += Character.charCount(cp) - 1
      }
      i += 1
    }
    new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Code-point string comparison — the order Spark's UTF8String
    * binary comparison AND DuckDB's default collation both implement.
    * Java String.compareTo is UTF-16 code-UNIT order, which diverges
    * for strings mixing supplementary code points (≥ U+10000, whose
    * high surrogates sort at 0xD800) with chars in U+E000–U+FFFF —
    * the sequential trainer must tie-break in the SAME order as the
    * distributed trainer's `orderBy(p.asc)` or the pinned
    * batch ≡ sequential guarantee silently breaks on such vocabularies.
    */
  private[llm] def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Deterministic BPE trainer over a (word, freq) table. Returns the
    * merge list as sep-joined pair strings, length exactly [[nMerges]]
    * (padded with [[nope]] when a tiny corpus exhausts its pairs —
    * mirroring the oracle's empty-best coalesce).
    */
  def train(words: Seq[(String, Long)], n: Int = nMerges): Seq[String] = {
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
    for (_ <- 0 until n) {
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
        // (count DESC, pair ASC in CODE-POINT order — [[cpCompare]],
        // matching the distributed trainer's binary orderBy and the
        // DuckDB oracle's collation): sep < every corpus char, so
        // comparing the joined pair string equals comparing the (l, r)
        // tuple
        var best: String = null
        var bestC = Long.MinValue
        for ((p, c) <- pc)
          if (c > bestC || (c == bestC && cpCompare(p, best) < 0)) { best = p; bestC = c }
        merges += best
        val m = best.replace(sep, "")
        st = st.map { case (s, f) => (s.replace(best, m), f) }
      }
    }
    merges.result()
  }

  /** Full word-frequency table of a documents frame — the distributed
    * trainer's input (NO vocab cap: the state the trainer iterates is
    * vocab-sized, so it never needs the gate's top-[[vocabLimit]]
    * driver collect).
    */
  def vocabDf(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Distributed merge-BATCH trainer — the realistic-merge-count
    * counterpart of [[train]] (which collects a bounded vocabulary and
    * iterates driver-side). State is the sep-joined symbol table
    * (word-vocabulary-sized, NEVER the corpus); each round costs one
    * distributed pair-count aggregation (explode adjacent symbol pairs
    * weighted by word freq → one map-side-combined sum → bounded
    * TakeOrdered top-`topK`) plus one bounded safety scan, and applies
    * a BATCH of merges — so `n` merges need far fewer than `n` corpus
    * passes while the merge table stays EXACTLY what `n` sequential
    * argmax rounds would produce (BpeTrainSpec pins equality).
    *
    * Sequential-equivalence argument (each round):
    *   - accept ranked candidates until the first that could INTERACT
    *     with an already-accepted merge (share/overlap its symbols or
    *     contain its merged string): a non-interacting pair's count is
    *     unchanged by the earlier merges of the batch, because replace
    *     sites can only consume an occurrence of pair (x, y) when
    *     x ends with a (site overlap / right fusion covers y) or
    *     x starts with b / y ends with a (boundary fusion) — the scan
    *     predicate is a superset of those conditions;
    *   - every pair NOT accepted (interacting, ranked below the stop
    *     point, or outside the top-K) has old count ≤ `stopC`, and any
    *     pair CREATED by an accepted merge inherits ≤ the old count of
    *     some interacting pair ≤ stopC — so keeping only accepted
    *     counts STRICTLY > stopC guarantees each accepted pair is
    *     still the (count DESC, pair ASC) argmax at its turn;
    *   - counts can only INCREASE for pairs whose symbol contains an
    *     accepted merged string as a substring (new occurrences appear
    *     at replace sites); one bounded distributed check rejects any
    *     batch merge whose merged string already occurs inside an
    *     existing symbol, eliminating that case entirely;
    *   - ties: equal-count accepted pairs are mutually non-interacting
    *     and ranked pair-ASC — exactly sequential's tie order.
    *   A round that can safely batch nothing falls back to the single
    *   snapshot argmax, which is sequential-exact by definition.
    *
    * Returns exactly `n` merges, [[nope]]-padded when the vocabulary
    * exhausts its pairs (the sequential trainer's padding).
    */
  def trainDistributed(
      words: DataFrame,
      n: Int,
      topK: Int = 256,
      onRound: Int => Unit = _ => ()
  ): Seq[String] = {
    var st = words
      .select(regexp_replace(col("word"), "(?<=.)(?=.)", sep).as("syms"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[String]
    var got = 0
    var exhausted = false
    while (got < n && !exhausted) {
      val arr = split(col("syms"), sep)
      val cand = st
        .filter(size(arr) >= 2) // sequence(1, 0) DESCENDS — filter first (CLAUDE.md)
        .select(
          explode(
            transform(
              sequence(lit(1), size(arr) - 1),
              i => concat(element_at(arr, i), lit(sep), element_at(arr, i + 1))
            )
          ).as("p"),
          col("freq")
        )
        .groupBy(col("p"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("p").asc)
        .limit(topK)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
      if (cand.isEmpty) exhausted = true
      else {
        val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var stopC = if (cand.length == topK) cand.last._2 else 0L
        var stopped = false
        for ((p, c) <- cand if !stopped) {
          val k = p.indexOf(sepChar)
          val (a, b) = (p.substring(0, k), p.substring(k + 1))
          val interacts = acc.exists { case (aj, bj, _) =>
            val mj = aj + bj
            a.contains(mj) || b.contains(mj) || a.startsWith(bj) || b.endsWith(aj) ||
            (a.endsWith(aj) && b.startsWith(bj))
          }
          if (interacts) { stopC = math.max(stopC, c); stopped = true }
          else acc += ((a, b, c))
        }
        var batch = acc.filter(_._3 > stopC).take(n - got).toSeq
        if (batch.length > 1) {
          // count-increase guard: truncate at the first merge whose
          // merged string already occurs INSIDE an existing symbol
          val checks = batch.map { case (a, b, _) =>
            max(when(exists(arr, s => s.contains(a + b)), 1).otherwise(0))
          }
          val row = st.agg(checks.head, checks.tail: _*).collect()(0)
          val bad = batch.indices.indexWhere(i => row.getInt(i) == 1)
          if (bad >= 0) batch = batch.take(math.max(bad, 1))
        }
        if (batch.isEmpty) {
          val (p, c) = cand.head
          val k = p.indexOf(sepChar)
          batch = Seq((p.substring(0, k), p.substring(k + 1), c))
        }
        var rewritten: org.apache.spark.sql.Column = col("syms")
        for ((a, b, _) <- batch) {
          rewritten = regexp_replace(
            rewritten,
            java.util.regex.Pattern.quote(a + sep + b),
            java.util.regex.Matcher.quoteReplacement(a + b)
          )
        }
        // checkpoint EVERY round: the next round's pair count and the
        // safety scan both re-read the state, and measured at the 200k-
        // word decade the re-evaluated regexp chain of a lazier cadence
        // costs more than the checkpoint job (290 s vs 462 s per 1000
        // merges at every-8-rounds)
        st = st.select(rewritten.as("syms"), col("freq")).localCheckpoint()
        batch.foreach { case (a, b, _) => merges += (a + sep + b) }
        got += batch.length
        onRound(batch.length)
      }
    }
    val out = merges.result()
    out ++ Seq.fill(n - out.length)(nope)
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

  /** (doc_id, n_ws, n_bpe) under an EXPLICIT merge table — the
    * production shape: the table is a trained-once artifact (e.g.
    * [[trainDistributed]]'s output at realistic merge counts) shipped
    * into the row-local projection, exactly how deployed tokenizers
    * carry their merges.txt. Encode cost is per-DISTINCT-word thanks
    * to the [[graft.functions.BpeRewriter]] memo, so 1000-merge tables
    * encode at near-32-merge throughput on Zipfian corpora.
    */
  def tokensBpeWith(docs: DataFrame, merges: Seq[String]): DataFrame =
    docs.select(
      col("doc_id"),
      size(filter(split(col("text"), " "), t => t =!= "")).cast("bigint").as("n_ws"),
      graft.functions.exprs.bpe_count(split(col("text"), " "), merges).as("n_bpe")
    )

  /** (doc_id, n_ws, n_bpe): whitespace-token and BPE-subword counts per
    * document. n_bpe ≥ n_ws always (every word is ≥ 1 subword).
    */
  def tokensBpe(docs: DataFrame): DataFrame =
    tokensBpeWith(docs, gateMerges(docs))

  /** Per-language tokenizer FERTILITY table — the "how expensive is
    * this tokenizer on each language" diagnostic every multilingual
    * data recipe reports (subwords per word, chars per subword; cf.
    * the fertility tables in the XLM-R / BLOOM tokenizer analyses):
    * one documents scan computing the whitespace/BPE counts row-local
    * (the [[tokensBpe]] expressions inline — no self-join back to the
    * scan), one lang-keyed aggregation. Ratios guard their zero
    * denominators (wpli precedent) and integer sums divide once at the
    * end, so the only float op is the final round6 division.
    */
  def corpusFertility(docs: DataFrame): DataFrame = {
    val merges = gateMerges(docs)
    docs
      .select(
        col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        size(filter(split(col("text"), " "), t => t =!= "")).cast("bigint").as("n_ws"),
        graft.functions.exprs.bpe_count(split(col("text"), " "), merges).as("n_bpe")
      )
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("n_ws"),
        sum(col("n_bpe")).as("n_bpe"),
        graft.core.Dsp
          .round6(
            when(sum(col("n_ws")) === 0, lit(0.0))
              .otherwise(sum(col("n_bpe")).cast("double") / sum(col("n_ws")).cast("double"))
          )
          .as("fertility"),
        graft.core.Dsp
          .round6(
            when(sum(col("n_bpe")) === 0, lit(0.0))
              .otherwise(sum(col("n_chars")).cast("double") / sum(col("n_bpe")).cast("double"))
          )
          .as("chars_per_tok")
      )
  }

  /** DuckDB trainer + per-doc-count CTE chain, shared by every
    * BPE-budgeted oracle: [[nMerges]] stages of pair-count → argmax →
    * replace-rewrite, application as nested replace() over every
    * distinct word, ending in `agg` = (doc_id, n_ws, n_bpe).
    */
  private[llm] def bpeCtes(src: String = "documents"): Seq[String] = {
    val SEP = "chr(31)"
    val NOPE = "chr(30)"
    val parts = Seq.newBuilder[String]
    parts += s"toks AS MATERIALIZED (SELECT doc_id, u.tok AS tok FROM $src, " +
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
    "WITH " + bpeCtes().mkString(", ") +
      " SELECT d.doc_id AS doc_id, coalesce(g.n_ws, 0) AS n_ws, coalesce(g.n_bpe, 0) AS n_bpe " +
      "FROM documents d LEFT JOIN agg g ON d.doc_id = g.doc_id"

  // ---------------------------------------------------------------
  // text_tokens_bpe_bytes — byte-level BPE (GPT-2 lineage)
  // ---------------------------------------------------------------

  /** Non-ASCII plant for the byte-level gate (the licPlant convention
    * — the synthetic corpus is pure [a-z ]): 2-byte Latin diacritics
    * and 3-byte CJK, so the remap exercises identity, Latin-1-kept and
    * 256+n byte classes.
    */
  private val bytePlant9 = " café żółw"
  private val bytePlant7 = " 日本語 naïve"
  private[llm] val bytePlantExpr: String =
    s"concat(text, CASE WHEN doc_id % 9 = 0 THEN '$bytePlant9' " +
      s"WHEN doc_id % 7 = 0 THEN '$bytePlant7' ELSE '' END)"

  /** Byte-level BPE token counts + decode-identity witness — what
    * GPT-lineage tokenizers actually ship: each word's UTF-8 bytes are
    * remapped to printable chars ([[remapBytes]] — the published
    * bytes_to_unicode table), the EXISTING trainer/encoder machinery
    * runs unchanged on the remapped symbols, and `decode_ok` witnesses
    * in-plan that the real byte decoder inverts the real byte encoder
    * on every row — byte-level is lossless on ANY input, where
    * char-level BPE documents its codepoint divergence. Row-local
    * projection + the bounded trainer collect; no new shuffle.
    */
  def tokensBpeBytes(docs: DataFrame): DataFrame = {
    val df = docs
      .select(col("doc_id"), expr(bytePlantExpr).as("orig"))
      .withColumn(
        "text",
        concat_ws(
          " ",
          transform(split(col("orig"), " "), t => graft.functions.exprs.byte_remap(t))
        )
      )
    val merges = gateMerges(df)
    df.select(
      col("doc_id"),
      size(filter(split(col("text"), " "), t => t =!= "")).cast("bigint").as("n_ws"),
      graft.functions.exprs.bpe_count(split(col("text"), " "), merges).as("n_bpe_bytes"),
      (graft.functions.exprs.byte_unremap(col("text")) === col("orig")).as("decode_ok")
    )
  }

  /** Oracle twin: the remap rendered as a replace chain over the
    * plant's (known, bounded) non-ASCII alphabet — ASCII printable
    * bytes are identity under the GPT-2 table, so only the planted
    * chars need rewriting; the trainer CTEs then run verbatim over the
    * remapped source. Replace order is immaterial under TWO invariants
    * the build now ASSERTS (r15 — images do NOT have distinct lead
    * bytes; é/ó/ï all share 0xC3): (1) no special char occurs inside
    * any OTHER special's image, so the remap chain never rewrites an
    * already-written image and the unremap chain never manufactures a
    * spurious special; (2) no image occurs inside a concatenation of
    * two images except as the expected prefix/suffix, so adjacent
    * planted specials ("żół") cannot yield a boundary-spanning match.
    * Editing the plants re-runs the assertion at class init.
    */
  val tokensBpeBytesSql: String = {
    val specials = (bytePlant9 + bytePlant7).filter(_ > 127).distinct.toList
    val img = specials.map(c => c -> remapBytes(c.toString)).toMap
    for (c1 <- specials; c2 <- specials if c1 != c2)
      require(
        !img(c2).contains(c1),
        s"byte-plant invariant: special '$c1' occurs in the image of '$c2'"
      )
    for (c <- specials; a <- specials; b <- specials) {
      val cat = img(a) + img(b)
      var i = cat.indexOf(img(c))
      while (i >= 0) {
        require(
          (i == 0 && c == a) || (i == img(a).length && c == b),
          s"byte-plant invariant: image of '$c' spans images of '$a'+'$b' at $i"
        )
        i = cat.indexOf(img(c), i + 1)
      }
    }
    val remapChain = specials.foldLeft("orig") { (acc, c) =>
      s"replace($acc, '$c', '${remapBytes(c.toString)}')"
    }
    val unremapChain = specials.foldLeft("b.text") { (acc, c) =>
      s"replace($acc, '${remapBytes(c.toString)}', '$c')"
    }
    s"WITH porig AS MATERIALIZED (SELECT doc_id, $bytePlantExpr AS orig FROM documents), " +
      s"bdocs AS MATERIALIZED (SELECT doc_id, $remapChain AS text FROM porig), " +
      bpeCtes("bdocs").mkString(", ") +
      " SELECT p.doc_id AS doc_id, coalesce(g.n_ws, 0) AS n_ws, " +
      "coalesce(g.n_bpe, 0) AS n_bpe_bytes, " +
      s"($unremapChain = p.orig) AS decode_ok " +
      "FROM porig p JOIN bdocs b ON b.doc_id = p.doc_id " +
      "LEFT JOIN agg g ON g.doc_id = p.doc_id"
  }

  val corpusFertilitySql: String = {
    val r6 = (e: String) => graft.core.Dsp.round6Sql(e)
    "WITH " + bpeCtes().mkString(", ") +
      ", f AS (SELECT d.lang AS lang, CAST(length(d.text) AS BIGINT) AS n_chars, " +
      "coalesce(g.n_ws, 0) AS n_ws, coalesce(g.n_bpe, 0) AS n_bpe " +
      "FROM documents d LEFT JOIN agg g ON d.doc_id = g.doc_id) " +
      "SELECT lang, count(*) AS n_docs, CAST(sum(n_ws) AS BIGINT) AS n_ws, " +
      "CAST(sum(n_bpe) AS BIGINT) AS n_bpe, " +
      r6("CASE WHEN sum(n_ws) = 0 THEN 0.0e0 ELSE CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_ws) AS DOUBLE) END") +
      " AS fertility, " +
      r6("CASE WHEN sum(n_bpe) = 0 THEN 0.0e0 ELSE CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_bpe) AS DOUBLE) END") +
      " AS chars_per_tok FROM f GROUP BY lang"
  }

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
    "WITH " + bpeCtes().mkString(", ") +
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
    "WITH " + bpeCtes().mkString(", ") +
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
    "WITH " + bpeCtes().mkString(", ") +
      s", k AS (SELECT d.source AS source, CAST(sum(CASE WHEN $h < $rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
      s"CAST(sum(CASE WHEN $h < $rate THEN coalesce(g.n_bpe, 0) ELSE 0 END) AS BIGINT) AS tok_kept " +
      "FROM documents d LEFT JOIN agg g ON d.doc_id = g.doc_id GROUP BY d.source) " +
      "SELECT source, n_kept, tok_kept, " +
      s"${graft.core.Dsp.round6Sql(s"pow(tok_kept, $a) / sum(pow(tok_kept, $a)) OVER ()")} AS mix_weight FROM k"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens_bpe" -> { (s, dir) => tokensBpe(Tables.documents(s, dir)) },
    "text_tokens_bpe_bytes" -> { (s, dir) => tokensBpeBytes(Tables.documents(s, dir)) },
    "text_bpe_segments" -> { (s, dir) => segmentsBpe(Tables.documents(s, dir)) },
    "text_pack_bpe" -> { (s, dir) => packBpe(Tables.documents(s, dir)) },
    "sample_mix_bpe" -> { (s, dir) => mixBpe(Tables.documents(s, dir)) },
    "corpus_fertility" -> { (s, dir) => corpusFertility(Tables.documents(s, dir)) }
  )

  def oracleSql: Map[String, String] = Map(
    "text_tokens_bpe" -> tokensBpeSql,
    "text_tokens_bpe_bytes" -> tokensBpeBytesSql,
    "text_bpe_segments" -> segmentsBpeSql,
    "text_pack_bpe" -> packBpeSql(),
    "sample_mix_bpe" -> mixBpeSql(),
    "corpus_fertility" -> corpusFertilitySql
  )
}
