package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the SentencePiece unigram model), the second of the two production
  * tokenizer-training algorithms ([[Bpe]] is the other): pieces carry
  * independent probabilities, a word's segmentation likelihood is the
  * product over its pieces, training is EM over the segmentation
  * lattice with periodic pruning, and encoding is the Viterbi best
  * path.
  *
  * Scale shape (the Bpe.trainDistributed discipline): corpus-sized
  * work happens ONCE (the word-count aggregation); every EM round is
  * one pass over the (word, freq) frame — forward/backward over each
  * word's lattice is row-local against the BROADCAST current vocab
  * (bounded: |vocab| entries), and the only shuffle is the
  * piece-keyed expected-count aggregation (vocab-sized at any corpus
  * size). Driver state is the vocab itself.
  *
  * Determinism discipline: per-(word, piece) expected counts are
  * quantized to integer micros BEFORE the distributed sum, so the
  * M-step sees exact BIGINTs whose sum is order-independent — float
  * sum order across executors can never flip a pruning decision.
  * Final piece log-probs are quantized to integer micros too, making
  * Viterbi an EXACT integer DP both engines can replay (the gate
  * hash-checks the DP score per word).
  */
object Unigram {

  /** piece → logp in integer micros (natural log · 10⁶, round-half-up). */
  final case class Model(pieces: Map[String, Long], maxPieceLen: Int)

  private def words(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= 12)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Candidate seed: all substrings (length ≤ maxPieceLen) weighted by
    * word frequency; keeps every single character (coverage guarantee)
    * plus the top multi-char candidates.
    *
    * DISTRIBUTED (r13): the substring counts aggregate piece-keyed on
    * the cluster and only the BOUNDED winners come back — all single
    * chars (charset-sized) plus the top-k multis under the total
    * (count desc, piece asc) order (deterministic, so the trained
    * model is run-stable and the gate's literal-embedded oracle
    * replays it). The former driver-side loop needed the whole corpus
    * vocabulary collected — 10⁸ distinct words at 100 TB do not fit
    * on a driver. Each of the two collects re-runs the vocabulary-
    * sized flatMap+agg off the checkpointed word frame — cheaper than
    * materializing the full distinct-substring table for reuse.
    */
  private def seed(wc: DataFrame, vocabSize: Int, maxPieceLen: Int): Map[String, Double] = {
    val spark = wc.sparkSession
    import spark.implicits._
    def pieceCounts: DataFrame = wc
      .as[(String, Long)]
      .flatMap { case (w, f) =>
        for {
          i <- 0 until w.length
          j <- 1 to math.min(maxPieceLen, w.length - i)
        } yield (w.substring(i, i + j), f)
      }
      .toDF("piece", "c")
      .groupBy(col("piece"))
      .agg(sum(col("c")).as("c"))
    val chars = pieceCounts
      .filter(length(col("piece")) === 1)
      .as[(String, Long)]
      .collect()
    val multi = pieceCounts
      .filter(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece").asc)
      .limit(math.max(0, vocabSize - chars.length))
      .as[(String, Long)]
      .collect()
    val kept = (chars ++ multi).toMap
    val total = kept.values.sum.toDouble
    kept.map { case (p, c) => p -> math.log(c / total) }
  }

  /** One word's forward-backward expected piece counts (log space),
    * quantized to micros. Returns (piece, expectedCountMicros·freq).
    */
  private def expect(
      word: String,
      freq: Long,
      lp: collection.Map[String, Double],
      maxPieceLen: Int
  ): Iterator[(String, Long)] = {
    val L = word.length
    val NEG = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NEG) b else if (b == NEG) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }
    val alpha = Array.fill(L + 1)(NEG); alpha(0) = 0.0
    for (i <- 1 to L; j <- 1 to math.min(maxPieceLen, i)) {
      lp.get(word.substring(i - j, i)).foreach { p => alpha(i) = lse(alpha(i), alpha(i - j) + p) }
    }
    val beta = Array.fill(L + 1)(NEG); beta(L) = 0.0
    for (i <- L - 1 to 0 by -1; j <- 1 to math.min(maxPieceLen, L - i)) {
      lp.get(word.substring(i, i + j)).foreach { p => beta(i) = lse(beta(i), beta(i + j) + p) }
    }
    if (alpha(L) == NEG) Iterator.empty // unsegmentable (never with char coverage)
    else {
      val out = scala.collection.mutable.HashMap.empty[String, Double]
      for (i <- 0 until L; j <- 1 to math.min(maxPieceLen, L - i)) {
        val piece = word.substring(i, i + j)
        lp.get(piece).foreach { p =>
          val post = math.exp(alpha(i) + p + beta(i + j) - alpha(L))
          out(piece) = out.getOrElse(piece, 0.0) + post
        }
      }
      out.iterator.map { case (piece, e) =>
        piece -> math.floor(e * 1e6 + 0.5).toLong * freq
      }
    }
  }

  /** Corpus log-likelihood under the current vocab (EM's monotone
    * objective — spec-pinned non-decreasing across rounds). Per-word
    * contributions quantize to integer micros BEFORE the distributed
    * sum (the expected-count discipline): a double reduce sums in
    * nondeterministic partition order, and two runs differing by one
    * ulp could flip a strict monotonicity comparison.
    */
  def logLikelihood(wc: DataFrame, lp: Map[String, Double], maxPieceLen: Int): Double = {
    val spark = wc.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(lp)
    wc.as[(String, Long)]
      .mapPartitions(_.map { case (w, f) =>
        val L = w.length
        val NEG = Double.NegativeInfinity
        def lse(a: Double, b: Double): Double =
          if (a == NEG) b else if (b == NEG) a
          else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }
        val alpha = Array.fill(L + 1)(NEG); alpha(0) = 0.0
        for (i <- 1 to L; j <- 1 to math.min(maxPieceLen, i)) {
          bc.value.get(w.substring(i - j, i)).foreach { p =>
            alpha(i) = lse(alpha(i), alpha(i - j) + p)
          }
        }
        if (alpha(L) == NEG) 0L else math.floor(alpha(L) * f * 1e6 + 0.5).toLong
      })
      .reduce(_ + _) / 1e6
  }

  /** Train: seed → `rounds` EM rounds, pruning the lowest-probability
    * multi-char pieces down to `vocabSize` after each M-step (single
    * chars never prune — coverage). Returns micro-quantized log-probs.
    */
  def fit(
      docs: DataFrame,
      vocabSize: Int = 64,
      maxPieceLen: Int = 4,
      rounds: Int = 4
  ): Model = fitWithLl(docs, vocabSize, maxPieceLen, rounds)._1

  /** [[fit]] plus the corpus log-likelihood after every M-step — the
    * EM objective trace (monotone when `vocabSize` is large enough
    * that no pruning fires; pruning can legitimately drop it).
    */
  def fitWithLl(
      docs: DataFrame,
      vocabSize: Int = 64,
      maxPieceLen: Int = 4,
      rounds: Int = 4
  ): (Model, Seq[Double]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE corpus-sized pass builds the (word, freq) frame, which stays
    // DISTRIBUTED (checkpointed — reused by the seed and every EM
    // round); only vocab-sized results ever reach the driver
    val wcDf = words(docs).localCheckpoint()
    // seed WIDE (all candidates up to 4× target), then prune GRADUALLY
    // toward the target — SentencePiece's shrink schedule; a hard cut
    // after round 1 freezes whatever the seed counts favored (measured:
    // 'work' lost to 'wo'+'rk' under an immediate cut)
    var lp = seed(wcDf, math.max(vocabSize * 4, vocabSize), maxPieceLen)
    val nMulti0 = lp.keys.count(_.length > 1).toDouble
    val lls = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (round <- 1 to rounds) {
      val bc = spark.sparkContext.broadcast(lp)
      val counts = wcDf
        .as[(String, Long)]
        .flatMap { case (w, f) => expect(w, f, bc.value, maxPieceLen) }
        .toDF("piece", "m")
        .groupBy(col("piece"))
        .agg(sum(col("m")).as("m"))
        .as[(String, Long)]
        .collect()
        .toMap
      val total = counts.values.sum.toDouble
      val next = lp.keys.map { p => p -> counts.getOrElse(p, 0L) }.toSeq
      val keptChars = next.filter(_._1.length == 1)
      val targetMulti = math.max(0, vocabSize - keptChars.length)
      // geometric shrink from the wide seed to the target multi budget
      val budget =
        if (nMulti0 <= targetMulti) targetMulti
        else
          math.max(
            targetMulti,
            math.ceil(
              nMulti0 * math.pow(targetMulti / nMulti0, round.toDouble / rounds)
            ).toInt
          )
      val keptMulti = next
        .filter { case (p, c) => p.length > 1 && c > 0 }
        .sortBy { case (p, c) => (-c, p) }
        .take(budget)
      lp = (keptChars ++ keptMulti).map { case (p, c) =>
        p -> math.log(math.max(c, 1L) / total)
      }.toMap
      lls += logLikelihood(wcDf, lp, maxPieceLen)
    }
    (Model(lp.map { case (p, v) => p -> math.floor(v * 1e6 + 0.5).toLong }, maxPieceLen), lls.toSeq)
  }

  /** Viterbi best segmentation under the EXACT integer model; ties
    * prefer the SHORTEST last piece (smallest j) — the same rule the
    * SQL DP's greatest() ordering encodes by term order.
    */
  def viterbi(word: String, m: Model): (Long, Seq[String]) = {
    val L = word.length
    val NEG = Long.MinValue / 4
    val best = Array.fill(L + 1)(NEG); best(0) = 0L
    val from = Array.fill(L + 1)(0)
    for (i <- 1 to L; j <- 1 to math.min(m.maxPieceLen, i)) {
      m.pieces.get(word.substring(i - j, i)).foreach { p =>
        val s = best(i - j) + p
        if (s > best(i)) { best(i) = s; from(i) = j }
      }
    }
    if (best(L) <= NEG) (NEG, Seq(word))
    else {
      val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = L
      while (i > 0) { pieces.prepend(word.substring(i - from(i), i)); i -= from(i) }
      (best(L), pieces.toSeq)
    }
  }

  // ---- gate: the Viterbi DP score hash-checked cross-engine ----

  /** The vocab as a literal CASE chain: lpcase(expr) → micros or NULL. */
  private def lpCase(m: Model, sub: String): String = {
    val arms = m.pieces.toSeq.sortBy(_._1).map { case (p, v) =>
      s"WHEN '${p.replace("'", "''")}' THEN CAST($v AS BIGINT)"
    }
    s"(CASE $sub ${arms.mkString(" ")} ELSE NULL END)"
  }

  /** Chained DP column definitions b1..b12 over shared SQL fragments:
    * b_i = greatest over j of (b_{i-j} + lp(substr)), NULL-safe via an
    * exact sentinel (missing piece / unreachable position collapses to
    * the sentinel, never NULL — greatest() NULL semantics differ
    * between engines). Both engines evaluate the IDENTICAL strings:
    * Spark as chained withColumn, DuckDB as lateral column aliases.
    */
  private def dpColumns(m: Model, substrFn: String): Seq[(String, String)] = {
    val SENT = "-900000000000000"
    (1 to 12).map { i =>
      val terms = (1 to math.min(m.maxPieceLen, i)).map { j =>
        val prev = if (i - j == 0) "CAST(0 AS BIGINT)" else s"b${i - j}"
        s"coalesce($prev + ${lpCase(m, s"$substrFn(word, ${i - j + 1}, $j)")}, CAST($SENT AS BIGINT))"
      }
      val body = if (terms.length == 1) terms.head else s"greatest(${terms.mkString(", ")})"
      s"b$i" -> s"greatest($body, CAST($SENT AS BIGINT))"
    }
  }

  private def finalPick: String =
    "CASE length(word) " +
      (1 to 12).map(i => s"WHEN $i THEN b$i").mkString(" ") + " END"

  // The oracle SQL embeds the FITTED vocab as literals, so it is
  // rendered by the query run itself (the ica_clean precedent: Verify
  // runs every query BEFORE dumping oracle_sql.json; an unfitted dump
  // is invalid SQL — a loud gate FAIL, never a silent pass).
  private val modelCache = new java.util.concurrent.ConcurrentHashMap[String, Model]()
  @volatile private var tokSqlVar: Option[String] = None
  private val unfittedSql = "SELECT unigram_gate_oracle_rendered_before_query_ran"

  private def gateModel(spark: SparkSession, dir: String): Model =
    modelCache.computeIfAbsent(dir, d => fit(Tables.documents(spark, d)))

  private def tokSqlFor(m: Model): String = {
    val cols = dpColumns(m, "substr").map { case (n, e) => s"$e AS $n" }.mkString(", ")
    "WITH t AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents), " +
      "wc AS (SELECT word, count(*) AS freq FROM t WHERE word <> '' AND length(word) <= 12 GROUP BY word), " +
      s"dp AS (SELECT word, freq, $cols FROM wc) " +
      s"SELECT word, CAST(freq AS BIGINT) AS freq, $finalPick AS best_micros FROM dp"
  }

  /** Gate: per distinct corpus word (≤12 chars), the EXACT integer
    * Viterbi score under the model FIT ON THIS CORPUS at query-build
    * time — the vocab renders as the same literal CASE chain in BOTH
    * plans, and the 12 DP columns are the identical expression strings
    * (Spark: chained withColumn; DuckDB: lateral column aliases).
    */
  def unigramTok(spark: SparkSession, dir: String): DataFrame = {
    val m = gateModel(spark, dir)
    tokSqlVar = Some(tokSqlFor(m))
    var df = words(Tables.documents(spark, dir))
    dpColumns(m, "substring").foreach { case (name, sqlExpr) =>
      df = df.withColumn(name, expr(sqlExpr))
    }
    df.select(col("word"), col("freq"), expr(finalPick).as("best_micros"))
  }

  // ---- WordPiece greedy segmentation (Wu et al. 2016, the BERT
  // tokenizer's encode rule) over the SAME fitted vocab: longest-
  // match-first from the left, versus unigram's global-likelihood
  // Viterbi — the trio (BPE merge-replay, unigram Viterbi, WordPiece
  // greedy) covers every production subword encode family. Greedy is
  // sequential in the word, but a word advances ≥1 char per step, so
  // 12 chained steps close any ≤12-char word — each step ONE shared
  // expression string choosing the longest vocab piece at the cursor
  // (a CASE over the literal vocab, longest length first), carrying
  // (cursor, piece count, the accumulated segmentation string).
  // Unsegmentable-at-cursor words mark n_pieces = -1 ([UNK] — cannot
  // happen with char coverage, kept for fidelity to the rule). ----

  @volatile private var wpSqlVar: Option[String] = None

  /** Step expressions: pos_s, np_s, seg_s from step s−1 (identical
    * strings on both engines; `substrFn` is substring/substr).
    */
  private def wpColumns(m: Model, substrFn: String): Seq[(String, String)] = {
    (1 to 12).flatMap { s =>
      val p = if (s == 1) "CAST(1 AS BIGINT)" else s"pos${s - 1}"
      val np = if (s == 1) "CAST(0 AS BIGINT)" else s"np${s - 1}"
      val sg = if (s == 1) "''" else s"seg${s - 1}"
      // longest match at the cursor: try lengths maxPieceLen..1
      val pick = (m.maxPieceLen to 1 by -1)
        .map { j =>
          s"WHEN ${lpCase(m, s"$substrFn(word, CAST($p AS INT), $j)")} IS NOT NULL " +
            s"AND $p + $j <= length(word) + 1 THEN $j"
        }
        .mkString("CASE ", " ", " ELSE 0 END")
      // done (cursor past end) or stuck (no piece): carry state
      val guard = s"($p > length(word) OR $np < 0)"
      Seq(
        s"j$s" -> s"(CASE WHEN $guard THEN 0 ELSE $pick END)",
        s"pos$s" -> s"(CASE WHEN $guard THEN $p WHEN j$s = 0 THEN $p ELSE $p + j$s END)",
        s"np$s" -> (s"(CASE WHEN $guard THEN $np WHEN j$s = 0 THEN CAST(-1 AS BIGINT) " +
          s"ELSE $np + 1 END)"),
        s"seg$s" -> (s"(CASE WHEN $guard OR j$s = 0 THEN $sg " +
          s"ELSE concat($sg, CASE WHEN $sg = '' THEN '' ELSE '|' END, " +
          s"$substrFn(word, CAST($p AS INT), j$s)) END)")
      )
    }
  }

  private def wpSqlFor(m: Model): String = {
    // one MATERIALIZED CTE per greedy step — a single SELECT with
    // lateral aliases re-inlines each referenced alias and the 12-step
    // chain expands exponentially in the binder (measured: check.py
    // never returned); a CTE boundary evaluates every column once
    val steps = wpColumns(m, "substr")
      .grouped(4)
      .zipWithIndex
      .map { case (group, idx) =>
        val s = idx + 1
        val prev = if (s == 1) "wc" else s"dp${s - 1}"
        val carry =
          if (s == 1) "word, freq"
          else s"word, freq"
        val cols = group.map { case (n, e) => s"$e AS $n" }.mkString(", ")
        val keep = s"pos$s, np$s, seg$s"
        s"dp$s AS MATERIALIZED (SELECT $carry, $keep FROM (SELECT $carry, $cols FROM $prev))"
      }
      .mkString(", ")
    "WITH t AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents), " +
      "wc AS MATERIALIZED (SELECT word, count(*) AS freq FROM t WHERE word <> '' AND length(word) <= 12 GROUP BY word), " +
      s"$steps " +
      // UNK parity: the Scala encoder emits an EMPTY seg on a stuck
      // word; the chain carries the partial prefix — blank it here
      "SELECT word, CAST(freq AS BIGINT) AS freq, np12 AS n_pieces, " +
      "md5(CASE WHEN np12 < 0 THEN '' ELSE seg12 END) AS seg_md5 FROM dp12"
  }

  /** Gate: greedy WordPiece segmentation of every corpus word under
    * the corpus-fitted vocab — piece count AND the segmentation itself
    * (md5 of the '|'-joined pieces) hash-checked cross-engine. The
    * Spark side runs the REAL row-local Scala encoder ([[wordpiece]],
    * the one the library ships) against the broadcast vocab; the
    * oracle replays the greedy rule as a 12-step CASE chain over the
    * literal vocab — so the gate pins ALGORITHM agreement between the
    * production encoder and an independent SQL derivation. (A
    * Spark-side 48-column chained-CASE plan was tried first and hit
    * Catalyst's CollapseProject expression blowup — minutes of
    * optimizer time at 31 rows; the imperative greedy loop is the
    * honest row-local form.)
    */
  def wordpieceSeg(spark: SparkSession, dir: String): DataFrame = {
    val m = gateModel(spark, dir)
    wpSqlVar = Some(wpSqlFor(m))
    segFrame(spark, dir, m)
  }

  /** The row-local greedy segmentation frame under an arbitrary
    * piece model — shared by the unigram-vocab and WP-trained gates.
    */
  private def segFrame(spark: SparkSession, dir: String, m: Model): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(m)
    words(Tables.documents(spark, dir))
      .as[(String, Long)]
      .mapPartitions(_.map { case (w, f) =>
        wordpiece(w, bc.value) match {
          case Some(ps) => (w, f, ps.length.toLong, ps.mkString("|"))
          case None => (w, f, -1L, "")
        }
      })
      .toDF("word", "freq", "n_pieces", "seg")
      .select(col("word"), col("freq"), col("n_pieces"), md5(col("seg")).as("seg_md5"))
  }

  /** WordPiece LIKELIHOOD trainer (Schuster & Nakajima 2012 — the
    * BERT trainer): each step merges the adjacent symbol pair
    * maximizing count(ab) / (count(a)·count(b)) — the unigram-LM
    * likelihood GAIN of fusing the pair — where BPE's criterion is the
    * raw count(ab). The discriminating case (spec-planted): a
    * frequent pair of independently-frequent symbols loses to a rarer
    * pair whose parts occur ONLY together. Runs driver-side sequential
    * over the bounded top-[[Bpe.vocabLimit]] word vocabulary (the
    * gateMerges bounded-collect shape — a word vocab is Zipf-bounded
    * at any corpus size; the corpus-sized work is the ONE word-count
    * TakeOrdered). Argmax comparisons are EXACT cross-multiplied
    * BigInt rationals with the (score DESC, merged-string ASC)
    * tie-break — float ratios could flip on a ulp and break the
    * run-determinism the gate's literal-embedded oracle needs.
    * Returns a [[Model]] whose pieces are every single char (coverage)
    * plus the merged strings, valued by final symbol count micros —
    * the greedy encoder and the 12-step SQL gate machinery consume
    * membership only.
    */
  def fitWordpiece(docs: DataFrame, nMerges: Int = 24): Model = {
    val words0 = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "" && length(col("tok")) <= 12)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok").asc)
      .limit(Bpe.vocabLimit)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var sym: Array[(Array[String], Long)] =
      words0.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merged = scala.collection.mutable.ArrayBuffer.empty[String]
    var step = 0
    var done = false
    var lastCounts = Map.empty[String, Long]
    while (step < nMerges && !done) {
      val cs = scala.collection.mutable.HashMap.empty[String, Long]
      val cp = scala.collection.mutable.HashMap.empty[(String, String), Long]
      sym.foreach { case (ss, f) =>
        ss.foreach(s => cs(s) = cs.getOrElse(s, 0L) + f)
        var i = 0
        while (i < ss.length - 1) {
          val k = (ss(i), ss(i + 1)); cp(k) = cp.getOrElse(k, 0L) + f; i += 1
        }
      }
      lastCounts = cs.toMap
      if (cp.isEmpty) done = true
      else {
        // argmax of c_ab/(c_a·c_b): exact rational compare — score(k)
        // beats score(best) iff c_k·denom(best) > c_best·denom(k)
        def denom(k: (String, String)) = BigInt(cs(k._1)) * BigInt(cs(k._2))
        var best: ((String, String), Long) = null
        for ((k, c) <- cp) {
          if (best == null) best = (k, c)
          else {
            val cmp = (BigInt(c) * denom(best._1)).compare(BigInt(best._2) * denom(k))
            // tie-break on the PAIR, not the concatenation — (a,bc) and
            // (ab,c) both render "abc", which would leave the winner to
            // HashMap iteration order (ADVICE r13)
            val tieWins = cmp == 0 &&
              (k._1 < best._1._1 || (k._1 == best._1._1 && k._2 < best._1._2))
            if (cmp > 0 || tieWins) best = (k, c)
          }
        }
        val (a, b) = best._1
        merged += (a + b)
        sym = sym.map { case (ss, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < ss.length) {
            if (i < ss.length - 1 && ss(i) == a && ss(i + 1) == b) { out += (a + b); i += 2 }
            else { out += ss(i); i += 1 }
          }
          (out.toArray, f)
        }
        step += 1
      }
    }
    val chars = words0.flatMap(_._1.map(_.toString)).distinct
    val pieces = (chars ++ merged).distinct
      .map(p => p -> lastCounts.getOrElse(p, 0L) * 1000000L)
      .toMap
    Model(pieces, if (pieces.isEmpty) 1 else pieces.keys.map(_.length).max)
  }

  private val wpTrainedCache = new java.util.concurrent.ConcurrentHashMap[String, Model]()
  @volatile private var wpTrainedSqlVar: Option[String] = None

  /** Gate: greedy segmentation of every corpus word under the
    * WP-LIKELIHOOD-trained vocab (24 merges fit on this corpus at
    * query-build time) — the trained-tokenizer twin of
    * `text_wordpiece_seg` (whose vocab is the unigram EM fit), closing
    * the third trainer of the production family: BPE (count), unigram
    * (EM), WordPiece (likelihood). Same literal-vocab 12-step
    * MATERIALIZED CASE chain oracle; the trained pieces embed in BOTH
    * plans, so the gate pins trainer determinism AND encoder/SQL
    * algorithm agreement.
    */
  def wordpieceTrained(spark: SparkSession, dir: String): DataFrame = {
    val m = wpTrainedCache.computeIfAbsent(dir, d => fitWordpiece(Tables.documents(spark, d)))
    wpTrainedSqlVar = Some(wpSqlFor(m))
    segFrame(spark, dir, m)
  }

  /** Greedy WordPiece in Scala — the encoder the SQL gate must agree
    * with (spec-pinned).
    */
  def wordpiece(word: String, m: Model): Option[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      val j = (m.maxPieceLen to 1 by -1)
        .find(l => pos + l <= word.length && m.pieces.contains(word.substring(pos, pos + l)))
        .getOrElse(0)
      if (j == 0) return None
      out += word.substring(pos, pos + j)
      pos += j
    }
    Some(out.toSeq)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_unigram_tok" -> { (s, dir) => unigramTok(s, dir) },
    "text_wordpiece_seg" -> { (s, dir) => wordpieceSeg(s, dir) },
    "text_wordpiece_trained" -> { (s, dir) => wordpieceTrained(s, dir) }
  )

  def oracleSql: Map[String, String] = Map(
    "text_unigram_tok" -> tokSqlVar.getOrElse(unfittedSql),
    "text_wordpiece_seg" -> wpSqlVar.getOrElse(unfittedSql),
    "text_wordpiece_trained" -> wpTrainedSqlVar.getOrElse(unfittedSql)
  )
}
