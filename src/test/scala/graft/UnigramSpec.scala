package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer (Kudo 2018 / SentencePiece unigram): EM
  * objective, planted-morphology recovery, Viterbi/DP agreement, and
  * char-coverage segmentability.
  */
class UnigramSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.llm.Unigram

  // a morphology-rich corpus: stems work/play/read recur under the
  // suffixes ing/ed/er/s — the unigram model should allocate pieces
  // to the stems (they pay off across many word types)
  private def corpus = {
    val ws = Seq("work", "working", "worked", "worker", "works",
      "play", "playing", "played", "player", "plays",
      "read", "reading", "reader", "reads")
    Seq.tabulate(40)(i => (i.toLong, ws.mkString(" "))).toDF("doc_id", "text")
  }

  test("EM log-likelihood is non-decreasing when nothing prunes") {
    val (_, lls) = Unigram.fitWithLl(corpus, vocabSize = 4096, rounds = 4)
    assert(lls.length == 4)
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - math.abs(a) * 1e-9, s"EM objective dropped: $lls")
    }
  }

  test("planted stems become high-probability pieces and drive segmentation") {
    val m = Unigram.fit(corpus, vocabSize = 24, rounds = 4)
    val multi = m.pieces.filter(_._1.length > 1)
    assert(multi.contains("work") && multi.contains("play") && multi.contains("read"),
      s"stems missing from vocab: ${multi.keys.toSeq.sorted}")
    val (_, segW) = Unigram.viterbi("working", m)
    assert(segW.head == "work", s"'working' segmented $segW")
    val (_, segP) = Unigram.viterbi("player", m)
    assert(segP.head == "play", s"'player' segmented $segP")
  }

  test("Scala Viterbi score equals the gate's SQL DP score on every corpus word") {
    // the gate itself fits on the sf corpus; replicate: fit here, run
    // the DP columns through Spark SQL, compare to the encoder
    val m = Unigram.fit(corpus, vocabSize = 24, rounds = 2)
    val wordsDf = corpus
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("word"))
      .distinct()
    // reuse the gate plumbing via a scratch dir is heavier; instead
    // exercise viterbi vs a brute-force enumeration
    def brute(word: String): Long = {
      def go(i: Int): Long =
        if (i == word.length) 0L
        else (1 to math.min(m.maxPieceLen, word.length - i)).flatMap { j =>
          m.pieces.get(word.substring(i, i + j)).map(_ + go(i + j))
        }.foldLeft(Long.MinValue / 4)(math.max)
      go(0)
    }
    wordsDf.as[String].collect().foreach { w =>
      val (score, pieces) = Unigram.viterbi(w, m)
      assert(score == brute(w), s"$w: viterbi $score != brute ${brute(w)}")
      assert(pieces.mkString("") == w, s"$w: pieces don't reassemble: $pieces")
      val pieceSum = pieces.map(m.pieces).sum
      assert(pieceSum == score, s"$w: piece sum $pieceSum != score $score")
    }
  }

  test("char coverage: every corpus word is segmentable (finite score)") {
    val m = Unigram.fit(corpus, vocabSize = 8, rounds = 2) // tiny vocab
    Seq("working", "played", "reads", "w").foreach { w =>
      val (score, _) = Unigram.viterbi(w, m)
      assert(score > Long.MinValue / 8, s"$w unsegmentable at tiny vocab")
    }
  }

  test("wordpiece greedy: longest-match-first, reassembles, None only off-vocab") {
    val m = graft.llm.Unigram.Model(
      Map("work" -> -1L, "wor" -> -1L, "w" -> -1L, "o" -> -1L, "r" -> -1L,
        "k" -> -1L, "i" -> -1L, "n" -> -1L, "g" -> -1L, "ing" -> -1L),
      maxPieceLen = 4
    )
    // greedy takes 'work' (len 4) over 'wor'; then 'ing' over 'i'
    assert(graft.llm.Unigram.wordpiece("working", m).contains(Seq("work", "ing")))
    assert(graft.llm.Unigram.wordpiece("working", m).get.mkString("") == "working")
    // off-vocab char -> None (the [UNK] arm)
    assert(graft.llm.Unigram.wordpiece("workz", m).isEmpty)
    // greedy differs from optimal when a long first piece strands the
    // tail - the documented WordPiece-vs-Viterbi contrast
    val m2 = graft.llm.Unigram.Model(Map("ab" -> -1L, "a" -> -1L, "bc" -> -1L), 4)
    assert(graft.llm.Unigram.wordpiece("abc", m2).isEmpty) // greedy: 'ab' then 'c' missing
    assert(graft.llm.Unigram.viterbi("abc", m2)._2 == Seq("a", "bc")) // viterbi finds it
  }

  test("wordpiece likelihood trainer prefers the always-together pair over the frequent-but-independent one") {
    import spark.implicits._
    // 'st' is the most FREQUENT pair (120) but s and t are everywhere
    // (score 120/(220*220)); 'xy' is rarer (30) but x and y occur ONLY
    // together (score 30/(30*30)) -> WordPiece merges xy first where
    // BPE (raw count) merges st first — the criterion discriminator
    val text = (("st " * 120) + ("sa " * 100) + ("ta " * 100) + ("xy " * 30)).trim
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val m = graft.llm.Unigram.fitWordpiece(docs, nMerges = 1)
    assert(m.pieces.contains("xy"), s"expected xy merged, pieces=${m.pieces.keys}")
    assert(!m.pieces.contains("st"), "st must not merge on the first likelihood step")
    val bpeFirst =
      graft.llm.Bpe.train(Seq(("st", 120L), ("sa", 100L), ("ta", 100L), ("xy", 30L)), 1).head
    assert(bpeFirst == "s" + graft.llm.Bpe.sep + "t", s"BPE picks raw count: $bpeFirst")
    // the trained model still segments every corpus word (char coverage)
    Seq("st", "sa", "ta", "xy").foreach { w =>
      assert(graft.llm.Unigram.wordpiece(w, m).isDefined, s"$w unsegmentable")
    }
    assert(graft.llm.Unigram.wordpiece("xy", m).get == Seq("xy"))
  }

  test("wordpiece trainer is deterministic and merges are exact-rational ranked") {
    import spark.implicits._
    val text = (("ab " * 50) + ("cd " * 50) + ("ae " * 25) + ("ce " * 25)).trim
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val m1 = graft.llm.Unigram.fitWordpiece(docs, nMerges = 3)
    val m2 = graft.llm.Unigram.fitWordpiece(docs, nMerges = 3)
    assert(m1.pieces.keySet == m2.pieces.keySet, "trainer nondeterministic across runs")
  }
}
