package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.exprs

/** The native hot-path expressions must be value-identical to the
  * higher-order-function formulations they replaced (same accumulation
  * order, same hashes) — the gate proves this end-to-end against
  * DuckDB; these tests pin it directly against the old Spark forms on
  * randomized data, so a refactor can't silently drift.
  */
class ExprEquivalenceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rnd = new scala.util.Random(77)

  test("DotD / SqDistD equal the aggregate(zip_with()) folds bit-for-bit") {
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextGaussian()),
      Array.fill(64)(rnd.nextGaussian())
    )).toDF("a", "b")
    val both = rows.select(
      exprs.dot_d(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("slow"),
      exprs.sq_dist(col("a"), col("b")).as("fastd"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v).as("slowd")
    ).collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot differs") // bit-exact, not approx
      assert(r.getDouble(2) == r.getDouble(3), "sqdist differs")
    }
  }

  test("DotLit equals zip_with against the literal plane array bit-for-bit") {
    val plane = Array.fill(64)(rnd.nextGaussian())
    val rows = Seq.fill(100)(Array.fill(64)(rnd.nextGaussian())).toDF("v")
    val both = rows.select(
      exprs.dot_lit(col("v"), plane).as("fast"),
      aggregate(zip_with(col("v"), array(plane.map(lit).toSeq: _*), (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("slow")
    ).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  private def randomText(): String = {
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "iota", "kappa")
    Seq.fill(3 + rnd.nextInt(40))(words(rnd.nextInt(words.length))).mkString(" ")
  }

  test("ShingleHashSet equals the exploded xxhash64 shingle pipeline") {
    val docs = (0L until 50L).map(i => (i, randomText())).toDF("doc_id", "text")
    val fast = docs
      .select(col("doc_id"), exprs.shingle_hash_set(split(col("text"), " "), 3, 1024).as("shs"))
      .select(col("doc_id"), explode(col("shs")).as("shh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val slow = graft.llm.TextStats
      .shingles(docs)
      .select(col("doc_id"), xxhash64(col("sh")).as("shh"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == slow)
  }

  test("MinHashSig equals the exploded distinct-shingle k-min pipeline") {
    val docs = (0L until 50L).map(i => (i, randomText())).toDF("doc_id", "text")
    // same permutation constants as Dedup (seed 13, 9 hashes)
    val r13 = new scala.util.Random(13)
    val pa = Array.fill(9)(r13.nextInt(1 << 30).toLong * 2 + 1)
    val pb = Array.fill(9)(r13.nextInt(Int.MaxValue).toLong)
    val fast = docs
      .select(col("doc_id"), exprs.minhash_sig(split(col("text"), " "), 3, 1024, pa, pb).as("ms"))
      .select(col("doc_id"), posexplode(col("ms")).as(Seq("j", "minh")))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    // the r3 formulation, inlined: exploded distinct shingles -> 32-bit
    // md5-prefix hash -> k multiply-add-mod min aggregates
    val h32 = conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long")
    val mins = (0 until 9).map { j =>
      min((lit(pa(j)) * col("h") + lit(pb(j))) % 4294967296L).as(s"m$j")
    }
    val slow = graft.llm.TextStats
      .shingles(docs)
      .select(col("doc_id"), col("sh"))
      .distinct()
      .select(col("doc_id"), h32.as("h"))
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), posexplode(array((0 until 9).map(j => col(s"m$j")): _*)).as(Seq("j", "minh")))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    assert(fast == slow)
  }

  test("SimHash64 equals the conv(substring(md5)) majority-vote pipeline") {
    val docs = (0L until 50L).map(i => (i, randomText())).toDF("doc_id", "text")
    val fast = docs
      .select(col("doc_id"), exprs.simhash64(split(col("text"), " "), 1024).as("s2"))
      .select(col("doc_id"), element_at(col("s2"), 1).as("hi"), element_at(col("s2"), 2).as("lo"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // the r3 formulation, inlined: exploded tokens -> md5 hex halves ->
    // 64 conditional majority aggregates -> packed halves
    val toks = graft.llm.TextStats.tokens(docs).select(col("doc_id"), md5(col("tok")).as("h"))
    val ints = toks.select(
      col("doc_id"),
      conv(substring(col("h"), 1, 8), 16, 10).cast("long").as("hi"),
      conv(substring(col("h"), 9, 8), 16, 10).cast("long").as("lo")
    )
    val wCols = (0 until 64).map { b =>
      val bit = if (b < 32) shiftright(col("hi"), 31 - b) % 2 else shiftright(col("lo"), 63 - b) % 2
      sum(bit * 2 - 1).as(s"w$b")
    }
    val packedHi =
      (0 until 32).map(b => when(col(s"w$b") > 0, lit(1L << (31 - b))).otherwise(lit(0L))).reduce(_ + _)
    val packedLo =
      (32 until 64).map(b => when(col(s"w$b") > 0, lit(1L << (63 - b))).otherwise(lit(0L))).reduce(_ + _)
    val slow = ints
      .groupBy(col("doc_id"))
      .agg(wCols.head, wCols.tail: _*)
      .select(col("doc_id"), packedHi.as("hi"), packedLo.as("lo"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(fast == slow)
  }
}
