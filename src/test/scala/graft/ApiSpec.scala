package graft

import org.scalatest.funsuite.AnyFunSuite

class ApiSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val sig = core.Signal.long(spark, sf)

  test("facade mirrors the reference call shapes end to end") {
    assert(Api.Kaiser(10, 20, 100).apply(sig).count() > 0)
    assert(Api.Hamming(10, 20, 100).apply(sig, mode = "valid").count() > 0)
    assert(Api.Butter(10, 20, 100).apply(sig, dephase = true).count() > 0)
    assert(Api.Ellip(10, 20, 100).order == 4)
    assert(Api.downsample(sig, 2, 100).count() > 0)
    assert(Api.psd(sig).count() > 0)
    assert(Api.plv(sig).count() == 10)
  }

  test("filter viewer methods: frequency and impulse responses") {
    val fr = Api.Butter(10, 20, 100).frequencyResponse(spark, 100.0).collect()
    assert(fr.length == 512)
    val dc = fr.minBy(_.getDouble(1)) // k = 0
    assert(math.abs(dc.getDouble(2) - 1.0) < 1e-3, s"DC gain ${dc.getDouble(2)}")
    assert(fr.filter(_.getDouble(1) >= 25).forall(_.getDouble(3) <= -39.9), "stopband leak")
    assert(Api.Kaiser(10, 20, 100).impulseResponse(spark, 100.0).count() >= 100)
    assert(Api.Butter(10, 20, 100).impulseResponse(spark, 100.0).count() == 100)
    // FIR path: a = [1.0] exercises the empty sin-polynomial branch
    val firFr = Api.Kaiser(10, 20, 100).frequencyResponse(spark, 100.0).collect()
    assert(firFr.length == 512)
    val firDc = firFr.minBy(_.getDouble(1))
    assert(math.abs(firDc.getDouble(2) - 1.0) < 1e-2, s"FIR DC gain ${firDc.getDouble(2)}")
    assert(firFr.filter(_.getDouble(1) >= 25).forall(_.getDouble(3) <= -39.0), "FIR stopband leak")
  }

  test("facade designs equal the operator-layer designs") {
    assert(Api.Kaiser(10, 20, 100).coeffs.sameElements(operators.FirOps.kaiserLp))
    assert(Api.Butter(10, 20, 100).sos.map(_.toSeq).toSeq ==
      operators.IirOps.butterLp.map(_.toSeq).toSeq)
  }

  test("round-7 selection facade endpoints run end to end") {
    val docs = graft.core.Tables.documents(spark, sf)
    assert(Api.gopherRules(docs).columns.last == "pass")
    assert(Api.gopherRules(docs).count() == docs.count())
    assert(Api.c4Clean(docs).count() == docs.count())
    assert(Api.dsirWeights(docs).count() > 0)
    assert(Api.langId(docs).count() == docs.count())
    assert(Api.bpeMerges(docs).length == graft.llm.Bpe.nMerges)
    assert(Api.tokensBpe(docs).count() == docs.count())
    assert(Api.packDocsBpe(docs).count() == docs.count())
    assert(Api.mixWeightsBpe(docs).count() > 0)
    assert(Api.removeDupSpans(docs).count() == docs.count())
    assert(Api.curateLlm(docs).count() > 0)
  }

  test("round-9 facade endpoints run end to end") {
    import org.apache.spark.sql.functions._
    val docs = core.Tables.documents(spark, sf)
    val emb = core.Tables.embeddings(spark, sf)
    val orders = core.Tables.orders(spark, sf)
    assert(Api.corpusProfile(docs).count() > 0)
    assert(Api.hashEmbedDupes(docs).columns.toSeq == Seq("doc_a", "doc_b", "cos"))
    assert(Api.keepBest(docs).count() == docs.count())
    assert(Api.pcaTopK(spark, emb, 2).count() == 2 * 64)
    assert(Api.pcaWhiten(spark, emb, 2).count() == 2 * emb.count())
    val counters = Api
      .quantileCounters(
        orders,
        col("o_orderpriority"),
        expr("CAST(floor(o_totalprice) AS BIGINT)")
      )
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)) -> r.getLong(4))
      .toMap
    val g = orders.select(col("o_orderpriority")).head.getString(0)
    val n = orders.filter(col("o_orderpriority") === g).count()
    val med = Api.quantileFromCounters(counters, g, n, 0.5)
    assert(med > 0, s"descended median $med")
  }

  test("ProfileService: init + ingest merge == single-pass profile, served grid-only") {
    import org.apache.spark.sql.functions._
    val docs = core.Tables.documents(spark, sf)
    val store = sources.Scratch.dir("api_profile_service")
    val h2 = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % 2
    // continuous-ingest cadence: seed with one slice, ingest the other
    Api.ProfileService.init(docs.filter(h2 === 0), store)
    Api.ProfileService.ingest(docs.filter(h2 === 1), store)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    // the served profile and quantiles come from the STORE ONLY and
    // must equal the single-pass full-corpus answers exactly
    assert(canon(Api.ProfileService.profile(spark, store)) == canon(Api.corpusProfile(docs)))
    assert(
      canon(Api.ProfileService.quantiles(spark, store)) ==
        canon(llm.Sketches.corpusProfileQuantiles(docs))
    )
    // the store is the documented bounded layout: one grid table whose
    // row count is corpus-independent (≤ sources·(m + L·d·w + 1))
    val grid = spark.read.parquet(s"$store/grid")
    assert(grid.columns.toSeq == Seq("source", "kind", "k1", "k2", "k3", "mx", "cnt", "sm"))
    val nSources = docs.select(col("source")).distinct().count()
    val bound = nSources * (llm.Sketches.hllRegisters +
      llm.Sketches.qLevels * llm.Sketches.qDepth * llm.Sketches.qWidth + 1)
    assert(grid.count() <= bound, s"grid ${grid.count()} exceeds bound $bound")
    // a second ingest keeps serving consistent (monotone doc counts)
    Api.ProfileService.ingest(docs.filter(h2 === 1).limit(5), store)
    val n2 = Api.ProfileService
      .profile(spark, store)
      .agg(sum(col("n_docs")))
      .head
      .getLong(0)
    assert(n2 == docs.count() + 5)
  }

  test("ProfileService.merge: two independently-ingested stores consolidate == single-pass") {
    import org.apache.spark.sql.functions._
    val docs = core.Tables.documents(spark, sf)
    val storeA = sources.Scratch.dir("api_profile_merge_a")
    val storeB = sources.Scratch.dir("api_profile_merge_b")
    val dest = sources.Scratch.dir("api_profile_merge_dest")
    val h2 = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % 2
    // two clusters, each profiling only its own slice
    Api.ProfileService.init(docs.filter(h2 === 0), storeA)
    Api.ProfileService.init(docs.filter(h2 === 1), storeB)
    Api.ProfileService.merge(spark, storeA, storeB, dest)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(canon(Api.ProfileService.profile(spark, dest)) == canon(Api.corpusProfile(docs)))
    assert(
      canon(Api.ProfileService.quantiles(spark, dest)) ==
        canon(llm.Sketches.corpusProfileQuantiles(docs))
    )
    // dest may alias an input: consolidating INTO storeA must serve the
    // same fleet-wide profile (the checkpoint-before-swap guarantee)
    Api.ProfileService.merge(spark, storeA, storeB, storeA)
    assert(canon(Api.ProfileService.profile(spark, storeA)) == canon(Api.corpusProfile(docs)))
    // no stray swap debris
    val fs = new org.apache.hadoop.fs.Path(dest).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dest/grid.next")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dest/grid.prev")))
  }

  test("ProfileService.ingestStream: zero-state stream profiles == single-pass over the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = core.Tables.documents(spark, sf).select("doc_id", "text", "lang", "source")
    val rows = docs.collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val store = sources.Scratch.dir("api_profile_stream")
    val input = MemoryStream[(Long, String, String, String)]
    val q = Api.ProfileService.ingestStream(
      input.toDF().toDF("doc_id", "text", "lang", "source"),
      store
    )
    def tup(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))
    input.addData(b1.map(tup).toIndexedSeq) // first batch seeds the store
    q.processAllAvailable()
    input.addData(b2.map(tup).toIndexedSeq)
    q.processAllAvailable()
    val progs = q.recentProgress
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(canon(Api.ProfileService.profile(spark, store)) == canon(Api.corpusProfile(docs)))
    // the stream itself holds ZERO state — the grid is the only memory
    assert(progs.flatMap(_.stateOperators).isEmpty, "profile ingest must hold no streaming state")
  }

  test("UpsertStore.upsertStream: zero-state out-of-order stream == collapse of the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // (user_id, event_id, ts_us, k) with batch 2 INTERLEAVED in time
    // (user 1's latest row arrives in batch 1, so the batch-2 upsert
    // must not clobber it — latest-wins is a max, not last-writer)
    val all = Seq(
      (1L, 10L, 100L, 7L), (1L, 11L, 300L, 9L), (2L, 12L, 50L, 3L),
      (1L, 13L, 200L, 8L), (2L, 14L, 60L, 4L), (3L, 15L, 10L, 1L)
    )
    val (b1, b2) = all.splitAt(3)
    val store = sources.Scratch.dir("api_upsert_stream")
    val input = MemoryStream[(Long, Long, Long, Long)]
    val q = Api.UpsertStore.upsertStream(
      input.toDF().toDF("user_id", "event_id", "ts_us", "k"),
      store
    )
    input.addData(b1) // seeds
    q.processAllAvailable()
    input.addData(b2)
    q.processAllAvailable()
    val progs = q.recentProgress
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val full = Api.UpsertStore.collapse(all.toDF("user_id", "event_id", "ts_us", "k"))
    assert(canon(Api.UpsertStore.serve(spark, store)) == canon(full))
    // user 1: k=9 at ts 300 (from batch 1) survives the batch-2 upsert
    val u1 = Api.UpsertStore.serve(spark, store).filter($"user_id" === 1L).head()
    assert(u1.getLong(1) == 9L && u1.getLong(4) == 3L, s"u1: $u1")
    assert(progs.flatMap(_.stateOperators).isEmpty, "upsert stream must hold no streaming state")
  }

  test("IIR band facade mirrors 2-element reference specs") {
    assert(Api.ButterBand(Seq(10, 20), Seq(5, 30), 100).sos.map(_.toSeq).toSeq ==
      operators.IirOps.butterBp.map(_.toSeq).toSeq)
    assert(Api.Cheby1Band(Seq(10, 20), Seq(5, 30), 100).sos.map(_.toSeq).toSeq ==
      operators.IirOps.cheby1Bp.map(_.toSeq).toSeq)
    assert(Api.Cheby2Band(Seq(10, 30), Seq(15, 25), 100).sos.map(_.toSeq).toSeq ==
      operators.IirOps.cheby2Bs.map(_.toSeq).toSeq)
    assert(Api.EllipBand(Seq(10, 30), Seq(15, 25), 100).sos.map(_.toSeq).toSeq ==
      operators.IirOps.ellipBs.map(_.toSeq).toSeq)
    // bandstop applies end to end through the zero-phase path
    assert(Api.Cheby2Band(Seq(10, 30), Seq(15, 25), 100).apply(sig).count() > 0)
    intercept[IllegalArgumentException](Api.ButterBand(Seq(10), Seq(5, 30), 100))
  }
}
