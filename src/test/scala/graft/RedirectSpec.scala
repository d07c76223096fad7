package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.{Bpe, Curation, TextStats, Urls}

/** Behavior pins for the r17 redirect resolver: loop/budget
  * termination, canonicalize-before-lookup chaining, and the
  * chain-to-canonical-dedup composition the operator exists for.
  */
class RedirectSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def resolve(rows: Seq[(String, String)]) =
    Urls
      .resolveRedirects(rows.toDF("url", "location"))
      .select("url", "status", "n_hops", "final_canon")
      .as[(String, String, Option[Long], Option[String])]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4)))
      .toMap

  test("a 2-cycle terminates as status=loop with NULL hops/canon; bystanders resolve") {
    val got = resolve(Seq(
      ("http://h.example.com/a", "http://h.example.com/b"),
      ("http://h.example.com/b", "http://h.example.com/a"),
      ("http://h.example.com/c", null)
    ))
    assert(got("http://h.example.com/a") == (("loop", None, None)))
    assert(got("http://h.example.com/b") == (("loop", None, None)))
    assert(got("http://h.example.com/c") == (("ok", Some(0L), Some("h.example.com/c"))))
  }

  test("each hop canonicalizes the Location before map lookup (WWW/scheme/fragment variants chain)") {
    val got = resolve(Seq(
      ("http://h.example.com/p0", null),
      // Location decorated: https + WWW. + fragment — canon must strip all three to chain
      ("http://h.example.com/p1", "https://WWW.h.example.com/p0#frag"),
      ("https://www.h.example.com/p2", "HTTP://h.example.com:80/p1")
    ))
    assert(got("http://h.example.com/p1") == (("ok", Some(1L), Some("h.example.com/p0"))))
    assert(got("https://www.h.example.com/p2") == (("ok", Some(2L), Some("h.example.com/p0"))))
  }

  test("hop budget: a 10-hop chain resolves exactly; a 20-hop chain exceeds 2^4 and is dropped as loop") {
    val chain10 = (0 until 10).map(i => (s"http://c.example.com/n$i", s"http://c.example.com/n${i + 1}"))
    val chain20 = (0 until 20).map(i => (s"http://d.example.com/n$i", s"http://d.example.com/n${i + 1}"))
    val fin = Seq(("http://c.example.com/n10", null), ("http://d.example.com/n20", null))
    val got = resolve(chain10 ++ chain20 ++ fin)
    assert(got("http://c.example.com/n0") == (("ok", Some(10L), Some("c.example.com/n10"))))
    assert(got("http://d.example.com/n0") == (("loop", None, None)))
    // the tail of the 20-chain is inside budget and resolves fine
    assert(got("http://d.example.com/n5") == (("ok", Some(15L), Some("d.example.com/n20"))))
  }

  test("dangling: a redirect to a never-fetched target reports the unknown canon") {
    val got = resolve(Seq(("http://h.example.com/gone", "http://elsewhere.example.com/x")))
    assert(got("http://h.example.com/gone") == (("dangling", Some(1L), Some("elsewhere.example.com/x"))))
  }

  test("streaming ingest: chains complete ACROSS batches; a refetch never rewrites the stored verdict") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("redirect_store").toString + "/fetchlog"
    Urls.seedFetchStore(
      Seq.empty[(String, String)].toDF("url", "location"),
      store
    )
    val in = MemoryStream[(String, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Map[String, (String, Option[Long], Option[String])]]
    val q = Urls.redirectIngest(
      in.toDF().toDF("url", "location"),
      store,
      resolved =>
        seen += resolved
          .select("url", "status", "n_hops", "final_canon")
          .as[(String, String, Option[Long], Option[String])]
          .collect()
          .map(r => r._1 -> ((r._2, r._3, r._4)))
          .toMap
    )
    // batch 1: the chain HEAD arrives first; its target is unfetched
    in.addData(("http://s.example.com/u2", "https://WWW.s.example.com/u1"))
    q.processAllAvailable()
    // batch 2: the tail lands (u1 -> u0, u0 a 200) AND u2 is refetched
    // with a DIFFERENT location — first-fetch-wins must ignore it
    in.addData(
      ("http://s.example.com/u1", "http://s.example.com/u0#x"),
      ("http://s.example.com/u0", null),
      ("http://s.example.com/u2", "http://elsewhere.example.com/hijack")
    )
    q.processAllAvailable()
    q.stop()
    assert(seen.size == 2)
    // after batch 1: dangling at the unfetched target
    assert(seen(0)("http://s.example.com/u2") == (("dangling", Some(1L), Some("s.example.com/u1"))))
    // after batch 2: the SAME url's verdict upgrades to the full chain
    // (the original edge, not the hijack refetch)
    assert(seen(1)("http://s.example.com/u2") == (("ok", Some(2L), Some("s.example.com/u0"))))
    assert(seen(1)("http://s.example.com/u1") == (("ok", Some(1L), Some("s.example.com/u0"))))
    assert(seen(1)("http://s.example.com/u0") == (("ok", Some(0L), Some("s.example.com/u0"))))
  }

  test("composition: sources redirecting to variant Locations of one page share a final_canon dedup key") {
    val docs = core.Tables.documents(spark, sf)
    val resolved = Urls.crawlRedirectsGate(spark, sf)
    // every %5=1 and %5=2 doc lands on its chain's %5=0 base page;
    // group by final_canon: the base doc plus its two redirectors
    // collapse to ONE canonical key (what curate_url-style dedup keys on)
    val grp = resolved
      .filter(col("status") === "ok")
      .groupBy(col("final_canon"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
    val full = grp.filter(col("n") >= 3).count()
    assert(full > 0, "chains collapse 3+ sources onto one canonical key")
    // and resolution is idempotent on final pages: a %5=0 doc's canon is its own
    val base = resolved.filter(col("doc_id") % 5 === 0 && col("doc_id") % 20 =!= 14 &&
      col("doc_id") % 20 =!= 9 && col("doc_id") % 20 =!= 19)
    assert(base.filter(col("n_hops") =!= 0).count() == 0)
    assert(docs.count() == resolved.count(), "one verdict per fetched URL")
  }
}

/** Pins for the r17 export capstone: token-exact accounting and
  * input-order invariance of the manifest.
  */
class ExportManifestSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs = core.Tables.documents(spark, sf)

  test("manifest totals are token-exact against an independent tokenize of the kept set") {
    val manifest = Curation.exportManifest(docs).cache()
    // independent replay of the keep set (curate_llm's selection)
    val kept = docs
      .select(col("doc_id"), col("text"), Curation.qualityScore.as("quality"))
      .filter(col("quality") >= 0.45)
      .withColumn(
        "keep_id",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
        )
      )
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("text"))
    val toks = Bpe
      .tokensBpeWith(kept, Bpe.gateMerges(docs))
      .select(least(col("n_bpe"), lit(TextStats.maxTokens.toLong)).as("t"))
      .agg(sum(col("t")).as("tot"), count(lit(1)).as("n"))
      .as[(Long, Long)]
      .collect()(0)
    val got = manifest
      .agg(sum(col("n_tokens")), sum(col("n_docs")))
      .as[(Long, Long)]
      .collect()(0)
    assert(got == toks, s"manifest $got vs independent tokenize $toks")
    // all 16 shards populated; bins = ceil(tokens/256) per shard
    assert(manifest.count() == Curation.nShards.toLong)
    assert(
      manifest
        .filter(col("n_bins") =!= expr(s"(n_tokens + ${Bpe.packCap - 1}) div ${Bpe.packCap}"))
        .count() == 0
    )
  }

  test("inc: dirty is exactly the delta docs' shard set; a self-diff is all-clean") {
    val inc = Curation.exportManifestIncGate(spark, sf).cache()
    // the five planted delta docs (3/103 added, 7/207 removed, 11
    // edited) — dirty must be exactly their md5-shard set, proving
    // every OTHER shard's file needs no rewrite
    val deltaShards = Seq(3L, 103L, 7L, 207L, 11L)
      .toDF("doc_id")
      .select(
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % Curation.nShards).as("shard")
      )
      .as[Long]
      .collect()
      .toSet
    val dirty = inc.filter(col("dirty")).select("shard").as[Long].collect().toSet
    assert(dirty == deltaShards, s"dirty $dirty vs delta shards $deltaShards")
    // identical snapshots diff clean everywhere
    val self = Curation.exportManifestInc(docs, docs)
    assert(self.filter(col("dirty")).count() == 0)
  }

  test("inc: a shard losing ALL its docs emits a DELETE record (zero counts, NULL md5, dirty)") {
    val shardOf =
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % Curation.nShards
    val gone = 5L
    val newDocs = docs.filter(shardOf =!= gone).select(col("doc_id"), col("text"))
    val inc = Curation.exportManifestInc(docs.select(col("doc_id"), col("text")), newDocs).cache()
    val del = inc
      .filter(col("shard") === gone)
      .select("n_docs", "n_tokens", "n_bins", "content_md5", "dirty")
      .as[(Long, Long, Long, Option[String], Boolean)]
      .collect()
    assert(del.toSeq == Seq((0L, 0L, 0L, None, true)), del.mkString(","))
    assert(inc.count() == Curation.nShards.toLong)
  }

  test("the manifest is invariant to input partitioning/order (the shard order is content-defined)") {
    val a = Curation.exportManifest(docs).orderBy("shard").collect().toSeq
    val b = Curation
      .exportManifest(docs.repartition(7, col("text")).sortWithinPartitions(desc("doc_id")))
      .orderBy("shard")
      .collect()
      .toSeq
    assert(a == b)
  }
}

/** Loader contract: the mixture schedule and the physical export
  * interlock — every scheduled step resolves to a (shard dir, row)
  * coordinate in the exported files.
  */
class LoaderContractSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("every scheduled step resolves to a physical (shard, pos) coordinate in the export") {
    val docs = core.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val merges = Bpe.gateMerges(docs)
    val out = graft.sources.Scratch.dir("export_coords_spec")
    Curation.exportShards(docs, out, merges)
    // schedule the EXPORTED corpus across its shards (source := shard)
    val store = spark.read
      .parquet(out)
      .select(col("doc_id"), col("text"), col("shard").cast("long").as("shard"))
    val weights = store
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("u6"))
      .select(col("shard").cast("string").as("source"), col("u6"))
    val sched = Curation.mixScheduleFrom(
      store.select(col("doc_id"), col("text"), col("shard").cast("string").as("source")),
      weights,
      120
    )
    val coords = Curation.exportCoords(spark, out).cache()
    val resolved = sched.join(coords, Seq("doc_id")).cache()
    // every step lands on a physical row, in the shard it was scheduled for
    assert(resolved.count() == 120, "every scheduled step must resolve")
    assert(resolved.filter(col("source") =!= col("shard").cast("string")).count() == 0)
    // the seek table is dense per shard (pos 0..n-1, no gaps)
    val dense = coords.groupBy(col("shard")).agg(max(col("pos")).as("mx"), count(lit(1)).as("n"))
    assert(dense.filter(col("mx") =!= col("n") - 1).count() == 0, "pos must be dense per shard")
  }
}

/** Streaming export: micro-batches feed the SAME shard layout and
  * manifest as the batch export, at-most-once-ever per content, with
  * dirty-shard-only manifest maintenance — and the loader-side verify
  * passes at every point in the stream's life.
  */
class ExportStreamSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("streaming export: first-arrival by content, dirty-only manifest upkeep, verify green per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = graft.sources.Scratch.dir("export_stream_store")
    val mani = graft.sources.Scratch.dir("export_stream_manifest")
    val seen = graft.sources.Scratch.dir("export_stream_seen")
    val allDocs = core.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    // pinned tokenizer artifact: trained ONCE, shared by every batch
    val merges = Bpe.gateMerges(allDocs)
    Curation.seedExportStores(spark, store, mani, seen)
    val in = MemoryStream[(Long, String)]
    val q = Curation.exportStream(in.toDF().toDF("doc_id", "text"), store, mani, seen, merges)
    def manifest(): Map[Long, (Long, Long, Long, String)] =
      spark.read
        .parquet(mani)
        .collect()
        .map(r =>
          r.getAs[Number]("shard").longValue() ->
            (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_bins"), r.getAs[String]("content_md5"))
        )
        .toMap
    def verified(): Boolean = {
      val exp = spark.read
        .parquet(mani)
        .select(
          col("shard").cast("long").as("shard"),
          col("n_docs"),
          col("n_tokens"),
          col("n_bins"),
          col("content_md5")
        )
      Curation.exportVerify(spark, store, exp, merges).filter(!col("ok")).count() == 0
    }
    val shardOf =
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % Curation.nShards
    // batch 1: the even half of the corpus
    val b1 = allDocs.filter(col("doc_id") % 2 === 0).as[(Long, String)].collect()
    in.addData(b1.toIndexedSeq: _*)
    q.processAllAvailable()
    val m1 = manifest()
    assert(m1.nonEmpty && verified(), "verify must pass after batch 1")
    val stored1 = spark.read.parquet(store).count()
    // batch 2: new odd docs confined to TWO shards, a replayed batch-1
    // doc (same id), and a batch-1 TEXT under a fresh id — only the
    // two genuinely-new docs' shards may change
    val odd2 = allDocs
      .filter(col("doc_id") % 2 === 1 && shardOf.isin(3L, 7L))
      .as[(Long, String)]
      .collect()
    assert(odd2.nonEmpty)
    val replayed = b1.head
    val reContent = (900001L, b1.head._2)
    in.addData((odd2 :+ replayed :+ reContent).toIndexedSeq: _*)
    q.processAllAvailable()
    val m2 = manifest()
    assert(verified(), "verify must pass after batch 2")
    val touched = odd2
      .map(_._1)
      .toSeq
      .toDF("doc_id")
      .select(shardOf.as("s"))
      .as[Long]
      .collect()
      .toSet
    for ((s, row) <- m1 if !touched.contains(s))
      assert(m2(s) == row, s"untouched shard $s manifest row drifted")
    assert(touched.exists(s => m2(s) != m1.getOrElse(s, null)), "touched shards must move")
    // the fresh-id duplicate CONTENT did not export (at-most-once-ever)
    assert(!spark.read.parquet(store).filter(col("doc_id") === 900001L).collect().nonEmpty)
    // batch 3: pure replay — nothing appends anywhere
    in.addData(b1.take(5).toIndexedSeq: _*)
    q.processAllAvailable()
    assert(spark.read.parquet(store).count() == stored1 + odd2.length, "replays must not re-export")
    assert(manifest() == m2, "a no-op batch must leave the manifest untouched")
    q.stop()
  }
}

/** Loader-side shard integrity: a clean export verifies everywhere; a
  * tampered shard file is caught by exactly its shard's manifest row.
  */
class ExportVerifySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("export verify: clean read-back is all-ok; a tampered shard flips exactly its own flag") {
    val docs = core.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val merges = Bpe.gateMerges(docs)
    val out = graft.sources.Scratch.dir("export_verify_spec")
    val expected = Curation.exportShards(docs, out, merges).cache()
    val clean = Curation.exportVerify(spark, out, expected, merges).cache()
    assert(clean.count() == Curation.nShards.toLong)
    assert(clean.filter(!col("ok")).count() == 0, "clean export must verify everywhere")
    // drop the cache BEFORE tampering: the re-verify's plan is
    // identical, so a live cache would serve the pre-tamper result
    clean.unpersist(blocking = true)
    // tamper: silently drop one doc from shard 5's files (the failure
    // a partial copy or truncated object write produces)
    val victim = out + "/shard=5"
    val rows = spark.read.parquet(victim).collect()
    assert(rows.nonEmpty)
    val dropId = rows.map(_.getAs[Long]("doc_id")).min
    rows
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .filter(_._1 != dropId)
      .toSeq
      .toDF("doc_id", "text")
      .write
      .mode("overwrite")
      .parquet(victim)
    val tampered = Curation.exportVerify(spark, out, expected, merges).cache()
    val bad = tampered.filter(!col("ok")).select("shard").as[Long].collect().toSeq
    assert(bad == Seq(5L), s"exactly the tampered shard must flag: $bad")
    // the drift is visible in the counts, not just the fingerprint
    val row5 = tampered.filter(col("shard") === 5).collect()(0)
    val exp5 = expected.filter(col("shard") === 5).collect()(0)
    assert(row5.getAs[Long]("n_docs") == exp5.getAs[Long]("n_docs") - 1)
  }
}

/** The COMPLETE product path in one spec: fetched bytes (real per-arm
  * charset encodings) → sniff+transcode → WARC archive → strict
  * re-parse → HTML extraction → curate/tokenize/shard export manifest.
  * Every leg is gated solo; this pins that the chain a 100 TB run
  * actually executes composes — the composed manifest must equal the
  * direct extraction's manifest row-for-row, with the charset leg
  * proven non-vacuous (the Latin-1 arm's bytes are NOT valid UTF-8).
  */
class CrawlExportSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("crawl-to-export: bytes -> decode -> WARC -> extract -> manifest equals the direct manifest") {
    // a non-ASCII marker rides every doc so the byte legs do real work
    val docs = core.Tables
      .documents(spark, sf)
      .select(col("doc_id"), concat(lit("café "), col("text")).as("text"))
    val pages = docs.select(col("doc_id"), expr(Curation.htmlPlantExpr).as("html"))
    // fetch-side frame: payload bytes REALLY encoded per arm
    val fetched = pages.select(
      col("doc_id"),
      col("html"),
      when(col("doc_id") % 3 === 0, lit("Content-Type: text/html; charset=ISO-8859-1"))
        .otherwise(lit("Content-Type: text/html"))
        .as("header"),
      when(col("doc_id") % 3 === 0, encode(col("html"), "ISO-8859-1"))
        .otherwise(encode(col("html"), "UTF-8"))
        .as("payload")
    )
    val dec = graft.sources.Charsets.decodeFetched(fetched).cache()
    // the sniff+transcode leg is exact on every arm...
    assert(dec.filter(col("text_out") =!= col("html")).count() == 0)
    // ...and NOT vacuous: the Latin-1 arm's bytes differ from the UTF-8
    // encoding (so the sniff MUST read the header to decode correctly;
    // decoding these bytes as UTF-8 is malformed — ANSI decode() even
    // throws on them, which is why this pins byte inequality instead)
    assert(
      dec
        .filter(col("doc_id") % 3 === 0)
        .filter(col("payload") === encode(col("html"), "UTF-8"))
        .count() == 0,
      "Latin-1 arm bytes must not coincide with the UTF-8 encoding"
    )
    // archive the decoded pages, re-parse, extract
    val tmp = graft.sources.Scratch.dir("crawl_export_spec")
    graft.sources.WarcOps.writeSpark(
      dec.select(
        col("doc_id"),
        concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
        col("text_out").as("html")
      ),
      tmp,
      nFiles = 2
    )
    val extracted = Curation
      .htmlExtractTextPages(
        graft.sources.WarcOps
          .readSpark(spark, tmp + "/part-*.warc")
          .select(
            regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
            col("body").as("html")
          )
      )
      .select(col("doc_id"), col("text"))
      // a real pipeline drops empty extractions before curation (the
      // quality score is undefined on zero tokens — ANSI divide)
      .filter(length(col("text")) > 0)
      .cache()
    // the marker survives the full byte path into the product text for
    // every doc whose extraction KEEPS the block carrying it (the keep
    // heuristic drops it for some plants — non-vacuity is what matters:
    // non-ASCII content demonstrably reaches the training product)
    assert(extracted.filter(col("text").contains("café")).count() > 0)
    val composed = Curation.exportManifest(extracted).orderBy("shard").collect().toSeq
    val direct = Curation
      .exportManifest(
        Curation
          .htmlExtractTextPages(pages)
          .select(col("doc_id"), col("text"))
          .filter(length(col("text")) > 0)
      )
      .orderBy("shard")
      .collect()
      .toSeq
    assert(composed == direct, "composed crawl-to-export manifest drifted from the direct manifest")
    assert(composed.nonEmpty && composed.map(_.getAs[Long]("n_tokens")).sum > 0)
  }
}
