package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WarcOps

/** WARC container source: distributed write → strict parse round-trip,
  * composition with the HTML extraction stage (the real ingest chain
  * WARC → HTML → text), and loud failure on malformed records.
  */
class WarcSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val t = ("the cat is on a mat and it is fine for now with the dog " * 8).trim

  test("WARC write -> read roundtrips every record field") {
    val docs = Seq((35L, t), (3L, t), (7L, t)).toDF("doc_id", "text")
    val pages = docs.select(
      col("doc_id"),
      concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val tmp = graft.sources.Scratch.dir("warc_spec")
    WarcOps.writeSpark(pages, tmp, nFiles = 2)
    val back = WarcOps.readSpark(spark, tmp + "/part-*.warc").collect()
    assert(back.length == 3, "one record per page")
    val byUri = back.map(r => r.getAs[String]("target_uri") -> r).toMap
    val expected = pages.collect().map(r => (r.getString(1), r.getString(2))).toMap
    for ((uri, html) <- expected) {
      val r = byUri(uri)
      assert(r.getAs[String]("http_status") == "200")
      assert(r.getAs[String]("body") == html, s"body drift for $uri")
      assert(r.getAs[String]("record_id").startsWith("<urn:uuid:"))
    }
  }

  test("WARC -> htmlExtractTextPages equals the direct extraction (the ingest chain composes)") {
    val docs = Seq((35L, t), (3L, t)).toDF("doc_id", "text")
    val pages = docs.select(
      col("doc_id"),
      concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val tmp = graft.sources.Scratch.dir("warc_spec_chain")
    WarcOps.writeSpark(pages, tmp, nFiles = 2)
    val viaWarc = graft.llm.Curation
      .htmlExtractTextPages(
        WarcOps
          .readSpark(spark, tmp + "/part-*.warc")
          .select(
            regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
            col("body").as("html")
          )
      )
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    val direct = graft.llm.Curation
      .htmlExtractText(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(viaWarc == direct, "WARC-fed extraction must equal the direct plant extraction")
  }

  test("streaming WARC ingest: stream-parsed extraction equals batch, new segments picked up incrementally") {
    val docsA = Seq((35L, t), (3L, t)).toDF("doc_id", "text")
    val docsB = Seq((11L, t)).toDF("doc_id", "text")
    def pagesOf(d: org.apache.spark.sql.DataFrame) = d.select(
      col("doc_id"),
      concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val tmp = graft.sources.Scratch.dir("warc_stream_spec")
    WarcOps.writeSpark(pagesOf(docsA), tmp, nFiles = 2)
    // the streaming chain: ingest → HTML extraction, both stateless
    val q = graft.llm.Curation
      .htmlExtractTextPages(
        WarcOps
          .ingestStream(spark, tmp)
          .select(
            regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
            col("body").as("html")
          )
      )
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("warc_stream_out")
      .start()
    q.processAllAvailable()
    val afterA = spark.table("warc_stream_out").count()
    assert(afterA == 2, s"first drop should parse 2 pages, got $afterA")
    // a NEW segment lands — only it is parsed in the next batch
    WarcOps.writeSpark(pagesOf(docsB), tmp + "/more", nFiles = 1)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(tmp + "/more/part-00000.warc"),
      java.nio.file.Paths.get(tmp + "/part-late.warc")
    )
    q.processAllAvailable()
    q.stop()
    val got = spark
      .table("warc_stream_out")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(got.keySet == Set(35L, 3L, 11L), s"incremental pickup missed a segment: ${got.keySet}")
    val direct = graft.llm.Curation
      .htmlExtractText(Seq((35L, t), (3L, t), (11L, t)).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(got == direct, "stream-parsed extraction must equal the batch path")
  }

  test("streaming WET emission: WARC in -> extraction -> WET out equals the batch path") {
    val docsA = Seq((35L, t), (3L, t)).toDF("doc_id", "text")
    val docsB = Seq((11L, t)).toDF("doc_id", "text")
    def pagesOf(d: org.apache.spark.sql.DataFrame) = d.select(
      col("doc_id"),
      concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val in = graft.sources.Scratch.dir("wet_stream_in")
    val out = graft.sources.Scratch.dir("wet_stream_out")
    val ckpt = graft.sources.Scratch.dir("wet_stream_ckpt")
    WarcOps.writeSpark(pagesOf(docsA), in, nFiles = 2)
    val texts = graft.llm.Curation
      .htmlExtractTextPages(
        WarcOps
          .ingestStream(spark, in)
          .select(
            regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
            col("body").as("html")
          )
      )
      .select(
        col("doc_id"),
        concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
        col("text")
      )
    val q = WarcOps.emitWetStream(texts, out, ckpt)
    q.processAllAvailable()
    // a LATE segment lands — the next batch emits a NEW wet directory
    WarcOps.writeSpark(pagesOf(docsB), in + "/more", nFiles = 1)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(in + "/more/part-00000.warc"),
      java.nio.file.Paths.get(in + "/part-late.warc")
    )
    q.processAllAvailable()
    q.stop()
    val got = WarcOps
      .readSpark(spark, out + "/batch-*/part-*.wet")
      .collect()
      .map(r => r.getAs[String]("target_uri").split("/").last.toLong -> r.getAs[String]("body"))
      .toMap
    val direct = graft.llm.Curation
      .htmlExtractText(Seq((35L, t), (3L, t), (11L, t)).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(2))
      .toMap
    assert(got == direct, "stream-emitted WET must equal the batch extraction text")
  }

  test("malformed records fail loudly with file and offset") {
    val good = WarcOps.record("0" * 32, "http://h/x", "<p>ok</p>")
    // bad magic: strict parse must name the file, not resync silently
    val badMagic = "HARC/9.9\r\nx: y\r\n\r\n".getBytes ++ good
    val p1 = intercept[IllegalArgumentException](
      WarcOps.parseRecords("f.warc", badMagic).toList
    )
    assert(p1.getMessage.contains("bad WARC magic") && p1.getMessage.contains("f.warc"))
    // truncated payload: claim more bytes than exist
    val truncated = new String(good, java.nio.charset.StandardCharsets.UTF_8)
      .replaceFirst("Content-Length: [0-9]+", "Content-Length: 99999")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val p2 = intercept[IllegalArgumentException](
      WarcOps.parseRecords("g.warc", truncated).toList
    )
    assert(p2.getMessage.contains("truncated payload") && p2.getMessage.contains("g.warc"))
    // and the good record parses clean on its own
    val ok = WarcOps.parseRecords("h.warc", good).toList
    assert(ok.length == 1 && ok.head._6 == "<p>ok</p>" && ok.head._4 == "response")
  }

  test("malformed HTTP status line fails with file and offset, not a raw index error") {
    // status line with no space after the version token
    val httpNoSpace = "HTTP/1.1\r\nContent-Type: text/html\r\n\r\nbody"
    val p = httpNoSpace.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:1>\r\n" +
      s"WARC-Target-URI: http://h/x\r\nContent-Length: ${p.length}\r\n\r\n").getBytes ++
      p ++ "\r\n\r\n".getBytes
    val e1 = intercept[IllegalArgumentException](WarcOps.parseRecords("s.warc", rec).toList)
    assert(
      e1.getMessage.contains("malformed HTTP status line") && e1.getMessage.contains("s.warc"),
      s"got: ${e1.getMessage}"
    )
    // payload whose header block STARTS with CRLF (empty status line)
    val p2 = "\r\n\r\nbody".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val rec2 = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:2>\r\n" +
      s"WARC-Target-URI: http://h/y\r\nContent-Length: ${p2.length}\r\n\r\n").getBytes ++
      p2 ++ "\r\n\r\n".getBytes
    val e2 = intercept[IllegalArgumentException](WarcOps.parseRecords("t.warc", rec2).toList)
    assert(e2.getMessage.contains("t.warc"), s"got: ${e2.getMessage}")
  }

  test("warcinfo segment headers: emitted first, typed in the read-back, response rows unaffected") {
    val docs = Seq((35L, t), (3L, t)).toDF("doc_id", "text")
    val pages = docs.select(
      col("doc_id"),
      concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val tmp = graft.sources.Scratch.dir("warcinfo_spec")
    WarcOps.writeSpark(pages, tmp, nFiles = 2, warcinfo = true)
    val back = WarcOps.readSpark(spark, tmp + "/part-*.warc")
    val byType = back.groupBy("warc_type").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("warcinfo" -> 2L, "response" -> 2L), s"got $byType")
    // warcinfo records sit at offset 0 of each segment
    val infoOffs = back.filter(col("warc_type") === "warcinfo").select("rec_offset").collect().map(_.getLong(0))
    assert(infoOffs.forall(_ == 0L), "warcinfo must open the segment")
    // and the response payloads are untouched by the leading header
    val bodies = back.filter(col("warc_type") === "response").select("body").as[String].collect().toSet
    assert(bodies == pages.select("html").as[String].collect().toSet)
  }

  test("gzip WARC: per-record gzip members roundtrip; plain and gz segments mix in one glob") {
    val docsA = Seq((35L, t), (3L, t)).toDF("doc_id", "text")
    val docsB = Seq((11L, t)).toDF("doc_id", "text")
    def pagesOf(d: org.apache.spark.sql.DataFrame) = d.select(
      col("doc_id"),
      concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val tmp = graft.sources.Scratch.dir("warc_gz_spec")
    WarcOps.writeSpark(pagesOf(docsA), tmp, nFiles = 1, gzip = true)
    WarcOps.writeSpark(pagesOf(docsB), tmp, nFiles = 1) // plain, same dir
    // the gz segment really is gzip (magic bytes) and smaller than raw
    val gzFile = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".warc.gz")).get
    val head = java.nio.file.Files.readAllBytes(gzFile.toPath).take(2)
    assert((head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b, "missing gzip magic")
    // one glob reads BOTH compressed and plain segments (magic-sniffed)
    val back = WarcOps
      .readSpark(spark, tmp + "/part-*.warc*")
      .collect()
      .map(r => r.getAs[String]("target_uri").split("/").last.toLong -> r.getAs[String]("body"))
      .toMap
    val want = (pagesOf(docsA).collect() ++ pagesOf(docsB).collect())
      .map(r => r.getLong(0) -> r.getString(2))
      .toMap
    assert(back == want, "mixed plain+gz glob must roundtrip byte-exact")
    // writer convention: one gzip member PER RECORD (the CC byte-range
    // fetch contract) — the 2-record segment carries >= 2 member
    // headers (1f 8b 08; deflate bytes can only ever ADD matches)
    val bytes = java.nio.file.Files.readAllBytes(gzFile.toPath)
    val members = (0 until bytes.length - 2).count(i =>
      (bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b && (bytes(i + 2) & 0xff) == 0x08
    )
    assert(members >= 2, s"expected one gzip member per record, found $members header(s)")
    // and the reader handles INDEPENDENTLY produced concatenated
    // members (a file assembled from separate gzip writes)
    def gz1(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val r1 = WarcOps.record("0" * 32, "http://h/a", "<p>one</p>")
    val r2 = WarcOps.record("1" * 32, "http://h/b", "<p>two</p>")
    val tmp2 = graft.sources.Scratch.dir("warc_gz_concat_spec")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tmp2 + "/part-00000.warc.gz"),
      gz1(r1) ++ gz1(r2)
    )
    val cat = WarcOps.readSpark(spark, tmp2 + "/part-*.warc.gz").collect()
    assert(cat.map(_.getAs[String]("body")).toSet == Set("<p>one</p>", "<p>two</p>"))
  }

  test("WET/WAT derivative records roundtrip; WET bodies equal the direct extraction text") {
    val docs = Seq((35L, t), (3L, t), (11L, t)).toDF("doc_id", "text")
    val pages = docs.select(col("doc_id"), expr(graft.llm.Curation.htmlPlantExpr).as("html"))
    val direct = graft.llm.Curation
      .htmlExtractTextPages(pages)
      .collect()
      .map(r => r.getLong(0) -> r.getString(2))
      .toMap
    val wet = graft.llm.Curation
      .htmlExtractTextPages(pages)
      .select(
        col("doc_id"),
        concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
        col("text")
      )
    val tmp = graft.sources.Scratch.dir("wet_spec")
    WarcOps.writeWetSpark(wet, tmp, nFiles = 2)
    val back = WarcOps
      .readSpark(spark, tmp + "/part-*.wet")
      .collect()
      .map(r =>
        r.getAs[String]("target_uri").split("/").last.toLong ->
          (r.getAs[String]("http_status"), r.getAs[String]("body"))
      )
      .toMap
    assert(back.keySet == direct.keySet)
    for ((id, text) <- direct) {
      assert(back(id)._1 == "", "conversion records carry no HTTP status")
      assert(back(id)._2 == text, s"WET body drift for doc $id")
    }
    // WAT: metadata JSON roundtrips verbatim — through the GZIPPED
    // derivative form (.wat.gz, per-record members like .warc.gz)
    val meta = docs.select(
      col("doc_id"),
      concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
      concat(lit("{\"doc\":"), col("doc_id").cast("string"), lit("}")).as("json")
    )
    val tmp2 = graft.sources.Scratch.dir("wat_spec")
    WarcOps.writeWatSpark(meta, tmp2, nFiles = 1, gzip = true)
    val backWat = WarcOps
      .readSpark(spark, tmp2 + "/part-*.wat.gz")
      .collect()
      .map(r => r.getAs[String]("target_uri").split("/").last.toLong -> r.getAs[String]("body"))
      .toMap
    assert(backWat == Map(35L -> "{\"doc\":35}", 3L -> "{\"doc\":3}", 11L -> "{\"doc\":11}"))
    // gzipped WET roundtrips the extraction text too
    val tmp3 = graft.sources.Scratch.dir("wet_gz_spec")
    WarcOps.writeWetSpark(wet, tmp3, nFiles = 1, gzip = true)
    val backGz = WarcOps
      .readSpark(spark, tmp3 + "/part-*.wet.gz")
      .collect()
      .map(r => r.getAs[String]("target_uri").split("/").last.toLong -> r.getAs[String]("body"))
      .toMap
    assert(backGz == direct, "gzipped WET body drift")
  }

  test("CDX: record lengths tile the segment byte-exactly; ranged reads serve single records") {
    val docs = Seq((35L, t), (3L, t), (7L, t)).toDF("doc_id", "text")
    val pages = docs.select(
      col("doc_id"),
      concat(lit("http://h.example.com/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val tmp = graft.sources.Scratch.dir("cdx_spec")
    WarcOps.writeSpark(pages, tmp, nFiles = 1, warcinfo = true)
    val recs = WarcOps
      .readSpark(spark, tmp + "/part-*.warc")
      .orderBy("rec_offset")
      .collect()
    assert(recs.length == 4, "warcinfo + 3 responses")
    // the (offset, length) spans tile the file with no gap or overlap,
    // ending exactly at the filesystem's byte count
    var cum = 0L
    for (r <- recs) {
      assert(r.getAs[Long]("rec_offset") == cum, s"gap before offset ${r.getAs[Long]("rec_offset")}")
      cum += r.getAs[Long]("rec_length")
    }
    val fileLen = new java.io.File(tmp, "part-00000.warc").length()
    assert(cum == fileLen, s"length sum $cum != file size $fileLen")
    // a ranged read of each span parses in ISOLATION to the same record
    val raf = new java.io.RandomAccessFile(tmp + "/part-00000.warc", "r")
    try {
      for (r <- recs) {
        val buf = new Array[Byte](r.getAs[Long]("rec_length").toInt)
        raf.seek(r.getAs[Long]("rec_offset"))
        raf.readFully(buf)
        val one = WarcOps.parseRecords("slice.warc", buf).toList
        assert(one.length == 1, "a span must hold exactly one record")
        assert(one.head._6 == r.getAs[String]("body"), "ranged body drift")
        assert(one.head._4 == r.getAs[String]("warc_type"))
      }
    } finally raf.close()
    // the CDX projection: SURT urlkey + 14-digit timestamp + digest
    val cdx = WarcOps
      .cdxIndex(WarcOps.readSpark(spark, tmp + "/part-*.warc"))
      .filter(col("warc_type") === "response")
      .collect()
      .map(r => r.getAs[String]("urlkey") -> r.getAs[String]("cdx_ts"))
      .toMap
    assert(cdx.keySet == Set(
      "com,example,h)/doc/35",
      "com,example,h)/doc/3",
      "com,example,h)/doc/7"
    ), s"got ${cdx.keySet}")
    assert(cdx.values.forall(_ == "20240101000000"))
  }

  test("CDX over .gz: compressed member spans tile the file; ranged gunzip fetch serves records") {
    val docs = Seq((35L, t), (3L, t), (7L, t)).toDF("doc_id", "text")
    val pages = docs.select(
      col("doc_id"),
      concat(lit("http://h.example.com/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val tmp = graft.sources.Scratch.dir("cdx_gz_spec")
    WarcOps.writeSpark(pages, tmp, nFiles = 1, gzip = true, warcinfo = true)
    val recs = WarcOps
      .readSparkGz(spark, tmp + "/part-*.warc.gz")
      .orderBy("rec_offset")
      .collect()
    assert(recs.length == 4, "warcinfo + 3 responses")
    // COMPRESSED member spans tile the .gz file byte-exactly
    var cum = 0L
    for (r <- recs) {
      assert(r.getAs[Long]("rec_offset") == cum, "member gap/overlap")
      cum += r.getAs[Long]("rec_length")
    }
    val f = new java.io.File(tmp, "part-00000.warc.gz")
    assert(cum == f.length(), s"member spans sum $cum != gz file size ${f.length()}")
    // a ranged read of ONE compressed span + gunzip parses to the record
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      for (r <- recs if r.getAs[String]("warc_type") == "response") {
        val buf = new Array[Byte](r.getAs[Long]("rec_length").toInt)
        raf.seek(r.getAs[Long]("rec_offset"))
        raf.readFully(buf)
        val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(buf))
        val one = WarcOps.parseRecords("m.warc", in.readAllBytes()).toList
        assert(one.length == 1 && one.head._6 == r.getAs[String]("body"), "gz ranged drift")
      }
    } finally raf.close()
    // and the decompressed-stream offsets readSpark reports for .gz
    // could NOT have served: they exceed/misalign the compressed file
    val plainOffsets = WarcOps
      .readSpark(spark, tmp + "/part-*.warc.gz")
      .orderBy("rec_offset")
      .collect()
      .map(_.getAs[Long]("rec_offset"))
    assert(
      plainOffsets.toSeq != recs.map(_.getAs[Long]("rec_offset")).toSeq,
      "decompressed offsets must differ from member offsets (else this spec proves nothing)"
    )
  }

  test("streaming CDX: the index built on the ingest stream equals the batch index") {
    val docs = Seq((35L, t), (3L, t), (7L, t)).toDF("doc_id", "text")
    val pages = docs.select(
      col("doc_id"),
      concat(lit("http://h.example.com/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val tmp = graft.sources.Scratch.dir("cdx_stream_spec")
    WarcOps.writeSpark(pages, tmp, nFiles = 2)
    // cdxIndex is wholly row-local, so it composes onto the stream
    val q = WarcOps
      .cdxIndex(WarcOps.ingestStream(spark, tmp))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("cdx_stream_out")
      .start()
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("warc_file", "rec_offset", "rec_length", "urlkey", "cdx_ts", "http_status", "digest")
      .collect()
      .map(_.toSeq)
      .sortBy(_.toString)
      .toSeq
    val streamed = canon(spark.table("cdx_stream_out"))
    val batch = canon(WarcOps.cdxIndex(WarcOps.readSpark(spark, tmp + "/part-*.warc")))
    assert(streamed == batch, "stream-built CDX must equal the batch index")
    assert(streamed.nonEmpty)
  }

  test("revisit records: payload-identical refetches dedup to headers; changed pages restore") {
    // renderer: the revisit profile headers are present in the bytes
    val raw = new String(
      WarcOps.recordRaw(
        "1" * 36,
        "http://h/x",
        "revisit",
        "message/http",
        "",
        Seq("WARC-Refers-To-Target-URI" -> "http://h/x")
      ),
      java.nio.charset.StandardCharsets.UTF_8
    )
    assert(raw.contains("WARC-Refers-To-Target-URI: http://h/x"))
    assert(raw.contains("Content-Length: 0"))
    // end-to-end: doc 6 changes INSIDE the 280-char render window ->
    // response; doc 3's text changes BEYOND it (payload identical) ->
    // revisit; doc 7 unchanged -> revisit
    val docs = Seq((6L, "the cat sat"), (3L, "z" * 300), (7L, t)).toDF("doc_id", "text")
    def plant(d: org.apache.spark.sql.DataFrame) = d.select(
      col("doc_id"),
      concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val prev = graft.sources.Scratch.dir("revisit_spec_prev")
    WarcOps.writeSpark(plant(docs), prev, nFiles = 1)
    val cdx1 = WarcOps
      .cdxIndex(WarcOps.readSpark(spark, prev + "/part-*.warc"))
      .select(col("url").as("uri"), col("digest"))
    val docs2 = docs.select(
      col("doc_id"),
      expr("CASE WHEN doc_id % 3 = 0 THEN concat(text, ' updated') ELSE text END").as("text")
    )
    val out = graft.sources.Scratch.dir("revisit_spec")
    WarcOps.writeRevisitSpark(plant(docs2), cdx1, out, nFiles = 1)
    val back = WarcOps
      .readSpark(spark, out + "/part-*.warc")
      .collect()
      .map(r =>
        r.getAs[String]("target_uri").split("/").last.toLong ->
          ((r.getAs[String]("warc_type"), r.getAs[String]("body"), r.getAs[Long]("rec_length")))
      )
      .toMap
    assert(back(6L)._1 == "response" && back(6L)._2.contains("updated"), s"got ${back(6L)}")
    assert(back(3L)._1 == "revisit" && back(3L)._2 == "", "beyond-window change must dedup")
    assert(back(7L)._1 == "revisit" && back(7L)._2 == "")
    // the dedup actually saves bytes: doc 3's revisit member is
    // header-sized, far under the record crawl 1 stored for it
    val prevLen = WarcOps
      .readSpark(spark, prev + "/part-*.warc")
      .filter(col("target_uri") === "http://h/doc/3")
      .collect()
      .head
      .getAs[Long]("rec_length")
    assert(
      back(3L)._3 < prevLen / 2 && back(3L)._3 < 400,
      s"revisit not small: ${back(3L)._3} vs stored $prevLen"
    )
  }

  test("streaming frontier: WARC ingest -> URL extraction -> politeness scheduling composes as one stream") {
    // the crawl loop's discovery leg: segments land, their pages name
    // new doc ids, and the frontier schedules the NEXT fetches with
    // per-host slot counters that survive batch boundaries
    val docsA = Seq((141L, t), (101L, t)).toDF("doc_id", "text")
    val docsB = Seq((161L, t)).toDF("doc_id", "text")
    def pagesOf(d: org.apache.spark.sql.DataFrame) = d.select(
      col("doc_id"),
      concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val dir = graft.sources.Scratch.dir("frontier_stream_spec")
    WarcOps.writeSpark(pagesOf(docsA), dir, nFiles = 1)
    val q = graft.llm.Urls
      .scheduleStream(
        WarcOps
          .ingestStream(spark, dir)
          .select(
            regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
            lit("x").as("text")
          )
      )
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("frontier_stream_out")
      .start()
    q.processAllAvailable()
    // a LATE segment names doc 161 (same host as 141) — its slot must
    // CONTINUE the host's politeness sequence
    WarcOps.writeSpark(pagesOf(docsB), dir + "/more", nFiles = 1)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir + "/more/part-00000.warc"),
      java.nio.file.Paths.get(dir + "/part-late.warc")
    )
    q.processAllAvailable()
    q.stop()
    val got = spark
      .table("frontier_stream_out")
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("slot"), r.getAs[Long]("fetch_at_ms"))))
      .toMap
    assert(!got.contains(101L), "robots-disallowed URL scheduled from the WARC stream")
    assert(got(141L) == ((1L, 0L)) && got(161L) == ((2L, 1000L)), s"got $got")
  }

  test("discovery stream with the dedup leg: re-discovered URLs suppressed, slot sequence continues") {
    // the COMPLETE discovery loop: WARC ingest → URL extraction →
    // canonical dedup (watermark + persisted-store anti-join:
    // at-most-once-EVER emission) → robots → politeness slots — two
    // coupled streaming queries connected by the frontier store (the
    // storage-linked composition a production crawler runs)
    val dir = graft.sources.Scratch.dir("discovery_dedup_spec")
    val store = graft.sources.Scratch.dir("discovery_dedup_store") + "/canon"
    graft.llm.Urls.seedUrlStore(
      Seq.empty[(Long, String, java.sql.Timestamp)].toDF("doc_id", "url", "ts"),
      store
    )
    def pagesOf(ids: Seq[Long]) = ids
      .map(i => (i, t))
      .toDF("doc_id", "text")
      .select(
        col("doc_id"),
        concat(lit("http://site4.example.com/doc/"), col("doc_id").cast("string")).as("uri"),
        expr(graft.llm.Curation.htmlPlantExpr).as("html")
      )
    WarcOps.writeSpark(pagesOf(Seq(141L, 151L)), dir, nFiles = 1, date = "2024-01-01T00:00:00Z")
    def ingest() = WarcOps
      .ingestStream(spark, dir)
      .select(
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("target_uri").as("url"),
        to_timestamp(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("ts")
      )
    val q1a = graft.llm.Urls.urlDedupIngest(ingest(), store)
    // stage 2: the store's appended survivors ARE the discovery log —
    // stream them into the robots screen + per-host slot counters
    val frontier = spark.readStream
      .schema(spark.read.parquet(store).schema)
      .parquet(store)
      .select(col("doc_id"), concat(lit("http://"), col("canon")).as("url"))
    val q2 = graft.llm.Urls
      .scheduleStreamUrls(frontier)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("discovery_dedup_out")
      .start()
    q1a.processAllAvailable()
    q2.processAllAvailable()
    // RESTART stage 1 with FRESH streaming state (no checkpoint): the
    // late segment re-discovers 141 and names new 161, and the rewound
    // source also replays segment 1 — at-most-once-ever now rests
    // ENTIRELY on the persisted store's anti-join
    q1a.stop()
    WarcOps.writeSpark(pagesOf(Seq(141L, 161L)), dir + "/more", nFiles = 1, date = "2024-02-01T00:00:00Z")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir + "/more/part-00000.warc"),
      java.nio.file.Paths.get(dir + "/part-late.warc")
    )
    val q1b = graft.llm.Urls.urlDedupIngest(ingest(), store)
    q1b.processAllAvailable()
    q2.processAllAvailable()
    q1b.stop()
    q2.stop()
    val rows = spark
      .table("discovery_dedup_out")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("slot"), r.getAs[Long]("fetch_at_ms")))
    assert(rows.length == 3, s"each canonical URL must be scheduled exactly once ever: $rows")
    val slots = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    // site4's delay class: 500 · (1 + 4 % 3) = 1000 ms; 161 CONTINUES
    // the host's sequence (slot 3) even though its batch followed a
    // stage-1 restart and a re-discovery
    assert(slots(141L) == ((1L, 0L)), s"got $slots")
    assert(slots(151L) == ((2L, 1000L)), s"got $slots")
    assert(slots(161L) == ((3L, 2000L)), s"got $slots")
  }

  test("dated CDX merge: latest capture wins by WARC-Date, ingest order irrelevant, coordinates serve") {
    // a malformed writer date fails loudly, before any bytes land
    intercept[IllegalArgumentException](WarcOps.record("x", "http://h/", "b", "2024-13-99"))
    val short = "tiny doc about a cat"
    val docs1 = Seq((3L, short + " one"), (5L, short + " base")).toDF("doc_id", "text")
    val docs2 = Seq((3L, short + " two"), (5L, short + " base")).toDF("doc_id", "text")
    val docs3 = Seq((3L, short + " midway")).toDF("doc_id", "text")
    def pages(d: org.apache.spark.sql.DataFrame) = d.select(
      col("doc_id"),
      concat(lit("http://site4.example.com/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val root = graft.sources.Scratch.dir("cdx_merge_spec")
    WarcOps.writeSpark(pages(docs1), root + "/c1", nFiles = 1, date = "2024-01-15T00:00:00Z")
    WarcOps.writeSpark(pages(docs2), root + "/c2", nFiles = 1, date = "2024-03-15T00:00:00Z")
    WarcOps.writeSpark(pages(docs3), root + "/c3", nFiles = 1, date = "2024-02-15T00:00:00Z")
    def cdxOf(sub: String) = WarcOps
      .cdxIndex(WarcOps.readSpark(spark, root + s"/$sub/part-*.warc"))
      .filter(col("warc_type") === "response")
      .withColumn("warc_file", concat_ws("/", lit(sub), col("warc_file")))
    // ingest deliberately OUT of capture order, with the OLDER February
    // crawl (c3) arriving after the March one (c2): capture time, not
    // ingestion order, must pick the winner
    val m1 = WarcOps.cdxMergeLatest(cdxOf("c2").unionByName(cdxOf("c1")).unionByName(cdxOf("c3")))
    val m2 = WarcOps.cdxMergeLatest(cdxOf("c3").unionByName(cdxOf("c2")).unionByName(cdxOf("c1")))
    val rows = m1.collect().map(r => r.getAs[String]("urlkey") -> r).toMap
    val d3 = rows("com,example,site4)/doc/3")
    assert(d3.getAs[String]("latest_ts") == "20240315000000", "March must win over later-ingested February")
    assert(d3.getAs[Long]("n_caps") == 3L)
    assert(rows("com,example,site4)/doc/5").getAs[Long]("n_caps") == 2L)
    assert(
      m1.orderBy("urlkey").collect().toSeq == m2.orderBy("urlkey").collect().toSeq,
      "merge must be ingestion-order invariant"
    )
    // the merged coordinates stay SERVABLE across crawl directories:
    // a ranged fetch of each winner returns the LATEST body bytes
    val wanted = m1.select(
      regexp_extract(col("urlkey"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
      col("warc_file"),
      col("rec_offset"),
      col("rec_length")
    )
    val served = WarcOps
      .fetchRecords(wanted, root)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[String]("fetch_md5"))
      .toMap
    val expect = pages(docs2)
      .select(col("doc_id"), md5(col("html")))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(served(3L) == expect(3L), "doc 3 must serve the March capture's bytes")
    assert(served(5L) == expect(5L))
  }

  test("recrawl priority: a frequently-changing URL outranks a static one within its host") {
    // in-memory chain in cdxIndex's column shape: X changes every
    // capture, Y never does — same host, so they compete for slots
    val chain = Seq(
      ("com,example,site4)/x", "http://site4.example.com/x", "20240101000000", "d1"),
      ("com,example,site4)/x", "http://site4.example.com/x", "20240201000000", "d2"),
      ("com,example,site4)/x", "http://site4.example.com/x", "20240301000000", "d3"),
      ("com,example,site4)/y", "http://site4.example.com/y", "20240101000000", "e1"),
      ("com,example,site4)/y", "http://site4.example.com/y", "20240201000000", "e1"),
      ("com,example,site4)/y", "http://site4.example.com/y", "20240301000000", "e1")
    ).toDF("urlkey", "url", "cdx_ts", "digest")
    val sched = WarcOps
      .prioritySchedule(WarcOps.recrawlPriority(chain))
      .collect()
      .map(r => r.getAs[String]("urlkey") -> r)
      .toMap
    val x = sched("com,example,site4)/x")
    val y = sched("com,example,site4)/y")
    assert(x.getAs[Long]("rate_ppm") == 1000000L && y.getAs[Long]("rate_ppm") == 0L)
    assert(x.getAs[Long]("slot") == 1L && y.getAs[Long]("slot") == 2L, "changing URL must take slot 1")
    assert(x.getAs[Long]("fetch_at_ms") < y.getAs[Long]("fetch_at_ms"))
    // the same operator off REAL dated segments: two crawls of one page
    // whose text changes — the archive's own history drives the estimate
    val root = graft.sources.Scratch.dir("crawl_priority_spec")
    def onePage(txt: String) = Seq((9L, txt))
      .toDF("doc_id", "text")
      .select(
        col("doc_id"),
        lit("http://site4.example.com/doc/9").as("uri"),
        expr(graft.llm.Curation.htmlPlantExpr).as("html")
      )
    WarcOps.writeSpark(onePage("cat doc v1"), root + "/c1", nFiles = 1, date = "2024-01-01T00:00:00Z")
    WarcOps.writeSpark(onePage("cat doc v2"), root + "/c2", nFiles = 1, date = "2024-02-01T00:00:00Z")
    def cdxOf(sub: String) = WarcOps
      .cdxIndex(WarcOps.readSpark(spark, root + s"/$sub/part-*.warc"))
      .filter(col("warc_type") === "response")
    val pri = WarcOps.recrawlPriority(cdxOf("c1").unionByName(cdxOf("c2"))).collect()
    assert(pri.length == 1)
    assert(pri.head.getAs[Long]("n_caps") == 2L && pri.head.getAs[Long]("n_changes") == 1L)
    assert(pri.head.getAs[Long]("rate_ppm") == 1000000L)
  }

  test("write/read route through the Hadoop FileSystem API (explicit file: scheme URI)") {
    val docs = Seq((35L, t), (3L, t)).toDF("doc_id", "text")
    val pages = docs.select(
      col("doc_id"),
      concat(lit("http://h/doc/"), col("doc_id").cast("string")).as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val local = graft.sources.Scratch.dir("warc_fs_spec")
    val fsUri = "file://" + local // resolved by Path.getFileSystem, not java.io
    WarcOps.writeSpark(pages, fsUri, nFiles = 2)
    // no tmp write-aside files may survive the rename discipline
    val leftovers = new java.io.File(local).listFiles().map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"write-aside leftovers: ${leftovers.mkString(",")}")
    val back = WarcOps.readSpark(spark, fsUri + "/part-*.warc")
    assert(back.count() == 2)
    val bodies = back.select("body").as[String].collect().toSet
    val want = pages.select("html").as[String].collect().toSet
    assert(bodies == want, "fs-routed round trip must be byte-exact")
  }
}
