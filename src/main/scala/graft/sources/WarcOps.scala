package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** WARC (ISO 28500 / WARC-1.0) container source — the format web crawl
  * data actually arrives in: Common Crawl ships ~90 000 WARC segments
  * per monthly crawl, and a 100 TB curation run parses them before the
  * HTML stage (`text_html_extract`) can see a byte. This closes the
  * ingest chain: WARC → HTML → text → curation.
  *
  * Writer: a distributed `foreachPartition` egress (the EDF writeSpark
  * shape) — each task renders its partition's pages as `response`
  * records (WARC headers + an HTTP/1.1 response payload) into ONE
  * `part-NNNNN.warc` segment, so an n-file corpus writes with n-task
  * parallelism and no driver data movement.
  *
  * Reader: `binaryFiles` glob + a row-local record parser
  * (`mapPartitions`-class codec — the documented honest form for
  * sequential byte formats, EDF precedent): scan for the `WARC/1.0`
  * magic, read headers to the blank line, take exactly
  * `Content-Length` payload bytes, split the HTTP payload at its
  * header/body boundary. The FILE is the parallelism unit (real WARC
  * segments are ~1 GiB by convention — thousands of files at crawl
  * scale, same argument as the EDF corpus reader).
  *
  * Parsing is STRICT (a malformed record throws with its file/offset
  * rather than silently resyncing — crawl-side truncation should
  * surface in the job, not vanish into row loss); record ORDER within
  * a file is not assumed by any consumer.
  */
object WarcOps {

  private val CRLF = "\r\n"

  /** Render one WARC/1.0 record of the given `warcType` with a RAW
    * payload (no HTTP envelope) — the WET (`conversion`) / WAT
    * (`metadata`) record shape (r15: the Common Crawl sibling formats
    * are themselves WARC containers, differing only in record type and
    * payload).
    */
  def recordRaw(
      recordId: String,
      targetUri: String,
      warcType: String,
      contentType: String,
      body: String
  ): Array[Byte] = {
    val payload = body.getBytes(StandardCharsets.UTF_8)
    val head = "WARC/1.0" + CRLF +
      s"WARC-Type: $warcType" + CRLF +
      s"WARC-Record-ID: <urn:uuid:$recordId>" + CRLF +
      "WARC-Date: 2024-01-01T00:00:00Z" + CRLF +
      s"WARC-Target-URI: $targetUri" + CRLF +
      s"Content-Type: $contentType" + CRLF +
      s"Content-Length: ${payload.length}" + CRLF + CRLF
    val hb = head.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](hb.length + payload.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(payload, 0, out, hb.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Render one WARC/1.0 `response` record. `body` is the HTTP entity
    * (ASCII or UTF-8); the HTTP status line + headers are synthesized.
    */
  def record(recordId: String, targetUri: String, body: String): Array[Byte] =
    recordRaw(
      recordId,
      targetUri,
      "response",
      "application/http; msgtype=response",
      "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF + CRLF + body
    )

  /** Distributed WARC egress of a (doc_id, uri, html) frame: `nFiles`
    * segments, one per task.
    *
    * Cluster-portable (r15): each task writes through the Hadoop
    * `FileSystem` resolved FROM the output path (so `outDir` may be
    * `hdfs://`, `s3a://`, or a bare local path routed by
    * `fs.defaultFS`) with the write-aside + rename discipline the
    * compaction code uses (`Scale.compactFiles`): the segment lands at
    * `.part-NNNNN.warc.tmp` and is renamed into place only after a
    * clean close, so a killed task can never leave a half-written
    * segment under the final name. The driver's Hadoop configuration
    * rides to executors via [[org.apache.spark.SerializableWritable]].
    */
  def writeSpark(
      pages: DataFrame,
      outDir: String,
      nFiles: Int = 4,
      gzip: Boolean = false,
      warcinfo: Boolean = false
  ): Unit =
    writeRows(
      pages.select(col("doc_id"), col("uri"), col("html")),
      outDir,
      nFiles,
      if (gzip) ".warc.gz" else ".warc",
      (id, uri, body) => {
        val rec = record(f"$id%016x-0000-0000-0000-000000000000", uri, body)
        if (gzip) gzipMember(rec) else rec
      },
      // real CC segments open with a warcinfo header record describing
      // the writer (its own gzip member in .gz segments); readers see
      // it as warc_type='warcinfo' and filter on type
      header =
        if (!warcinfo) None
        else {
          val info = recordRaw(
            "ffffffff-0000-0000-0000-000000000000",
            "",
            "warcinfo",
            "application/warc-fields",
            "software: graft\r\nformat: WARC File Format 1.0\r\n"
          )
          Some(if (gzip) gzipMember(info) else info)
        }
    )

  /** One gzip MEMBER per record — the actual Common Crawl convention
    * (every .warc.gz is a concatenation of independently-compressed
    * members, so a byte-range fetch of one record decompresses without
    * the rest of the segment). The reader needs no per-record framing:
    * `GZIPInputStream` transparently reads concatenated members, so
    * the same incremental [[parseStream]] runs over the decompressed
    * stream.
    */
  private def gzipMember(rec: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(rec.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(rec)
    gz.finish()
    gz.close()
    bos.toByteArray
  }

  /** WET egress — the Common Crawl extracted-text derivative: one
    * `conversion` record per page, payload = the page's clean text
    * (what [[graft.llm.Curation.htmlExtractTextPages]] emits). Input
    * frame: (doc_id, uri, text).
    */
  def writeWetSpark(
      texts: DataFrame,
      outDir: String,
      nFiles: Int = 4,
      gzip: Boolean = false
  ): Unit =
    writeRows(
      texts.select(col("doc_id"), col("uri"), col("text")),
      outDir,
      nFiles,
      if (gzip) ".wet.gz" else ".wet",
      (id, uri, body) => {
        val rec =
          recordRaw(f"$id%016x-0000-0000-0000-000000000001", uri, "conversion", "text/plain", body)
        if (gzip) gzipMember(rec) else rec
      }
    )

  /** WAT egress — the Common Crawl metadata derivative: one `metadata`
    * record per page, payload = a JSON summary of the page. Input
    * frame: (doc_id, uri, json).
    */
  def writeWatSpark(
      meta: DataFrame,
      outDir: String,
      nFiles: Int = 4,
      gzip: Boolean = false
  ): Unit =
    writeRows(
      meta.select(col("doc_id"), col("uri"), col("json")),
      outDir,
      nFiles,
      if (gzip) ".wat.gz" else ".wat",
      (id, uri, body) => {
        val rec = recordRaw(
          f"$id%016x-0000-0000-0000-000000000002",
          uri,
          "metadata",
          "application/json",
          body
        )
        if (gzip) gzipMember(rec) else rec
      }
    )

  /** The shared distributed egress: `nFiles` segments, one per task,
    * through the Hadoop FileSystem with write-aside + rename. */
  private def writeRows(
      rows: DataFrame,
      outDir: String,
      nFiles: Int,
      suffix: String,
      render: (Long, String, String) => Array[Byte],
      header: Option[Array[Byte]] = None
  ): Unit = {
    val spark = rows.sparkSession
    import spark.implicits._
    val hconf =
      new org.apache.spark.SerializableWritable(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(outDir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(root)
    rows
      .as[(Long, String, String)]
      .repartition(nFiles, col(rows.columns.head))
      .foreachPartition { (it: Iterator[(Long, String, String)]) =>
        if (it.hasNext) { // empty partitions write no file
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val dir = new org.apache.hadoop.fs.Path(outDir)
          val fs = dir.getFileSystem(hconf.value)
          val tmp = new org.apache.hadoop.fs.Path(dir, f".part-$pid%05d$suffix.tmp")
          val dst = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d$suffix")
          val out = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
          try {
            header.foreach(out.write)
            it.foreach { case (id, uri, body) => out.write(render(id, uri, body)) }
          } finally out.close()
          if (fs.exists(dst)) fs.delete(dst, false)
          require(fs.rename(tmp, dst), s"WARC egress: rename $tmp -> $dst failed")
        }
      }
  }

  /** Parse every record of one WARC segment INCREMENTALLY off an
    * `InputStream` — task memory is O(one record), never O(segment),
    * so a ~1 GiB-by-convention Common Crawl segment parses in a small
    * constant heap (r15 — the readSpark `pds.toArray()` cliff is gone).
    * Emits (offset, recordId, targetUri, httpStatus, body).
    *
    * The parser is strictly sequential (one byte of lookahead), which
    * is all WARC needs: headers to the blank line, then exactly
    * `Content-Length` payload bytes. Strictness contract unchanged: a
    * malformed record throws with its file + offset.
    */
  private[graft] def parseStream(
      file: String,
      in0: java.io.InputStream
  ): Iterator[(Long, String, String, String, String, String)] =
    new Iterator[(Long, String, String, String, String, String)] {
      private val in = new java.io.BufferedInputStream(in0, 1 << 16)
      private var pos = 0L // offset of `la` within the segment
      private var la: Int = in.read() // one-byte lookahead; -1 = EOF
      private def consume(): Int = { val b = la; la = in.read(); pos += 1; b }
      // skip CRLFs between records / at EOF (record terminator is CRLFCRLF)
      private def skipCrlf(): Unit =
        while (la == '\r') {
          consume()
          require(consume() == '\n', s"$file: bare CR between records at offset ${pos - 2}")
        }
      skipCrlf()
      def hasNext: Boolean = la != -1
      def next(): (Long, String, String, String, String, String) = {
        val off = pos
        def line(): String = {
          val start = pos
          val sb = new java.lang.StringBuilder(64)
          var done = false
          while (!done) {
            val b = consume()
            require(b != -1, s"$file: truncated header line at offset $start")
            if (b == '\r') {
              require(consume() == '\n', s"$file: bare CR in header line at offset $start")
              done = true
            } else sb.append(b.toChar) // WARC named headers are ASCII
          }
          sb.toString
        }
        val magic = line()
        require(magic == "WARC/1.0", s"$file: bad WARC magic '$magic' at offset $off")
        var recordId = ""; var uri = ""; var len = -1; var wtype = ""
        var h = line()
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          require(i > 0, s"$file: malformed WARC header '$h' at offset $off")
          val (k, v) = (h.substring(0, i).trim, h.substring(i + 1).trim)
          k match {
            case "WARC-Record-ID"  => recordId = v
            case "WARC-Target-URI" => uri = v
            case "WARC-Type"       => wtype = v
            case "Content-Length"  => len = v.toInt
            case _                 => ()
          }
          h = line()
        }
        require(len >= 0, s"$file: record at offset $off missing Content-Length")
        require(wtype.nonEmpty, s"$file: record at offset $off missing WARC-Type")
        val buf = new Array[Byte](len)
        if (len > 0) {
          require(la != -1, s"$file: truncated payload at offset $off")
          buf(0) = la.toByte // the lookahead byte is payload byte 0
          var got = 1
          while (got < len) {
            val n = in.read(buf, got, len - got)
            require(n > 0, s"$file: truncated payload at offset $off")
            got += n
          }
          pos += len
          la = in.read()
        }
        val payload = new String(buf, StandardCharsets.UTF_8)
        skipCrlf()
        if (wtype == "response") {
          // HTTP payload: status line, headers, blank line, body
          val hdrEnd = payload.indexOf(CRLF + CRLF)
          require(hdrEnd > 0, s"$file: payload at offset $off has no HTTP header terminator")
          val statusLine = payload.substring(0, payload.indexOf(CRLF))
          val sp = statusLine.indexOf(' ')
          require(
            sp > 0 && sp + 1 < statusLine.length,
            s"$file: malformed HTTP status line '$statusLine' at offset $off"
          )
          val status = statusLine.substring(sp + 1).split(" ")(0)
          val body = payload.substring(hdrEnd + 4)
          (off, recordId, uri, wtype, status, body)
        } else {
          // conversion (WET) / metadata (WAT) / request / warcinfo:
          // the payload IS the body — no HTTP envelope, no status
          (off, recordId, uri, wtype, "", payload)
        }
      }
    }

  /** Byte-array convenience wrapper over [[parseStream]] — the
    * streaming ingest path (the `binaryFile` source hands whole-file
    * `content` bytes by contract) and specs.
    */
  private[graft] def parseRecords(
      file: String,
      bytes: Array[Byte]
  ): Iterator[(Long, String, String, String, String, String)] =
    parseStream(file, new java.io.ByteArrayInputStream(bytes))

  /** Distributed WARC read: one task per segment file (the EDF corpus
    * parallelism argument), row-local strict parsing — INCREMENTAL off
    * the `PortableDataStream` (r15): the segment is never materialized
    * in task memory; the stream closes on iterator exhaustion and (for
    * failed/short-circuited tasks) on task completion.
    */
  def readSpark(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(glob)
      .flatMap { case (path, pds) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        // gzip sniffed by MAGIC, not extension (a glob may mix plain
        // and .gz segments); GZIPInputStream reads the concatenated
        // per-record members transparently, so offsets are within the
        // DECOMPRESSED stream for gz segments
        val raw = new java.io.BufferedInputStream(pds.open(), 1 << 16)
        raw.mark(2)
        val b0 = raw.read(); val b1 = raw.read()
        raw.reset()
        val in: java.io.InputStream =
          if (b0 == 0x1f && b1 == 0x8b) new java.util.zip.GZIPInputStream(raw, 1 << 16) else raw
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => in.close())
        parseStream(name, in).map { case (off, rid, uri, wtype, status, body) =>
          (name, off, rid, wtype, uri, status, body)
        }
      }
      .toDF("warc_file", "rec_offset", "record_id", "warc_type", "target_uri", "http_status", "body")
  }

  /** STREAMING WARC ingest — the crawl-side arrival pattern: segment
    * files land in a directory and each micro-batch parses only the
    * NEW files (Structured Streaming's `binaryFile` source tracks seen
    * paths; maxFilesPerTrigger bounds batch size). The parse is the
    * same strict row-local codec as [[readSpark]] and entirely
    * stateless, so downstream row-local stages (`htmlExtractTextPages`
    * → quality screens) compose onto the stream unchanged — the
    * streaming twin of the WARC → HTML → text chain (spec pins
    * stream ≡ batch and incremental pickup).
    */
  def ingestStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 8): DataFrame = {
    import spark.implicits._
    spark.readStream
      .format("binaryFile")
      // the source's FIXED schema — streaming sources refuse inference
      .schema(
        org.apache.spark.sql.types.StructType(
          Seq(
            org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types
              .StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)
          )
        )
      )
      .option("pathGlobFilter", "*.warc")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        parseRecords(name, bytes).map { case (off, rid, uri, wtype, status, body) =>
          (name, off, rid, wtype, uri, status, body)
        }
      }
      .toDF("warc_file", "rec_offset", "record_id", "warc_type", "target_uri", "http_status", "body")
  }

  /** Gate: documents → planted HTML pages → WARC segments → parse back,
    * proven content-preserving by per-record body hashes the oracle
    * recomputes straight off the parquet (jsonl_roundtrip shape; the
    * htmlPlantExpr is already a dual-dialect string).
    */
  def roundtripAgg(s: SparkSession, dir: String, gzip: Boolean = false): DataFrame = {
    val pages = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        concat(
          lit("http://site"),
          (col("doc_id") % 20).cast("string"),
          lit(".example.com/doc/"),
          col("doc_id").cast("string")
        ).as("uri"),
        expr(graft.llm.Curation.htmlPlantExpr).as("html")
      )
    val out = Scratch.dir(if (gzip) "warc_gz_roundtrip" else "warc_roundtrip")
    writeSpark(pages, out, nFiles = 4, gzip = gzip)
    readSpark(s, out + (if (gzip) "/part-*.warc.gz" else "/part-*.warc"))
      .select(
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("target_uri"),
        col("http_status"),
        length(col("body")).cast("long").as("n_body_chars"),
        md5(col("body")).as("body_md5")
      )
  }

  val roundtripAggSql: String =
    "WITH pages AS (SELECT doc_id, " +
      "concat('http://site', CAST(doc_id % 20 AS STRING), '.example.com/doc/', CAST(doc_id AS STRING)) AS target_uri, " +
      s"${graft.llm.Curation.htmlPlantExpr} AS html FROM documents) " +
      "SELECT doc_id, target_uri, '200' AS http_status, " +
      "CAST(length(html) AS BIGINT) AS n_body_chars, md5(html) AS body_md5 FROM pages"

  /** Integration gate: the FULL ingest chain under the oracle — pages
    * written to real WARC segments, parsed back, and run through the
    * HTML extraction; the oracle computes the extraction straight off
    * the planted pages, so a hash match proves the file round-trip is
    * byte-exact AND the extraction is path-independent.
    */
  def warcHtmlExtract(s: SparkSession, dir: String): DataFrame = {
    val pages = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        concat(
          lit("http://site"),
          (col("doc_id") % 20).cast("string"),
          lit(".example.com/doc/"),
          col("doc_id").cast("string")
        ).as("uri"),
        expr(graft.llm.Curation.htmlPlantExpr).as("html")
      )
    val out = Scratch.dir("warc_html_extract")
    writeSpark(pages, out, nFiles = 4)
    graft.llm.Curation.htmlExtractPages(
      readSpark(s, out + "/part-*.warc")
        .select(
          regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
          col("body").as("html")
        )
    )
  }

  /** STREAMING WET egress — the emission twin of [[ingestStream]]: a
    * crawl pipeline streams WARC segments in and WET derivatives out.
    * Each micro-batch's (doc_id, uri, text) rows land as WET segments
    * under `outDir/batch-<id>/` through the SAME distributed
    * Hadoop-FS writer (foreachBatch — per-batch directories keep
    * segment names collision-free across batches; a restart re-runs
    * an uncommitted batch into the same directory, and the write-aside
    * + rename discipline makes that overwrite clean). Read back with
    * readSpark over the glob `batch-&#47;part-&#42;.wet`.
    */
  def emitWetStream(
      texts: DataFrame,
      outDir: String,
      checkpoint: String,
      nFiles: Int = 2
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) =>
      if (!batch.isEmpty) writeWetSpark(batch, f"$outDir/batch-$batchId%05d", nFiles)
    texts.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch(fn)
      .start()
  }

  private def uriExpr =
    concat(
      lit("http://site"),
      (col("doc_id") % 20).cast("string"),
      lit(".example.com/doc/"),
      col("doc_id").cast("string")
    )

  /** WET round trip: plant pages → extraction → WET segments → parse
    * back; the oracle recomputes the extraction's clean text straight
    * off the plant (shared CTE chain with text_html_extract), so a
    * hash match proves WET bodies ARE the extraction output and the
    * conversion-record file leg is byte-exact.
    */
  def wetRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val pages = Tables
      .documents(s, dir)
      .select(col("doc_id"), expr(graft.llm.Curation.htmlPlantExpr).as("html"))
    val wet = graft.llm.Curation
      .htmlExtractTextPages(pages)
      .select(col("doc_id"), uriExpr.as("uri"), col("text"))
    val out = Scratch.dir("wet_roundtrip")
    writeWetSpark(wet, out)
    readSpark(s, out + "/part-*.wet")
      .select(
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        length(col("body")).cast("long").as("n_wet_chars"),
        md5(col("body")).as("wet_md5")
      )
  }

  val wetRoundtripSql: String =
    s"WITH ${graft.llm.Curation.htmlExtractCtes} " +
      "SELECT doc_id, CAST(length(cleaned) AS BIGINT) AS n_wet_chars, md5(cleaned) AS wet_md5 " +
      "FROM outp"

  /** WAT round trip: the per-page metadata JSON (title + block counts
    * + clean-char count + the OUTLINK list — what a link-graph stage
    * like curate_pagerank consumes straight from WAT without
    * re-parsing HTML; r15 enrichment) written as `metadata` records
    * and parsed back VERBATIM — the gate output carries the JSON body
    * itself, so the oracle's recomputed string must match
    * character-for-character. Outlinks come from the quote-bounded
    * href group ([^"]*), so the values can never contain a quote and
    * the JSON array needs no escaping.
    */
  def watRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val pages = Tables
      .documents(s, dir)
      .select(col("doc_id"), expr(graft.llm.Curation.htmlPlantExpr).as("html"))
      .localCheckpoint() // feeds the extraction AND the outlink scan
    val links = pages.select(
      col("doc_id"),
      expr("regexp_extract_all(html, '<a href=\"([^\"]*)\"', 1)").as("links")
    )
    val meta = graft.llm.Curation
      .htmlExtractPages(pages)
      .join(links, Seq("doc_id"))
      .select(
        col("doc_id"),
        uriExpr.as("uri"),
        concat(
          lit("{\"title\":\""),
          col("title"),
          lit("\",\"n_blocks\":"),
          col("n_blocks").cast("string"),
          lit(",\"n_kept\":"),
          col("n_kept").cast("string"),
          lit(",\"n_clean_chars\":"),
          col("n_clean_chars").cast("string"),
          lit(",\"links\":"),
          when(size(col("links")) === 0, lit("[]"))
            .otherwise(concat(lit("[\""), array_join(col("links"), "\",\""), lit("\"]"))),
          lit("}")
        ).as("json")
      )
    val out = Scratch.dir("wat_roundtrip")
    writeWatSpark(meta, out)
    readSpark(s, out + "/part-*.wat")
      .select(
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("body").as("wat_json")
      )
  }

  val watRoundtripSql: String =
    s"WITH ${graft.llm.Curation.htmlExtractCtes}, " +
      "lk AS (SELECT doc_id, regexp_extract_all(html, '<a href=\"([^\"]*)\"', 1) AS links FROM aug) " +
      "SELECT o.doc_id, concat('{\"title\":\"', o.title, '\",\"n_blocks\":', " +
      "CAST(o.n_blocks AS VARCHAR), ',\"n_kept\":', CAST(o.n_kept AS VARCHAR), " +
      "',\"n_clean_chars\":', CAST(CAST(length(o.cleaned) AS BIGINT) AS VARCHAR), " +
      "',\"links\":', CASE WHEN len(lk.links) = 0 THEN '[]' " +
      "ELSE concat('[\"', array_to_string(lk.links, '\",\"'), '\"]') END, '}') AS wat_json " +
      "FROM outp o JOIN lk ON lk.doc_id = o.doc_id"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "warc_roundtrip" -> { (s, dir) => roundtripAgg(s, dir) },
    "warc_gz_roundtrip" -> { (s, dir) => roundtripAgg(s, dir, gzip = true) },
    "warc_html_extract" -> { (s, dir) => warcHtmlExtract(s, dir) },
    "wet_roundtrip" -> { (s, dir) => wetRoundtrip(s, dir) },
    "wat_roundtrip" -> { (s, dir) => watRoundtrip(s, dir) }
  )

  def oracleSql: Map[String, String] = Map(
    "warc_roundtrip" -> roundtripAggSql,
    // same oracle — the compression leg must be invisible
    "warc_gz_roundtrip" -> roundtripAggSql,
    // the extraction oracle verbatim — the WARC leg must be invisible
    "warc_html_extract" -> graft.llm.Curation.htmlExtractSql,
    "wet_roundtrip" -> wetRoundtripSql,
    "wat_roundtrip" -> watRoundtripSql
  )
}
