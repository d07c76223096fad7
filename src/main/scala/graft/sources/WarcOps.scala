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

  /** Default capture timestamp when a writer isn't handed one. Every
    * date rendered into a record must keep this EXACT ISO-8601 Zulu
    * seconds shape (fixed 20 bytes) — the CDX length oracle's
    * arithmetic derives its constants from a probe render and holds
    * for any date of the same width ([[cdxFixed]]).
    */
  private[sources] val defaultWarcDate = "2024-01-01T00:00:00Z"

  private def requireWarcDate(date: String): Unit =
    require(
      date.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z"""),
      s"WARC-Date '$date' must be ISO-8601 Zulu seconds (yyyy-MM-ddTHH:mm:ssZ)"
    )

  /** Render one WARC/1.0 record of the given `warcType` with a RAW
    * payload (no HTTP envelope) — the WET (`conversion`) / WAT
    * (`metadata`) record shape (r15: the Common Crawl sibling formats
    * are themselves WARC containers, differing only in record type and
    * payload). `date` is the record's capture time (r16: threaded from
    * the writer so multi-crawl archives carry REAL per-crawl
    * timestamps — the dated cross-crawl CDX merge keys on it).
    */
  def recordRaw(
      recordId: String,
      targetUri: String,
      warcType: String,
      contentType: String,
      body: String,
      extraHeaders: Seq[(String, String)] = Seq.empty,
      date: String = defaultWarcDate
  ): Array[Byte] = {
    requireWarcDate(date)
    val payload = body.getBytes(StandardCharsets.UTF_8)
    val head = "WARC/1.0" + CRLF +
      s"WARC-Type: $warcType" + CRLF +
      s"WARC-Record-ID: <urn:uuid:$recordId>" + CRLF +
      s"WARC-Date: $date" + CRLF +
      s"WARC-Target-URI: $targetUri" + CRLF +
      extraHeaders.map { case (k, v) => s"$k: $v" + CRLF }.mkString +
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

  /** The synthesized HTTP envelope head of every `response` record —
    * exposed so the CDX length oracle derives its constants from the
    * ONE definition (editing the envelope can't silently skew the
    * oracle arithmetic).
    */
  private[sources] val httpHead: String =
    "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF + CRLF

  /** Render one WARC/1.0 `response` record. `body` is the HTTP entity
    * (ASCII or UTF-8); the HTTP status line + headers are synthesized.
    */
  def record(
      recordId: String,
      targetUri: String,
      body: String,
      date: String = defaultWarcDate
  ): Array[Byte] =
    recordRaw(
      recordId,
      targetUri,
      "response",
      "application/http; msgtype=response",
      httpHead + body,
      date = date
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
      warcinfo: Boolean = false,
      date: String = defaultWarcDate
  ): Unit =
    writeRows(
      pages.select(col("doc_id"), col("uri"), col("html")),
      outDir,
      nFiles,
      if (gzip) ".warc.gz" else ".warc",
      (id, uri, body, _) => {
        val rec = record(f"$id%016x-0000-0000-0000-000000000000", uri, body, date)
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
            "software: graft\r\nformat: WARC File Format 1.0\r\n",
            date = date
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
      gzip: Boolean = false,
      date: String = defaultWarcDate
  ): Unit =
    writeRows(
      texts.select(col("doc_id"), col("uri"), col("text")),
      outDir,
      nFiles,
      if (gzip) ".wet.gz" else ".wet",
      (id, uri, body, _) => {
        val rec =
          recordRaw(
            f"$id%016x-0000-0000-0000-000000000001",
            uri,
            "conversion",
            "text/plain",
            body,
            date = date
          )
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
      gzip: Boolean = false,
      date: String = defaultWarcDate
  ): Unit =
    writeRows(
      meta.select(col("doc_id"), col("uri"), col("json")),
      outDir,
      nFiles,
      if (gzip) ".wat.gz" else ".wat",
      (id, uri, body, _) => {
        val rec = recordRaw(
          f"$id%016x-0000-0000-0000-000000000002",
          uri,
          "metadata",
          "application/json",
          body,
          date = date
        )
        if (gzip) gzipMember(rec) else rec
      }
    )

  /** Crawl-over-crawl dedup at INGEST — the Common Crawl `revisit`
    * convention: when a refetched page's payload digest matches the
    * PREVIOUS crawl's CDX digest, the writer emits a `revisit` record
    * (WARC-Profile identical-payload-digest, WARC-Refers-To-Target-URI,
    * EMPTY payload) instead of re-storing the body — the storage dedup
    * that keeps month-over-month archive growth sublinear (unchanged
    * pages cost ~300 header bytes, not their payload). `pages` =
    * (doc_id, uri, html) of the new crawl; `priorCdx` = (uri, digest)
    * — the previous crawl's index IS the dedup store. The decision is
    * ONE equi-join on uri (hash-partitioned at any scale; no content
    * ever moves for unchanged pages beyond its local md5).
    */
  def writeRevisitSpark(
      pages: DataFrame,
      priorCdx: DataFrame,
      outDir: String,
      nFiles: Int = 4,
      date: String = defaultWarcDate
  ): Unit =
    writeRows(
      pages
        .select(col("doc_id"), col("uri"), col("html"))
        .join(priorCdx.select(col("uri"), col("digest").as("prior_digest")), Seq("uri"), "left")
        .select(
          col("doc_id"),
          col("uri"),
          col("html"),
          when(
            col("prior_digest").isNotNull && md5(col("html")) === col("prior_digest"),
            lit("revisit")
          ).otherwise(lit("response")).as("kind")
        ),
      outDir,
      nFiles,
      ".warc",
      (id, uri, body, kind) =>
        if (kind == "revisit")
          recordRaw(
            f"$id%016x-0000-0000-0000-000000000003",
            uri,
            "revisit",
            "message/http",
            "",
            Seq(
              "WARC-Refers-To-Target-URI" -> uri,
              "WARC-Profile" -> "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
            ),
            date = date
          )
        else record(f"$id%016x-0000-0000-0000-000000000000", uri, body, date)
    )

  /** The shared distributed egress: `nFiles` segments, one per task,
    * through the Hadoop FileSystem with write-aside + rename. */
  private def writeRows(
      rows: DataFrame, // (id, uri, body [, kind]) — kind defaults to ''
      outDir: String,
      nFiles: Int,
      suffix: String,
      render: (Long, String, String, String) => Array[Byte],
      header: Option[Array[Byte]] = None
  ): Unit = {
    val spark = rows.sparkSession
    import spark.implicits._
    val hconf =
      new org.apache.spark.SerializableWritable(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(outDir)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(root)
    val rows4 =
      if (rows.columns.length >= 4) rows
      else rows.withColumn("kind", lit(""))
    rows4
      .as[(Long, String, String, String)]
      .repartition(nFiles, col(rows.columns.head))
      .foreachPartition { (it: Iterator[(Long, String, String, String)]) =>
        if (it.hasNext) { // empty partitions write no file
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val dir = new org.apache.hadoop.fs.Path(outDir)
          val fs = dir.getFileSystem(hconf.value)
          val tmp = new org.apache.hadoop.fs.Path(dir, f".part-$pid%05d$suffix.tmp")
          val dst = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d$suffix")
          val out = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
          try {
            header.foreach(out.write)
            it.foreach { case (id, uri, body, kind) => out.write(render(id, uri, body, kind)) }
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
    * Emits (offset, recordId, targetUri, warcType, httpStatus, body,
    * recordLength, warcDate) — the length is the EXACT byte span of
    * the record including its CRLFCRLF terminator, so per-file record
    * lengths tile the segment: offset(k) = Σ length(<k). That tiling
    * is what a CDX index (the Common Crawl lookup sidecar) stores, and
    * what lets a wayback-style consumer fetch ONE record with a ranged
    * read ([[cdxLookup]]).
    *
    * The parser is strictly sequential (one byte of lookahead), which
    * is all WARC needs: headers to the blank line, then exactly
    * `Content-Length` payload bytes. Strictness contract unchanged: a
    * malformed record throws with its file + offset.
    */
  private[graft] def parseStream(
      file: String,
      in0: java.io.InputStream
  ): Iterator[(Long, String, String, String, String, String, Long, String)] =
    new Iterator[(Long, String, String, String, String, String, Long, String)] {
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
      def next(): (Long, String, String, String, String, String, Long, String) = {
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
        var recordId = ""; var uri = ""; var len = -1; var wtype = ""; var wdate = ""
        var h = line()
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          require(i > 0, s"$file: malformed WARC header '$h' at offset $off")
          val (k, v) = (h.substring(0, i).trim, h.substring(i + 1).trim)
          k match {
            case "WARC-Record-ID"  => recordId = v
            case "WARC-Target-URI" => uri = v
            case "WARC-Type"       => wtype = v
            case "WARC-Date"       => wdate = v
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
        // the CRLFCRLF terminator belongs to the record; after
        // skipCrlf, pos sits on the NEXT record's first byte (or EOF),
        // so the span [off, pos) is the record's exact byte length and
        // per-file lengths tile the segment — the CDX contract
        val recLen = pos - off
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
          (off, recordId, uri, wtype, status, body, recLen, wdate)
        } else {
          // conversion (WET) / metadata (WAT) / request / warcinfo:
          // the payload IS the body — no HTTP envelope, no status
          (off, recordId, uri, wtype, "", payload, recLen, wdate)
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
  ): Iterator[(Long, String, String, String, String, String, Long, String)] =
    parseStream(file, new java.io.ByteArrayInputStream(bytes))

  /** Split a `.warc.gz` segment into its gzip MEMBERS, tracking each
    * member's COMPRESSED byte span — the coordinates a CDX over .gz
    * segments must store: a ranged fetch addresses compressed bytes,
    * so the decompressed-stream offsets [[readSpark]] reports for .gz
    * files can never serve one. (This is exactly the Common Crawl
    * contract: cdx offsets/lengths point at whole gzip members, and a
    * byte-range GET + gunzip yields one record.)
    *
    * Each member's header is parsed manually (FLG extra/name/comment/
    * hcrc fields honored), the deflate body runs through a raw
    * `Inflater(nowrap)` with exact input accounting (unused tail bytes
    * are pushed back), and the 8-byte trailer's ISIZE is validated
    * against the inflated length — so the emitted (offset, length)
    * spans tile the file byte-exactly, the same invariant the plain
    * parser's spans carry.
    */
  private[graft] def gzMembers(
      file: String,
      in0: java.io.InputStream
  ): Iterator[(Long, Long, Array[Byte])] =
    new Iterator[(Long, Long, Array[Byte])] {
      private val in = new java.io.PushbackInputStream(
        new java.io.BufferedInputStream(in0, 1 << 16),
        1 << 15
      )
      private var pos = 0L
      def hasNext: Boolean = {
        val b = in.read()
        if (b == -1) false
        else { in.unread(b); true }
      }
      def next(): (Long, Long, Array[Byte]) = {
        val start = pos
        def u8(): Int = {
          val b = in.read()
          require(b != -1, s"$file: truncated gzip member at offset $start")
          pos += 1
          b
        }
        require(
          u8() == 0x1f && u8() == 0x8b,
          s"$file: bad gzip magic at offset $start"
        )
        require(u8() == 8, s"$file: unsupported gzip method at offset $start")
        val flg = u8()
        var i = 0
        while (i < 6) { u8(); i += 1 } // MTIME, XFL, OS
        if ((flg & 4) != 0) { // FEXTRA
          val xlen = u8() | (u8() << 8)
          var j = 0
          while (j < xlen) { u8(); j += 1 }
        }
        if ((flg & 8) != 0) while (u8() != 0) () // FNAME, NUL-terminated
        if ((flg & 16) != 0) while (u8() != 0) () // FCOMMENT
        if ((flg & 2) != 0) { u8(); u8() } // FHCRC
        val inf = new java.util.zip.Inflater(true)
        val out = new java.io.ByteArrayOutputStream(1 << 15)
        val feed = new Array[Byte](8192)
        val chunk = new Array[Byte](8192)
        var lastN = 0
        try {
          while (!inf.finished()) {
            if (inf.needsInput()) {
              lastN = in.read(feed)
              require(lastN > 0, s"$file: truncated gzip member at offset $start")
              pos += lastN
              inf.setInput(feed, 0, lastN)
            }
            val k = inf.inflate(chunk)
            if (k > 0) out.write(chunk, 0, k)
            else
              require(
                inf.finished() || inf.needsInput(),
                s"$file: stalled gzip member at offset $start"
              )
          }
          val rem = inf.getRemaining
          if (rem > 0) { // unused tail belongs to the trailer / next member
            in.unread(feed, lastN - rem, rem)
            pos -= rem
          }
        } finally inf.end()
        var t = 0
        while (t < 4) { u8(); t += 1 } // CRC32 (deflate integrity implied)
        var isize = 0L
        t = 0
        while (t < 4) { isize |= (u8().toLong << (8 * t)); t += 1 }
        require(
          isize == (out.size.toLong & 0xffffffffL),
          s"$file: gzip ISIZE mismatch at offset $start"
        )
        (start, pos - start, out.toByteArray)
      }
    }

  /** Distributed read of `.warc.gz` segments with COMPRESSED member
    * coordinates: one gzip member per record (the writer's and Common
    * Crawl's convention — a member holding more than one record throws),
    * each member strict-parsed in isolation; `rec_offset`/`rec_length`
    * are the member's compressed byte span, so [[cdxIndex]] over this
    * frame yields an index whose coordinates a ranged fetch on the .gz
    * file can actually serve ([[fetchRecords]] with gz=true).
    */
  def readSparkGz(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(glob)
      .flatMap { case (path, pds) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val raw = pds.open()
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => raw.close())
        gzMembers(name, raw).map { case (memOff, memLen, bytes) =>
          val recs = parseRecords(name, bytes).toList
          require(
            recs.length == 1,
            s"$name: gzip member at offset $memOff holds ${recs.length} records (one expected)"
          )
          val (_, rid, uri, wtype, status, body, _, wdate) = recs.head
          (name, memOff, memLen, rid, wtype, wdate, uri, status, body)
        }
      }
      .toDF(
        "warc_file",
        "rec_offset",
        "rec_length",
        "record_id",
        "warc_type",
        "warc_date",
        "target_uri",
        "http_status",
        "body"
      )
  }

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
        parseStream(name, in).map { case (off, rid, uri, wtype, status, body, recLen, wdate) =>
          (name, off, recLen, rid, wtype, wdate, uri, status, body)
        }
      }
      .toDF(
        "warc_file",
        "rec_offset",
        "rec_length",
        "record_id",
        "warc_type",
        "warc_date",
        "target_uri",
        "http_status",
        "body"
      )
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
        parseRecords(name, bytes).map { case (off, rid, uri, wtype, status, body, recLen, wdate) =>
          (name, off, recLen, rid, wtype, wdate, uri, status, body)
        }
      }
      .toDF(
        "warc_file",
        "rec_offset",
        "rec_length",
        "record_id",
        "warc_type",
        "warc_date",
        "target_uri",
        "http_status",
        "body"
      )
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
    // scan fan-out (guide §2.5): the HTML plant + regex outlink/block
    // extraction otherwise run single-task on a single-file corpus
    val pages = graft.core.Tables
      .fan(Tables.documents(s, dir), "doc_id")
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

  /** CDX index of a parsed-record frame — the THIRD Common Crawl
    * sidecar (next to WET/WAT): per record, the SURT urlkey, the
    * 14-digit capture timestamp, and the (file, offset, length,
    * digest, status) a wayback-style consumer needs to fetch exactly
    * ONE record with a ranged read. Wholly row-local off the parse
    * (the parser already emits exact byte spans that tile the
    * segment); at crawl scale the index is sorted/bucketed by urlkey
    * downstream, which SURT makes a per-domain range scan.
    */
  def cdxIndex(recs: DataFrame): DataFrame =
    graft.llm.Urls
      .canonicalize(recs.withColumn("url", col("target_uri")))
      .select(
        col("warc_file"),
        col("rec_offset"),
        col("rec_length"),
        graft.llm.Urls
          .surtCol(col("host"), expr("substr(canon, length(host) + 1)"))
          .as("urlkey"),
        // the ORIGINAL fetch URL rides next to the sort key, as in real
        // CDXJ lines — consumers (and the revisit writer) join on it
        col("target_uri").as("url"),
        regexp_replace(col("warc_date"), "[-:TZ]", "").as("cdx_ts"),
        col("warc_type"),
        col("http_status"),
        md5(col("body")).as("digest")
      )

  /** CDX length-oracle constants, derived from the ONE record renderer
    * (a probe render, never hand-counted bytes): a response record's
    * total length is `cdxFixed + len(uri) + len(str(hHttp + L)) +
    * hHttp + L` where L = body length — the only non-linearity is the
    * Content-Length digit count.
    */
  private[sources] val cdxHttpLen: Int =
    httpHead.getBytes(StandardCharsets.UTF_8).length
  private[sources] val cdxFixed: Int = {
    val probe = record(f"${0L}%016x-0000-0000-0000-000000000000", "", "")
    probe.length - cdxHttpLen - String.valueOf(cdxHttpLen).length
  }

  /** Gate: plant pages → WARC segments (WITH a leading warcinfo
    * record, so the offset math is exercised past a non-response
    * header) → parse → CDX. Three independent proofs ride the output:
    * `tiled` (each record's offset equals the sum of all prior record
    * lengths in its segment — the warcinfo row is inside the prefix
    * sums, so its length is covered transitively), `file_exact` (the
    * per-segment length sum equals the FILESYSTEM's byte count for
    * the file), and `rec_length` itself against the oracle's
    * arithmetic render of the record. urlkey/digest/status/timestamp
    * replay straight off the plant.
    */
  /** Shared proof frame for the plain/gz CDX gates: plant → segments
    * (warcinfo-headed) → parse (decompressed-stream spans for plain,
    * COMPRESSED member spans for .gz) → CDX projection + the tiling
    * and filesystem-size checks.
    */
  private def cdxProof(
      s: SparkSession,
      dir: String,
      scratchName: String,
      gzip: Boolean
  ): DataFrame = {
    import s.implicits._
    val pages = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        uriExpr.as("uri"),
        expr(graft.llm.Curation.htmlPlantExpr).as("html")
      )
    val out = Scratch.dir(scratchName)
    writeSpark(pages, out, nFiles = 4, gzip = gzip, warcinfo = true)
    val glob = if (gzip) "part-*.warc.gz" else "part-*.warc"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val sizes = fs
      .globStatus(new org.apache.hadoop.fs.Path(out, glob))
      .map(st => (st.getPath.getName, st.getLen))
      .toSeq
      .toDF("warc_file", "file_len")
    val recs =
      if (gzip) readSparkGz(s, out + "/" + glob) else readSpark(s, out + "/" + glob)
    val byFile = org.apache.spark.sql.expressions.Window
      .partitionBy(col("warc_file"))
    val ordered = byFile
      .orderBy(col("rec_offset"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    cdxIndex(recs)
      .withColumn(
        "tiled",
        col("rec_offset") === coalesce(sum(col("rec_length")).over(ordered), lit(0L))
      )
      .withColumn("seg_len", sum(col("rec_length")).over(byFile))
      .join(broadcast(sizes), "warc_file")
      .filter(col("warc_type") === "response")
      .withColumn(
        "doc_id",
        regexp_extract(col("urlkey"), "/doc/([0-9]+)$", 1).cast("long")
      )
      .withColumn("file_exact", col("seg_len") === col("file_len"))
  }

  def cdxGate(s: SparkSession, dir: String): DataFrame =
    cdxProof(s, dir, "warc_cdx", gzip = false)
      .select(
        col("doc_id"),
        col("urlkey"),
        col("cdx_ts"),
        col("http_status"),
        col("rec_length"),
        col("digest"),
        col("tiled"),
        col("file_exact")
      )

  /** The .gz twin: coordinates are COMPRESSED member spans (the real
    * Common Crawl cdx contract), so `rec_length` is codec output and
    * stays out of the oracle compare — the proofs here are tiling
    * (members cover the file exactly: gap-free, overlap-free, ending
    * at the filesystem byte count) plus the content columns replayed
    * off the plant.
    */
  def cdxGzGate(s: SparkSession, dir: String): DataFrame =
    cdxProof(s, dir, "warc_cdx_gz", gzip = true)
      .select(
        col("doc_id"),
        col("urlkey"),
        col("cdx_ts"),
        col("http_status"),
        col("digest"),
        col("tiled"),
        col("file_exact")
      )

  val cdxGateSql: String =
    "WITH pages AS (SELECT doc_id, " +
      "concat('http://site', CAST(doc_id % 20 AS STRING), '.example.com/doc/', CAST(doc_id AS STRING)) AS uri, " +
      s"${graft.llm.Curation.htmlPlantExpr} AS html FROM documents) " +
      "SELECT doc_id, " +
      "concat('com,example,site', CAST(doc_id % 20 AS STRING), ')/doc/', CAST(doc_id AS STRING)) AS urlkey, " +
      "'20240101000000' AS cdx_ts, '200' AS http_status, " +
      s"CAST($cdxFixed + length(uri) + length(CAST($cdxHttpLen + length(html) AS VARCHAR)) + " +
      s"$cdxHttpLen + length(html) AS BIGINT) AS rec_length, " +
      "md5(html) AS digest, TRUE AS tiled, TRUE AS file_exact FROM pages"

  /** The CDX CONSUMER — wayback-style single-record serving: given
    * index rows, fetch each record with a RANGED filesystem read
    * (`seek(offset)` + exactly `length` bytes — O(record) I/O per
    * lookup regardless of segment size, the property the whole
    * offset/length machinery exists for) and strict-parse the slice
    * in isolation. The gate fetches the doc_id ≡ 0 (mod 5) subset and
    * hashes the served bodies; the oracle recomputes the digests off
    * the plant, so a match proves the index coordinates land on
    * byte-exact record boundaries.
    */
  /** The ranged-read core: fetch each record named by a CDX row
    * (doc_id, warc_file, rec_offset, rec_length) from `segDir` with
    * `seek(offset)` + exactly `length` bytes and strict-parse the
    * slice in isolation — O(record) I/O and memory per lookup,
    * partition-parallel over the lookup set. Emits the served
    * record's status and body md5.
    */
  def fetchRecords(cdxRows: DataFrame, segDir: String, gz: Boolean = false): DataFrame = {
    val s = cdxRows.sparkSession
    import s.implicits._
    val hconf =
      new org.apache.spark.SerializableWritable(s.sparkContext.hadoopConfiguration)
    cdxRows
      .select(col("doc_id"), col("warc_file"), col("rec_offset"), col("rec_length"))
      .as[(Long, String, Long, Long)]
      .mapPartitions { it =>
        val dirPath = new org.apache.hadoop.fs.Path(segDir)
        val fs = dirPath.getFileSystem(hconf.value)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (docId, file, off, len) =>
          val in = fs.open(new org.apache.hadoop.fs.Path(dirPath, file))
          val buf =
            try {
              in.seek(off)
              val b = new Array[Byte](len.toInt)
              in.readFully(b)
              b
            } finally in.close()
          // a .gz span is one compressed member — gunzip it first (the
          // byte-range-GET + gunzip serving shape)
          val rec: java.io.InputStream =
            if (gz)
              new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(buf), 1 << 14)
            else new java.io.ByteArrayInputStream(buf)
          val (_, _, _, _, status, body, _, _) = parseStream(file, rec).next()
          md.reset()
          val hex = md
            .digest(body.getBytes(StandardCharsets.UTF_8))
            .map(b => f"$b%02x")
            .mkString
          (docId, status, hex)
        }
      }
      .toDF("doc_id", "fetch_status", "fetch_md5")
  }

  def cdxLookup(s: SparkSession, dir: String): DataFrame = {
    val pages = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        uriExpr.as("uri"),
        expr(graft.llm.Curation.htmlPlantExpr).as("html")
      )
    val out = Scratch.dir("cdx_lookup")
    writeSpark(pages, out, nFiles = 4)
    val wanted = cdxIndex(readSpark(s, out + "/part-*.warc"))
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("urlkey"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("warc_file"),
        col("rec_offset"),
        col("rec_length")
      )
      .filter(col("doc_id") % 5 === 0)
    fetchRecords(wanted, out)
  }

  val cdxLookupSql: String =
    "SELECT doc_id, '200' AS fetch_status, " +
      s"md5(${graft.llm.Curation.htmlPlantExpr}) AS fetch_md5 " +
      "FROM documents WHERE doc_id % 5 = 0"

  val cdxGzGateSql: String =
    "WITH pages AS (SELECT doc_id, " +
      s"${graft.llm.Curation.htmlPlantExpr} AS html FROM documents) " +
      "SELECT doc_id, " +
      "concat('com,example,site', CAST(doc_id % 20 AS STRING), ')/doc/', CAST(doc_id AS STRING)) AS urlkey, " +
      "'20240101000000' AS cdx_ts, '200' AS http_status, " +
      "md5(html) AS digest, TRUE AS tiled, TRUE AS file_exact FROM pages"

  /** Serving off .gz: ranged read of ONE compressed member + gunzip +
    * strict parse — the byte-range-GET shape every wayback/CC consumer
    * runs against the live archive.
    */
  def cdxGzLookup(s: SparkSession, dir: String): DataFrame = {
    val pages = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        uriExpr.as("uri"),
        expr(graft.llm.Curation.htmlPlantExpr).as("html")
      )
    val out = Scratch.dir("cdx_gz_lookup")
    writeSpark(pages, out, nFiles = 4, gzip = true)
    val wanted = cdxIndex(readSparkGz(s, out + "/part-*.warc.gz"))
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("urlkey"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("warc_file"),
        col("rec_offset"),
        col("rec_length")
      )
      .filter(col("doc_id") % 5 === 0)
    fetchRecords(wanted, out, gz = true)
  }

  /** Gate: two crawls of the same URLs — crawl 2 appends ' updated
    * now' to every doc_id ≡ 0 (mod 3) document's TEXT, but the plant
    * only renders the first 280 chars, so long changed docs still
    * produce a byte-identical page (the content-changed /
    * payload-identical case real crawls hit constantly — it must
    * classify `revisit`). Crawl 1 is written, CDX-indexed, and its
    * digests drive [[writeRevisitSpark]] for crawl 2; the gate parses
    * crawl 2's segments back. The oracle replays the REAL rule —
    * response iff md5(html2) ≠ md5(html1) — by rendering both plants,
    * so the classification, the empty revisit payloads, and the
    * re-stored response bodies all hash-check.
    */
  def warcRevisit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pages1 = docs.select(
      col("doc_id"),
      uriExpr.as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val prev = Scratch.dir("warc_revisit_prev")
    writeSpark(pages1, prev, nFiles = 4)
    val cdx1 = cdxIndex(readSpark(s, prev + "/part-*.warc"))
      .filter(col("warc_type") === "response")
      .select(col("url").as("uri"), col("digest"))
    val pages2 = docs
      .select(
        col("doc_id"),
        expr(
          "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' updated now') ELSE text END"
        ).as("text")
      )
      .select(
        col("doc_id"),
        uriExpr.as("uri"),
        expr(graft.llm.Curation.htmlPlantExpr).as("html")
      )
    val out = Scratch.dir("warc_revisit")
    writeRevisitSpark(pages2, cdx1, out, nFiles = 4)
    readSpark(s, out + "/part-*.warc")
      .select(
        regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("warc_type"),
        length(col("body")).cast("long").as("n_body_chars"),
        md5(col("body")).as("body_md5")
      )
  }

  val warcRevisitSql: String =
    "WITH t2 AS (SELECT doc_id, " +
      "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' updated now') ELSE text END AS text " +
      "FROM documents), " +
      s"rp1 AS (SELECT doc_id, ${graft.llm.Curation.htmlPlantExpr} AS html FROM documents), " +
      s"rp2 AS (SELECT doc_id, ${graft.llm.Curation.htmlPlantExpr} AS html FROM t2) " +
      "SELECT p2.doc_id, " +
      "CASE WHEN md5(p2.html) <> md5(p1.html) THEN 'response' ELSE 'revisit' END AS warc_type, " +
      "CASE WHEN md5(p2.html) <> md5(p1.html) THEN CAST(length(p2.html) AS BIGINT) ELSE 0 END AS n_body_chars, " +
      "CASE WHEN md5(p2.html) <> md5(p1.html) THEN md5(p2.html) ELSE md5('') END AS body_md5 " +
      "FROM rp2 p2 JOIN rp1 p1 ON p1.doc_id = p2.doc_id"

  /** CDX shard LAYOUT — the cluster.idx pattern: the index is stored
    * partitioned by the SURT host prefix (the leading reversed-domain
    * component SURT exists to expose) so a domain lookup PRUNES to one
    * shard directory at the scan, and "every capture under
    * *.example.com" is a directory-local range scan instead of an
    * index-wide pass. Gate: segments → CDX → partitioned parquet →
    * read back filtered to two hosts (the plan-audit spec pins the
    * PartitionFilters pushdown); output aggregates per host with an
    * order-pinned urlkey-list md5 so the shard CONTENTS hash-check
    * against the plant.
    */
  def cdxLayout(s: SparkSession, dir: String): DataFrame = {
    val pages = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        uriExpr.as("uri"),
        expr(graft.llm.Curation.htmlPlantExpr).as("html")
      )
    val out = Scratch.dir("cdx_layout_warc")
    writeSpark(pages, out, nFiles = 4)
    val shards = Scratch.dir("cdx_layout_shards")
    cdxIndex(readSpark(s, out + "/part-*.warc"))
      .filter(col("warc_type") === "response")
      .withColumn("surt_host", regexp_extract(col("urlkey"), "^([^)]+)", 1))
      .write
      .mode("overwrite")
      .partitionBy("surt_host")
      .parquet(shards)
    s.read
      .parquet(shards)
      .filter(col("surt_host").isin("com,example,site3", "com,example,site7"))
      .groupBy(col("surt_host"))
      .agg(
        count(lit(1)).as("n_caps"),
        md5(array_join(array_sort(collect_list(col("urlkey"))), ",")).as("urlkeys_md5")
      )
  }

  val cdxLayoutSql: String =
    "WITH ck AS (SELECT doc_id, " +
      "concat('com,example,site', CAST(doc_id % 20 AS STRING), ')/doc/', CAST(doc_id AS STRING)) AS urlkey, " +
      "concat('com,example,site', CAST(doc_id % 20 AS STRING)) AS surt_host FROM documents) " +
      "SELECT surt_host, CAST(count(*) AS BIGINT) AS n_caps, " +
      "md5(string_agg(urlkey, ',' ORDER BY urlkey)) AS urlkeys_md5 FROM ck " +
      "WHERE surt_host IN ('com,example,site3', 'com,example,site7') GROUP BY surt_host"

  /** The ARCHIVE'S LOGICAL VIEW across crawls — wayback's "serve the
    * latest capture": crawl 2's CDX carries `response` rows (changed
    * pages, stored) and `revisit` rows (unchanged pages, NOT stored —
    * their bytes live in crawl 1). Resolution is one equi-join: a
    * revisit row takes its serving coordinates and digest from the
    * PRIOR crawl's CDX row for the same URL. The gate proves the
    * invariant the whole dedup machinery exists to preserve: after
    * resolution, EVERY url serves exactly its latest content
    * (served_digest == md5(html₂) for all docs — for revisit rows
    * that equality holds precisely because payload-identity is what
    * classified them), while `src` records which crawl physically
    * holds the bytes.
    */
  def cdxResolve(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pages1 = docs.select(
      col("doc_id"),
      uriExpr.as("uri"),
      expr(graft.llm.Curation.htmlPlantExpr).as("html")
    )
    val prev = Scratch.dir("cdx_resolve_prev")
    writeSpark(pages1, prev, nFiles = 4)
    val cdx1 = cdxIndex(readSpark(s, prev + "/part-*.warc"))
      .filter(col("warc_type") === "response")
      .select(col("url"), col("digest").as("prev_digest"))
      .localCheckpoint() // feeds the revisit writer AND the resolution join
    val pages2 = docs
      .select(
        col("doc_id"),
        expr(
          "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' updated now') ELSE text END"
        ).as("text")
      )
      .select(
        col("doc_id"),
        uriExpr.as("uri"),
        expr(graft.llm.Curation.htmlPlantExpr).as("html")
      )
    val out = Scratch.dir("cdx_resolve_new")
    writeRevisitSpark(pages2, cdx1.select(col("url").as("uri"), col("prev_digest").as("digest")), out)
    cdxIndex(readSpark(s, out + "/part-*.warc"))
      .join(cdx1, Seq("url"), "left")
      .select(
        regexp_extract(col("urlkey"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("urlkey"),
        when(col("warc_type") === "revisit", col("prev_digest"))
          .otherwise(col("digest"))
          .as("served_digest"),
        when(col("warc_type") === "revisit", lit("prev")).otherwise(lit("new")).as("src")
      )
  }

  /** Resolution must hand every URL its LATEST content: the oracle
    * renders crawl 2's plant directly — a hash match proves the
    * revisit indirection is lossless.
    */
  val cdxResolveSql: String =
    "WITH t2 AS (SELECT doc_id, " +
      "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' updated now') ELSE text END AS text " +
      "FROM documents), " +
      s"rp1 AS (SELECT doc_id, ${graft.llm.Curation.htmlPlantExpr} AS html FROM documents), " +
      s"rp2 AS (SELECT doc_id, ${graft.llm.Curation.htmlPlantExpr} AS html FROM t2) " +
      "SELECT p2.doc_id, " +
      "concat('com,example,site', CAST(p2.doc_id % 20 AS STRING), ')/doc/', CAST(p2.doc_id AS STRING)) AS urlkey, " +
      "md5(p2.html) AS served_digest, " +
      "CASE WHEN md5(p2.html) <> md5(p1.html) THEN 'new' ELSE 'prev' END AS src " +
      "FROM rp2 p2 JOIN rp1 p1 ON p1.doc_id = p2.doc_id"

  /** DATED cross-crawl CDX merge — the other half of the archive
    * serving contract next to [[cdxResolve]] (which only follows the
    * revisit indirection): when a URL is RE-CRAWLED as a full
    * `response` in several crawls, "serve the latest capture" must
    * pick by CAPTURE TIME (`cdx_ts`, the WARC-Date the r16 writer
    * threads through every record), never by ingestion order —
    * wayback's merged cluster.idx semantics. One `groupBy(urlkey)`
    * with an exact `max_by` on (cdx_ts, warc_file, rec_offset): a
    * single hash shuffle on the index key at any archive size (at
    * 100 TB the CDX is already sorted/bucketed by urlkey, so the
    * partial aggregation is map-side and the merge never touches
    * payload bytes — index rows only).
    */
  def cdxMergeLatest(cdx: DataFrame): DataFrame =
    cdx
      .groupBy(col("urlkey"))
      .agg(
        count(lit(1)).as("n_caps"),
        max_by(
          struct(
            col("url"),
            col("cdx_ts"),
            col("warc_file"),
            col("rec_offset"),
            col("rec_length"),
            col("digest")
          ),
          // total order: capture time first; (file, offset) breaks the
          // pathological same-second duplicate deterministically
          struct(col("cdx_ts"), col("warc_file"), col("rec_offset"))
        ).as("top")
      )
      .select(
        col("urlkey"),
        col("top.url").as("url"),
        col("top.cdx_ts").as("latest_ts"),
        col("n_caps"),
        col("top.warc_file").as("warc_file"),
        col("top.rec_offset").as("rec_offset"),
        col("top.rec_length").as("rec_length"),
        col("top.digest").as("served_digest")
      )

  /** Archive SERVING view — [[cdxMergeLatest]]'s capture-side answer
    * annotated with the PUBLISHER's freshness claim (sitemap
    * `<lastmod>`, r16's `Sitemaps` leg): `publisher_ts` rides next to
    * `latest_ts`, and `stale` reuses the fused-priority CLASS rule on
    * the serving side — a lastmod STRICTLY after our latest capture
    * means the archive is serving a copy the publisher has since
    * replaced (the "this snapshot may be outdated" banner / recrawl
    * escalation signal); an unlisted URL carries NULL and is never
    * flagged (absence is no evidence of change). The sitemap side is
    * pre-aggregated to max(sm_ts) per urlkey — duplicate listings are
    * protocol-legal and must not fan the serving row out (the
    * [[fusedPriority]] rule).
    */
  def archiveServeView(merged: DataFrame, sitemap: DataFrame): DataFrame =
    merged
      .join(
        sitemap.groupBy(col("urlkey")).agg(max(col("sm_ts")).as("publisher_ts")),
        Seq("urlkey"),
        "left"
      )
      .withColumn("stale", coalesce(col("publisher_ts") > col("latest_ts"), lit(false)))

  /** Gate: THREE dated crawls of overlapping URL sets — crawl A
    * (2024-01) fetches every doc, crawl B (2024-02) re-crawls the
    * doc_id ≡ 0 (mod 3) subset with ' v2' appended to the text, crawl
    * C (2024-03) re-crawls the mod-5 subset with ' v3' — written as
    * full RESPONSE records (the re-crawl case [[cdxResolve]]'s
    * revisit indirection does not cover). The three archives are
    * CDX-indexed and unioned deliberately OUT of capture order (C,
    * then A, then B): the merge must still hand every URL its latest
    * capture by cdx_ts — a mod-15 doc serves crawl C's digest even
    * though crawl B was ingested after it. The oracle renders each
    * doc's expected latest plant directly; `warc_file` is prefixed
    * with its crawl subdir so the merged coordinates stay SERVABLE
    * across crawl directories (the spec fetches them back byte-exact).
    *
    * r17: the merged view is served THROUGH [[archiveServeView]] with
    * a planted sitemap — publisher arms: mod-9=7 unlisted (NULL,
    * never stale), mod-4=1 dated 2024-04 (after every capture —
    * always stale), mod-4=2 dated 2024-01-15 (stale exactly for the
    * crawl-A-only docs: listed-not-newer for every re-crawled one),
    * rest dated equal to crawl A (the boundary: equality is NOT
    * stale). Every arm non-vacuous at every sf.
    */
  val mergeSitemapTsExpr: String =
    "CASE WHEN doc_id % 4 = 1 THEN '20240401000000' " +
      "WHEN doc_id % 4 = 2 THEN '20240115000000' ELSE '20240101000000' END"

  def cdxMergeGate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def pagesOf(d: DataFrame): DataFrame =
      d.select(col("doc_id"), uriExpr.as("uri"), expr(graft.llm.Curation.htmlPlantExpr).as("html"))
    val root = Scratch.dir("cdx_merge")
    writeSpark(pagesOf(docs), root + "/crawlA", nFiles = 4, date = "2024-01-01T00:00:00Z")
    writeSpark(
      pagesOf(
        docs
          .filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"))
      ),
      root + "/crawlB",
      nFiles = 4,
      date = "2024-02-01T00:00:00Z"
    )
    writeSpark(
      pagesOf(
        docs
          .filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" v3")).as("text"))
      ),
      root + "/crawlC",
      nFiles = 4,
      date = "2024-03-01T00:00:00Z"
    )
    def cdxOf(sub: String): DataFrame =
      cdxIndex(readSpark(s, root + "/" + sub + "/part-*.warc"))
        .filter(col("warc_type") === "response")
        .withColumn("warc_file", concat_ws("/", lit(sub), col("warc_file")))
    val chain = cdxOf("crawlC").unionByName(cdxOf("crawlA")).unionByName(cdxOf("crawlB"))
    val sitemap = docs
      .filter(col("doc_id") % 9 =!= 7)
      .select(
        concat(
          lit("com,example,site"),
          (col("doc_id") % 20).cast("string"),
          lit(")/doc/"),
          col("doc_id").cast("string")
        ).as("urlkey"),
        expr(mergeSitemapTsExpr).as("sm_ts")
      )
    archiveServeView(cdxMergeLatest(chain), sitemap)
      .select(
        regexp_extract(col("urlkey"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("urlkey"),
        col("latest_ts"),
        col("n_caps"),
        col("served_digest"),
        col("publisher_ts"),
        col("stale")
      )
  }

  /** Latest-wins replay: each doc's expected capture set is (A always,
    * B iff mod 3, C iff mod 5) and the winner is the latest present —
    * rendered straight off the plants, so a hash match proves the
    * merge picked by capture time for every URL.
    */
  val cdxMergeSql: String =
    "WITH tb AS (SELECT doc_id, concat(text, ' v2') AS text FROM documents WHERE doc_id % 3 = 0), " +
      "tc AS (SELECT doc_id, concat(text, ' v3') AS text FROM documents WHERE doc_id % 5 = 0), " +
      s"ma AS (SELECT doc_id, ${graft.llm.Curation.htmlPlantExpr} AS html FROM documents), " +
      s"mb AS (SELECT doc_id, ${graft.llm.Curation.htmlPlantExpr} AS html FROM tb), " +
      s"mc AS (SELECT doc_id, ${graft.llm.Curation.htmlPlantExpr} AS html FROM tc), " +
      "mg AS MATERIALIZED (SELECT a.doc_id AS doc_id, " +
      "concat('com,example,site', CAST(a.doc_id % 20 AS STRING), ')/doc/', CAST(a.doc_id AS STRING)) AS urlkey, " +
      "CASE WHEN c.doc_id IS NOT NULL THEN '20240301000000' " +
      "WHEN b.doc_id IS NOT NULL THEN '20240201000000' " +
      "ELSE '20240101000000' END AS latest_ts, " +
      "CAST(1 + (CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END) + " +
      "(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_caps, " +
      "md5(coalesce(c.html, b.html, a.html)) AS served_digest " +
      "FROM ma a LEFT JOIN mb b ON b.doc_id = a.doc_id LEFT JOIN mc c ON c.doc_id = a.doc_id), " +
      s"sm AS (SELECT doc_id, $mergeSitemapTsExpr AS sm_ts FROM documents WHERE doc_id % 9 <> 7) " +
      "SELECT mg.doc_id, mg.urlkey, mg.latest_ts, mg.n_caps, mg.served_digest, " +
      "sm.sm_ts AS publisher_ts, coalesce(sm.sm_ts > mg.latest_ts, false) AS stale " +
      "FROM mg LEFT JOIN sm ON sm.doc_id = mg.doc_id"

  /** Per-URL CHANGE-RATE estimate off the archive's own dated history
    * — the Common-Crawl-style freshness loop's input: the multi-crawl
    * CDX chain ([[cdxMergeLatest]]'s input shape — urlkey, url,
    * cdx_ts, digest) IS a per-URL observation series, and k
    * consecutive-capture digest changes over n captures is the
    * change-rate estimator recrawl prioritization runs on. Exact
    * integer rate (`rate_ppm = k·10⁶ div (n−1)`, 0 for single
    * captures) so the oracle replays it. One narrow lag window + one
    * aggregation, both keyed on urlkey — at archive scale this is a
    * map-side pass over the urlkey-sorted CDX, index rows only.
    */
  def recrawlPriority(cdx: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("urlkey"))
      .orderBy(col("cdx_ts").asc)
    cdx
      .select(col("urlkey"), col("url"), col("cdx_ts"), col("digest"))
      .withColumn("prev_digest", lag(col("digest"), 1).over(w))
      .groupBy(col("urlkey"))
      .agg(
        max_by(col("url"), col("cdx_ts")).as("url"),
        count(lit(1)).as("n_caps"),
        sum(
          when(col("prev_digest").isNotNull && col("digest") =!= col("prev_digest"), 1L)
            .otherwise(0L)
        ).as("n_changes")
      )
      .withColumn(
        "rate_ppm",
        when(col("n_caps") > 1, expr("n_changes * 1000000 div (n_caps - 1)")).otherwise(lit(0L))
      )
  }

  /** RECRAWL scheduling — [[graft.llm.Urls.crawlSchedule]]'s politeness
    * shape (per-host slots × the 3-class host delay) consuming
    * [[recrawlPriority]]'s column: within each host, slots are ordered
    * by change rate DESCENDING (a frequently-changing URL is refetched
    * before a static one — the freshness loop's whole point), with an
    * md5(urlkey) tie-break so equal-rate URLs order deterministically
    * but without doc-id bias. The window partitions on the real host
    * key (aliased before the window) over a NARROW frame.
    */
  def prioritySchedule(pri: DataFrame): DataFrame = {
    val delayMs =
      expr("500 * (1 + CAST(substr(host, 5, length(host) - 16) AS BIGINT) % 3)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(
        col("rate_ppm").desc,
        col("n_changes").desc,
        md5(col("urlkey")).asc,
        col("urlkey").asc
      )
    pri
      .withColumn("host", regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1))
      .select(col("urlkey"), col("host"), col("n_caps"), col("n_changes"), col("rate_ppm"))
      .withColumn("slot", row_number().over(w).cast("long"))
      .withColumn("fetch_at_ms", (col("slot") - 1) * delayMs)
  }

  /** Gate: a FOUR-capture dated chain per URL (base → mod-3 docs
    * change → mod-5 docs change → everything reverts), priority off
    * the chain, schedule off the priority. The capture pattern makes
    * MID-RANGE rates (0, 2/3, 1 of intervals changed), and — because
    * the plant renders only the first 280 chars of text — long docs
    * re-crawl with UNCHANGED payloads, so capture count and change
    * count genuinely decouple (the saturated-rate probe rule: rates
    * are not all 0 or all 1 at any sf). The chain is built in-memory
    * in cdxIndex's column shape (ts literals + plant digests) — the
    * file-backed dated chain is [[cdxMergeGate]]'s subject, and the
    * spec runs this operator over REAL dated segments to pin the
    * contract.
    */
  def crawlPriorityGate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def cap(ts: String, textCase: String): DataFrame =
      docs
        .select(col("doc_id"), expr(textCase).as("text"))
        .select(
          col("doc_id"),
          lit(ts).as("cdx_ts"),
          md5(expr(graft.llm.Curation.htmlPlantExpr)).as("digest")
        )
    val chain = cap("20240101000000", "text")
      .unionByName(
        cap("20240201000000", "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' v2') ELSE text END")
      )
      .unionByName(
        cap("20240301000000", "CASE WHEN doc_id % 5 = 0 THEN concat(text, ' v3') ELSE text END")
      )
      .unionByName(cap("20240401000000", "text"))
      .withColumn(
        "urlkey",
        concat(
          lit("com,example,site"),
          (col("doc_id") % 20).cast("string"),
          lit(")/doc/"),
          col("doc_id").cast("string")
        )
      )
      .withColumn("url", uriExpr)
    prioritySchedule(recrawlPriority(chain))
      .select(
        regexp_extract(col("urlkey"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("host"),
        col("n_caps"),
        col("n_changes"),
        col("rate_ppm"),
        col("slot"),
        col("fetch_at_ms")
      )
  }

  /** FUSED recrawl prioritization — both freshness signals a real
    * crawler holds, combined: the PUBLISHER's (sitemap `lastmod`, r16's
    * `Sitemaps` leg) and the OBSERVED one (the dated CDX chain's
    * change rate, [[recrawlPriority]]). The fusion rule is the one
    * production freshness loops use: "the publisher says this URL
    * changed since our last capture" is a must-fetch CLASS, not a
    * score — within each host, class-0 URLs (sitemap lastmod strictly
    * after our latest capture) schedule before every class-1 URL
    * (listed-but-not-newer, or absent from the sitemap — an absent
    * listing is no evidence of change), and WITHIN a class the
    * observed rate orders as before. Everything stays exact
    * (14-digit-timestamp string compare, integer rate) so the oracle
    * replays the whole fusion.
    *
    * Scale shape: one urlkey-keyed aggregation over index rows + one
    * broadcast-or-hash equi-join to the sitemap frame + the per-host
    * politeness window — [[prioritySchedule]]'s cost plus a join that
    * shuffles only (urlkey, ts) pairs.
    */
  def fusedPriority(cdx: DataFrame, sitemap: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("urlkey"))
      .orderBy(col("cdx_ts").asc)
    cdx
      .select(col("urlkey"), col("url"), col("cdx_ts"), col("digest"))
      .withColumn("prev_digest", lag(col("digest"), 1).over(w))
      .groupBy(col("urlkey"))
      .agg(
        max_by(col("url"), col("cdx_ts")).as("url"),
        max(col("cdx_ts")).as("latest_ts"),
        count(lit(1)).as("n_caps"),
        sum(
          when(col("prev_digest").isNotNull && col("digest") =!= col("prev_digest"), 1L)
            .otherwise(0L)
        ).as("n_changes")
      )
      .withColumn(
        "rate_ppm",
        when(col("n_caps") > 1, expr("n_changes * 1000000 div (n_caps - 1)")).otherwise(lit(0L))
      )
      // pre-aggregate the sitemap side: duplicate listings of a loc are
      // protocol-legal (repeated entries, the same URL across sitemap
      // files) and would fan the priority row out into multiple
      // politeness slots downstream (r16 advice) — freshness only needs
      // the NEWEST publisher date per urlkey
      .join(
        sitemap.groupBy(col("urlkey")).agg(max(col("sm_ts")).as("sm_ts")),
        Seq("urlkey"),
        "left"
      )
      .withColumn(
        "fresh_class",
        when(col("sm_ts").isNotNull && col("sm_ts") > col("latest_ts"), 0).otherwise(1)
      )
  }

  /** [[prioritySchedule]]'s politeness window consuming the fused
    * ordering: class first, observed rate within class.
    */
  def fusedSchedule(pri: DataFrame): DataFrame = {
    val delayMs =
      expr("500 * (1 + CAST(substr(host, 5, length(host) - 16) AS BIGINT) % 3)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(
        col("fresh_class").asc,
        col("rate_ppm").desc,
        col("n_changes").desc,
        md5(col("urlkey")).asc,
        col("urlkey").asc
      )
    pri
      .withColumn("host", regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1))
      .select(
        col("urlkey"),
        col("host"),
        col("fresh_class"),
        col("n_caps"),
        col("n_changes"),
        col("rate_ppm")
      )
      .withColumn("slot", row_number().over(w).cast("long"))
      .withColumn("fetch_at_ms", (col("slot") - 1) * delayMs)
  }

  /** Gate: a 4-capture chain where captures 3 and 4 cover SUBSETS
    * (mod-2 / mod-4), so `latest_ts` genuinely varies per URL
    * (20240201/0301/0401) and capture counts decouple from change
    * counts — plus a sitemap frame listing all but the mod-9=7 URLs
    * with the [[graft.llm.Sitemaps.lastmodExpr]] date as a 14-digit
    * timestamp. Probed non-vacuous at every sf: both classes, mixed
    * rates, unlisted URLs, and class-0 URLs with LOWER rates than
    * class-1 URLs in the same host (the fusion must override the
    * rate). Oracle replays chain → lag → counts → join → class →
    * window verbatim.
    */
  def crawlPriorityFusedGate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def cap(ts: String, textCase: String, modFilter: Int): DataFrame = {
      val base = if (modFilter > 1) docs.filter(col("doc_id") % modFilter === 0) else docs
      base
        .select(col("doc_id"), expr(textCase).as("text"))
        .select(
          col("doc_id"),
          lit(ts).as("cdx_ts"),
          md5(expr(graft.llm.Curation.htmlPlantExpr)).as("digest")
        )
    }
    val chain = cap("20240101000000", "text", 1)
      .unionByName(
        cap("20240201000000", "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' v2') ELSE text END", 1)
      )
      .unionByName(
        cap("20240301000000", "CASE WHEN doc_id % 5 = 0 THEN concat(text, ' v3') ELSE text END", 2)
      )
      .unionByName(cap("20240401000000", "text", 4))
      .withColumn(
        "urlkey",
        concat(
          lit("com,example,site"),
          (col("doc_id") % 20).cast("string"),
          lit(")/doc/"),
          col("doc_id").cast("string")
        )
      )
      .withColumn("url", uriExpr)
    val sitemap = docs
      .filter(col("doc_id") % 9 =!= 7)
      .select(
        concat(
          lit("com,example,site"),
          (col("doc_id") % 20).cast("string"),
          lit(")/doc/"),
          col("doc_id").cast("string")
        ).as("urlkey"),
        concat(
          regexp_replace(expr(graft.llm.Sitemaps.lastmodExpr), "-", ""),
          lit("000000")
        ).as("sm_ts")
      )
    fusedSchedule(fusedPriority(chain, sitemap))
      .select(
        regexp_extract(col("urlkey"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("host"),
        col("fresh_class"),
        col("n_caps"),
        col("n_changes"),
        col("rate_ppm"),
        col("slot"),
        col("fetch_at_ms")
      )
  }

  val crawlPriorityFusedSql: String = {
    val plant = graft.llm.Curation.htmlPlantExpr
    val lm = graft.llm.Sitemaps.lastmodExpr
    "WITH cb AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN concat(text, ' v2') ELSE text END AS text FROM documents), " +
      "cc AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN concat(text, ' v3') ELSE text END AS text FROM documents WHERE doc_id % 2 = 0), " +
      "cd AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0), " +
      s"ch AS (SELECT doc_id, '20240101000000' AS cdx_ts, md5($plant) AS digest FROM documents " +
      s"UNION ALL SELECT doc_id, '20240201000000', md5($plant) FROM cb " +
      s"UNION ALL SELECT doc_id, '20240301000000', md5($plant) FROM cc " +
      s"UNION ALL SELECT doc_id, '20240401000000', md5($plant) FROM cd), " +
      "lg AS (SELECT doc_id, digest, cdx_ts, lag(digest) OVER (PARTITION BY doc_id ORDER BY cdx_ts) AS prev FROM ch), " +
      "pr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_caps, max(cdx_ts) AS latest_ts, " +
      "CAST(sum(CASE WHEN prev IS NOT NULL AND digest <> prev THEN 1 ELSE 0 END) AS BIGINT) AS n_changes " +
      "FROM lg GROUP BY doc_id), " +
      s"sm AS (SELECT doc_id, concat(replace($lm, '-', ''), '000000') AS sm_ts FROM documents WHERE doc_id % 9 <> 7), " +
      "pp AS (SELECT pr.doc_id, n_caps, n_changes, latest_ts, " +
      "CAST(CASE WHEN n_caps > 1 THEN n_changes * 1000000 // (n_caps - 1) ELSE 0 END AS BIGINT) AS rate_ppm, " +
      "CASE WHEN sm.sm_ts IS NOT NULL AND sm.sm_ts > pr.latest_ts THEN 0 ELSE 1 END AS fresh_class, " +
      "concat('site', CAST(pr.doc_id % 20 AS STRING), '.example.com') AS host, " +
      "concat('com,example,site', CAST(pr.doc_id % 20 AS STRING), ')/doc/', CAST(pr.doc_id AS STRING)) AS urlkey " +
      "FROM pr LEFT JOIN sm ON sm.doc_id = pr.doc_id), " +
      "sl AS (SELECT doc_id, host, fresh_class, n_caps, n_changes, rate_ppm, " +
      "CAST(row_number() OVER (PARTITION BY host ORDER BY fresh_class ASC, rate_ppm DESC, n_changes DESC, md5(urlkey) ASC, urlkey ASC) AS BIGINT) AS slot FROM pp) " +
      "SELECT doc_id, host, fresh_class, n_caps, n_changes, rate_ppm, slot, " +
      "CAST((slot - 1) * (500 * (1 + CAST(substr(host, 5, length(host) - 16) AS BIGINT) % 3)) AS BIGINT) AS fetch_at_ms FROM sl"
  }

  /** Chain → lag → change counts → rate → per-host priority window,
    * replayed verbatim (exact integers end to end).
    */
  val crawlPrioritySql: String = {
    val plant = graft.llm.Curation.htmlPlantExpr
    "WITH cb AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN concat(text, ' v2') ELSE text END AS text FROM documents), " +
      "cc AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN concat(text, ' v3') ELSE text END AS text FROM documents), " +
      s"ch AS (SELECT doc_id, '20240101000000' AS cdx_ts, md5($plant) AS digest FROM documents " +
      s"UNION ALL SELECT doc_id, '20240201000000', md5($plant) FROM cb " +
      s"UNION ALL SELECT doc_id, '20240301000000', md5($plant) FROM cc " +
      s"UNION ALL SELECT doc_id, '20240401000000', md5($plant) FROM documents), " +
      "lg AS (SELECT doc_id, digest, lag(digest) OVER (PARTITION BY doc_id ORDER BY cdx_ts) AS prev FROM ch), " +
      "pr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_caps, " +
      "CAST(sum(CASE WHEN prev IS NOT NULL AND digest <> prev THEN 1 ELSE 0 END) AS BIGINT) AS n_changes " +
      "FROM lg GROUP BY doc_id), " +
      "pp AS (SELECT doc_id, n_caps, n_changes, " +
      "CAST(CASE WHEN n_caps > 1 THEN n_changes * 1000000 // (n_caps - 1) ELSE 0 END AS BIGINT) AS rate_ppm, " +
      "concat('site', CAST(doc_id % 20 AS STRING), '.example.com') AS host, " +
      "concat('com,example,site', CAST(doc_id % 20 AS STRING), ')/doc/', CAST(doc_id AS STRING)) AS urlkey FROM pr), " +
      "sl AS (SELECT doc_id, host, n_caps, n_changes, rate_ppm, " +
      "CAST(row_number() OVER (PARTITION BY host ORDER BY rate_ppm DESC, n_changes DESC, md5(urlkey) ASC, urlkey ASC) AS BIGINT) AS slot FROM pp) " +
      "SELECT doc_id, host, n_caps, n_changes, rate_ppm, slot, " +
      "CAST((slot - 1) * (500 * (1 + CAST(substr(host, 5, length(host) - 16) AS BIGINT) % 3)) AS BIGINT) AS fetch_at_ms FROM sl"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "warc_roundtrip" -> { (s, dir) => roundtripAgg(s, dir) },
    "warc_gz_roundtrip" -> { (s, dir) => roundtripAgg(s, dir, gzip = true) },
    "warc_html_extract" -> { (s, dir) => warcHtmlExtract(s, dir) },
    "wet_roundtrip" -> { (s, dir) => wetRoundtrip(s, dir) },
    "wat_roundtrip" -> { (s, dir) => watRoundtrip(s, dir) },
    "warc_cdx" -> { (s, dir) => cdxGate(s, dir) },
    "cdx_lookup" -> { (s, dir) => cdxLookup(s, dir) },
    "warc_cdx_gz" -> { (s, dir) => cdxGzGate(s, dir) },
    "cdx_gz_lookup" -> { (s, dir) => cdxGzLookup(s, dir) },
    "warc_revisit" -> { (s, dir) => warcRevisit(s, dir) },
    "cdx_layout" -> { (s, dir) => cdxLayout(s, dir) },
    "cdx_resolve" -> { (s, dir) => cdxResolve(s, dir) },
    "cdx_merge" -> { (s, dir) => cdxMergeGate(s, dir) },
    "crawl_priority" -> { (s, dir) => crawlPriorityGate(s, dir) },
    "crawl_priority_fused" -> { (s, dir) => crawlPriorityFusedGate(s, dir) }
  )

  def oracleSql: Map[String, String] = Map(
    "warc_roundtrip" -> roundtripAggSql,
    // same oracle — the compression leg must be invisible
    "warc_gz_roundtrip" -> roundtripAggSql,
    // the extraction oracle verbatim — the WARC leg must be invisible
    "warc_html_extract" -> graft.llm.Curation.htmlExtractSql,
    "wet_roundtrip" -> wetRoundtripSql,
    "wat_roundtrip" -> watRoundtripSql,
    "warc_cdx" -> cdxGateSql,
    "cdx_lookup" -> cdxLookupSql,
    "warc_cdx_gz" -> cdxGzGateSql,
    // serving must be compression-invariant: the gz leg answers the
    // SAME oracle as the plain leg
    "cdx_gz_lookup" -> cdxLookupSql,
    "warc_revisit" -> warcRevisitSql,
    "cdx_layout" -> cdxLayoutSql,
    "cdx_resolve" -> cdxResolveSql,
    "cdx_merge" -> cdxMergeSql,
    "crawl_priority" -> crawlPrioritySql,
    "crawl_priority_fused" -> crawlPriorityFusedSql
  )
}
