package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Charset sniffing + transcoding — the fetch-side step every real
  * crawl needs between "payload bytes" and "text": a response's bytes
  * arrive in whatever encoding the publisher used, declared (when
  * declared at all) in up to three conflicting places. The resolution
  * order implemented here is the standard one (WHATWG encoding sniff /
  * HTML5 prescan, as production crawlers apply it to non-browser
  * fetches):
  *
  *   1. a byte-order mark wins over everything (UTF-8 / UTF-16BE/LE);
  *   2. else the HTTP `Content-Type` header's `charset=` parameter;
  *   3. else a `<meta charset=…>` / `<meta http-equiv=… content=…>`
  *      declaration found by decoding a bounded prefix as Latin-1 (the
  *      ASCII-superset prescan — meta tags are ASCII, so any
  *      single-byte decoding exposes them);
  *   4. else UTF-8 (the modern web default).
  *
  * Declared labels normalize through a WHATWG-style alias table
  * (`windows-1252`/`latin1`/`iso_8859-1` → ISO-8859-1, `utf8` → UTF-8,
  * unknown labels → UTF-8) before decoding, because the JVM/engine
  * decoder wants canonical names and real-web labels are a zoo.
  *
  * Everything is ROW-LOCAL (sniff = a few regexes over a 1 KiB prefix,
  * transcode = one `decode` per row under whole-stage codegen), so the
  * stage runs map-side at any crawl scale — no shuffle, no state. The
  * gate plants five declaration arms (header / meta-charset / BOM with
  * a CONFLICTING header / meta-http-equiv / undeclared) with payloads
  * REALLY encoded per-arm (Latin-1 vs UTF-8 bytes genuinely differ on
  * the non-ASCII salt), and proves the decoded text md5-equals the
  * original plant — the full bytes→text roundtrip, replayed by the
  * oracle arithmetically (Latin-1 bytes = chars; UTF-8 bytes = strlen).
  */
object Charsets {

  /** UTF-8 byte-order mark. */
  val bomUtf8: Array[Byte] = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)

  // ---- gate plant (dual-dialect expression strings) ----

  /** The page string: optional meta declaration per arm + a non-ASCII
    * salt ("café nº<d> über") so Latin-1 and UTF-8 byte lengths
    * genuinely differ and a wrong decode cannot md5-match.
    */
  val pageExpr: String =
    "concat('<html><head>', " +
      "CASE WHEN doc_id % 5 = 1 THEN '<meta charset=\"windows-1252\">' " +
      "WHEN doc_id % 5 = 3 THEN '<meta http-equiv=\"Content-Type\" content=\"text/html; charset=UTF-8\">' " +
      "ELSE '' END, " +
      "'<title>Doc ', CAST(doc_id AS STRING), '</title></head><body><p>', " +
      "substr(text, 1, 120), " +
      "' café nº', CAST(doc_id % 10 AS STRING), ' über</p></body></html>')"

  /** The HTTP Content-Type header per arm; arm 2 DECLARES Latin-1 but
    * ships a UTF-8 BOM — the BOM must win.
    */
  val headerExpr: String =
    "CASE WHEN doc_id % 5 = 0 THEN 'Content-Type: text/html; charset=ISO-8859-1' " +
      "WHEN doc_id % 5 = 2 THEN 'Content-Type: text/html; charset=ISO-8859-1' " +
      "ELSE 'Content-Type: text/html' END"

  /** Fetched-response plant: (doc_id, page, header string, payload
    * bytes) — bytes REALLY encoded per arm (the only Spark-side-only
    * step; the oracle replays its consequences arithmetically). The
    * original `page` string rides along so roundtrip checks compare
    * in-frame (no join).
    */
  def fetchPlant(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), expr(pageExpr).as("page"), expr(headerExpr).as("header"))
      .withColumn(
        "payload",
        when(col("doc_id") % 5 <= 1, encode(col("page"), "ISO-8859-1"))
          .when(col("doc_id") % 5 === 2, concat(lit(bomUtf8), encode(col("page"), "UTF-8")))
          .otherwise(encode(col("page"), "UTF-8"))
      )
      .select(col("doc_id"), col("page"), col("header"), col("payload"))

  // ---- the operator ----

  /** Sniff + transcode over (…, header, payload): adds
    * `src` (bom|header|meta|default), `declared` (the raw winning
    * label, '' when none), `charset` (normalized decode charset) and
    * `text_out` (the decoded string, BOM stripped); all other input
    * columns pass through.
    *
    * Implemented as a row-local Scala kernel (`mapPartitions`, the
    * WARC-codec class): the declarative withColumn chain inlined the
    * meta-prescan (prefix decode + regex) ~30× per row under
    * CollapseProject — measured 7.6 s vs this kernel's sub-second at
    * 200k pages — and a per-record byte codec is exactly the shape
    * the repo's mapPartitions rule sanctions. Regexes precompile once
    * per partition; decoding uses the JVM charset decoders with the
    * standard replace-malformed policy. Stateless, so streaming-safe.
    */
  def decodeFetched(fetched: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val inSchema = fetched.schema
    val outSchema = StructType(
      inSchema.fields ++ Seq(
        StructField("src", StringType),
        StructField("declared", StringType),
        StructField("charset", StringType),
        StructField("text_out", StringType)
      )
    )
    val hIdx = inSchema.fieldIndex("header")
    val pIdx = inSchema.fieldIndex("payload")
    fetched.mapPartitions { rows =>
      val headerRe = java.util.regex.Pattern.compile("(?i)charset=([A-Za-z0-9_\\-]+)")
      val metaRe =
        java.util.regex.Pattern.compile("(?i)<meta[^>]*charset=\"?([A-Za-z0-9_\\-]+)")
      val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
      def reFind(p: java.util.regex.Pattern, s: String): String = {
        val m = p.matcher(s)
        if (m.find() && m.group(1).nonEmpty) m.group(1) else null
      }
      rows.map { r =>
        // null tolerance (r16 advice): real fetch frames carry rows
        // with no Content-Type header or an empty body — sniff treats
        // a missing header as undeclared and a missing payload as
        // empty bytes (decodes to "", default charset)
        val header = if (r.isNullAt(hIdx)) "" else r.getString(hIdx)
        val payload =
          if (r.isNullAt(pIdx)) Array.emptyByteArray else r.getAs[Array[Byte]](pIdx)
        val bomCs =
          if (payload.length >= 3 && payload(0) == 0xEF.toByte &&
            payload(1) == 0xBB.toByte && payload(2) == 0xBF.toByte) "utf-8"
          else if (payload.length >= 2 && payload(0) == 0xFE.toByte && payload(1) == 0xFF.toByte)
            "utf-16be"
          else if (payload.length >= 2 && payload(0) == 0xFF.toByte && payload(1) == 0xFE.toByte)
            "utf-16le"
          else null
        val headerDecl = reFind(headerRe, header)
        // HTML5 prescan: a bounded prefix decoded as Latin-1 (an
        // ASCII superset) exposes the ASCII meta tag for any
        // ASCII-compatible payload encoding
        lazy val metaDecl =
          reFind(metaRe, new String(payload, 0, math.min(payload.length, 1024), latin1))
        val (src, declared) =
          if (bomCs != null) ("bom", bomCs)
          else if (headerDecl != null) ("header", headerDecl)
          else if (metaDecl != null) ("meta", metaDecl)
          else ("default", "")
        val cs =
          if (src == "bom") declared
          else if (src == "default") "utf-8"
          else aliasNormName(declared)
        val bomLen = if (src != "bom") 0 else if (cs == "utf-8") 3 else 2
        val jcs = cs match {
          case "iso-8859-1" => latin1
          case "us-ascii" => java.nio.charset.StandardCharsets.US_ASCII
          case "utf-16be" => java.nio.charset.StandardCharsets.UTF_16BE
          case "utf-16le" => java.nio.charset.StandardCharsets.UTF_16LE
          case _ => java.nio.charset.StandardCharsets.UTF_8
        }
        val textOut = new String(payload, bomLen, payload.length - bomLen, jcs)
        Row.fromSeq(r.toSeq ++ Seq(src, declared, cs, textOut))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** [[aliasNorm]]'s plain-Scala twin for the kernel path. */
  private def aliasNormName(label: String): String = label.toLowerCase match {
    case "iso-8859-1" | "latin1" | "latin-1" | "iso_8859-1" | "windows-1252" | "cp1252" | "l1" =>
      "iso-8859-1"
    case "utf-8" | "utf8" | "unicode-1-1-utf-8" => "utf-8"
    case "us-ascii" | "ascii" => "us-ascii"
    case "utf-16be" => "utf-16be"
    case "utf-16le" | "utf-16" => "utf-16le"
    case _ => "utf-8"
  }

  /** crawl_charset gate: the five-arm plant through the REAL sniff +
    * decode; md5(text_out) must equal md5 of the original page string
    * — bytes→text roundtrip proven per row, all replayed by arithmetic
    * in the oracle.
    */
  def crawlCharsetGate(docs: DataFrame): DataFrame =
    decodeFetched(fetchPlant(docs))
      .select(
        col("doc_id"),
        col("src"),
        col("declared"),
        col("charset"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        length(col("text_out")).cast("long").as("n_chars"),
        md5(col("text_out")).as("text_md5")
      )

  val crawlCharsetSql: String =
    s"WITH p AS (SELECT doc_id, $pageExpr AS page FROM documents) " +
      "SELECT doc_id, " +
      "CASE WHEN doc_id % 5 = 0 THEN 'header' WHEN doc_id % 5 = 1 THEN 'meta' " +
      "WHEN doc_id % 5 = 2 THEN 'bom' WHEN doc_id % 5 = 3 THEN 'meta' ELSE 'default' END AS src, " +
      "CASE WHEN doc_id % 5 = 0 THEN 'ISO-8859-1' WHEN doc_id % 5 = 1 THEN 'windows-1252' " +
      "WHEN doc_id % 5 = 2 THEN 'utf-8' WHEN doc_id % 5 = 3 THEN 'UTF-8' ELSE '' END AS declared, " +
      "CASE WHEN doc_id % 5 <= 1 THEN 'iso-8859-1' ELSE 'utf-8' END AS charset, " +
      // Latin-1 arms: one byte per char; BOM arm: 3 + UTF-8 bytes
      "CAST(CASE WHEN doc_id % 5 <= 1 THEN length(page) " +
      "WHEN doc_id % 5 = 2 THEN 3 + strlen(page) ELSE strlen(page) END AS BIGINT) AS n_bytes, " +
      "CAST(length(page) AS BIGINT) AS n_chars, " +
      "md5(page) AS text_md5 FROM p"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "crawl_charset" -> { (s, dir) => crawlCharsetGate(Tables.documents(s, dir)) }
  )

  def oracleSql: Map[String, String] = Map(
    "crawl_charset" -> crawlCharsetSql
  )
}
