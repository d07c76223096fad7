package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Charsets

class CharsetSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs = core.Tables.documents(spark, sf)

  test("every plant arm decodes back to the exact page string") {
    val out = Charsets.decodeFetched(Charsets.fetchPlant(docs))
    assert(out.filter(col("text_out") =!= col("page")).count() == 0)
    // every arm populated
    assert(out.select("src").distinct().count() == 4)
  }

  test("BOM beats a conflicting header; undeclared falls back to UTF-8") {
    val out = Charsets.decodeFetched(Charsets.fetchPlant(docs))
    val bomArm = out.filter(col("doc_id") % 5 === 2)
    assert(bomArm.filter(col("src") =!= "bom" || col("charset") =!= "utf-8").count() == 0)
    // the conflicting header really declared Latin-1 on those rows
    assert(bomArm.filter(!col("header").contains("ISO-8859-1")).count() == 0)
    val defArm = out.filter(col("doc_id") % 5 === 4)
    assert(defArm.filter(col("src") =!= "default" || col("charset") =!= "utf-8").count() == 0)
  }

  test("Latin-1 bytes decoded as Latin-1, not mojibake: non-ASCII salt survives") {
    val out = Charsets
      .decodeFetched(Charsets.fetchPlant(docs))
      .filter(col("doc_id") % 5 === 0)
    assert(out.count() > 0)
    assert(out.filter(!col("text_out").contains("café nº")).count() == 0)
    // and the payload bytes are genuinely single-byte: é is 0xE9
    val hexed = out.select(upper(hex(col("payload"))).as("h"))
    assert(hexed.filter(!col("h").contains("636166E9")).count() == 0) // 'caf\xE9'
  }

  test("UTF-16 BOMs sniff and decode (beyond the gate's planted arms)") {
    val s = "hi café"
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ s.getBytes("UTF-16BE")
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ s.getBytes("UTF-16LE")
    val in = Seq(
      (1L, "Content-Type: text/html", be),
      (2L, "Content-Type: text/html", le)
    ).toDF("doc_id", "header", "payload")
    val out = Charsets.decodeFetched(in).select("doc_id", "src", "charset", "text_out")
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "bom", "utf-16be", s)))
    assert(out(1) == ((2L, "bom", "utf-16le", s)))
  }

  test("charset decode is stream-safe (pure projection — runs in a streaming query)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Array[Byte])]
    val q = graft.sources.Charsets
      .decodeFetched(in.toDF().toDF("doc_id", "header", "payload"))
      .select("doc_id", "src", "charset", "text_out")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("charset_stream_out")
      .start()
    in.addData((1L, "Content-Type: text/html; charset=ISO-8859-1", "café".getBytes("ISO-8859-1")))
    in.addData((2L, "Content-Type: text/html", "plain".getBytes("UTF-8")))
    q.processAllAvailable()
    q.stop()
    val got = spark
      .table("charset_stream_out")
      .as[(Long, String, String, String)]
      .collect()
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "header", "iso-8859-1", "café"),
      (2L, "default", "utf-8", "plain")
    ))
  }

  test("alias zoo normalizes; unknown labels fall back to UTF-8") {
    val page = "<html><body>ok</body></html>"
    val in = Seq(
      (1L, "Content-Type: text/html; charset=latin1"),
      (2L, "Content-Type: text/html; charset=UTF8"),
      (3L, "Content-Type: text/html; charset=x-mystery-enc"),
      (4L, "Content-Type: text/html; charset=cp1252")
    ).toDF("doc_id", "header")
      .withColumn("payload", encode(lit(page), "ISO-8859-1"))
    val out = Charsets.decodeFetched(in).select("doc_id", "charset")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "iso-8859-1"), (2L, "utf-8"), (3L, "utf-8"), (4L, "iso-8859-1")))
  }

  test("null header / null payload rows sniff without NPE (real fetch frames carry both)") {
    val in = Seq(
      (1L, null.asInstanceOf[String], "café".getBytes("UTF-8")),
      (2L, "Content-Type: text/html; charset=ISO-8859-1", null.asInstanceOf[Array[Byte]]),
      (3L, null.asInstanceOf[String], null.asInstanceOf[Array[Byte]])
    ).toDF("doc_id", "header", "payload")
    val out = Charsets.decodeFetched(in).select("doc_id", "src", "charset", "text_out")
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    // no header → undeclared (default UTF-8 decode of the real bytes);
    // no payload → empty text under the header's declared charset;
    // neither → empty default row, never a crash
    assert(out(0) == ((1L, "default", "utf-8", "café")))
    assert(out(1) == ((2L, "header", "iso-8859-1", "")))
    assert(out(2) == ((3L, "default", "utf-8", "")))
  }
}
