package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with decode / feature-extraction / resize / frame-sampling stages.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB — everything around it (schema,
  * batched per-partition execution, partition locality, column shapes)
  * is the real production plumbing: swap `stubDecode` for an actual
  * codec (e.g. via JNI or mapInPandas on the PySpark side) and the plan
  * is unchanged.
  */
object Multimodal {

  /** Synthetic media corpus derived from documents: payload = utf-8
    * bytes, metadata typed as (width, height, format, n_frames).
    */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          (length(col("text")) % 64 + 1).as("width"),
          (length(col("text")) % 48 + 1).as("height"),
          lit("fake/raw").as("format"),
          (length(col("text")) / 64 + 1).as("n_frames")
        ).as("meta")
      )

  /** STUB decode kernel: a real codec would decode `payload` to pixels/
    * samples; the deterministic fake emits per-byte statistics so the
    * batch shape (one feature vector per media row) is exercised
    * end-to-end.
    */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    if (payload.isEmpty) Array(0.0, 0.0, 0.0)
    else {
      val n = payload.length.toDouble
      var sum = 0.0; var min = 255.0; var max = 0.0
      payload.foreach { b =>
        val v = (b & 0xff).toDouble
        sum += v; if (v < min) min = v; if (v > max) max = v
      }
      Array(n, sum / n, max - min)
    }
  }

  /** Batched per-partition feature extraction (the Scala analogue of a
    * mapInPandas batch UDF): payload bytes never leave the executor.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val f = stubDecode(bytes)
        (id, f(0), f(1), f(2))
      })
      .toDF("media_id", "n_bytes", "mean_byte", "byte_range")
  }

  /** Fixed-size frame sampling of a "video" payload: 64-byte frames,
    * every k-th kept — pure column ops, no driver involvement.
    */
  def frameSample(media: DataFrame, everyK: Int): DataFrame = {
    val frameLen = 64
    media
      .select(
        col("media_id"),
        posexplode(split(base64(col("payload")), s"(?<=\\G.{$frameLen})"))
      )
      .toDF("media_id", "frame_idx", "frame_b64")
      .filter(col("frame_idx") % everyK === 0)
  }

  /** STUB resize: truncate/zero-pad payload to w·h bytes — stands in for
    * a pixel resample while keeping output shape contracts honest.
    */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val target = w * h
    media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out = java.util.Arrays.copyOf(bytes, target)
        (id, out)
      })
      .toDF("media_id", "payload")
      .withColumn("meta", struct(lit(w).as("width"), lit(h).as("height"), lit("fake/raw").as("format"), lit(1).as("n_frames")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> { (s, dir) =>
      decodeFeatures(syntheticMedia(s, dir))
        .select(
          col("media_id"),
          col("n_bytes"),
          round(col("mean_byte"), 6).as("mean_byte"),
          col("byte_range")
        )
    }
  )

  /** The stub decode's per-byte stats ARE SQL-expressible here because
    * the synthetic payload is UTF-8 of pure-ASCII text: byte values =
    * `unicode()` of each character. A real codec would drop this back
    * to a rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "mm_features" ->
      ("WITH ch AS (SELECT doc_id AS media_id, unicode(u.c) AS v " +
        "FROM documents, unnest(string_split(text, '')) u(c)) " +
        "SELECT media_id, CAST(count(*) AS DOUBLE) AS n_bytes, " +
        "round(sum(CAST(v AS DOUBLE)) / count(*), 6) AS mean_byte, " +
        "CAST(max(v) - min(v) AS DOUBLE) AS byte_range FROM ch GROUP BY media_id")
  )
}
