package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Annotation file readers (reference: openseize
  * `file_io/annotations.py:42` Pinnacle — a tab-delimited export with a
  * preamble of metadata lines before the header row; each row carries
  * number, start/end timestamps, a seconds-from-start pair, channel and
  * label; duration = stop − start).
  *
  * Spark-native shape: plain `spark.read.csv` over the file(s) with the
  * preamble dropped by row-number filter — annotation files are small,
  * the result is broadcast into mask range-joins (see AnnoOps).
  */
object Annotations {

  /** Read a Pinnacle-style TSV: `skipRows` preamble lines, then a header
    * row, then records. Output: (label, start_s, stop_s, duration_s,
    * channel).
    */
  def pinnacle(spark: SparkSession, path: String, skipRows: Int = 6): DataFrame = {
    // explicit schema: the metadata preamble has fewer fields than the
    // records, which would otherwise drive schema inference
    val schema = org.apache.spark.sql.types.StructType(
      (0 to 5).map(i => org.apache.spark.sql.types.StructField(s"_c$i", org.apache.spark.sql.types.StringType))
    )
    val raw = spark.read
      .option("delimiter", "\t")
      .option("header", "false")
      .schema(schema)
      .csv(path)
      .withColumn("_file", input_file_name())
    val w = Window.partitionBy(col("_file")).orderBy(monotonically_increasing_id())
    val body = raw.withColumn("_rn", row_number().over(w)).filter(col("_rn") > skipRows + 1)
    body
      .select(
        col("_c4").as("label"),
        col("_c2").cast("double").as("start_s"),
        col("_c3").cast("double").as("stop_s"),
        (col("_c3").cast("double") - col("_c2").cast("double")).as("duration_s"),
        col("_c5").as("channel")
      )
  }

  /** Interval annotations → per-sample boolean mask at rate fs over
    * [0, size) (reference `as_mask`, annotations.py:130). `include`
    * keeps samples inside any annotation; false inverts.
    */
  def asMask(
      spark: SparkSession,
      annos: DataFrame,
      size: Long,
      fs: Double,
      include: Boolean = true
  ): DataFrame = {
    val samples = spark.range(size).select(col("id").as("n"))
    val iv = annos.select(
      (col("start_s") * fs).cast("bigint").as("lo"),
      ((col("start_s") + col("duration_s")) * fs).cast("bigint").as("hi")
    )
    val flagged = samples
      .join(broadcast(iv), col("n") >= col("lo") && col("n") < col("hi"), "left_outer")
      .groupBy(col("n"))
      .agg(max(col("lo").isNotNull).as("hit"))
    val mask = if (include) col("hit") else !col("hit")
    flagged.select(col("n"), mask.as("mask"))
  }
}
