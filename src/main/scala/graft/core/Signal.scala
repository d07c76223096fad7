package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Signal data model.
  *
  * The reference (openseize `core/producer.py:146`) streams big EEG arrays
  * as chunked iterables with shape (channels, samples). The Spark-native
  * equivalent is a long-format DataFrame `(channel, n, x)`: `channel` is
  * the parallel unit, `n` the sample index, `x` the amplitude. A partition
  * sort per channel replaces the reference's sequential chunk iteration,
  * and every downstream DSP op is a declarative plan over this shape.
  *
  * For the test corpus the signal is derived from `events`:
  * channel = event_type, n = rank of event_id within the channel,
  * x = value. Both engines (Spark / DuckDB oracle) derive it with the
  * same window expression, so the derivation is deterministic.
  */
object Signal {

  /** Long-format signal (channel: string, n: bigint, x: double).
    *
    * The alias to `channel` happens BEFORE the ranking window so the
    * hash partitioning established here propagates to every downstream
    * channel-keyed window/aggregate — one shuffle for a whole DSP chain
    * instead of one per stage (verified via executedPlan Exchange
    * counts).
    */
  def long(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("channel")).orderBy(col("event_id"))
    Tables
      .events(spark, dir)
      .select(col("event_type").as("channel"), col("event_id"), col("value").as("x"))
      .select(
        col("channel"),
        (row_number().over(w) - 1).cast("bigint").as("n"),
        col("x")
      )
  }

  /** DuckDB twin of [[long]] — used as a CTE prefix by every oracle. */
  val longSql: String =
    "SELECT event_type AS channel, " +
      "CAST(row_number() OVER (PARTITION BY event_type ORDER BY event_id) - 1 AS BIGINT) AS n, " +
      "value AS x FROM events"

  /** Standard oracle prelude: `WITH sig AS (...)`. */
  val sigCte: String = s"WITH sig AS ($longSql)"

  /** Segmented form: fixed-length sample arrays per (channel, seg).
    * Throughput layout for vectorized kernels (FFT / long convolutions):
    * one shuffle to group, then all per-segment compute is partition-local.
    * `n0` is the absolute index of the first sample in the segment.
    */
  def segments(spark: SparkSession, dir: String, segLen: Int): DataFrame = {
    require(segLen > 0)
    long(spark, dir)
      .withColumn("seg", (col("n") / segLen).cast("bigint"))
      .groupBy(col("channel"), col("seg"))
      .agg(
        min(col("n")).as("n0"),
        transform(
          array_sort(collect_list(struct(col("n"), col("x")))),
          s => s.getField("x")
        ).as("xs")
      )
  }
}
