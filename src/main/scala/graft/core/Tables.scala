package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test corpus.
  *
  * All tables are read lazily; Catalyst pushes projections/filters into the
  * parquet scan. At production scale these would be partitioned layouts —
  * the loaders take a directory so the same code addresses any scale
  * factor.
  */
object Tables {
  /** Scale-adaptive scan fan-out (optimization-guide §2.5, input skew):
    * the local test corpus is one parquet file per table, so every
    * scan-side computation (per-token md5, codec kernels, explode +
    * partial aggregation) runs in ONE task until the first exchange.
    * When the planned scan has fewer partitions than the session's
    * parallelism, redistribute by a deterministic key BEFORE the heavy
    * work; on a many-split production table the condition is false and
    * this is a no-op (an unconditional repartition would shuffle the
    * corpus). Apply ONLY where the pre-exchange work dominates — the
    * exchange costs ~30-80 ms at gate scale, so cheap-scan queries lose.
    * Measured r17 (interleaved A/B at sf0.1): corpus_profile 2.0→0.7 s,
    * corpus_profile_quantiles 2.9→1.3, sample_dsir 2.1→1.5,
    * winnow_overlap 1.5→1.1; NEGATIVE on join/window-bound queries
    * (sim_* −embeddings is 2000 rows−, dedup_*, classifier), so apply
    * per call site on measurement, never blanket.
    */
  def fan(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // streaming frames can't be probed via .rdd (and micro-batches are
    // already split by the source); frames without the key pass through
    if (df.isStreaming || !df.columns.contains(key)) df
    else if (df.rdd.getNumPartitions < target)
      df.repartition(target, org.apache.spark.sql.functions.col(key))
    else df
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** events.parquet's `ts` has shipped as TIMESTAMP(NANOS) in some corpus
    * generations and TIMESTAMP(MICROS) in others; every operator consumes
    * epoch-nanos BIGINT (`ts_ns`), so adapt on the observed schema:
    *  - int64 (NANOS read via nanosAsLong): already epoch nanos.
    *  - timestamp / timestamp_ntz (MICROS): epoch-micros × 1000 — exactly
    *    DuckDB's `epoch_ns(ts)` view of the same parquet, so oracle parity
    *    is preserved bit-for-bit. NTZ wall-clock is interpreted as UTC
    *    matching DuckDB's naive TIMESTAMP semantics.
    *
    * SESSION-WIDE SIDE EFFECT (deliberate): this accessor pins
    * `spark.sql.session.timeZone=UTC` and `nanosAsLong`. The NTZ→epoch
    * conversion is wrong under any other session timezone and there is
    * no per-query override, so the pin must hold in EVERY session that
    * reads events — including a driver-owned session this library does
    * not build. The in-repo entrypoints (Verify, Bench, Prof,
    * TestSpark) additionally pin it at build time so their OTHER
    * queries render timestamps consistently even before events loads.
    * nanosAsLong: without it Spark refuses to read NANOS parquet at
    * all; `events` is the only nanos table, so it is observable
    * nowhere else.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = table(spark, dir, "events")
    val tsNs = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => unix_micros(col("ts").cast("timestamp")) * lit(1000L)
    }
    df.withColumn("ts", tsNs).withColumnRenamed("ts", "ts_ns")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
