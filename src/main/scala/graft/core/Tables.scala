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
