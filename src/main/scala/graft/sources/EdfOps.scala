package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Signal

/** Driver-contract entry for the EDF source: a deterministic
  * write→read round-trip over the event signal (rows-only check — the
  * DuckDB oracle cannot parse EDF).
  */
object EdfOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "edf_roundtrip" -> { (s, dir) =>
      // distributed write→read round-trip: the sample axis splits into
      // 4 "recordings", each written as its own EDF file executor-side
      // (Edf.writeSpark — no driver collect of signal data; the only
      // collects are per-channel count/min/max stats). readSpark then
      // reassembles the global sample index from the file names.
      val spr = 64
      val sig = Signal.long(s, dir)
      val len =
        sig.groupBy(col("channel")).agg(count(lit(1)).as("c")).agg(min(col("c"))).head.getLong(0)
      // up to 4 recordings, but never shorter than one data record each
      val nRecordings = math.max(1L, math.min(4L, len / spr))
      val per = (len / nRecordings / spr) * spr
      val recs = sig
        .filter(col("n") < per * nRecordings)
        .select(
          concat(lit("rec"), expr(s"CAST(n DIV $per AS BIGINT)")).as("recording"),
          col("channel"),
          pmod(col("n"), lit(per)).as("n"),
          col("x")
        )
      val tmp = java.nio.file.Files.createTempDirectory("graft_edf").toString
      Edf.writeSpark(recs, tmp, fs = 100.0, samplesPerRecord = spr)
      Edf
        .readSpark(s, s"$tmp/*.edf")
        .withColumn("rec_idx", regexp_extract(col("src"), "rec(\\d+)\\.edf", 1).cast("bigint"))
        .select(
          col("channel"),
          (col("rec_idx") * per + col("n")).as("n"),
          round(col("x"), 2).as("x")
        )
    }
  )

  def oracleSql: Map[String, String] = Map()
}
