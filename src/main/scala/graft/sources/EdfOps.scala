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
      // equal-length channel matrix from the head of each channel (the
      // small collect is the EDF Writer's driver-side sink contract, as
      // in the reference; record count trimmed to a multiple of spr)
      val spr = 64
      val all = Signal
        .long(s, dir)
        .groupBy(col("channel"))
        .agg(sort_array(collect_list(struct(col("n"), col("x")))).as("rows"))
        .collect()
        .map(r =>
          r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)).toArray
        )
        .sortBy(_._1)
        .toSeq
      val len = (all.map(_._2.length).min / spr) * spr
      val chans = all.map { case (ch, xs) => ch -> xs.take(len) }
      val tmp = java.nio.file.Files.createTempDirectory("graft_edf").toString
      val path = s"$tmp/roundtrip.edf"
      Edf.write(path, chans, fs = 100.0, samplesPerRecord = spr)
      Edf.readSpark(s, path).select(col("channel"), col("n"), round(col("x"), 2).as("x"))
    }
  )

  def oracleSql: Map[String, String] = Map()
}
