package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Signal, Tables}

/** Annotation-to-mask machinery (reference: openseize
  * `file_io/annotations.py:130` `as_mask`: annotation intervals
  * (start time, duration) → per-sample boolean mask at a given rate).
  *
  * The test-corpus stand-in for an annotation file: every 'error' event
  * row k (ordered by event_id) marks an interval [4k, 4k+10) on the
  * sample axis; the mask is evaluated over the 'click' channel. The
  * interval join broadcasts the (small) annotation side; at scale this is
  * the standard broadcast range-join shape.
  */
object AnnoOps {

  private val strideMul = 4L
  private val dur = 10L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "anno_mask" -> { (s, dir) =>
      val sig = Signal.long(s, dir).filter(col("channel") === "click")
      val w = Window.orderBy(col("event_id"))
      val anno = Tables
        .events(s, dir)
        .filter(col("event_type") === "error")
        .select((row_number().over(w) - 1).cast("bigint").as("k"))
        .select((col("k") * strideMul).as("lo"), (col("k") * strideMul + dur).as("hi"))
      val hit = sig
        .join(broadcast(anno), col("n") >= col("lo") && col("n") < col("hi"), "left_outer")
        .groupBy(col("n"), col("x"))
        .agg(max(col("lo").isNotNull).as("in_anno"))
      hit.select(col("n"), col("x"), col("in_anno"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "anno_mask" ->
      (s"${Signal.sigCte}, anno AS (SELECT (row_number() OVER (ORDER BY event_id) - 1) * $strideMul AS lo, " +
        s"(row_number() OVER (ORDER BY event_id) - 1) * $strideMul + $dur AS hi " +
        "FROM events WHERE event_type = 'error') " +
        "SELECT n, x, EXISTS (SELECT 1 FROM anno a WHERE sig.n >= a.lo AND sig.n < a.hi) AS in_anno " +
        "FROM sig WHERE channel = 'click'")
  )
}
