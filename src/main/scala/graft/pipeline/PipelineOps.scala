package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Signal
import graft.operators.FirOps

/** Composable processing pipelines (reference: openseize
  * `tools/pipeline.py:16` Pipeline — compose callables with frozen
  * kwargs and apply them in order).
  *
  * The Spark-native composition unit is `DataFrame => DataFrame`; a
  * Pipeline is a fold over those. Because every stage is declarative,
  * the composed pipeline is ONE Catalyst plan — stages fuse into shared
  * whole-stage-codegen spans instead of materializing between steps.
  */
final case class Pipeline(stages: Vector[DataFrame => DataFrame] = Vector.empty) {

  /** Append a stage (reference Pipeline.append). */
  def append(stage: DataFrame => DataFrame): Pipeline = Pipeline(stages :+ stage)

  /** Apply all stages in order (reference Pipeline.__call__). */
  def apply(df: DataFrame): DataFrame = stages.foldLeft(df)((d, f) => f(d))
}

object PipelineOps {

  /** Demo pipeline: hamming lowpass → decimate by 2 → per-channel
    * standardize — a filter → resample → normalize chain as one plan.
    */
  def demo: Pipeline = Pipeline()
    .append(FirOps.same(_, FirOps.hammingLp))
    .append { df =>
      df.filter(col("n") % 2 === 0)
        .select(col("channel"), (col("n") / 2).cast("bigint").as("n"), col("y"))
    }
    .append { df =>
      val w = Window.partitionBy(col("channel"))
      df.select(
        col("channel"),
        col("n"),
        round((col("y") - avg(col("y")).over(w)) / stddev_pop(col("y")).over(w), 6).as("z")
      )
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_demo" -> { (s, dir) => demo(Signal.long(s, dir)) }
  )

  def oracleSql: Map[String, String] = Map(
    "pipeline_demo" ->
      (s"${Signal.sigCte}, conv AS (SELECT channel, n, round(${FirOps.sameExprSql(FirOps.hammingLp)}, 6) AS y " +
        "FROM sig WINDOW w AS (PARTITION BY channel ORDER BY n)), " +
        "dec AS (SELECT channel, n // 2 AS n, y FROM conv WHERE n % 2 = 0) " +
        "SELECT channel, n, round((y - avg(y) OVER (PARTITION BY channel)) / " +
        "stddev_pop(y) OVER (PARTITION BY channel), 6) AS z FROM dec")
  )
}
