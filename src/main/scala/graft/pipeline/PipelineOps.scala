package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

object PipelineOps {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
