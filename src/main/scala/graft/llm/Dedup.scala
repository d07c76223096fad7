package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

object Dedup {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
