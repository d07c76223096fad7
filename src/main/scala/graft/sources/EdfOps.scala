package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

object EdfOps {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
