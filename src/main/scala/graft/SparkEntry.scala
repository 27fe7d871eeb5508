package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.FlowLog
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full decorator pipeline (amazon-archives/aws-vpc-flow-log-appender,
    * decorator/index.js:243-262) with the reference's output field names,
    * including the kebab-case ones and the nested `source-location` struct
    * (decorator/index.js:109-126,169-190).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    FlowLog.pipeline(
      Tables.lineitem(spark, d), Tables.supplier(spark, d),
      Tables.nation(spark, d), Tables.region(spark, d))
      .filter(!col("error"))
      .select(
        col("version"), col("account_id").as("account-id"),
        col("interface_id").as("interface-id"), col("srcaddr"),
        col("destaddr"), col("srcport"), col("dstport"), col("protocol"),
        col("packets"), col("bytes"), col("start"), col("end"),
        col("action"), col("log_status").as("log-status"),
        col("security_group_ids").as("security-group-ids"), col("direction"),
        col("country_code").as("source-country-code"),
        col("country_name").as("source-country-name"),
        col("region_code").as("source-region-code"),
        col("region_name").as("source-region-name"),
        col("city").as("source-city"),
        col("source_location").as("source-location"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FlowLogQueries.queries ++ RelationalQueries.queries ++
      PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    FlowLogQueries.oracle ++ RelationalQueries.oracle ++
      PipelineQueries.oracle
}
