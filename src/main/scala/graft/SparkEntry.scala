package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 (or a
  * north-star extension); entries with a [[oracleSql]] twin are verified
  * by the driver against DuckDB on the same parquet tables.
  *
  * Conventions for oracle parity:
  *  - double aggregation goes through decimal(18,2) casts (exact, engine
  *    order-independent); pass-through doubles are untouched.
  *  - every result is deterministically ordered and ends with explicit
  *    final-type casts so Spark and DuckDB emit identical schemas.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ LakehouseQueries.all ++ PipelineQueries.all

  def oracleSql: Map[String, String] =
    Queries.oracles ++ LakehouseQueries.oracles ++ PipelineQueries.oracles
}
