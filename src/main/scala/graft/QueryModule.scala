package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named family of driver-verifiable queries.
  *
  * `queries` maps name -> (spark, sfDir) => result; `oracles` maps the SAME
  * name -> equivalent ANSI SQL for the DuckDB oracle. Names missing from
  * `oracles` get the driver's weaker rows-only check (used for operators
  * whose output depends on engine-internal hashing or approximation).
  *
  * Contract (see /root/repo/SURVEY.md §5): results are deterministically
  * ordered, output column names match the SQL aliases exactly, computed
  * integers are cast to BIGINT on both sides, and double aggregates go
  * through graft.Sql's exact-decimal path.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
