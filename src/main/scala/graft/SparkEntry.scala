package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator family's query registry; each entry has a
  * DuckDB oracle in [[oracleSql]] unless marked rows-only.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs("q5_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ GraphOnTpch.defs ++ TextOps.defs ++
      VectorOps.defs ++ EventOps.defs ++ MultimodalQ.defs ++ CypherQ.defs ++
      GraphXQ.defs ++ PackOps.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ GraphOnTpch.oracles ++ TextOps.oracles ++
      VectorOps.oracles ++ EventOps.oracles ++ MultimodalQ.oracles ++
      CypherQ.oracles ++ GraphXQ.oracles ++ PackOps.oracles
}
