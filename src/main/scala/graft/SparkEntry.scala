package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Curation, LlmOps, Modeling, QueryDef, Relational, Scalars, Temporal}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Registry of every implemented operator from SURVEY.md §2. Each entry is
  * a (SparkSession, sfDir) => DataFrame builder; those that are
  * SQL-expressible carry a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  private val all: Seq[QueryDef] =
    Relational.defs ++ Scalars.defs ++ Temporal.defs ++ LlmOps.defs ++
      Analytics.defs ++ Curation.defs ++ Modeling.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
