package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see SURVEY.md §7 + TESTDATA.md.
  *
  * `queries` is the correctness-gate inventory: one entry per implemented
  * operator from SURVEY.md §2 (host-engine relational surface, event
  * analytics, text/dedup/similarity pipeline ops, and the connector
  * surface). `oracleSql` carries the DuckDB-equivalent SQL for everything
  * SQL-expressible; connector queries verified against local fixtures use
  * literal VALUES oracles.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    Relational.defs ++ Extended.defs ++ Events.defs ++ TextAnalysis.defs ++
      Vectors.defs ++ Pipeline.defs ++ Curation.defs ++ Connectors.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs.find(_.name == "q06_join_5way").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
