package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query groups:
  *  - [[graft.queries.Relational]]: relational parity with the reference's
  *    delegated engines (DataFusion/PyArrow) — q1–q16, q36–q38, q44;
  *  - [[graft.queries.DeltaQueries]]: end-to-end Delta-log-engine queries
  *    (write → log replay → pruned scan vs oracle) — q17–q21, q39–q40, q42,
  *    plus DML: API DELETE/UPDATE/MERGE q45–q47 and SQL DML q48;
  *  - [[graft.queries.PipelineQueries]]: LLM-data-pipeline operators
  *    (dedup, similarity, text analysis, windows, multimodal) — q22–q35,
  *    q41, q43.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Relational.queries2 ++
      graft.queries.DeltaQueries.queries ++ graft.queries.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.Relational.oracleSql2 ++
      graft.queries.DeltaQueries.oracleSql ++ graft.queries.PipelineQueries.oracleSql
}
