package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Declared, LlmQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator (SURVEY.md §2.H Q1–Q20 + the [NS] LLM-pipeline
  * extensions) is registered here as a named deterministic query; entries
  * with SQL-expressible semantics also carry DuckDB oracle SQL for the
  * driver's hash-compare gate.
  */
object SparkEntry {

  val declared: Seq[Declared] = RelationalQueries.all ++ LlmQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-way broadcast-join revenue rollup (SURVEY.md §2.H Q10). */
  def entry(spark: SparkSession): DataFrame =
    declared.find(_.name == "q10_join_revenue").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — ALL declared queries carry one (the
    * iterative k-means queries q33/q47 replay their training as chained
    * CTEs; QueriesSpec pins the no-oracle set to empty). */
  def oracleSql: Map[String, String] =
    declared.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
