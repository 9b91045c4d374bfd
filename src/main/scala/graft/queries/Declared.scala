package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A declared, deterministic query: a Spark-side builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query over
  * the same parquet tables. The driver hash-compares both result sets with
  * columns sorted by name, so builders and oracle SQL must agree on column
  * NAMES and TYPES exactly, and every query ends in ORDER BY on a unique key.
  */
final case class Declared(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)
