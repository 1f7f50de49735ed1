package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One scored query: the Spark implementation plus (when SQL-expressible)
  * its DuckDB oracle twin. Column names and types must match between the
  * two exactly — the driver sorts columns by name and hash-compares values
  * (SURVEY.md §2.3). Queries without an oracle get a rows-only check.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
