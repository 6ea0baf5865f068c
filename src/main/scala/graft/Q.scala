package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One checklist entry from SURVEY.md §2: a named query, its Spark
  * implementation, and (when SQL-expressible) a DuckDB oracle that must
  * hash-match it exactly. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
