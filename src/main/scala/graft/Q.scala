package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query plus (when SQL-expressible) a
  * DuckDB oracle producing the identical result on the same parquet tables.
  * Parity rules (SURVEY.md §7.4): alias every computed column identically on
  * both sides; impose a deterministic total ORDER BY; round floating
  * aggregates; cast where DuckDB's type widening differs from Spark's
  * (sum(BIGINT)→HUGEINT, floor→DOUBLE, length→BIGINT, year→BIGINT). */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
