package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A declared query: name, Spark implementation, optional DuckDB oracle.
  *
  * `oracle = None` means the op is not SQL-expressible (or not
  * bit-stable) in DuckDB; the driver then records a weaker rows-only
  * check and correctness is covered by ScalaTest instead (SURVEY.md §2.7).
  */
final case class Q(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(
      impl: (SparkSession, String) => DataFrame): Q =
    Q(name, impl, Some(sql))

  def noOracle(name: String)(impl: (SparkSession, String) => DataFrame): Q =
    Q(name, impl, None)
}
