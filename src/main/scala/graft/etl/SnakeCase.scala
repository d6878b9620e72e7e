package graft.etl

import org.apache.spark.sql.DataFrame

/** camelCase / dotted-path → snake_case column renaming.
  *
  * Reference semantics: bpi_etl_bigquery.py:216-219 — replace `.` with
  * `_`, insert `_` at a lowercase→UPPERCASE boundary, lowercase the rest.
  * Renaming is a driver-side, plan-time operation in Spark too (it only
  * rewrites the projection), so this stays cheap at any scale.
  */
object SnakeCase {
  // Boundary is ([a-z])([A-Z]) exactly as the reference's regex — a
  // digit→UPPER boundary does NOT get an underscore ('rate1Float' →
  // 'rate1float'), matching bpi_etl_bigquery.py:218 semantics.
  def snake(name: String): String =
    name
      .replace(".", "_")
      .replaceAll("(?<=[a-z])(?=[A-Z])", "_")
      .toLowerCase

  /** Rename every column of `df` to snake_case. */
  def renameAll(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(snake).toIndexedSeq: _*)
}
