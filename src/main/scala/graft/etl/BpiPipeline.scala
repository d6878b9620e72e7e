package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's whole DAG as function composition (SURVEY.md §3):
  * extract (schema-enforced read + raw snapshot) → transform → load
  * (pinned-nullability parquet, appended to the warehouse table). What
  * Airflow does with four Celery tasks, two XCom hops and three GCS
  * round-trips is one lazy plan here — the only materialization is the
  * final write.
  */
object BpiPipeline {

  /** Run on raw JSON payloads already fetched (or replayed from
    * snapshots). `lastUpdated` is the stamp the reference takes from
    * pendulum.now() (bpi_etl_bigquery.py:234) — injected for
    * determinism; production callers pass the wall clock. */
  def run(
      spark: SparkSession,
      bpiJsonPath: String,
      xrJsonPath: String,
      lastUpdated: String,
      tableDir: String): DataFrame = {
    val bpi = Ingest.readBpi(spark, bpiJsonPath)
    val xr = Ingest.readXr(spark, xrJsonPath)
    val out = Sinks.withPinnedSchema(
      BpiTransform(bpi, xr, lastUpdated), Schemas.bpiXrHourly)
    Sinks.appendParquet(out, tableDir)
    spark.read.parquet(tableDir)
  }
}
