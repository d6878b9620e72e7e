package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All declared queries read through here so the scan path is uniform:
  * plain parquet scans that Catalyst can push filters/projections into.
  * At cluster scale the same API would point at a partitioned table root
  * instead of a single file — nothing else changes.
  */
final case class Tables(spark: SparkSession, sfDir: String) {
  private def rd(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region: DataFrame     = rd("region")
  def nation: DataFrame     = rd("nation")
  def customer: DataFrame   = rd("customer")
  def supplier: DataFrame   = rd("supplier")
  def part: DataFrame       = rd("part")
  def orders: DataFrame     = rd("orders")
  def lineitem: DataFrame   = rd("lineitem")
  def documents: DataFrame  = rd("documents")
  def embeddings: DataFrame = rd("embeddings")

  /** The events parquet carries TIMESTAMP(NANOS), which Spark has no
    * native type for; sessions set spark.sql.legacy.parquet.nanosAsLong
    * (see [[Sessions]]) so it scans as nanos-since-epoch LONG, converted
    * here to a µs timestamp with integer `div` (no double round-trip —
    * epoch nanos exceed 2^53). Matches DuckDB's ns→µs cast truncation.
    */
  def events: DataFrame = {
    val df = rd("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}
