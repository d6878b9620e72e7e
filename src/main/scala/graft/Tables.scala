package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events: DataFrame     = rd("events")
  def documents: DataFrame  = rd("documents")
  def embeddings: DataFrame = rd("embeddings")
}
