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
    Tables.cached(spark, s"$sfDir/$name.parquet")

  def region: DataFrame     = rd("region")
  def nation: DataFrame     = rd("nation")
  def customer: DataFrame   = rd("customer")
  def supplier: DataFrame   = rd("supplier")
  def part: DataFrame       = rd("part")
  def orders: DataFrame     = rd("orders")
  def lineitem: DataFrame   = rd("lineitem")
  def documents: DataFrame  = rd("documents")
  def embeddings: DataFrame = rd("embeddings")

  /** Normalizes `ts` to session-zoned TimestampType regardless of the
    * physical parquet type, so every downstream query sees one type.
    * Generations of the test parquet have carried TIMESTAMP(NANOS)
    * (scans as nanos-since-epoch LONG under
    * spark.sql.legacy.parquet.nanosAsLong, converted with integer `div`
    * — no double round-trip, epoch nanos exceed 2^53) and µs
    * TIMESTAMP_NTZ (cast is value-identical under the pinned-UTC
    * session). Both match DuckDB's reading of the same file.
    */
  def events: DataFrame = {
    val df = rd("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}

object Tables {
  /** `spark.read.parquet` eagerly lists files and reads footers to
    * resolve the schema; Verify/Bench run ~40 queries in one process, so
    * re-resolving the same nine relations per query is a fixed ~0.3 s
    * floor under every measurement. Base relations are immutable for the
    * life of a run — cache the resolved DataFrame handle per
    * (session, path). Only relation metadata is reused; each query still
    * builds and optimizes its own plan on top.
    */
  private val handles =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def cached(spark: SparkSession, path: String): DataFrame =
    handles.computeIfAbsent((spark, path), { case (s, p) => s.read.parquet(p) })

  /** Drop cached handles. MUST be called by any path that rewrites
    * parquet under a previously-read directory — the eagerly-resolved
    * file listing otherwise serves deleted splits (FileNotFound) or
    * stale data. [[graft.ops.Compaction.compactPartitions]] calls this
    * after rewriting; tests that overwrite fixtures do the same. Growth
    * is bounded in practice by the process's session count (one or two)
    * × nine relations; a long-lived multi-session service would key off
    * weak session refs instead. */
  private[graft] def invalidate(): Unit = handles.clear()
}
