package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed tables for co-located joins (SURVEY.md §4 / the 100 TB
  * design bullet): pre-partition both join sides into the same number
  * of buckets on the join key at WRITE time, so every subsequent join
  * on that key reads bucket-aligned files and skips the shuffle
  * entirely — the dominant cost of a large-large join amortized across
  * every query that joins on the key.
  */
object Bucketing {

  /** Write `df` as a bucketed (and in-bucket sorted) managed table.
    *
    * The repartition on the bucket key before the write is load-bearing:
    * bucketing hashes with the same Murmur3-mod-N as HashPartitioning,
    * so each write task holds exactly one bucket's rows and emits
    * exactly ONE file per bucket — without it, every task writes a file
    * into every bucket it touches (tasks × buckets small files at
    * cluster scale). The single-file-per-bucket layout guarantees the
    * join plans with zero Exchange; a Sort remains above each scan,
    * since Spark 3+ no longer propagates the written per-bucket sort
    * order by default (`spark.sql.legacy.bucketedTableScan.
    * outputOrdering`). The sorted write is retained anyway for
    * compression and row-group pruning. StorageQueriesSpec asserts the
    * Exchange-free plan. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Append a batch into a bucketed managed table (created on first
    * append). Each append adds ONE file per bucket (the load-bearing
    * repartition again), so a table appended N times reads N files per
    * bucket — bounded growth that [[Compaction]] folds back down; the
    * bucket-aligned layout itself is invariant under appends, so every
    * reader keeps its Exchange-free plan. This is the write path for
    * STANDING indexes that grow batch-by-batch (the streaming
    * near-dedup band index). */
  def appendBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("append")
      .format("parquet")
      .saveAsTable(table)
}
