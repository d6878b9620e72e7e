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
    * The repartition on the bucket key before the write is load-bearing
    * twice over: bucketing hashes with the same Murmur3-mod-N as
    * HashPartitioning, so each write task holds exactly one bucket's
    * rows and emits exactly ONE file per bucket. (a) Without it, every
    * task writes a file into every bucket it touches — tasks × buckets
    * small files at cluster scale; (b) Spark only trusts the written
    * sort order when a bucket is a single file
    * (`bucketsContainSingleFile`), and only then can sort-merge join
    * skip its Sort. StorageQueriesSpec asserts the resulting join plan
    * has zero Exchange and zero Sort. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
