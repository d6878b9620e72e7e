package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed tables for co-located joins (SURVEY.md §4 / the 100 TB
  * design bullet): pre-partition both join sides into the same number
  * of buckets on the join key at WRITE time, so every subsequent join
  * on that key reads bucket-aligned files and skips the shuffle
  * entirely — the dominant cost of a large-large join amortized across
  * every query that joins on the key.
  */
object Bucketing {

  /** Write `df` as a bucketed (and in-bucket sorted) managed table.
    * Sorting by the key additionally lets sort-merge join skip its
    * sort. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
