package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Parallelism helpers for CPU-heavy narrow transforms. */
object Par {
  /** Repartition by key with an EXPLICIT partition count (session's
    * shuffle partitions): a bare `repartition(col)` is subject to AQE
    * rebalancing, which coalesces a tiny shuffle back to one partition
    * and re-serializes the downstream per-row work — exactly wrong when
    * the input is one unsplittable file/row group and the cost is CPU
    * per row, not bytes. */
  def byKey(df: DataFrame, key: String): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
      col(key))
}
