package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4 / the 100 TB design
  * bullet AQE doesn't always cover: one pathological key that floods a
  * single reducer).
  *
  * Aggregation: split each hot key across `salts` sub-keys, partially
  * aggregate on (key, salt) — so the skewed key's load spreads over
  * `salts` reducers — then finish on key alone. Cost: one extra (tiny)
  * shuffle of partial rows.
  *
  * Join: salt the large side's rows, replicate the small side once per
  * salt, join on (key, salt). Replication factor = `salts` on the small
  * side only — the classic trade for unskewing a hot build key.
  */
object Salting {

  /** Rotating per-row salt in [0, salts): spreads even a key whose rows
    * are byte-identical (a value-derived hash would be constant for
    * those rows and leave the hot reducer hot). Internal only — never
    * part of an oracle-checked result. */
  private def rotatingSalt(salts: Int): Column =
    pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts))
      .cast("int")

  /** Skew-safe sum+count per key group: two-phase aggregate through a
    * salted intermediate. Result is exact for algebraic aggregates. */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], value: String, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt", rotatingSalt(salts))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(value)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__psum")).as(s"sum_$value"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Skew-safe equi-join: large side salted, small side replicated
    * across all salts, join key becomes (key, salt). Semantics equal
    * the plain inner equi-join. */
  def saltedJoin(
      large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, salts: Int): DataFrame = {
    // hash(key) is constant per key, so it would NOT spread a hot key;
    // salt large rows by the rotating per-row expression instead.
    val lSpread = large.withColumn("__salt", rotatingSalt(salts))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    lSpread.join(s,
      lSpread(largeKey) === s(smallKey) && lSpread("__salt") === s("__salt"))
      .drop("__salt")
  }
}
