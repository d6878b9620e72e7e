package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Correctness cover for the no-oracle `agg_approx_topk` key: with the
  * tracked-item budget at/above the key cardinality the ApproxTopK
  * sketch admits no counting error, so every reported count must EQUAL
  * the exact aggregation's — only item identity at a tied rank boundary
  * is sketch-discretionary. */
class ApproxTopKSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("reported counts equal exact counts; top-10 count multiset matches exactly") {
    val got = SparkEntry.queries("agg_approx_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 10)
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Every reported item carries its exact count (budget >= cardinality
    // means zero sketch error on counts).
    got.foreach { case (item, c) =>
      assert(exact(item) == c, s"item $item: sketch count $c vs exact ${exact(item)}")
    }
    // The ten reported counts are exactly the ten largest exact counts
    // (tie-tolerant: compare sorted count multisets, not item identity).
    val topExact = exact.values.toSeq.sorted(Ordering[Long].reverse).take(10)
    assert(got.map(_._2).toSeq.sorted(Ordering[Long].reverse) == topExact)
  }
}
