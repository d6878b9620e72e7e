package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The point of bucketing is observable in the plan: a join between two
  * tables bucketed identically on the join key must contain NO shuffle
  * exchange, and must still produce the same rows as the plain join. */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("co-bucketed join plans without a shuffle and matches the plain join") {
    val t = Tables(spark, sf)
    Bucketing.writeBucketed(t.orders, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(t.lineitem, "lineitem_b", "l_orderkey", 8)

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")

    val plain = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    assert(joined.count() == plain.count())
    // exact integer checksum (double sums are partition-order sensitive)
    assert(joined.agg(sum(col("l_orderkey") + col("l_linenumber"))).head().getLong(0)
      == plain.agg(sum(col("l_orderkey") + col("l_linenumber"))).head().getLong(0))
  }
}
