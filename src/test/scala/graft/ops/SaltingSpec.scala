package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salting must change the shuffle shape, not the answer: salted
  * results equal their unsalted equivalents exactly. */
class SaltingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("saltedSumCount equals plain groupBy sum/count (exact long sums)") {
    val li = Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_orderkey"))
    val salted = Salting
      .saltedSumCount(li, Seq("l_returnflag"), "l_orderkey", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_orderkey").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain inner equi-join") {
    val t = Tables(spark, sf)
    val plain = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Salting
      .saltedJoin(t.orders, t.customer, "o_custkey", "c_custkey", salts = 4)
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("small side is replicated once per salt before the join") {
    val t = Tables(spark, sf)
    // Row multiplicity check: joining against a single-key small side
    // must not duplicate large-side rows.
    val one = t.customer.limit(1)
    val joined = Salting.saltedJoin(t.orders, one, "o_custkey", "c_custkey", 4)
    val plain = t.orders.join(one, col("o_custkey") === col("c_custkey"))
    assert(joined.count() == plain.count())
  }
}
