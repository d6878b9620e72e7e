package graft.util

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Determinism property: Det aggregates must be bit-identical across
  * partitionings (the whole point — double sums are order-dependent,
  * integerized sums are not). */
class DetSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("dsum/davg identical under 1, 7 and 32 partitions") {
    val li = Tables(spark, sf).lineitem
    def run(parts: Int): (Double, Double) = {
      val r = li.repartition(parts)
        .agg(
          Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("s"),
          Det.davg(col("l_quantity")).as("a"))
        .head()
      (r.getDouble(0), r.getDouble(1))
    }
    val runs = Seq(1, 7, 32).map(run)
    runs.foreach { case (s, a) =>
      assert(java.lang.Double.doubleToLongBits(s)
        == java.lang.Double.doubleToLongBits(runs.head._1))
      assert(java.lang.Double.doubleToLongBits(a)
        == java.lang.Double.doubleToLongBits(runs.head._2))
    }
  }

  test("plain double sum IS partition-order sensitive on this data (the motivation)") {
    val li = Tables(spark, sf).lineitem
      .select((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("x"))
    val a = li.repartition(1).agg(sum("x")).head().getDouble(0)
    val b = li.repartition(32).agg(sum("x")).head().getDouble(0)
    // Not asserted unequal (could coincide), but the exact-units sums must
    // agree regardless — and a/b differing is why Det exists.
    val ea = li.repartition(1).agg(Det.dsum(col("x"))).head().getDouble(0)
    val eb = li.repartition(32).agg(Det.dsum(col("x"))).head().getDouble(0)
    assert(ea == eb)
    // dsum quantizes to cents: worst case n_rows × 0.005 = 30 for the
    // 6000-row fixture; assert at 2× so the sanity bound has headroom.
    assert(math.abs(a - ea) <= 60.0 && math.abs(b - eb) <= 60.0)
  }
}
