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

  test("isqrtScaled1000 == isqrt(x*1e6) below the old overflow ceiling, " +
      "and exact floor(1000*sqrt(x)) beyond it (BigInt ground truth)") {
    import spark.implicits._
    // Sweep: boundary-heavy small values, squares±1, and large values
    // past the old x*1e6 int64 ceiling (~9.2e12) where only the new
    // form can run at all.
    val small = (0L to 2000L) ++
      (1L to 2000L).flatMap(k => Seq(k * k - 1, k * k, k * k + 1))
    val big = Seq(9223372036854L, 9223372036855L, 1000000000000000L,
      (1L << 62) - 1, (1L << 62), Long.MaxValue - 1, Long.MaxValue) ++
      (1L to 50L).map(i => Long.MaxValue / 7 * 3 / (i * i))
    val xs = (small ++ big).distinct.toDF("x")
    val got = xs
      .select(col("x"), Det.isqrtScaled1000(col("x")).as("s"),
        when(col("x") <= lit(9000000000000L),
          Det.isqrt(col("x") * 1000000L)).as("old"))
      .collect()
    got.foreach { r =>
      val x = r.getLong(0)
      val s = r.getLong(1)
      val truth = BigInt(x).*(1000000).bigInteger.sqrt().longValueExact()
      assert(s == truth, s"isqrtScaled1000($x) = $s, want $truth")
      if (!r.isNullAt(2))
        assert(r.getLong(2) == s, s"old/new disagree at $x")
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
