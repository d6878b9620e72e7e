package graft.ops

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Correctness cover for the no-oracle `approx_distinct` key (SURVEY.md
  * §2.7): HLL++ estimates must sit within the configured relative error
  * of the exact per-group distinct counts. */
class ApproxDistinctSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 4x the 2% target rsd per group") {
    val approx = SparkEntry.queries("approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("distinct_users")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) <= math.max(1.0, 0.08 * ex),
        s"group $k: approx $ap vs exact $ex")
    }
  }

  test("table_profile_hll matches the exact profile, n_distinct within 4x rsd") {
    def byCol(key: String) = SparkEntry.queries(key)(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val exact = byCol("table_profile")
    val hll = byCol("table_profile_hll")
    assert(hll.keySet == exact.keySet)
    exact.foreach { case (c, (n, nNull, nd, minE6, maxE6)) =>
      val (hn, hNull, hnd, hMin, hMax) = hll(c)
      // Everything but the sketch is computed identically.
      assert((hn, hNull, hMin, hMax) == ((n, nNull, minE6, maxE6)),
        s"$c: non-sketch stats drifted")
      assert(math.abs(hnd.toDouble - nd) <= math.max(1.0, 0.08 * nd),
        s"$c: approx n_distinct $hnd vs exact $nd")
    }
  }
}
