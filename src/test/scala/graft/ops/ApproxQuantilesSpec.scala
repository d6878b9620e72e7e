package graft.ops

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Correctness cover for the no-oracle `agg_quantiles_approx` key.
  * A value-distance bound is the wrong check for a quantile sketch —
  * in a sparse value region the nearest real datum can sit far from
  * the interpolated exact percentile while still being rank-perfect.
  * GK's actual contract is on RANK: at accuracy 10000 the estimate's
  * rank error is ≤ ~1e-4·n. This spec recomputes each estimate's rank
  * band in the raw per-group data and asserts the target quantile
  * falls inside it (±1% slack ≫ the guarantee). */
class ApproxQuantilesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("percentile_approx estimates are rank-correct per group") {
    val approx = SparkEntry.queries("agg_quantiles_approx")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val exactN = SparkEntry.queries("agg_quantiles")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exactN.keySet)
    // Raw cents-domain values per group, the sketch's own input.
    val values = graft.Tables(spark, sf).events
      .select(col("event_type"), graft.util.Det.toUnits(col("value"), 100).as("vu"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    approx.foreach { case (g, (n, p25, p50, p75)) =>
      val vs = values(g)
      assert(n == vs.length, s"group $g: row counts must be exact")
      Seq((0.25, p25), (0.50, p50), (0.75, p75)).foreach { case (q, ap) =>
        val apUnits = math.round(ap * 100)
        val ltFrac = vs.count(_ < apUnits).toDouble / n
        val leFrac = vs.count(_ <= apUnits).toDouble / n
        assert(ltFrac - 0.01 <= q && q <= leFrac + 0.01,
          s"group $g q=$q: estimate $ap has rank band [$ltFrac, $leFrac]")
      }
    }
  }
}
