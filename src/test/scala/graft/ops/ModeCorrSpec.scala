package graft.ops

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** agg_mode and timeseries_returns_corr against independent
  * driver-side recomputations at fixture scale. */
class ModeCorrSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("agg_mode: deterministic mode matches a driver-side count") {
    val got = SparkEntry.queries("agg_mode")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val counts = Tables(spark, sf).orders
      .select("o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    counts.keys.map(_._1).toSeq.distinct.foreach { status =>
      val byPrio = counts.collect { case ((s, p), n) if s == status => (p, n) }
      val (modeP, modeN) = byPrio.toSeq.sortBy { case (p, n) => (-n, p) }.head
      val (gp, gn, gd) = got(status)
      assert(gp == modeP && gn == modeN && gd == byPrio.size.toLong,
        s"mode mismatch for $status")
    }
  }

  test("customer_pareto: deciles partition customers, shares sum to 1") {
    val rows = SparkEntry.queries("customer_pareto")(spark, sf)
      .orderBy("decile").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    val nCust = Tables(spark, sf).orders
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    val total = rows.map(_.getLong(2)).sum
    rows.foreach(r => assert(
      r.getDouble(3) == r.getLong(2).toDouble / total.toDouble))
    // ranked by spend desc: decile revenue is non-increasing
    val cents = rows.map(_.getLong(2)).toSeq
    assert(cents == cents.sorted.reverse, "Lorenz ordering")
  }

  test("timeseries_beta: equal-weight-index betas sum to exactly 1") {
    val rows = SparkEntry.queries("timeseries_beta")(spark, sf).collect()
    assert(rows.length == 5)
    val varDen = rows.map(_.getLong(3)).distinct
    assert(varDen.length == 1, "one shared index variance")
    // sum_i cov(r_i, r_m) = var(r_m) when the index is the sum of all
    // instruments over the same aligned days — exact in integers
    assert(rows.map(_.getLong(2)).sum == varDen.head,
      "covariance decomposition of the index variance must be exact")
    rows.foreach(r =>
      assert(r.getDouble(4) == r.getLong(2).toDouble / r.getLong(3).toDouble))
  }

  test("timeseries_returns_corr: Pearson from exact sufficient stats") {
    val rows = SparkEntry.queries("timeseries_returns_corr")(spark, sf)
      .collect()
    assert(rows.length == 10, "5 instruments -> 10 unordered pairs")
    // recompute one pair fully driver-side
    def closes(et: String): Map[Long, Long] = {
      val dayMicros = 86400L * 1000000L
      Tables(spark, sf).events.filter(col("event_type") === et)
        .select(expr("unix_micros(ts)"), col("event_id"), col("value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
        .groupBy(_._1 / dayMicros).view
        .mapValues(rs => rs.maxBy(t => (t._1, t._2))._3).toMap
    }
    def rets(c: Map[Long, Long]): Map[Long, Long] = {
      val days = c.keys.toSeq.sorted
      days.zip(days.tail).map { case (p, d) => d -> (c(d) - c(p)) }.toMap
    }
    val (ra, rb) = (rets(closes("click")), rets(closes("error")))
    val common = (ra.keySet & rb.keySet).toSeq.sorted
    val xs = common.map(ra); val ys = common.map(rb)
    val n = common.length.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val want = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble)
        * math.sqrt((n * syy - sy * sy).toDouble))
    val row = rows.find(r =>
      r.getString(0) == "click" && r.getString(1) == "error").get
    assert(row.getLong(2) == n)
    assert(row.getLong(3) == n * sxy - sx * sy)
    assert(row.getDouble(4) == want, "corr must be bit-identical")
    rows.foreach(r => assert(math.abs(r.getDouble(4)) <= 1.0))
  }
}
