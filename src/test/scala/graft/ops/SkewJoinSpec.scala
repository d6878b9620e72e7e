package graft.ops

import graft.{SparkEntry, SparkSpec}

/** The planted power-law join pair: AQE's runtime skew split and the
  * explicit salting path must agree on values, and each must actually
  * engage its skew machinery — the 100×-scale insurance the salting
  * module claims, proved on a declared query instead of a synthetic
  * fixture. */
class SkewJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("the planted key is genuinely power-law (hot key holds ~70% of rows)") {
    import org.apache.spark.sql.functions._
    val keyed = graft.Tables(spark, sf).lineitem
      .select(when(pmod(col("l_orderkey"), lit(10)) < 7, lit(1L))
        .otherwise(col("l_suppkey")).as("k"))
    val total = keyed.count()
    val hot = keyed.filter(col("k") === 1L).count()
    assert(hot.toDouble / total > 0.6 && hot.toDouble / total < 0.8,
      s"fixture drifted: hot key holds $hot of $total rows")
  }

  test("AQE and salted paths return identical values on the skewed key") {
    val aqe = SparkEntry.queries("join_skew_aqe")(spark, sf)
      .collect().map(_.toString).toSeq
    val salted = SparkEntry.queries("join_skew_salted")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(aqe == salted, "the pair must be value-equivalent")
    assert(aqe.nonEmpty)
  }

  test("forced thresholds: AQE rewrites the skewed join with skew=true") {
    import org.apache.spark.sql.functions._
    // Locally the hot partition is far under the default 256 MB
    // threshold; force the knobs the way a 100 TB hot key would trip
    // them on its own. Broadcast is disabled so the join stays a
    // shuffled SMJ — the shape OptimizeSkewedJoin rewrites. One more
    // fixture artifact to undo: AQE splits a skewed partition on
    // MAP-TASK boundaries, and the single-row-group test parquet
    // feeds the whole hot partition from ONE mapper (unsplittable by
    // construction) — so the fact side is repartitioned first, giving
    // the scan the multi-mapper shape any real cluster scan has. The
    // declared query itself is shape-identical minus that exchange.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      // Coalescing would merge the split partitions back below the
      // advisory size and can mask the rewrite on tiny inputs.
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val was = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val t = graft.Tables(spark, sf)
      val df = t.lineitem
        .repartition(8)
        .select(when(pmod(col("l_orderkey"), lit(10)) < 7, lit(1L))
          .otherwise(col("l_suppkey")).as("skew_key"),
          col("l_extendedprice"))
        .join(t.supplier, col("skew_key") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"))
      df.collect() // AQE rewrites at runtime; plan is final only after
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot partition:\n$plan")
    } finally was.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted plan spreads the hot key: join clusters on (key, salt)") {
    val df = SparkEntry.queries("join_skew_salted")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // The physical join condition must include the salt column — that
    // is the spread: the hot key's rows hash to `salts` distinct
    // reducer keys instead of one.
    assert(plan.contains("__salt"),
      s"salt column missing from the physical plan:\n$plan")
  }
}
