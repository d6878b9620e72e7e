package graft.ops

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Training-data plumbing queries: the point-in-time join must never
  * leak a future dimension version into a fact (the feature-leakage
  * property), triplets must respect their label contract, and the
  * curriculum order must be a tier-contiguous permutation. */
class TrainingJoinsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("join_point_in_time: version valid at the fact date, never after") {
    val rows = SparkEntry.queries("join_point_in_time")(spark, sf).collect()
    val bal0 = Tables(spark, sf).customer.collect()
      .map(r => r.getLong(0) ->
        math.floor(r.getDouble(3) * 100.0 + 0.5).toLong).toMap
    assert(rows.length.toLong == Tables(spark, sf).orders.count(),
      "every fact joins exactly one version (v0 predates all facts)")
    rows.foreach { r =>
      val (custkey, date, version, bal) =
        (r.getLong(1), r.getString(2), r.getInt(3), r.getLong(4))
      val expected =
        if (date < "1997-01-01") 0 else if (date < "1999-01-01") 1 else 2
      assert(version == expected,
        s"order at $date got version $version, leak or stale: $r")
      assert(bal == bal0(custkey) + version * 100L)
    }
  }

  test("plan pins: the single-shuffle claims hold in the physical plan") {
    def hashExchanges(name: String): Int =
      "Exchange hashpartitioning".r.findAllIn(
        SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString).length
    assert(hashExchanges("join_point_in_time") == 1,
      "PIT join is ONE window shuffle on the entity key")
    assert(hashExchanges("cdc_apply") == 1,
      "changelog collapse is ONE shuffle on pk")
    assert(hashExchanges("cdc_apply_idempotent") == 1,
      "idempotent apply must NOT add a second dedup shuffle " +
        "(the 10x-stress regression this pin guards)")
    assert(hashExchanges("cdc_scd2") == 1,
      "SCD2 history rides the same pk shuffle")
  }

  test("contrastive_triplets: label contract and per-anchor uniqueness") {
    val t = Tables(spark, sf)
    val labels = t.embeddings.collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rows = SparkEntry.queries("contrastive_triplets")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "fixture must mine at least one triplet")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "one triplet per anchor")
    rows.foreach { r =>
      val (a, p, ps, n, ns, m) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(labels(p) == labels(a), "positive must share the anchor label")
      assert(labels(n) != labels(a), "negative must differ in label")
      assert(m == ps - ns, "margin is the exact sim difference")
      assert(p != a && n != a)
    }
  }

  test("curriculum_order: tier-contiguous permutation, hash-shuffled within") {
    val rows = SparkEntry.queries("curriculum_order")(spark, sf)
      .orderBy("global_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4)))
    val n = rows.length
    assert(rows.map(_._4).toSeq == (1L to n).toSeq,
      "global_pos is a 1..n permutation")
    // tiers are contiguous ranges of the global order, in tier order
    val tierSeq = rows.map(_._2).toSeq
    assert(tierSeq == tierSeq.sorted, "all of tier t precedes tier t+1")
    // quartile tiers: no tier exceeds half the corpus (ties can skew
    // the exact quarter, a degenerate-constant corpus would collapse
    // tiers entirely — this fixture doesn't)
    val sizes = rows.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.forall(_ <= n / 2 + 1), s"tier sizes: $sizes")
    // within a tier, order follows md5(doc_id)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_._3).map(_._1).toSeq
      val byHash = rs.map(_._1).sortBy(id =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, id)).toSeq
      assert(byPos == byHash, "within-tier order must be the md5 shuffle")
    }
  }
}
