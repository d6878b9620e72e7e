package graft.er

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Entity resolution over the planted dirty twin: blocking must never
  * split a true pair (deletion-stable key), the verifier must recall
  * every twin, clusters must cover every record exactly once, and the
  * quality audit must reconcile with the labeled matches. */
class ErQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("er_matches: every planted twin pair is recalled, labeled true") {
    val matches = SparkEntry.queries("er_matches")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val nCust = Tables(spark, sf).customer.count()
    val truePairs = matches.filter(m => m._4 == 1).map(m => (m._1, m._2))
    // same-entity matches are exactly the (2k, 2k+1) twins
    truePairs.foreach { case (a, b) =>
      assert(b == a + 1 && a % 2 == 0, s"unexpected true pair ($a, $b)")
    }
    assert(truePairs.length.toLong == nCust,
      "recall must be 1.0: the twin is one deletion away and the block " +
        "key is deletion-stable")
    matches.foreach(m => assert(m._3 <= 2 && m._3 >= 1))
  }

  test("er_candidates histogram: pair volume is sum of b(b-1)/2, never n^2") {
    val hist = SparkEntry.queries("er_candidates")(spark, sf).collect()
    val nRecords = 2 * Tables(spark, sf).customer.count()
    val nFromBlocks = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(nFromBlocks == nRecords, "every record is in exactly one block")
    val nPairs = hist.map(_.getLong(2)).sum
    hist.foreach { r =>
      assert(r.getLong(2) ==
        r.getLong(1) * (r.getLong(0) * (r.getLong(0) - 1) / 2))
    }
    assert(nPairs < nRecords * nRecords / 4,
      "blocking must beat the quadratic corpus pairing")
  }

  test("er_golden: clusters partition the records; survivor is the clean row") {
    val golden = SparkEntry.queries("er_golden")(spark, sf).collect()
    val nRecords = 2 * Tables(spark, sf).customer.count()
    assert(golden.map(_.getLong(1)).sum == nRecords,
      "cluster sizes sum to the record count (a partition)")
    assert(golden.map(_.getLong(0)).distinct.length == golden.length)
    golden.foreach { r =>
      assert(r.getLong(0) % 2 == 0,
        "cluster id = min rec_id, always a clean (even) record here")
      assert(r.getString(3).length == 18,
        "representative name is the undamaged 18-char clean variant")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
    }
  }

  test("er_incremental: every late record routes to its own entity's " +
      "standing record at this fixture") {
    val rows = SparkEntry.queries("er_incremental")(spark, sf).collect()
    val evens = Tables(spark, sf).customer
      .filter(col("c_custkey") % 2 === 0).count()
    assert(rows.length.toLong == evens,
      "every planted late record finds a standing match")
    rows.foreach { r =>
      val (newId, rec, lev, nCand, same) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getInt(4))
      val custkey = newId - 10000000L
      // best match is the entity's own clean twin (lev 1) or, when the
      // late deletion coincides with the standing dirty twin's, that
      // twin at lev 0 — never a cross-entity record at this sf (blocks
      // are single-entity at sf0.001)
      assert(rec / 2 == custkey && same == 1, s"cross-entity route: $r")
      assert(lev <= 1 && nCand >= 2, s"unexpected match quality: $r")
    }
  }

  test("er_key_select: narrowest key under the cap, consistent histograms") {
    val rows = SparkEntry.queries("er_key_select")(spark, sf)
      .orderBy("key_len").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5)))
    assert(rows.map(_._1).toSeq == Seq(2, 3, 4))
    val nRecords = 2 * Tables(spark, sf).customer.count()
    rows.foreach { case (_, nBlocks, maxB, _, q, _) =>
      assert(nBlocks <= nRecords && maxB >= 1)
      assert((q == 1) == (maxB <= 16))
    }
    // exactly one selection: the narrowest qualifying key
    assert(rows.count(_._6 == 1) == 1)
    val sel = rows.find(_._6 == 1).get
    assert(rows.filter(_._1 < sel._1).forall(_._5 == 0),
      "every narrower key must have failed the cap")
    // wider keys mean fewer (or equal) pairs — the monotone tradeoff
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted.reverse)
  }

  test("er_quality reconciles with the labeled match list") {
    val q = SparkEntry.queries("er_quality")(spark, sf).collect().head
    val matches = SparkEntry.queries("er_matches")(spark, sf).collect()
    val tp = matches.count(_.getInt(3) == 1).toLong
    assert(q.getLong(0) == matches.length.toLong)
    assert(q.getLong(1) == tp)
    assert(q.getLong(2) == matches.length - tp)
    assert(q.getDouble(4) == tp.toDouble / matches.length.toDouble)
    assert(q.getDouble(5) == 1.0, "planted recall is 1.0 by construction")
  }
}
