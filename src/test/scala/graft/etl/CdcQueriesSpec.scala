package graft.etl

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** CDC changelog collapse: the snapshot must reflect exactly the planted
  * insert/update/delete history, and the batch accounting must reconcile
  * with it. */
class CdcQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("cdc_apply: deletes drop, updates win, untouched rows insert-through") {
    val t = Tables(spark, sf)
    val orders = t.orders
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .collect()
      .map(r => r.getLong(0) ->
        (math.floor(r.getDouble(1) * 100.0 + 0.5).toLong, r.getString(2)))
      .toMap
    val snap = SparkEntry.queries("cdc_apply")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toMap
    val deleted = orders.keySet.filter(_ % 13 == 0)
    val updated = orders.keySet.filter(k => k % 7 == 0 && k % 13 != 0)
    assert(snap.keySet == orders.keySet -- deleted,
      "snapshot = inserts minus deletes")
    updated.foreach { k =>
      val (cents, status, seq, op) = snap(k)
      assert(cents == orders(k)._1 + 500 && status == "U" &&
        seq == 2L && op == "U", s"update not applied for $k")
    }
    (snap.keySet -- updated).foreach { k =>
      val (cents, status, seq, op) = snap(k)
      assert(cents == orders(k)._1 && status == orders(k)._2 &&
        seq == 1L && op == "I", s"insert mutated for $k")
    }
  }

  test("cdc_scd2: version chains are contiguous and current matches apply") {
    val hist = SparkEntry.queries("cdc_scd2")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3), r.getString(4), r.getInt(5)))
    // per key: versions ordered by valid_from chain [from, to) without
    // gaps; exactly the non-delete ops
    hist.groupBy(_._1).foreach { case (pk, vs) =>
      val sorted = vs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2), s"gap in version chain for $pk")
        case _ => ()
      }
      assert(sorted.init.forall(_._6 == 0))
    }
    val current = hist.filter(v => v._6 == 1 && v._3.isEmpty)
      .map(v => v._1 -> (v._4, v._5)).toMap
    val snap = SparkEntry.queries("cdc_apply")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every snapshot row is a current SCD2 version with the same values;
    // current versions NOT in the snapshot are exactly the deleted keys
    // (their last non-delete version has valid_to = the delete's seq,
    // so they are non-current) — so the maps must be equal.
    assert(current == snap,
      "current SCD2 versions must equal the applied snapshot")
  }

  test("cdc_apply_idempotent equals cdc_apply despite duplicate delivery") {
    val clean = SparkEntry.queries("cdc_apply")(spark, sf).collect()
      .map(_.toSeq)
    val dedup = SparkEntry.queries("cdc_apply_idempotent")(spark, sf)
      .collect().map(_.toSeq)
    assert(clean.toSeq == dedup.toSeq,
      "at-least-once delivery must collapse to the exactly-once snapshot")
  }

  test("cdc_batch_stats reconciles with the applied snapshot") {
    val stats = SparkEntry.queries("cdc_batch_stats")(spark, sf)
      .orderBy("seq").collect()
    assert(stats.length == 3)
    val nOrders = Tables(spark, sf).orders.count()
    assert(stats(0).getLong(1) == nOrders && stats(0).getLong(5) == nOrders,
      "batch 1 inserts everything")
    assert(stats(1).getLong(2) > 0 && stats(1).getLong(5) == nOrders,
      "updates are live-count-neutral")
    val finalLive = stats(2).getLong(5)
    assert(finalLive ==
      SparkEntry.queries("cdc_apply")(spark, sf).count(),
      "final live count equals the snapshot size")
  }

  test("cdc_view_distinct: the count-map path equals a from-scratch " +
      "recompute, and the batch forces a multiplicity to ZERO on a " +
      "surviving customer") {
    val orders = Tables(spark, sf).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    // Plain-Scala mirror of the applied table's distinct-bucket view.
    val applied =
      orders.filter(_._1 % 13 != 0).map { case (k, c, p) =>
        (c, (if (k % 7 == 0) p + 500 else p) / 100000)
      } ++
        orders.filter(_._1 % 11 == 0).map { case (_, c, p) =>
          (c, (p + 777) / 100000)
        }
    val want = applied.groupBy(_._1).map { case (c, rows) =>
      c -> ((rows.map(_._2).distinct.length.toLong, rows.length.toLong))
    }
    val got = SparkEntry.queries("cdc_view_distinct")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want, "map-maintained view drifted from recompute")
    // The decrement case an insert-only "values seen" view gets wrong:
    // some surviving customer must have a (customer, band) multiplicity
    // driven to exactly zero by a delete — its distinct count DROPS.
    val baseMap = orders.groupBy(o => (o._2, o._3 / 100000))
      .map { case (k, rows) => k -> rows.length.toLong }
    val deltaMap = applied.groupBy(identity)
      .map { case (k, rows) => k -> rows.length.toLong }
    val appliedBands = applied.groupBy(_._1)
      .map { case (c, rows) => c -> rows.map(_._2).toSet }
    val zeroed = baseMap.keys.filter { case (c, b) =>
      deltaMap.getOrElse((c, b), 0L) == 0L && got.contains(c) &&
        // strict loser: the customer minted no new bands, so the view's
        // distinct count must be strictly below the base view's
        appliedBands(c).subsetOf(
          orders.filter(_._2 == c).map(_._3 / 100000).toSet)
    }
    assert(zeroed.nonEmpty,
      "the planted batch must exercise the multiplicity-to-zero case")
    zeroed.take(3).foreach { case (c, _) =>
      assert(got(c)._1 <
        orders.filter(_._2 == c).map(_._3 / 100000).distinct.length,
        s"customer $c lost a band, so its distinct count must drop")
    }
  }

  test("cdc_view_distinct_hll: the mergeable sketch form tracks the " +
      "exact insert-only distinct (sparse-regime exactness) and the " +
      "two-partial merge equals the one-shot sketch") {
    val got = SparkEntry.queries("cdc_view_distinct_hll")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // Exact insert-only reference: the base stream plus the % 11
    // insert delta, per-customer COUNT(DISTINCT band) and row count.
    val o = Tables(spark, sf).orders
    val cents = graft.util.Det.toUnits(col("o_totalprice"), 100L)
      .cast("long")
    val applied = o
      .select(col("o_custkey"), (cents.divide(100000L)).cast("long")
        .as("bkt"))
      .unionByName(o.filter(col("o_orderkey") % 11 === 0)
        .select(col("o_custkey"),
          ((cents + 777L).divide(100000L)).cast("long").as("bkt")))
    val exact = applied.groupBy(col("o_custkey"))
      .agg(countDistinct(col("bkt")).as("nd"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (k, (nd, n)) =>
      val (est, rows) = got(k)
      assert(rows == n, s"customer $k row bill $rows != exact $n")
      // Driver cardinalities sit in the DataSketches sparse regime,
      // where the estimate is exact; the 2% bound is the declared
      // contract for larger domains.
      val slack = math.max(1L, math.ceil(nd * 0.02).toLong)
      assert(math.abs(est - nd) <= slack,
        s"customer $k estimate $est outside $nd +- $slack")
    }
    // Associativity: the two-partial union-merge must estimate exactly
    // what a single-pass sketch over the applied stream estimates --
    // the monoid property that makes per-epoch partials foldable.
    val oneShot = applied.groupBy(col("o_custkey"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("bkt")))
        .as("n_distinct_est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (k, (est, _)) =>
      assert(est == oneShot(k),
        s"customer $k merged estimate $est != one-shot ${oneShot(k)}")
    }
  }
}
