package graft.er

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Entity resolution over the planted dirty twin: the two-pass
  * blocking must never split a true pair (each pass covers the other's
  * damage blind spot), the verifier must recall every twin, clusters
  * must cover every record exactly once, and the quality audit must
  * reconcile with the labeled matches. */
class ErQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("er_matches: every planted twin pair is recalled, labeled true — " +
      "including the suffix-damaged twins only pass 2 can block") {
    val matches = SparkEntry.queries("er_matches")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    val nCust = Tables(spark, sf).customer.count()
    val truePairs = matches.filter(m => m._5 == 1)
    // same-entity matches are exactly the (2k, 2k+1) twins
    truePairs.foreach { case (a, b, _, _, _) =>
      assert(b == a + 1 && a % 2 == 0, s"unexpected true pair ($a, $b)")
    }
    assert(truePairs.length.toLong == nCust,
      "recall must be 1.0: each damage pattern leaves one block key " +
        "intact, and the passes union")
    // both damage families are present and caught
    val (suffixDamaged, digitDamaged) =
      truePairs.partition { case (a, _, _, _, _) => (a / 2) % 7 == 0 }
    assert(suffixDamaged.nonEmpty && digitDamaged.nonEmpty)
    // a digit-damaged twin's balance is off by one cent, so ONLY the
    // name-suffix pass can catch it
    digitDamaged.foreach { m =>
      assert(m._4 == 1L, s"digit-damaged twin caught by both passes? $m")
    }
    // a suffix-damaged twin keeps its balance but always breaks the
    // suffix key (the 'x' marker never equals a digit), so it is a
    // pass-2-only catch
    suffixDamaged.foreach { m =>
      assert(m._4 == 1L, s"suffix-damaged twin caught by both passes? $m")
    }
    matches.foreach(m => assert(m._3 <= 2 && m._3 >= 1))
  }

  test("er_candidates histogram: per-pass pair volume is sum of b(b-1)/2, " +
      "never n^2") {
    val hist = SparkEntry.queries("er_candidates")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nRecords = 2 * Tables(spark, sf).customer.count()
    assert(hist.map(_._1).distinct.sorted.toSeq == Seq(1, 2))
    Seq(1, 2).foreach { pass =>
      val p = hist.filter(_._1 == pass)
      val nFromBlocks = p.map(r => r._2 * r._3).sum
      assert(nFromBlocks == nRecords,
        s"every record is in exactly one pass-$pass block")
      p.foreach(r => assert(r._4 == r._3 * (r._2 * (r._2 - 1) / 2)))
      val nPairs = p.map(_._4).sum
      assert(nPairs < nRecords * nRecords / 4,
        s"pass-$pass blocking must beat the quadratic corpus pairing")
    }
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
      // batch ids live in the negative domain — disjoint from the
      // non-negative standing rec_ids at ANY corpus size
      assert(newId < 0)
      val custkey = -newId - 1
      // best match is the entity's own clean twin (lev 1) or, when the
      // late deletion coincides with the standing dirty twin's, that
      // twin at lev 0 — never a cross-entity record at this sf (blocks
      // are single-entity at sf0.001)
      assert(rec / 2 == custkey && same == 1, s"cross-entity route: $r")
      assert(lev <= 1, s"unexpected match quality: $r")
      // suffix-damaged dirty twins (custkey % 7 == 0) always leave the
      // probe block (their suffix carries the 'x' marker), so the
      // guaranteed fan-in there is just the clean record
      if (custkey % 7 == 0) assert(nCand >= 1, s"empty probe block: $r")
      else assert(nCand >= 2, s"unexpected fan-in: $r")
    }
  }

  test("er_incremental_scaled: fixed-k parity where the widths agree; " +
      "at the widened SF it keeps recall and strictly cuts fan-in") {
    // sf0.001: n = 150 → k clamps to 3, so the scaled plan IS the
    // fixed plan — exact parity, the cheap end of the spec bound.
    val small = SparkEntry.queries("er_incremental_scaled")(spark, sf)
      .collect().map(_.toSeq)
    val smallFixed = SparkEntry.queries("er_incremental")(spark, sf)
      .collect().map(_.toSeq)
    assert(small.toSeq == smallFixed.toSeq,
      "at SFs where k resolves to 3 the scaled form must equal the " +
        "declared fixed-k probe exactly")
    // sf0.01: n = 1500 → k = ⌈log10(187.5)⌉ = 3 still; sf0.1:
    // n = 15000 → k = 4, the first widened decade. The scaled probe
    // must keep the fixture's routing recall (every late record
    // attaches to its own entity) while paying strictly less block
    // fan-in than the fixed key — the er_key_select tradeoff, measured.
    val sfBig = "/root/testdata/sf0.1"
    val big = SparkEntry.queries("er_incremental_scaled")(spark, sfBig)
      .collect()
    val evens = Tables(spark, sfBig).customer
      .filter(col("c_custkey") % 2 === 0).count()
    assert(big.length.toLong == evens,
      "widening the key must not lose a planted late record")
    // Cross-entity lev ties exist at this SF (names one digit apart
    // alias under a single deletion), so routing accuracy is measured
    // against the FIXED probe, not asserted perfect: the wider key
    // must never route WORSE (measured r14: 0.895 scaled vs 0.817
    // fixed — the narrow block admits more impostor ties) …
    val fixedBig = SparkEntry.queries("er_incremental")(spark, sfBig)
      .collect()
    def rate(rs: Array[org.apache.spark.sql.Row]): Double =
      rs.count(_.getInt(4) == 1).toDouble / rs.length
    assert(rate(big) >= rate(fixedBig),
      s"scaled routing rate ${rate(big)} fell below fixed ${rate(fixedBig)}")
    assert(rate(big) >= 0.85, s"routing rate collapsed: ${rate(big)}")
    // … and must strictly cut the probe fan-in (the O(batch·n) term
    // the fixed key pays on its fixed 10³ block space; measured r14:
    // max 4 scaled vs 28 fixed at sf0.1).
    val maxCand = big.map(_.getLong(3)).max
    val maxCandFixed = fixedBig.map(_.getLong(3)).max
    assert(maxCand < maxCandFixed,
      s"the widened key must cut the probe fan-in: scaled max $maxCand " +
        s"vs fixed max $maxCandFixed")
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

  test("er_threshold_select: cumulative sweep, narrowest full-recall " +
      "threshold selected, monotone counts") {
    val rows = SparkEntry.queries("er_threshold_select")(spark, sf)
      .orderBy("lev_max").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(6), r.getInt(7)))
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    // cumulative: matches and true positives never decrease with L
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted)
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted)
    val nCust = Tables(spark, sf).customer.count()
    rows.foreach { case (_, _, tp, _, q, _) =>
      assert((q == 1) == (tp == nCust)) }
    // exactly one selection: the narrowest full-recall threshold —
    // lev 1 here (every planted twin is one edit away), exposing the
    // family's pinned <= 2 as priced robustness margin
    assert(rows.count(_._6 == 1) == 1)
    val sel = rows.find(_._6 == 1).get
    assert(sel._1 == 1 && sel._5 == 1)
    assert(rows.filter(_._1 < sel._1).forall(_._5 == 0))
  }

  test("er_quality reconciles with the labeled match list") {
    val q = SparkEntry.queries("er_quality")(spark, sf).collect().head
    val matches = SparkEntry.queries("er_matches")(spark, sf).collect()
    val tp = matches.count(_.getInt(4) == 1).toLong
    assert(q.getLong(0) == matches.length.toLong)
    assert(q.getLong(1) == tp)
    assert(q.getLong(2) == matches.length - tp)
    assert(q.getDouble(4) == tp.toDouble / matches.length.toDouble)
    assert(q.getDouble(5) == 1.0, "planted recall is 1.0 by construction")
  }

  test("over-cap block: capped pairing matches a plain-Scala reference " +
      "of the clique-head + star-edge contract exactly") {
    // No driver SF pushes an ER block past the cap (suffix blocks peak
    // ~30 at sf0.1), so the star-edge path gets its own corpus — 120
    // customers all ≡ 7 (mod 1000): one 222-record suffix block, the
    // mm_image_dedup over-cap discipline (oracle parity for the same
    // corpus runs via tools/check_oracle on /tmp/sfer, see the verify
    // skill).
    val dir = tmpDir("er-overcap")
    import spark.implicits._
    (0 until 120).map { i =>
      val k = 7L + 1000L * i
      (k, f"Customer#$k%09d", i % 25, math.round((1.0 + i * 1.37) * 100) / 100.0, "BUILDING")
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    val t = Tables(spark, dir)
    val got = ErQueries.matchesOf(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))
      .toSet
    // Plain-Scala mirror: records -> two-pass blocks -> rank by rec_id
    // -> clique head (rk <= cap) + star edges (head rec, tail rec) ->
    // lev <= 2 -> per-pair pass count.
    val recs = (0 until 120).flatMap { i =>
      val k = 7L + 1000L * i
      val name = f"Customer#$k%09d"
      val bal = math.round((math.round((1.0 + i * 1.37) * 100) / 100.0) * 100.0)
      val dirty =
        if (k % 7 == 0)
          name.substring(0, 16) + "abcdefghij"(((k / 10) % 10).toInt) +
            name.substring(17)
        else name.substring(0, (9 + k % 5).toInt) +
          name.substring((10 + k % 5).toInt)
      val dirtyBal = if (k % 7 == 0) bal else bal + 1
      Seq((2 * k, name, bal), (2 * k + 1, dirty, dirtyBal))
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cap = ErQueries.ErBlockCap
    val cand = (1 to 2).flatMap { pass =>
      recs.groupBy { case (_, name, bal) =>
        if (pass == 1) name.takeRight(3) else s"B$bal"
      }.values.filter(_.size > 1).flatMap { block =>
        val sorted = block.sortBy(_._1)
        val head = sorted.take(cap)
        val pairs = for {
          (a, i) <- head.zipWithIndex; b <- head.drop(i + 1)
        } yield (a, b)
        val stars = sorted.drop(cap).map(t => (sorted.head, t))
        pairs ++ stars
      }
    }
    val want = cand
      .filter { case (a, b) => lev(a._2, b._2) <= 2 }
      .groupBy { case (a, b) => (a._1, b._1) }
      .map { case ((ra, rb), occ) =>
        (ra, rb, lev(occ.head._1._2, occ.head._2._2).toLong, occ.size.toLong)
      }.toSet
    assert(got == want,
      s"capped pairing diverges from the reference on the over-cap block " +
        s"(got ${got.size}, want ${want.size})")
    assert(recs.groupBy(_._2.takeRight(3)).values.map(_.size).max > cap,
      "the fixture must actually exceed the cap")
  }

  test("matchesOf pairing is bucket-capped: pair count per (pass, block) " +
      "never exceeds the cap's clique + star bound") {
    // the cap machinery can't trigger at sf0.001 (blocks of ~2), so
    // pin the BOUND it guarantees instead: candidates per bucket are
    // at most C(cap,2) + (m - cap) star edges for a bucket of size m
    val t = Tables(spark, sf)
    val cap = ErQueries.ErBlockCap
    val blockSizes = ErQueries.blockPassesOf(t)
      .groupBy(col("pass"), col("blk")).count().collect()
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    val boundTotal = blockSizes.values.map { m =>
      val head = math.min(m, cap.toLong)
      head * (head - 1) / 2 + math.max(0L, m - cap)
    }.sum
    val nMatches = ErQueries.matchesOf(t).count()
    assert(nMatches <= boundTotal,
      "verified matches exceed the capped candidate bound")
  }
}
