package graft.dedup

import graft.{SparkSpec, SparkEntry}

/** Behavioral tests for the dedup family on planted data: exact dup and
  * a near-dup (one token changed) must be caught; an unrelated doc must
  * not pair with anything. Runs the *declared* queries against a
  * temp dir shaped like the driver tables. */
class DedupSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val base = ("spark catalyst shuffles partition data across executors " +
      "for wide joins and aggregations at scale ") * 8
    val near = base.replaceFirst("catalyst", "tungsten") // 1 token → ≤3 shingles change
    val other = "completely different words about cooking pasta with " +
      "tomatoes basil garlic olive oil and fresh bread " * 3
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),   // exact dup of 0
      (2L, near, "en", "src2", near.length.toLong),   // near dup of 0
      (3L, other, "en", "src3", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = tmpDir("dedup-docs")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("dedup_exact keeps one survivor per text, lowest doc_id") {
    val rows = SparkEntry.queries("dedup_exact")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(0L, 2L, 3L)) // doc 1 collapsed into doc 0
  }

  test("minhash LSH pairs exact and near dups, not unrelated docs") {
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup must collide in every band")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      "near dup should share at least one band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not pair")
  }

  test("simhash: identical docs agree; unrelated docs differ") {
    val sh = SparkEntry.queries("dedup_simhash")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    assert(sh(0L) != sh(3L))
  }

  test("ngram jaccard: exact dup scores 1.0, near dup close, ordered ahead of others") {
    val j = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(j((0L, 1L)) == 1.0)
    j.get((0L, 2L)).foreach(v => assert(v > 0.7 && v < 1.0))
  }

  test("dedup_components: dup cluster maps to one representative, loners absent") {
    val comp = SparkEntry.queries("dedup_components")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 0,1 (exact dups) are one component with min-id representative 0;
    // the near-dup 2 joins it iff LSH paired it (either way, consistent).
    assert(comp(0L) == 0L && comp(1L) == 0L)
    comp.get(2L).foreach(c => assert(c == 0L))
    assert(!comp.contains(3L), "unpaired docs have no component row")
  }

  test("incremental components: a bridging new doc merges two standing components") {
    import spark.implicits._
    // Corpus (ids not ≡ 0 mod 20): cluster A = {1, 2} on `base`,
    // cluster B = {3, 4} on `far` (4 tokens away from base — too far to
    // band-collide), plus unrelated 5. New batch (ids ≡ 0 mod 20):
    // doc 20 carries `bridge`, 2 tokens from EACH side — it must pair
    // with both clusters and the contracted super-graph propagation
    // must merge A and B into one component labeled min(1).
    val base = ("spark catalyst shuffles partition data across executors " +
      "for wide joins and aggregations at scale ") * 8
    val far = base
      .replaceFirst("catalyst", "tungsten").replaceFirst("partition", "divide")
      .replaceFirst("executors", "workers").replaceFirst("aggregations", "rollups")
    val bridge = base
      .replaceFirst("catalyst", "tungsten").replaceFirst("partition", "divide")
    val other = "completely different words about cooking pasta with " +
      "tomatoes basil garlic olive oil and fresh bread " * 3
    val docs = Seq(
      (1L, base), (2L, base), (3L, far), (4L, far), (5L, other),
      (20L, bridge))
      .map { case (id, tx) => (id, tx, "en", s"src$id", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = tmpDir("dedup-incr-merge")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")

    // Precondition — the planted distances really produce the intended
    // standing topology: A and B are separate components before the
    // new batch arrives (pairs within clusters, none across).
    val standingPairs = SparkEntry.queries("dedup_minhash_lsh")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(standingPairs.contains((1L, 2L)) && standingPairs.contains((3L, 4L)))
    assert(!standingPairs.exists(p => Set(1L, 2L).contains(p._1) &&
      Set(3L, 4L).contains(p._2)),
      s"base and far must not pair directly, got $standingPairs")

    val incr = SparkEntry.queries("dedup_incremental")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set(1L, 2L).exists(c => incr.contains((20L, c))) &&
      Set(3L, 4L).exists(c => incr.contains((20L, c))),
      s"bridge doc must match both clusters, got $incr")

    val out = SparkEntry.queries("dedup_incremental_components")(spark, d)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap
    // Everything the bridge touches collapses to one component, min id 1.
    Seq(1L, 2L, 3L, 4L).foreach(id => assert(out(id) == (1L, 0), s"doc $id: ${out(id)}"))
    assert(out(20L) == (1L, 1))
    assert(!out.contains(5L), "unpaired corpus doc has no row")
  }

  test("degenerate LSH bucket: pair count bounded linear, cluster stays connected") {
    import spark.implicits._
    // 2000 byte-identical docs — every band hashes them into ONE bucket.
    // Unbounded all-pairs would emit ~2.0M pairs; the rank cap must keep
    // it to T*(T-1)/2 all-pairs + (m-T) star edges.
    val m = 2000
    val text = "all these documents carry exactly the same tokens " * 4
    val docs = (0 until m).map(i =>
      (i.toLong, text, "en", s"s$i", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = tmpDir("dedup-degenerate")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")

    val t = DedupQueries.MaxBucketPairDocs
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == t * (t - 1) / 2 + (m - t),
      s"expected bounded pair count, got ${pairs.length}")
    // Connectivity: every doc appears in some pair, and each pair chains
    // (directly or transitively through head all-pairs) to doc 0 — the
    // property survivor selection by connected components needs.
    val covered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(covered == (0L until m.toLong).toSet)
    assert(pairs.count(_._1 == 0L) == (m - t) + (t - 1),
      "tail docs connect by star edges to the bucket minimum (doc 0)")
  }

  test("graph_triangles: degrees sum to 2|E|, triangle mass divisible by 3") {
    val sf = "/root/testdata/sf0.001"
    val stats = SparkEntry.queries("graph_triangles")(spark, sf).collect()
    assert(stats.nonEmpty)
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
    // The node universe is exactly the candidate graph's endpoints, and
    // every undirected edge contributes 2 to the degree total.
    assert(stats.map(_.getAs[Long]("degree")).sum == 2L * pairs.length)
    assert(stats.map(_.getAs[Long]("doc_id")).toSet ==
      pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet)
    // Each triangle is counted once per corner.
    val triMass = stats.map(_.getAs[Long]("triangles")).sum
    assert(triMass % 3 == 0, s"triangle corner mass $triMass not /3")
    // A planted triangle is found: 3 identical docs pair all-ways.
    import spark.implicits._
    val text = "three identical documents make one candidate triangle " * 6
    val docs = Seq(0L, 1L, 2L).map(i =>
      (i, text, "en", s"s$i", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = tmpDir("tri-docs")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val planted = SparkEntry.queries("graph_triangles")(spark, d).collect()
    assert(planted.length == 3)
    planted.foreach { r =>
      assert(r.getAs[Long]("degree") == 2)
      assert(r.getAs[Long]("triangles") == 1)
    }
  }

  test("component stats histogram partitions the corpus exactly") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("dedup_component_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    // n_docs is internally consistent and the histogram sums to the corpus
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("size") * r.getAs[Long]("n_components"))
      assert(r.getAs[Long]("n_components") > 0)
    }
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // sizes ≥ 2 agree with the labels frame dedup_components emits
    val paired = SparkEntry.queries("dedup_components")(spark, sf).count()
    val fromHist = rows.filter(_.getAs[Long]("size") >= 2)
      .map(_.getAs[Long]("n_docs")).sum
    assert(fromHist == paired)
  }

  test("dedup_substring reports exact excision spans, cross- and within-doc") {
    import spark.implicits._
    // K = 8: a shared 12-token run, an internal 10-token repeat, and a
    // fully unique doc. Every other token is globally unique so no
    // window collides by accident.
    def uniq(tag: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$tag$i")
    val shared = (0 until 12).map(i => s"shared$i")
    val rep = (0 until 10).map(i => s"rep$i")
    val a = uniq("a", 10) ++ shared ++ uniq("z", 10)       // span 10..21
    val b = uniq("b", 7) ++ shared ++ uniq("y", 5)         // span 7..18
    val c = rep ++ uniq("c", 9) ++ rep                     // spans 0..9, 19..28
    val d0 = uniq("d", 30)                                 // no spans
    // Two sub-K docs: zero windows on both engines — the oracle's
    // phantom NULL-fingerprint window (filtered by its fp IS NOT NULL)
    // must not fabricate spans for them.
    val e0 = uniq("e", 5)
    val f0 = uniq("f", 5)
    val docs = Seq((0L, a), (1L, b), (2L, c), (3L, d0), (4L, e0), (5L, f0))
      .map { case (id, tk) =>
        val tx = tk.mkString(" "); (id, tx, "en", s"src$id", tx.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("substring-docs")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spans = SparkEntry.queries("dedup_substring")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toSeq
    assert(spans == Seq(
      0L -> ((10L, 21L, 12L)),
      1L -> ((7L, 18L, 12L)),
      2L -> ((0L, 9L, 10L)),
      2L -> ((19L, 28L, 10L))))
  }

  test("dedup_recall_eval: planted dups are ground truth and caught; unrelated doc absent") {
    val rows = SparkEntry.queries("dedup_recall_eval")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // With 4 docs, every doc is inside the 40-doc hash sample, so the
    // audit sees the full truth set in both orientations.
    assert(rows((0L, 1L)) == ((1000000L, 1L)),
      s"exact dup must score J=1.0 and be caught: $rows")
    assert(rows((1L, 0L))._2 == 1L)
    val (nearJ, nearCaught) = rows((0L, 2L))
    assert(nearJ > 500000L && nearJ < 1000000L,
      s"near dup must land between tau and 1.0: $nearJ")
    assert(nearCaught == 1L, "the 1-token-changed near dup is an LSH catch")
    assert(!rows.keys.exists { case (a, b) => a == 3L || b == 3L },
      s"unrelated doc must never enter the truth set: ${rows.keys}")
  }

  test("propagation loop leaves the shared session conf untouched while it runs") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val widthBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    // A 2000-node chain converges in ~9 pointer-jump batches (seconds
    // of wall time) — long enough for a concurrent thread to observe
    // the session conf DURING the loop. The pre-round-10 loop flipped
    // AQE off and narrowed the width on the SHARED conf for exactly
    // this window; the cloned-session loop must leave both alone, so
    // a query compiling on the session meanwhile keeps its plan.
    val chain = (0L until 2000L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // Force the DISTRIBUTED loop: a 2000-edge chain is far under the
    // driver union-find gate, and this test is about the loop's conf
    // isolation window specifically.
    spark.conf.set("graft.cc.driverMaxEdges", "0")
    @volatile var done = false
    val observed = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String, Boolean)]()
    val watcher = Future {
      var polls = 0
      while (!done) {
        // What a concurrent caller would see: the conf values AND the
        // plan shape of a freshly-compiled aggregate.
        val agg = spark.range(100).groupBy(($"id" % 10).as("k")).count()
        val adaptive = agg.queryExecution.executedPlan
          .isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]
        observed.add((spark.conf.get("spark.sql.shuffle.partitions"),
          spark.conf.get("spark.sql.adaptive.enabled", "true"), adaptive))
        polls += 1
        Thread.sleep(5)
      }
      polls
    }
    val labels =
      try DedupQueries.componentLabelsOf(chain)
      finally spark.conf.unset("graft.cc.driverMaxEdges")
    val rows = labels.collect()
    done = true
    val polls = Await.result(watcher, 60.seconds)
    assert(rows.length == 2001 && rows.map(_.getLong(1)).distinct.sameElements(Array(0L)),
      "chain must collapse to one component labeled by its min node")
    assert(polls >= 10, s"watcher must sample during the loop (got $polls polls)")
    import scala.jdk.CollectionConverters._
    assert(observed.asScala.toSet == Set((widthBefore, aqeBefore, true)),
      s"shared conf/plans must be stable during the loop, saw: ${observed.asScala}")
  }

  test("banding auto-tuner: exactly one selection, obeying the recall-floor rule") {
    val rows = graft.SparkEntry.queries("dedup_banding_select")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getAs[String]("scheme")).toSeq ==
      Seq("b2r6", "b3r4", "b4r3", "b6r2"))
    rows.foreach { r =>
      assert(r.getAs[Long]("bands") * r.getAs[Long]("rows_per_band") == 12L,
        "every scheme must factorize the shared K=12 signature")
      assert(r.getAs[Long]("n_true") <= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("recall_ppm") <= 1000000L)
    }
    val selected = rows.filter(_.getAs[Boolean]("selected"))
    assert(selected.length == 1, "exactly one scheme is the decision")
    // Replay the declared rule on the reported table.
    val target = graft.dedup.DedupQueries.BandTargetRecallPpm
    val eligible = rows.filter(_.getAs[Long]("recall_ppm") >= target)
    val expected =
      if (eligible.nonEmpty)
        eligible.minBy(r =>
          (r.getAs[Long]("n_candidates"), r.getAs[String]("scheme")))
      else rows.minBy(r =>
        (1000000L - r.getAs[Long]("recall_ppm"), r.getAs[String]("scheme")))
    assert(selected.head.getAs[String]("scheme")
      == expected.getAs[String]("scheme"))
  }

  test("driver union-find and distributed loop label identically (gate parity)") {
    import spark.implicits._
    // Chain (long diameter), clique (dense), disjoint pair, duplicate
    // edges, and both edge orientations — every shape that could make
    // the two engines disagree.
    val edges = ((0L until 50L).map(i => (i, i + 1)) ++ // chain 0..50
      (for (a <- 100L until 106L; b <- 100L until 106L if a < b)
        yield (a, b)) ++ // clique
      Seq((200L, 201L), (201L, 200L), (200L, 201L)) ++ // dup + mirror
      Seq((300L, 400L))).toDF("doc_a", "doc_b")
    def labelsOf(maxEdges: String): Map[Long, Long] = {
      spark.conf.set("graft.cc.driverMaxEdges", maxEdges)
      try DedupQueries.componentLabelsOf(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("graft.cc.driverMaxEdges")
    }
    val driver = labelsOf(Long.MaxValue.toString)
    val distributed = labelsOf("0")
    assert(driver == distributed,
      s"gate paths must agree:\ndriver=$driver\ndistributed=$distributed")
    assert(driver(50L) == 0L && driver(105L) == 100L &&
      driver(201L) == 200L && driver(400L) == 300L)
    assert(driver.size == 51 + 6 + 2 + 2)
  }

  test("amplified banding lifts mid-J recall and contains the standard candidates") {
    import spark.implicits._
    // 60 planted pairs at shingle Jaccard ≈ 0.5 — exactly the S-curve
    // cliff dedup_recall_eval measures (B=3/R=4: P(candidate) ≈ 17%;
    // B=6/R=2 over the same signatures: ≈ 82%). Vocabulary is disjoint
    // across pairs so nothing pairs across plants. Deterministic
    // hashes → the caught counts below are exact, not flaky.
    def words(tag: String, i: Int, n: Int): String =
      (0 until n).map(j => s"${tag}${i}x$j").mkString(" ")
    val docs = (0 until 60).flatMap { i =>
      val common = words("c", i, 30)
      Seq((i.toLong, s"$common ${words("a", i, 12)}"),
        (i + 1000L, s"$common ${words("b", i, 12)}"))
    }.toDF("doc_id", "text")
    val planted = (0 until 60).map(i => (i.toLong, i + 1000L)).toSet
    def caughtBy(bands: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      DedupQueries.candidatePairsOf(bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(planted)
    val std = caughtBy(DedupQueries.bandsOfDocs(docs))
    val amp = caughtBy(DedupQueries.bandsOfDocsBR(docs, DedupQueries.AmpB,
      DedupQueries.AmpR))
    info(s"J≈0.5 planted pairs caught: standard ${std.size}/60, amplified ${amp.size}/60")
    assert(std.subsetOf(amp), "amplified candidates must contain standard ones")
    assert(amp.size > 2 * std.size,
      s"amplified banding must lift mid-J recall (std ${std.size}, amp ${amp.size})")
    // And on the declared-surface corpus: multi ⊇ standard candidates.
    val stdQ = SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multiQ = SparkEntry.queries("dedup_minhash_lsh_multi")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stdQ.subsetOf(multiQ))
  }

  test("quality survivors keep the longest cluster member, not the min id") {
    import spark.implicits._
    // Cluster of {0: truncated copy, 5: full doc}: near-dups (0's
    // shingles are a 97% subset of 5's), where min-id selection keeps
    // the TRUNCATED doc and quality selection must keep the full one.
    val full = ("spark catalyst shuffles partition data across executors " +
      "for wide joins and aggregations at scale ") * 8 +
      "appendix citations footnotes acknowledgments references errata"
    val truncated = full.split(" ").dropRight(6).mkString(" ")
    val loner = "entirely unrelated cooking content about pasta " * 10
    val d = tmpDir("dedup-qsurv")
    Seq(
      (0L, truncated, "en", "s0", truncated.length.toLong),
      (5L, full, "en", "s5", full.length.toLong),
      (7L, loner, "en", "s7", loner.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // Precondition: the pair is actually a candidate cluster.
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 5L)), s"fixture must band-collide, got $pairs")
    val minId = SparkEntry.queries("dedup_survivors")(spark, d)
      .collect().map(_.getLong(0)).toSet
    val quality = SparkEntry.queries("dedup_survivors_quality")(spark, d)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("cluster_size"))).toMap
    assert(minId == Set(0L, 7L), "min-id keeps the truncated copy")
    assert(quality.keySet == Set(5L, 7L),
      "quality selection must keep the FULL document instead")
    assert(quality(5L) == 2L && quality(7L) == 1L)
  }

  test("survivor-family invariant: every selection partitions the corpus") {
    // Structural contract shared by min-id, quality and SemDeDup
    // survivors: (a) sizes sum to the corpus row count (survivors
    // REPRESENT the corpus, none dropped, none double-counted);
    // (b) exactly one survivor per near-dup component.
    val dir001 = "/root/testdata/sf0.001"
    val nDocs = graft.Tables(spark, dir001).documents.count()
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, dir001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val groups = pairs.flatMap(p => Seq(p._1, p._2)).distinct.groupBy(find)
    for (q <- Seq("dedup_survivors", "dedup_survivors_quality")) {
      val rows = SparkEntry.queries(q)(spark, dir001).collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("cluster_size"))
      assert(rows.map(_._2).sum == nDocs, s"$q: sizes must sum to the corpus")
      val survivorSet = rows.map(_._1).toSet
      groups.values.foreach { g =>
        assert(g.count(survivorSet.contains) == 1,
          s"$q: each component needs exactly one survivor, got $g")
      }
    }
    // Embedding side, same contract over its own pair graph.
    val nVecs = graft.Tables(spark, dir001).embeddings.count()
    val sizesSum = SparkEntry.queries("semdedup_survivors")(spark, dir001)
      .collect().map(_.getAs[Long]("cluster_size")).sum
    assert(sizesSum == nVecs, "semdedup_survivors: sizes must sum to the corpus")
  }

  test("dedup-aware splits: no candidate pair straddles splits; loners match split_assign") {
    val dir001 = "/root/testdata/sf0.001"
    val splits = SparkEntry.queries("split_assign_dedup")(spark, dir001)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, dir001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // The leakage the audit counts is structurally impossible now.
    assert(pairs.forall { case (a, b) => splits(a) == splits(b) },
      "every near-dup candidate pair must share a split")
    // Unpaired docs keep split_assign's content-independent fate.
    val plain = SparkEntry.queries("split_assign")(spark, dir001)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val loners = splits.keySet -- clustered
    assert(loners.nonEmpty && loners.forall(d => splits(d) == plain(d)))
    // And the rule genuinely MOVES some clustered doc (the point of
    // the operator — deterministic on this fixed corpus).
    assert(clustered.exists(d => splits(d) != plain(d)),
      "at least one clustered doc must be re-assigned to its rep's split")
  }

  test("dedup_containment: a contained doc scores 1.0 while its Jaccard stays low") {
    import spark.implicits._
    // docShort is a verbatim token PREFIX of docLong (~quote/subset
    // inclusion): every shingle of short appears in long, so
    // containment = 1.0, while Jaccard ≈ |short|/|long| — the
    // asymmetric case the symmetric verifier under-scores.
    val longToks = (0 until 120).map(i => s"w$i")
    val shortToks = longToks.take(104) // J ≈ 0.86 keeps LSH candidacy
    val docs = Seq(
      (0L, longToks.mkString(" "), "en", "srcA", 100L),
      (1L, shortToks.mkString(" "), "en", "srcB", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = tmpDir("containment-docs")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val cont = SparkEntry.queries("dedup_containment")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (nCommon, nA, nB, c) = cont((0L, 1L))
    assert(c == 1000000L, s"full containment must score 1.0: $c")
    assert(nCommon == nB && nB < nA,
      "the smaller side's shingles are all shared")
    val jac = SparkEntry.queries("dedup_ngram_jaccard")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(jac((0L, 1L)) < 0.9,
      s"Jaccard under-scores the subset pair: ${jac((0L, 1L))}")
  }

  test("dedup_prefix_join is lossless at tau: it contains every pair the " +
      "banded index finds and verifies, and typically more") {
    val sf = "/root/testdata/sf0.001"
    val exact = graft.SparkEntry.queries("dedup_prefix_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // every LSH-candidate pair that verifies at the same tau must be in
    // the exact join's output (the lossless ⊇ relation; the DuckDB
    // oracle separately pins equality with the NAIVE complete join)
    val viaLsh = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .collect()
      .filter(_.getDouble(4) >= 0.5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLsh.subsetOf(exact),
      s"exact join missing LSH-verified pairs: ${viaLsh.diff(exact)}")
    assert(exact.size >= viaLsh.size,
      "the exact join can never find fewer pairs than the banded index")
  }

  test("dedup_policy_select: exact stays selected while affordable " +
      "(planted near-dup corpus); the reference row is exact by " +
      "construction") {
    val rows = SparkEntry.queries("dedup_policy_select")(spark, dir)
      .collect().map(r => r.getAs[String]("policy") -> r).toMap
    assert(rows.size == 2)
    val ex = rows("exact_prefix_join")
    assert(ex.getAs[Long]("recall_ppm") == 1000000L,
      "exact IS the reference: recall 1.0 by definition")
    assert(ex.getAs[Long]("selected") == 1L &&
      rows("banded_lsh").getAs[Long]("selected") == 0L,
      "tiny corpus: exact verify volume is affordable, exact wins")
    assert(ex.getAs[Long]("n_verify") <=
      rows("banded_lsh").getAs[Long]("n_verify") * DedupQueries.ExactAffordFactor)
  }

  test("dedup_policy_select: a prefix-collision-heavy corpus flips the " +
      "selection to banded once exact's verify volume crosses the " +
      "afford factor with banded recall intact") {
    import spark.implicits._
    // P×Q grid: doc(i, j) = X_i half + Y_j half. Same-i (and same-j)
    // docs share half their shingles — enough to collide in the
    // PPJoin prefix, not enough to be true τ=0.5 near-dups — so the
    // exact join's verify volume grows with P·C(Q,2) while the banded
    // S-curve drops J≈0.3 pairs. The 30 planted identical pairs are
    // the true duplicates BOTH policies must catch (banded recall
    // stays 100%, so the selector's switch is purely the cost term —
    // the same crossover the driver corpus shows organically between
    // sf0.01, exact selected at 27 vs 25 candidates, and sf0.1,
    // banded selected at 124979 vs 261).
    val grid = for (i <- 0 until 15; j <- 0 until 15) yield
      (0 until 20).map(k => s"x${i}w$k").mkString(" ") + " " +
        (0 until 20).map(k => s"y${j}v$k").mkString(" ")
    val dups = (0 until 30).flatMap { p =>
      val t = (0 until 25).map(k => s"d${p}u$k").mkString(" ")
      Seq(t, t)
    }
    val docs = (grid ++ dups).zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "src0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = tmpDir("dedup-policy-flip")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("dedup_policy_select")(spark, d)
      .collect().map(r => r.getAs[String]("policy") -> r).toMap
    val banded = rows("banded_lsh")
    assert(banded.getAs[Long]("selected") == 1L,
      s"banded must win the blow-up corpus: $rows")
    assert(banded.getAs[Long]("recall_ppm") >= DedupQueries.BandTargetRecallPpm,
      "the switch is only legal with recall intact")
    assert(rows("exact_prefix_join").getAs[Long]("n_verify") >
      banded.getAs[Long]("n_verify") * DedupQueries.ExactAffordFactor,
      "the flip must be driven by the measured verify-volume gap")
  }
}
