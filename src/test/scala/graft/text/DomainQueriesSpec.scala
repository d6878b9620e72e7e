package graft.text

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Behavioral invariants for the domain-curation family — the planted
  * hosting structure the DuckDB oracle (which replays the same twin)
  * cannot itself certify: that extraction recovers the TRUE planted
  * registrable domain on every hosted row (so the whole family
  * composes on the extracted key), that the public-suffix list is
  * honored, and that the three filter floors each fire on their own
  * planted tier and never on a clean primary domain. */
class DomainQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("domain_extract: recovers the planted registrable domain " +
      "verbatim on every hosted row; two-level suffixes split right") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf).documents
    val planted = DomainQueries.domainUrls(docs)
      .select(col("fetch_seq"), col("reg"))
    val got = SparkEntry.queries("domain_extract")(spark, sf)
    val joined = got.join(planted, "fetch_seq")
    assert(joined.filter(col("registrable_domain") =!= col("reg"))
      .count() == 0,
      "extraction must equal the planted registrable on every row")
    // Two-level suffix: a co.uk host keeps THREE labels registrable.
    val couk = got.filter(col("suffix") === "co.uk")
    assert(couk.count() > 0, "the twin plants co.uk domains")
    assert(couk.filter(!col("registrable_domain").rlike(
      "^site-\\d+\\.co\\.uk$")).count() == 0)
    // Subdomain + registrable reassemble the lowercased host exactly.
    val reassembled = got.filter(col("subdomain") =!= "")
      .filter(concat(col("subdomain"), lit("."),
        col("registrable_domain")) =!= col("host"))
    assert(reassembled.count() == 0, "subdomain.registrable == host")
    // The multi-label subdomain survives as-is.
    assert(got.filter(col("subdomain") === "cdn.static").count() > 0)
    // Casing noise is erased: hosts are lowercase.
    assert(got.filter(col("host") =!= lower(col("host"))).count() == 0)
  }

  test("domain_extract: the pinned PSL subset handles suffixes the " +
      "twin never plants (com.au, co.jp) and generic TLDs") {
    import spark.implicits._
    val hosts = Seq("www.shop.com.au", "news.co.jp", "a.b.example.io",
      "plain.net").toDF("h")
    val ext = hosts.select(
      regexp_extract(lower(col("h")),
        "([^.]+\\.(?:co\\.uk|com\\.au|co\\.jp|[a-z]+))$", 1).as("r"))
      .as[String].collect().toSeq
    assert(ext == Seq("shop.com.au", "news.co.jp", "example.io",
      "plain.net"))
  }

  test("domain_stats: mirrors serve 100% non-canonical copies, " +
      "primary domains 0%; hubs host 5-token teasers") {
    val s = SparkEntry.queries("domain_stats")(spark, sf).collect()
    assert(s.length == 25, "20 site + 3 mirror + 2 hub domains")
    val byDom = s.map(r => r.getAs[String]("registrable_domain") -> r).toMap
    byDom.keys.filter(_.startsWith("mirror-")).foreach { d =>
      assert(byDom(d).getAs[Long]("non_canonical_e6") == 1000000L,
        s"$d re-hosts full copies crawled after the original")
    }
    byDom.keys.filter(_.startsWith("site-")).foreach { d =>
      assert(byDom(d).getAs[Long]("non_canonical_e6") == 0L,
        s"$d is first-seen for all its content")
    }
    byDom.keys.filter(_.startsWith("hub-")).foreach { d =>
      assert(byDom(d).getAs[Long]("mean_tokens") <= 5L,
        s"$d hosts 5-token teaser stubs")
      assert(byDom(d).getAs[Long]("non_canonical_e6") == 0L,
        s"$d teasers are distinct texts, each its own canonical")
    }
    // Primary domains carry the subdomain variants; mirrors/hubs none.
    assert(byDom.keys.filter(_.startsWith("site-"))
      .forall(d => byDom(d).getAs[Long]("n_subdomains") >= 3))
  }

  test("domain_reputation: in-linkless tiers hold the exact damping " +
      "base; every primary domain ranks well above it") {
    val r = SparkEntry.queries("domain_reputation")(spark, sf).collect()
    assert(r.length == 25)
    r.foreach { row =>
      val d = row.getAs[String]("registrable_domain")
      val rank = row.getAs[Long]("rank_e6")
      val inW = row.getAs[Long]("in_w")
      if (d.startsWith("site-")) {
        assert(inW > 0 && rank > 500000L, s"$d: in_w=$inW rank=$rank")
      } else {
        // Mirror/hub copies link OUT to primary pages but receive no
        // links: rank is exactly the 3-iteration damping base.
        assert(inW == 0L && rank == 150000L, s"$d: in_w=$inW rank=$rank")
        assert(row.getAs[Long]("out_w") > 0L, s"$d emits outlinks")
      }
    }
  }

  test("domain_filter: each floor fires on its own planted tier and " +
      "never on a primary domain") {
    val f = SparkEntry.queries("domain_filter")(spark, sf).collect()
    val byDom = f.map(r => r.getAs[String]("registrable_domain") -> r).toMap
    byDom.foreach { case (d, row) =>
      val (m, rk, sh, b) = (row.getAs[Long]("flag_mirror"),
        row.getAs[Long]("flag_rank"), row.getAs[Long]("flag_short"),
        row.getAs[Long]("blocked"))
      if (d.startsWith("mirror-"))
        assert((m, rk, sh, b) == ((1L, 1L, 0L, 1L)), s"$d: $m $rk $sh $b")
      else if (d.startsWith("hub-"))
        assert((m, rk, sh, b) == ((0L, 1L, 1L, 1L)), s"$d: $m $rk $sh $b")
      else
        assert((m, rk, sh, b) == ((0L, 0L, 0L, 0L)), s"$d: $m $rk $sh $b")
    }
    // Removal accounting: blocked domains bill their distinct docs.
    f.foreach { row =>
      val expected = if (row.getAs[Long]("blocked") == 1L)
        row.getAs[Long]("n_docs") else 0L
      assert(row.getAs[Long]("n_docs_removed") == expected)
    }
  }

  test("isqrt: exact on perfect squares, their neighbors, and a dense " +
      "sweep (the ±1 fixup discharges the double-sqrt rounding)") {
    import spark.implicits._
    val xs = (0L to 2000L) ++
      (1L to 1000L).flatMap(k => Seq(k * k - 1, k * k, k * k + 1)) ++
      Seq(4503599627370496L - 1, 4503599627370496L, // 2^52 boundary
        999999999999L, 1000000000000L, 2000000000000L)
    val df = xs.filter(_ >= 0).distinct.toDF("x")
      .withColumn("s", graft.util.Det.isqrt(col("x")))
    val bad = df.filter(col("s") * col("s") > col("x") ||
      (col("s") + 1) * (col("s") + 1) <= col("x")).count()
    assert(bad == 0, "isqrt(x)^2 <= x < (isqrt(x)+1)^2 everywhere")
  }

  test("dedup_soft_weights: singleton weight exactly 1.0; cluster " +
      "weights exactly floor(1e6*sqrt(n)); mass sits between hard " +
      "dedup and no dedup") {
    val w = SparkEntry.queries("dedup_soft_weights")(spark, sf).collect()
    w.foreach { r =>
      val n = r.getAs[Long]("cluster_size")
      val expect = math.sqrt(n.toDouble * 1e12).toLong
      val got = r.getAs[Long]("weight_e6")
      assert(math.abs(got - expect) <= 1 &&
        got * got <= n * 1000000000000L &&
        (got + 1) * (got + 1) > n * 1000000000000L,
        s"n=$n weight=$got")
    }
    assert(w.exists(_.getAs[Long]("cluster_size") > 1L),
      "the corpus plants near-dup clusters; weights must be non-vacuous")
    val totalW = w.map(_.getAs[Long]("weight_e6")).sum
    val nDocs = graft.Tables(spark, sf).documents.count()
    assert(totalW >= w.length * 1000000L &&
      totalW <= nDocs * 1000000L,
      "sqrt-weights sit between one-per-cluster and one-per-doc mass")
  }

  test("domain_extract_psl: the table-driven longest-suffix path " +
      "agrees with the regex path on every hosted row; unlisted TLDs " +
      "take the default rule") {
    import spark.implicits._
    val rx = SparkEntry.queries("domain_extract")(spark, sf)
      .select(col("fetch_seq"), col("registrable_domain"), col("suffix"))
    val tb = SparkEntry.queries("domain_extract_psl")(spark, sf)
      .select(col("fetch_seq"),
        col("registrable_domain").as("r2"), col("suffix").as("s2"),
        col("matched_rule"))
    val j = rx.join(tb, "fetch_seq")
    assert(j.count() == rx.count())
    assert(j.filter(col("registrable_domain") =!= col("r2") ||
      col("suffix") =!= col("s2")).count() == 0,
      "two strategies, one semantics — bit-equal on the twin")
    // The twin only plants listed suffixes; both listed rules fire.
    val rules = tb.select("matched_rule").distinct()
      .as[String].collect().toSet
    assert(rules == Set("listed-2", "listed-1"))
    // The default rule (PSL '*' fallback) on a synthetic unlisted TLD:
    // resolved per the same length arithmetic the query uses.
    val got = Seq("api.service.xyz").toDF("h")
      .select(regexp_extract(col("h"), "([^.]+\\.[^.]+)$", 1).as("last2"),
        regexp_extract(col("h"), "([^.]+)$", 1).as("last1"))
      .head
    assert(got.getString(0) == "service.xyz" && got.getString(1) == "xyz")
  }

  test("domain_extract_psl at REAL PSL width: the ~9k-entry fixture " +
      "list broadcasts and stays bit-equal to the regex path on every " +
      "hosted row") {
    val psl = DomainQueries.fullPslFixture
    assert(psl.size >= 9000, s"fixture must be PSL-width, got ${psl.size}")
    assert(psl.map(_._1).distinct.size == psl.size, "duplicate suffixes")
    // The fixture strictly contains the pinned subset the regex path
    // compiles, so the two strategies must still agree.
    assert(Set("co.uk", "com.au", "co.jp")
      .subsetOf(psl.filter(_._2 == 2).map(_._1).toSet))
    assert(Set("com", "org", "net")
      .subsetOf(psl.filter(_._2 == 1).map(_._1).toSet))
    val docs = graft.Tables(spark, sf).documents
    val wide = DomainQueries.pslExtract(spark, docs, psl)
    // Plan pin: the 9k-row suffix policy reaches the corpus as
    // BROADCAST metadata (both depth probes), never a shuffled join.
    val plan = wide.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"suffix probes must broadcast at full width:\n$plan")
    val rx = SparkEntry.queries("domain_extract")(spark, sf)
      .select(col("fetch_seq"), col("registrable_domain"), col("suffix"))
    val j = rx.join(
      wide.select(col("fetch_seq"),
        col("registrable_domain").as("r2"), col("suffix").as("s2")),
      "fetch_seq")
    assert(j.count() == rx.count())
    assert(j.filter(col("registrable_domain") =!= col("r2") ||
      col("suffix") =!= col("s2")).count() == 0,
      "full-width table path drifted from the regex path")
    // Depth-2 preference survives the width: co.uk hosts must resolve
    // through the listed-2 rule even though 'uk' is also listed at
    // depth 1 (the real PSL lists both).
    import spark.implicits._
    val rules = wide.filter(col("suffix") === "co.uk")
      .select("matched_rule").distinct().as[String].collect().toSeq
    assert(rules == Seq("listed-2"))
  }

  test("domain_quality: the domain table reconciles exactly with the " +
      "corpus-level trained scorer") {
    val dq = SparkEntry.queries("domain_quality")(spark, sf).collect()
    assert(dq.length == 20, "one row per primary domain")
    val qs = SparkEntry.queries("quality_score")(spark, sf).collect()
    // Doc accounting: every doc lands in exactly one domain row.
    assert(dq.map(_.getAs[Long]("n_docs")).sum == qs.length)
    // The domain-weighted MAP-good count reconciles with the corpus
    // tally (floor-division slack bounded by one per domain).
    val corpusGood = qs.count(_.getAs[Long]("pred") == 1L)
    val approxGood = dq.map(r => r.getAs[Long]("good_frac_e6") *
      r.getAs[Long]("n_docs")).sum / 1000000L
    assert(math.abs(approxGood - corpusGood) <= dq.length,
      s"$approxGood vs $corpusGood")
    // The trained filter must discriminate BETWEEN domains (the
    // evidence the table exists to show): spread, not a constant.
    val fracs = dq.map(_.getAs[Long]("good_frac_e6"))
    assert(fracs.max - fracs.min > 100000L,
      "domains must differ by >10pp in trained-good fraction")
  }

  test("mixture_temperature: alpha=1/2 flattens the mixture — boosts " +
      "tail sources, shrinks heads, and preserves the share order") {
    val m = SparkEntry.queries("mixture_temperature")(spark, sf).collect()
    assert(m.length == 20)
    val byShare = m.sortBy(_.getAs[Long]("share_e6"))
    // Temperature shares are monotone in raw shares (sqrt is).
    val temps = byShare.map(_.getAs[Long]("temp_share_e6"))
    assert(temps.zip(temps.tail).forall { case (a, b) => a <= b })
    // The smallest source gains, the largest loses.
    assert(byShare.head.getAs[Long]("boost_e6") > 1000000L,
      "tail source must be boosted")
    assert(byShare.last.getAs[Long]("boost_e6") < 1000000L,
      "head source must shrink")
    // Shares are normalized (floor-division slack under one ppm each).
    val sumTemp = m.map(_.getAs[Long]("temp_share_e6")).sum
    assert(sumTemp > 1000000L - 20 && sumTemp <= 1000000L)
  }
}
