package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** The DOMAIN plane of web curation — the CCNet/FineWeb stage the text
  * family ran below: real web corpora are curated per REGISTRABLE
  * DOMAIN (the public-suffix-list unit a site owner controls), not per
  * document. Quality signals, duplication and link reputation
  * aggregate at that grain, and whole domains are kept or dropped
  * before any per-document filter runs — at 100 TB the domain table is
  * the only frame small enough to hand an operator.
  *
  * Input is a planted multi-domain HOSTING twin of `documents`
  * ([[domainUrls]]) — the `er_candidates` dirty-twin discipline applied
  * to the web's hosting structure. One row per (document, host) pair
  * with a first-seen crawl sequence:
  *
  *  - PRIMARY hosting: every doc on one of 20 source-keyed registrable
  *    domains across three public suffixes (`.com`, `.org`, the
  *    two-level `.co.uk`), wrapped in subdomain variants
  *    (none/www/blog/cdn.static) and casing noise keyed by doc_id.
  *  - MIRROR hosting: every 11th doc (doc_id % 11 = 3) is re-hosted,
  *    full copy, on one of 3 `mirror-*.net` domains, crawled AFTER the
  *    original (fetch_seq + 10M) — the scraper-mirror tier.
  *  - HUB hosting: every 23rd doc (doc_id % 23 = 5) appears on one of
  *    2 `hub-*.org` domains as a 5-token TEASER stub (fetch_seq +
  *    20M) — the listing/link-farm tier.
  *
  * The family, each oracle-replayed end to end:
  *
  *  - `domain_extract` — public-suffix-aware registrable-domain
  *    extraction per hosted row (lowercase; subdomain vs registrable
  *    vs suffix against a PINNED suffix list: the PSL subset
  *    {co.uk, com.au, co.jp} two-level + generic one-level). A spec
  *    pins that extraction recovers the planted registrable verbatim,
  *    so the whole family composes on the extracted key.
  *  - `domain_stats` — the per-domain curation table: hosted rows,
  *    distinct docs, subdomain/language spread, token volume, and the
  *    NON-CANONICAL share (a hosted copy is canonical iff it has the
  *    minimum fetch_seq for its exact text — first-seen-wins, the
  *    standard web-dedup survivorship rule; a mirror serves 100%
  *    non-canonical copies, an origin 0%).
  *  - `domain_reputation` — weighted PageRank over the DOMAIN-level
  *    link graph: every hosted copy links to the planted outlink
  *    target page `(7·doc_id) mod 101` ([[TextQueries.htmlTwin]]'s
  *    nav link), resolved to that page's PRIMARY domain; domain
  *    self-links dropped. Fully integerized like `graph_pagerank`:
  *    e6 ranks, per-edge exact floor contribution (r·w) div out_w,
  *    damping (85·Σ) div 100 — bit-identical on both engines.
  *    Mirror/hub domains emit links but receive none, so their rank
  *    sits at the exact damping base (0.15e6).
  *  - `domain_filter` — the keep/drop decision table composing the
  *    two: blocked when the non-canonical share, link rank, or mean
  *    hosted-copy length trips a pinned floor; per-domain flags +
  *    docs removed. On the planted structure each flag has a distinct
  *    firing set (mirrors: non-canonical + rank; hubs: short + rank;
  *    all 20 primary domains: clean), spec-pinned at every SF.
  *
  * Scale posture: the hosting twin is a narrow projection + two
  * filtered unions (no join); stats is ONE md5-keyed window (the
  * canonical rule) into ONE partial-agg shuffle on the domain key;
  * the link join probes a BROADCAST of the planted 101-page target
  * universe; everything after the edge aggregate is
  * domain-cardinality metadata (25 rows here, maybe 10^7 at 100 TB —
  * still executor-trivial), and the 3-iteration rank loop joins those
  * tiny frames off ONE localCheckpointed edge list (the
  * `graph_pagerank` lineage discipline). Nothing corpus-squared. */
object DomainQueries {

  /** Pinned public-suffix subset: the two-level suffixes the extractor
    * recognizes (PSL's co.uk family); any other suffix is one label.
    * The twin plants co.uk; com.au/co.jp document that the list is a
    * list, not a special case. */
  private val TwoLevelSuffixes = Seq("co\\.uk", "com\\.au", "co\\.jp")

  /** Registrable-domain pattern over a lowercased host: one label, a
    * dot, then a pinned two-level suffix or a generic one-level TLD.
    * Anchored at end; leftmost-first semantics agree between Java
    * regex and DuckDB's RE2 because earlier label starts cannot reach
    * the anchor (inner labels carry dots/digits/dashes that `[a-z]+`
    * excludes). */
  private val RegistrablePattern =
    s"([^.]+\\.(?:${TwoLevelSuffixes.mkString("|")}|[a-z]+))$$"

  /** The PRIMARY registrable domain of a doc (the planted source-keyed
    * site), as a column over any frame carrying `source` — the per-doc
    * key the curation pipeline joins domain verdicts on (the SQL twin
    * is the `named` CTE's `reg`). */
  private[graft] def primaryReg: Column = {
    val sn = expr("CAST(substring(source, 4, 8) AS BIGINT)")
    concat(lit("site-"), sn.cast("string"), lit("."),
      when(sn % 3 === 0, "com").when(sn % 3 === 1, "org")
        .otherwise("co.uk"))
  }

  /** The planted hosting twin: documents → one row per (doc, host):
    * (doc_id, text, lang, reg, raw_host, fetch_seq). `reg` is the TRUE
    * registrable domain (spec-pinned against extraction); `fetch_seq`
    * is the globally-unique first-seen crawl sequence (primary =
    * doc_id, mirror = +10M, hub = +20M). */
  private[text] def domainUrls(docs: DataFrame): DataFrame = {
    val reg = primaryReg
    // Variant moduli are COPRIME with 20: the generator keys `source`
    // as doc_id mod 20, so any 20-divisor modulus would be constant
    // within a domain and the variants would never vary per site.
    val sub = when(col("doc_id") % 7 === 1, "www.")
      .when(col("doc_id") % 7 === 2, "blog.")
      .when(col("doc_id") % 7 === 3, "cdn.static.")
      .otherwise("")
    val primary = docs.select(col("doc_id"), col("text"), col("lang"),
      reg.as("reg"),
      when(col("doc_id") % 3 === 1, upper(concat(sub, reg)))
        .otherwise(concat(sub, reg)).as("raw_host"),
      col("doc_id").as("fetch_seq"))
    val mirrorReg = concat(lit("mirror-"),
      (col("doc_id") % 3).cast("string"), lit(".net"))
    val mirror = docs.filter(col("doc_id") % 11 === 3)
      .select(col("doc_id"), col("text"), col("lang"),
        mirrorReg.as("reg"), mirrorReg.as("raw_host"),
        (col("doc_id") + 10000000L).as("fetch_seq"))
    val hubReg = concat(lit("hub-"),
      (col("doc_id") % 2).cast("string"), lit(".org"))
    val hub = docs.filter(col("doc_id") % 23 === 5)
      .select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 5), " ").as("text"),
        col("lang"), hubReg.as("reg"), hubReg.as("raw_host"),
        (col("doc_id") + 20000000L).as("fetch_seq"))
    primary.unionByName(mirror).unionByName(hub)
  }

  /** DuckDB mirror of [[domainUrls]] as a CTE chain ending in
    * `urls(doc_id, text, lang, reg, raw_host, fetch_seq)` — shared by
    * all four oracles so the planted twin cannot drift between them.
    * `named` additionally exposes the PRIMARY domain per doc (the link
    * graph resolves targets against it). */
  private[text] val sqlUrlsCte: String =
    """WITH src AS (
      |  SELECT doc_id, text, lang, source,
      |         CAST(substr(source, 4) AS BIGINT) AS sn
      |  FROM documents
      |), named AS (
      |  SELECT doc_id, text, lang,
      |         'site-' || CAST(sn AS VARCHAR) || '.' ||
      |           (CASE sn % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |                        ELSE 'co.uk' END) AS reg,
      |         (CASE doc_id % 7 WHEN 1 THEN 'www.' WHEN 2 THEN 'blog.'
      |                          WHEN 3 THEN 'cdn.static.'
      |                          ELSE '' END) AS sub
      |  FROM src
      |), urls AS (
      |  SELECT doc_id, text, lang, reg,
      |         CASE WHEN doc_id % 3 = 1 THEN upper(sub || reg)
      |              ELSE sub || reg END AS raw_host,
      |         doc_id AS fetch_seq
      |  FROM named
      |  UNION ALL
      |  SELECT doc_id, text, lang,
      |         'mirror-' || CAST(doc_id % 3 AS VARCHAR) || '.net' AS reg,
      |         'mirror-' || CAST(doc_id % 3 AS VARCHAR) || '.net'
      |           AS raw_host,
      |         doc_id + 10000000 AS fetch_seq
      |  FROM named WHERE doc_id % 11 = 3
      |  UNION ALL
      |  SELECT doc_id,
      |         array_to_string(list_slice(string_split(text, ' '), 1, 5),
      |                         ' ') AS text,
      |         lang,
      |         'hub-' || CAST(doc_id % 2 AS VARCHAR) || '.org' AS reg,
      |         'hub-' || CAST(doc_id % 2 AS VARCHAR) || '.org' AS raw_host,
      |         doc_id + 20000000 AS fetch_seq
      |  FROM named WHERE doc_id % 23 = 5
      |)""".stripMargin

  /** Extraction columns off a lowercased `host`: the registrable
    * domain by [[RegistrablePattern]], the suffix (everything after
    * the registrable's first dot), and the subdomain prefix (length
    * arithmetic — exact, no second regex). */
  private def extracted(host: Column): (Column, Column, Column) = {
    val reg = regexp_extract(host, RegistrablePattern, 1)
    val suffix = regexp_extract(reg, "^[^.]+\\.(.+)$", 1)
    val sub = when(length(host) === length(reg), lit(""))
      .otherwise(substring(host, lit(1), length(host) - length(reg) - 1))
    (reg, suffix, sub)
  }

  /** SQL twin of [[extracted]]: a CTE `ext` adding host (lowercased)
    * and registrable_domain to every hosted row (patterns shared
    * verbatim with the Spark side). */
  private[text] val sqlExtractCte: String =
    s""", hosts AS (
       |  SELECT doc_id, text, lang, reg, raw_host, fetch_seq,
       |         lower(raw_host) AS host
       |  FROM urls
       |), ext AS (
       |  SELECT doc_id, text, lang, reg, raw_host, fetch_seq, host,
       |         regexp_extract(host, '$RegistrablePattern', 1)
       |           AS registrable_domain
       |  FROM hosts
       |)""".stripMargin

  private val domainExtract = Q(
    "domain_extract",
    sqlUrlsCte + sqlExtractCte + """
      |SELECT fetch_seq, doc_id, raw_host, host,
      |       CASE WHEN length(host) = length(registrable_domain) THEN ''
      |            ELSE substr(host, 1,
      |                        length(host) - length(registrable_domain) - 1)
      |       END AS subdomain,
      |       registrable_domain,
      |       regexp_extract(registrable_domain, '^[^.]+\.(.+)$', 1)
      |         AS suffix
      |FROM ext ORDER BY fetch_seq""".stripMargin) { (s, dir) =>
    val withHost = domainUrls(Tables(s, dir).documents)
      .select(col("fetch_seq"), col("doc_id"), col("raw_host"),
        lower(col("raw_host")).as("host"))
    val (reg, suffix, sub) = extracted(col("host"))
    withHost
      .select(col("fetch_seq"), col("doc_id"), col("raw_host"),
        col("host"), sub.as("subdomain"), reg.as("registrable_domain"),
        suffix.as("suffix"))
      .orderBy("fetch_seq")
  }

  /** Spark frame of the extracted domain plane — one row per hosted
    * copy: (fetch_seq, doc_id, text, lang, host, registrable_domain,
    * subdomain). Stats/filter group off the EXTRACTED key (the
    * composition is the point; the spec pins it equal to the planted
    * `reg`). */
  private[graft] def extractedDocs(docs: DataFrame): DataFrame = {
    val withHost = domainUrls(docs)
      .withColumn("host", lower(col("raw_host")))
    val (reg, _, sub) = extracted(col("host"))
    withHost.select(col("fetch_seq"), col("doc_id"), col("text"),
      col("lang"), col("host"), reg.as("registrable_domain"),
      sub.as("subdomain"))
  }

  /** Shared per-domain stats aggregate (Spark side): canonical = the
    * minimum fetch_seq per exact text (first-seen-wins, a window on
    * the md5 key), then one partial-agg shuffle on the domain key.
    * Token counts are projected BEFORE the window so the md5 exchange
    * carries a 32-char digest per row, never the document bytes. */
  private[text] def statsFrom(ext: DataFrame): DataFrame =
    ext
      .select(col("registrable_domain"), col("subdomain"), col("lang"),
        col("doc_id"), col("fetch_seq"),
        md5(col("text")).as("text_key"),
        size(split(col("text"), " ")).cast("long").as("tk"))
      .withColumn("canon",
        (col("fetch_seq") === min(col("fetch_seq"))
          .over(Window.partitionBy(col("text_key")))).cast("long"))
      .groupBy(col("registrable_domain"))
      .agg(
        count(lit(1)).as("n_hosted"),
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("subdomain")).as("n_subdomains"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("tk")).as("n_tokens"),
        sum(col("canon")).as("n_canonical"))
      .select(col("registrable_domain"), col("n_hosted"), col("n_docs"),
        col("n_subdomains"), col("n_langs"), col("n_tokens"),
        col("n_canonical"),
        expr("(n_hosted - n_canonical) * 1000000 DIV n_hosted")
          .as("non_canonical_e6"),
        expr("n_tokens DIV n_hosted").as("mean_tokens"))

  /** SQL twin of [[statsFrom]] as a CTE `stats(...)` (appended after
    * [[sqlExtractCte]]). The canonicality CTE is named `dcanon`, not
    * `canon`: the curation pipeline composes this fragment with
    * TextQueries' URL-canonicalization chain, whose final CTE owns the
    * `canon` name. */
  private[text] val sqlStatsCte: String =
    """, dcanon AS (
      |  SELECT registrable_domain, doc_id, lang, text, subdomain,
      |         CASE WHEN fetch_seq = min(fetch_seq)
      |                OVER (PARTITION BY md5(text))
      |              THEN 1 ELSE 0 END AS canon
      |  FROM (SELECT *,
      |          CASE WHEN length(host) = length(registrable_domain)
      |               THEN ''
      |               ELSE substr(host, 1, length(host)
      |                           - length(registrable_domain) - 1)
      |          END AS subdomain
      |        FROM ext)
      |), stats AS (
      |  SELECT registrable_domain,
      |         CAST(count(*) AS BIGINT) AS n_hosted,
      |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |         CAST(count(DISTINCT subdomain) AS BIGINT) AS n_subdomains,
      |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |         CAST(sum(len(string_split(text, ' '))) AS BIGINT)
      |           AS n_tokens,
      |         CAST(sum(canon) AS BIGINT) AS n_canonical
      |  FROM dcanon GROUP BY registrable_domain
      |)""".stripMargin

  private val domainStats = Q(
    "domain_stats",
    sqlUrlsCte + sqlExtractCte + sqlStatsCte + """
      |SELECT registrable_domain, n_hosted, n_docs, n_subdomains, n_langs,
      |       n_tokens, n_canonical,
      |       (n_hosted - n_canonical) * 1000000 // n_hosted
      |         AS non_canonical_e6,
      |       n_tokens // n_hosted AS mean_tokens
      |FROM stats ORDER BY registrable_domain""".stripMargin) { (s, dir) =>
    statsFrom(extractedDocs(Tables(s, dir).documents))
      .orderBy("registrable_domain")
  }

  /** Spark frame of the domain-level rank table: (registrable_domain,
    * out_w, in_w, rank_e6). Every hosted copy carries the HTML twin's
    * planted outlink to page `(7·doc_id) mod 101`
    * ([[TextQueries.htmlTwin]]); the target universe is the first 101
    * docs resolved to their PRIMARY domain, so the page→domain map is
    * an explicit broadcast. Domain self-links are dropped (a site
    * linking to itself is navigation, not reputation). */
  /** The domain-level link-edge aggregate — exposed for the plan spec:
    * the page→domain map (101 rows by construction) must reach the
    * corpus as a BROADCAST probe, never a shuffled join. */
  private[text] def linkEdges(ext: DataFrame): DataFrame = {
    val pages = broadcast(
      ext.filter(col("fetch_seq") < 101) // primary hosting of pages 0..100
        .select(col("doc_id").as("tgt"),
          col("registrable_domain").as("dst")))
    ext
      .select(col("registrable_domain").as("src"),
        ((col("doc_id") * 7) % 101).as("tgt"))
      .join(pages, "tgt")
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Entry for the plan spec: the edge frame over the sf tables. */
  private[graft] def linkEdgesFor(s: SparkSession, dir: String): DataFrame =
    linkEdges(extractedDocs(Tables(s, dir).documents))

  private[text] def ranksFrom(ext: DataFrame): DataFrame = {
    import graft.ops.Checkpoints.CheckpointOps
    val edges = linkEdges(ext)
    val nodes = ext.select(col("registrable_domain").as("node")).distinct()
    // One lineage cut for the loop (graph_pagerank discipline): the
    // contrib frame and node list are re-read each iteration and must
    // not re-derive the corpus scan per step. The node list rides the
    // cut as null-dst rows so one checkpoint carries both.
    val contrib = edges
      .join(edges.groupBy(col("src").as("osrc"))
          .agg(sum(col("w")).as("out_w")),
        col("src") === col("osrc"))
      .select(col("src"), col("dst"), col("w"), col("out_w"))
      .unionByName(nodes.select(col("node").as("src"),
        lit(null).cast("string").as("dst"), lit(0L).as("w"),
        lit(0L).as("out_w")))
      .cut()
    val nodesCk = contrib.select(col("src").as("node")).distinct()
    val realEdges = contrib.filter(col("dst").isNotNull)
    var ranks = nodesCk.select(col("node").as("node_id"),
      lit(1000000L).as("r"))
    for (_ <- 1 to 3) {
      val sc = realEdges
        .join(ranks, col("src") === col("node_id"))
        .select(col("dst"), expr("(r * w) DIV out_w").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      ranks = nodesCk
        .join(sc, col("node") === col("dst"), "left")
        .select(col("node").as("node_id"),
          expr("150000 + (85 * coalesce(sc, 0)) DIV 100").as("r"))
    }
    val inW = realEdges.groupBy(col("dst").as("inode"))
      .agg(sum(col("w")).as("in_w"))
    val outW = realEdges.groupBy(col("src").as("onode"))
      .agg(sum(col("w")).as("w_out"))
    ranks
      .join(outW, col("node_id") === col("onode"), "left")
      .join(inW, col("node_id") === col("inode"), "left")
      .select(col("node_id").as("registrable_domain"),
        coalesce(col("w_out"), lit(0L)).as("out_w"),
        coalesce(col("in_w"), lit(0L)).as("in_w"),
        col("r").as("rank_e6"))
  }

  /** SQL twin of [[ranksFrom]]: CTE chain ending in `ranked(
    * registrable_domain, out_w, in_w, rank_e6)` (appended after
    * [[sqlExtractCte]]); the 3 damped iterations are unrolled, each a
    * weighted contribution join + LEFT JOIN back onto the node list so
    * in-linkless domains hold the exact damping base. */
  private[text] val sqlRanksCte: String = {
    def it(k: Int) =
      s""", r$k AS (
         |  SELECT n.node AS node_id,
         |         150000 + (85 * coalesce(s.sc, 0)) // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum((r.r * e.w) // e.out_w) AS sc
         |    FROM wedges e JOIN r${k - 1} r ON e.src = r.node_id
         |    GROUP BY e.dst) s ON n.node = s.dst
         |)""".stripMargin
    s""", pages AS (
       |  SELECT doc_id AS tgt, registrable_domain AS dst FROM ext
       |  WHERE fetch_seq < 101
       |), edges AS (
       |  SELECT x.registrable_domain AS src, p.dst,
       |         CAST(count(*) AS BIGINT) AS w
       |  FROM ext x JOIN pages p ON (x.doc_id * 7) % 101 = p.tgt
       |  WHERE x.registrable_domain <> p.dst
       |  GROUP BY 1, 2
       |), wedges AS (
       |  SELECT e.src, e.dst, e.w, o.out_w
       |  FROM edges e JOIN (
       |    SELECT src, sum(w) AS out_w FROM edges GROUP BY src) o
       |    ON e.src = o.src
       |), nodes AS (
       |  SELECT DISTINCT registrable_domain AS node FROM ext
       |), r0 AS (
       |  SELECT node AS node_id, CAST(1000000 AS BIGINT) AS r FROM nodes
       |)${it(1)}${it(2)}${it(3)}, ranked AS (
       |  SELECT r3.node_id AS registrable_domain,
       |         CAST(coalesce(o.out_w, 0) AS BIGINT) AS out_w,
       |         CAST(coalesce(i.in_w, 0) AS BIGINT) AS in_w,
       |         CAST(r3.r AS BIGINT) AS rank_e6
       |  FROM r3
       |  LEFT JOIN (SELECT src, sum(w) AS out_w FROM edges GROUP BY src) o
       |    ON r3.node_id = o.src
       |  LEFT JOIN (SELECT dst, sum(w) AS in_w FROM edges GROUP BY dst) i
       |    ON r3.node_id = i.dst
       |)""".stripMargin
  }

  private val domainReputation = Q(
    "domain_reputation",
    sqlUrlsCte + sqlExtractCte + sqlRanksCte + """
      |SELECT registrable_domain, out_w, in_w, rank_e6
      |FROM ranked ORDER BY registrable_domain""".stripMargin) { (s, dir) =>
    ranksFrom(extractedDocs(Tables(s, dir).documents))
      .orderBy("registrable_domain")
  }

  /** Pinned keep/drop floors for [[domainFilter]] — each with a wide
    * margin to the planted structure (no knife-edge data dependence):
    * a domain is blocked when over half its hosted copies are
    * non-canonical (mirrors serve 100%, origins ~0%), when its link
    * rank is under 0.5 (an in-linkless domain holds the exact 0.15e6
    * damping base; primary domains measure ~1.0e6), or when its mean
    * hosted copy is under 20 whitespace tokens (hub teasers are 5 by
    * construction, corpus docs ~50). */
  private[text] final val NonCanonicalFloorE6 = 500000L
  private[text] final val RankFloorE6 = 500000L
  private[text] final val MinMeanTokens = 20L

  private val domainFilter = Q(
    "domain_filter",
    sqlUrlsCte + sqlExtractCte + sqlStatsCte + sqlRanksCte + s"""
      |, dec AS (
      |  SELECT s.registrable_domain, s.n_hosted, s.n_docs,
      |         (s.n_hosted - s.n_canonical) * 1000000 // s.n_hosted
      |           AS non_canonical_e6,
      |         r.rank_e6,
      |         s.n_tokens // s.n_hosted AS mean_tokens
      |  FROM stats s JOIN ranked r USING (registrable_domain)
      |)
      |SELECT registrable_domain, n_hosted, n_docs, non_canonical_e6,
      |       rank_e6, mean_tokens,
      |       CAST(CASE WHEN non_canonical_e6 > $NonCanonicalFloorE6
      |                 THEN 1 ELSE 0 END AS BIGINT) AS flag_mirror,
      |       CAST(CASE WHEN rank_e6 < $RankFloorE6
      |                 THEN 1 ELSE 0 END AS BIGINT) AS flag_rank,
      |       CAST(CASE WHEN mean_tokens < $MinMeanTokens
      |                 THEN 1 ELSE 0 END AS BIGINT) AS flag_short,
      |       CAST(CASE WHEN non_canonical_e6 > $NonCanonicalFloorE6
      |                   OR rank_e6 < $RankFloorE6
      |                   OR mean_tokens < $MinMeanTokens
      |                 THEN 1 ELSE 0 END AS BIGINT) AS blocked,
      |       CAST(CASE WHEN non_canonical_e6 > $NonCanonicalFloorE6
      |                   OR rank_e6 < $RankFloorE6
      |                   OR mean_tokens < $MinMeanTokens
      |                 THEN n_docs ELSE 0 END AS BIGINT)
      |         AS n_docs_removed
      |FROM dec ORDER BY registrable_domain""".stripMargin) { (s, dir) =>
    val ext = extractedDocs(Tables(s, dir).documents)
    val stats = statsFrom(ext)
    val ranked = ranksFrom(ext)
      .select(col("registrable_domain"), col("rank_e6"))
    stats.join(ranked, "registrable_domain")
      .select(col("registrable_domain"), col("n_hosted"), col("n_docs"),
        col("non_canonical_e6"), col("rank_e6"), col("mean_tokens"),
        (col("non_canonical_e6") > NonCanonicalFloorE6).cast("long")
          .as("flag_mirror"),
        (col("rank_e6") < RankFloorE6).cast("long").as("flag_rank"),
        (col("mean_tokens") < MinMeanTokens).cast("long").as("flag_short"))
      .withColumn("blocked",
        (col("flag_mirror") === 1 || col("flag_rank") === 1 ||
          col("flag_short") === 1).cast("long"))
      .withColumn("n_docs_removed",
        when(col("blocked") === 1, col("n_docs")).otherwise(0L))
      .orderBy("registrable_domain")
  }

  /** The pinned suffix list as DATA — (suffix, depth) rows. The regex
    * path compiles this into [[RegistrablePattern]]; the table path
    * broadcasts it. One source, two execution strategies. */
  private val SuffixRows: Seq[(String, Int)] =
    Seq("co.uk" -> 2, "com.au" -> 2, "co.jp" -> 2,
      "com" -> 1, "org" -> 1, "net" -> 1)

  /** TABLE-DRIVEN registrable-domain extraction — the form that
    * survives the REAL public-suffix list: the regex path's suffix
    * alternation is fine at 3 pinned entries but wrong at the PSL's
    * ~9000 (a 9000-branch regex per row is neither compilable nor
    * fast), so the scale path treats the list as a broadcast TABLE
    * and resolves each host by LONGEST-LISTED-SUFFIX match (PSL
    * semantics): probe the host's last-2 and last-1 labels against
    * the depth-2/depth-1 suffix sets, prefer the deeper hit, fall
    * back to the bare TLD for unlisted suffixes (the PSL `*`
    * default). `matched_rule` reports which rule fired. The
    * registrable is rebuilt by pure length arithmetic (strip
    * `.suffix`, take the last remaining label) — no dynamic regex.
    * A spec pins BIT-EQUALITY with `domain_extract`'s regex path on
    * every hosted row: two strategies, one semantics. Scale: two
    * BROADCAST hash joins (the suffix policy reaches the corpus as
    * metadata, plan-pinned) on a narrow projection; output sort
    * only. */
  private val domainExtractPsl = Q(
    "domain_extract_psl", {
      val values = SuffixRows
        .map { case (s, d) => s"('$s', $d)" }.mkString(", ")
      sqlUrlsCte + s""", psl(sfx, depth) AS (
        |  SELECT * FROM (VALUES $values) AS t(sfx, depth)
        |), hosts AS (
        |  SELECT fetch_seq, doc_id, raw_host, lower(raw_host) AS host
        |  FROM urls
        |), cand AS (
        |  SELECT fetch_seq, doc_id, raw_host, host,
        |         regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS last2,
        |         regexp_extract(host, '([^.]+)$$', 1) AS last1
        |  FROM hosts
        |), resolved AS (
        |  SELECT c.fetch_seq, c.doc_id, c.raw_host, c.host,
        |         coalesce(p2.sfx, p1.sfx, c.last1) AS suffix,
        |         CASE WHEN p2.sfx IS NOT NULL THEN 'listed-2'
        |              WHEN p1.sfx IS NOT NULL THEN 'listed-1'
        |              ELSE 'default' END AS matched_rule
        |  FROM cand c
        |  LEFT JOIN psl p2 ON p2.depth = 2 AND c.last2 = p2.sfx
        |  LEFT JOIN psl p1 ON p1.depth = 1 AND c.last1 = p1.sfx
        |)
        |SELECT fetch_seq, doc_id, raw_host, host,
        |       regexp_extract(
        |         substr(host, 1, length(host) - length(suffix) - 1),
        |         '([^.]+)$$', 1) || '.' || suffix AS registrable_domain,
        |       suffix, matched_rule
        |FROM resolved ORDER BY fetch_seq""".stripMargin
    }) { (s, dir) =>
    pslExtract(s, Tables(s, dir).documents, SuffixRows)
  }

  /** The table path over an arbitrary suffix list — the declared query
    * runs it with the pinned 6 rows (oracle parity); the real-width
    * spec runs it with [[fullPslFixture]] (~9.1k rows) and pins
    * bit-equality with the regex path on every hosted row. */
  private[text] def pslExtract(
      s: SparkSession, docs: DataFrame,
      suffixRows: Seq[(String, Int)]): DataFrame = {
    import s.implicits._
    val psl = suffixRows.toDF("sfx", "depth")
    val cand = domainUrls(docs)
      .select(col("fetch_seq"), col("doc_id"), col("raw_host"),
        lower(col("raw_host")).as("host"))
      .withColumn("last2",
        regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
      .withColumn("last1", regexp_extract(col("host"), "([^.]+)$", 1))
    val p2 = broadcast(psl.filter(col("depth") === 2)
      .select(col("sfx").as("sfx2")))
    val p1 = broadcast(psl.filter(col("depth") === 1)
      .select(col("sfx").as("sfx1")))
    val resolved = cand
      .join(p2, col("last2") === col("sfx2"), "left")
      .join(p1, col("last1") === col("sfx1"), "left")
      .withColumn("suffix",
        coalesce(col("sfx2"), col("sfx1"), col("last1")))
      .withColumn("matched_rule",
        when(col("sfx2").isNotNull, "listed-2")
          .when(col("sfx1").isNotNull, "listed-1")
          .otherwise("default"))
    resolved
      .select(col("fetch_seq"), col("doc_id"), col("raw_host"),
        col("host"),
        concat(
          regexp_extract(
            substring(col("host"), lit(1),
              length(col("host")) - length(col("suffix")) - 1),
            "([^.]+)$", 1),
          lit("."), col("suffix")).as("registrable_domain"),
        col("suffix"), col("matched_rule"))
      .orderBy("fetch_seq")
  }

  /** A REAL-WIDTH public-suffix fixture (~9.1k entries, the published
    * PSL's scale): every two-letter country code crossed with the
    * common second-level registries (co/com/org/net/gov/ac/edu/mil/
    * ne/or/sch/id — the co.uk family generalized), the country codes
    * themselves, the classic gTLDs, and a synthetic new-gTLD tail.
    * Zero-egress container, so the list is generated to the published
    * list's SHAPE rather than copied from it; it strictly contains the
    * pinned [[SuffixRows]], so the table path under this list must be
    * bit-equal to the regex path on every hosted row (spec-pinned) —
    * the claim `domain_extract_psl`'s scaladoc makes, proven at the
    * width it claims. */
  private[text] def fullPslFixture: Seq[(String, Int)] = {
    val cc = for (a <- 'a' to 'z'; b <- 'a' to 'z') yield s"$a$b"
    val registries = Seq("co", "com", "org", "net", "gov", "ac",
      "edu", "mil", "ne", "or", "sch", "id")
    val depth2 = for (c <- cc; r <- registries) yield (s"$r.$c", 2)
    val depth1 = cc.map(c => (c, 1)) ++
      Seq("com", "org", "net", "info", "biz", "edu", "gov", "mil",
        "int", "arpa").map((_, 1)) ++
      (0 until 300).map(i => (f"ngtld$i%03d", 1))
    (depth2 ++ depth1).toSeq
  }

  /** DOMAIN-grain audit of the TRAINED quality classifier — the
    * composition that closes the two round-15 families into one
    * table: which registrable domains does the trained filter
    * actually like? Per doc the full `quality_score` pipeline runs
    * (training replayed end to end — the `quality_train` CTEs); per
    * PRIMARY domain (the origin site, source-keyed) the table reports
    * mean trained score, the MAP-good fraction, and the planted-label
    * good fraction beside it — the evidence a corpus owner reads
    * before turning `domain_filter`'s floors into a quality floor.
    * Scale: the scoring pipeline's own shape (model broadcast, one
    * per-doc combine) plus ONE corpus-keyed join attaching the
    * 20-row domain map to the scored frame; output is
    * domain-cardinality metadata. */
  private val domainQuality = Q(
    "domain_quality",
    QualityQueries.sqlQualityCtes + """, dom AS (
      |  SELECT doc_id,
      |         'site-' || CAST(CAST(substr(source, 4) AS BIGINT)
      |                         AS VARCHAR) || '.' ||
      |           (CASE CAST(substr(source, 4) AS BIGINT) % 3
      |              WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |              ELSE 'co.uk' END) AS registrable_domain
      |  FROM documents
      |), j AS (
      |  SELECT d.registrable_domain, s.score_fx, s.label,
      |         CASE WHEN s.score_fx > 0 THEN 1 ELSE 0 END AS pred
      |  FROM scored s JOIN dom d USING (doc_id)
      |)
      |SELECT registrable_domain,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(score_fx) // count(*) AS BIGINT) AS mean_score_fx,
      |       CAST(sum(pred) * 1000000 // count(*) AS BIGINT)
      |         AS good_frac_e6,
      |       CAST(sum(label) * 1000000 // count(*) AS BIGINT)
      |         AS label_good_frac_e6
      |FROM j GROUP BY registrable_domain
      |ORDER BY registrable_domain""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val sn = expr("CAST(substring(source, 4, 8) AS BIGINT)")
    val dom = t.documents.select(col("doc_id"),
      concat(lit("site-"), sn.cast("string"), lit("."),
        when(sn % 3 === 0, "com").when(sn % 3 === 1, "org")
          .otherwise("co.uk")).as("registrable_domain"))
    QualityQueries.scoredFrame(t)
      .withColumn("pred", (col("score_fx") > 0L).cast("long"))
      .join(dom, "doc_id")
      .groupBy(col("registrable_domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("score_fx")).as("ssum"),
        sum(col("pred")).as("np"),
        sum(col("label")).as("nl"))
      .select(col("registrable_domain"), col("n_docs"),
        expr("ssum DIV n_docs").as("mean_score_fx"),
        expr("np * 1000000 DIV n_docs").as("good_frac_e6"),
        expr("nl * 1000000 DIV n_docs").as("label_good_frac_e6"))
      .orderBy("registrable_domain")
  }

  def queries: Seq[Q] =
    Seq(domainExtract, domainExtractPsl, domainStats, domainReputation,
      domainFilter, domainQuality)
}
