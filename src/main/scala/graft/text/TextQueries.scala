package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.CheckpointOps
import graft.{Q, Tables}

/** Text-analysis operators for an LLM training-data pipeline (north-star
  * extensions, BASELINE.json): tokenization, token counting, quality
  * scoring, language ID, document fingerprinting. All are narrow per-row
  * transforms (plus one word-count aggregation) built from codegen'd
  * built-ins + higher-order array functions — no UDFs — so they scale
  * linearly with no shuffle except the final word-count groupBy.
  */
object TextQueries {

  private def toks: Column = split(col("text"), " ")

  // 32-bit cross-engine token hash — shared with dedup (graft.util.Hashes)
  private def tokHash(t: Column): Column = graft.util.Hashes.tokHash(t)
  private def sqlTokHash(t: String): String = graft.util.Hashes.sqlTokHash(t)

  /** Tokenize + corpus word count: explode is partition-local; only the
    * per-word partial counts shuffle (map-side combine). */
  private val textTokens = Q(
    "text_tokens",
    """SELECT word, count(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
      |) GROUP BY word
      |ORDER BY n DESC, word""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .select(explode(toks).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
  }

  /** Token counting two ways: whitespace split and a BPE-ish regex scan. */
  private val tokenCount = Q(
    "token_count",
    """SELECT doc_id,
      |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_re_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
          .cast("long").as("n_re_tokens"))
      .orderBy("doc_id")
  }

  /** Tokenizer-EXACT token accounting: per-doc BPE token counts under
    * the pinned merges table ([[Bpe]]) — what `mixture_plan_bpe` and
    * `pack_sequences_bpe` bill against, alongside `token_count`'s
    * cheap estimates. The whitespace count rides along so the
    * compression ratio (chars the merges saved) is read off one row.
    * One narrow projection, zero shuffle; the oracle replays the SAME
    * rank-ordered merge chain on the same builtins. */
  private val tokenCountBpe = Q(
    "token_count_bpe", {
      val m = Bpe.sqlMergedSymbols("text")
      s"""WITH m AS (SELECT doc_id, $m AS s FROM documents)
         |SELECT doc_id, ${Bpe.sqlCountFromMerged("s")} AS n_bpe_tokens
         |FROM m ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    Tables(s, dir).documents
      .select(col("doc_id"),
        Bpe.tokenCountNative(col("text")).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length/stopword-ratio heuristics. Ratios are
    * int/int divisions — exact on both engines. */
  private val textQuality = Q(
    "text_quality",
    """SELECT doc_id, n_chars,
      |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |       length(text) / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_token_span,
      |       CAST(len(list_filter(string_split(text, ' '),
      |                t -> t IN ('the', 'a'))) AS BIGINT)
      |         / CAST(len(string_split(text, ' ')) AS BIGINT) AS stopword_ratio,
      |       CASE WHEN len(string_split(text, ' ')) >= 20
      |                 AND CAST(len(list_filter(string_split(text, ' '),
      |                          t -> t IN ('the', 'a'))) AS BIGINT)
      |                     / CAST(len(string_split(text, ' ')) AS BIGINT) <= 0.5
      |            THEN 1 ELSE 0 END AS quality_pass
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val nTokens = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin("the", "a"))).cast("long")
    val stopRatio = nStop / nTokens
    Tables(s, dir).documents
      .select(
        col("doc_id"), col("n_chars"),
        nTokens.as("n_tokens"),
        (length(col("text")) / nTokens).as("avg_token_span"),
        stopRatio.as("stopword_ratio"),
        when(nTokens >= 20 && stopRatio <= 0.5, 1).otherwise(0)
          .as("quality_pass"))
      .orderBy("doc_id")
  }

  /** Language ID by marker-word counts with a deterministic argmax
    * (n-gram-heuristic family; marker lists kept tiny for oracle parity).
    */
  /** Pinned char-trigram language model — langid/fastText-class in
    * SHAPE (additive integer feature weights over character n-grams,
    * argmax over per-language scores), pinned-fixture in VALUES (the
    * weights are public-knowledge characteristic trigrams per
    * language, integer log-likelihood-ratio-style; production swaps
    * in a trained table). Single source of truth for the Spark side
    * AND the oracle — both replay these exact literals. */
  private[text] val LangModel: Seq[(String, Seq[(String, Int)])] = Seq(
    "en" -> Seq("the" -> 4, "and" -> 3, "ing" -> 3, "ion" -> 2, " a " -> 2),
    "fr" -> Seq(" le" -> 4, "les" -> 3, "ent" -> 2, "que" -> 3, "eur" -> 2),
    "es" -> Seq(" el" -> 4, "los" -> 3, "ado" -> 2, "nte" -> 2, "ara" -> 2),
    "de" -> Seq("der" -> 4, "sch" -> 3, "ein" -> 3, "und" -> 3, "ich" -> 2))

  /** Language ID — char-n-gram scoring with the pinned integer model
    * ([[LangModel]]): each language's score is Σ weight × occurrences
    * of its trigrams (non-overlapping left-to-right substring counts —
    * `(len(text) − len(remove(g)))/len(g)`, identical semantics on
    * both engines), predicted language is the deterministic argmax
    * (ties resolve in model order). One narrow projection of integer
    * arithmetic, zero shuffle, linear scans per trigram — the same
    * scan-bound posture as `token_count` at 100 TB. */
  /** DuckDB mirror of [[langScored]] (scores + argmax, no order) —
    * shared by `lang_id` and the `lang_id_confusion` audit. */
  private[text] def sqlLangScoredSelect: String = {
    val scores = LangModel.map { case (lang, grams) =>
      grams.map { case (g, w) =>
        val lit = g.replace("'", "''")
        s"$w * CAST((length(text) - length(replace(text, '$lit', ''))) // ${g.length} AS BIGINT)"
      }.mkString(" + ") + s" AS s_$lang"
    }.mkString(",\n         ")
    """SELECT doc_id, s_en, s_fr, s_es, s_de,
      |       CASE WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
      |            WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
      |            WHEN s_es >= s_de THEN 'es'
      |            ELSE 'de' END AS pred_lang
      |FROM (
      |  SELECT doc_id,
      |         """.stripMargin + scores + """
      |  FROM documents
      |)""".stripMargin
  }

  private val langId = Q(
    "lang_id", s"$sqlLangScoredSelect ORDER BY doc_id") { (s, dir) =>
    langScored(Tables(s, dir).documents).orderBy("doc_id")
  }

  /** [[LangModel]] scoring + argmax over any (doc_id, text) frame —
    * the `lang_id` body, factored so specs can plant texts. `keep`
    * names extra input columns to carry through (the confusion audit
    * rides the planted label along instead of self-joining the corpus
    * back on doc_id — one scan, no corpus-sized join). */
  private[text] def langScored(
      docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    def score(grams: Seq[(String, Int)]): Column =
      grams.map { case (g, w) =>
        (length(col("text")) - length(replace(col("text"), lit(g), lit(""))))
          .divide(lit(g.length)).cast("long") * lit(w.toLong)
      }.reduce(_ + _)
    docs
      .select(col("doc_id") +: keep.map(col) ++:
        LangModel.map { case (lang, grams) => score(grams).as(s"s_$lang") }: _*)
      .withColumn(
        "pred_lang",
        when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_es")
            && col("s_en") >= col("s_de"), "en")
          .when(col("s_fr") >= col("s_es") && col("s_fr") >= col("s_de"), "fr")
          .when(col("s_es") >= col("s_de"), "es")
          .otherwise("de"))
  }

  /** Document fingerprinting: whole-text md5, min-token-hash (1-function
    * MinHash), and a rolling polynomial hash over tokens
    * (h = (h*31 + tokHash) mod p) — the classic content-defined
    * fingerprint, folded left-to-right on both engines. */
  private val docFingerprint = Q(
    "doc_fingerprint",
    s"""SELECT doc_id,
       |       md5(text) AS content_hash,
       |       list_min(list_transform(string_split(text, ' '), t -> md5(t))) AS min_token_hash,
       |       list_reduce(
       |         list_prepend(CAST(0 AS BIGINT),
       |           list_transform(string_split(text, ' '),
       |                          t -> ${sqlTokHash("t")})),
       |         (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_hash
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // One native MD5 pass per token (TokenHashStats) instead of the
    // interpreted array_min(transform(md5)) + aggregate-fold pair that
    // digested every token twice through closure dispatch — the slowest
    // operator of the 10× scale stress before this (BASELINE.md). The
    // repartition still spreads the CPU across cores when the input is
    // one unsplittable row group (see DedupQueries.signatures).
    val stats = org.apache.spark.sql.graft.ColumnOps.tokenHashStats(toks)
    graft.util.Par.byKey(Tables(s, dir).documents, "doc_id")
      .select(
        col("doc_id"),
        md5(col("text")).as("content_hash"),
        stats.getField("min_token_hash").as("min_token_hash"),
        stats.getField("rolling_hash").as("rolling_hash"))
      .orderBy("doc_id")
  }

  /** PII redaction — a first-class pass in any LLM training-data
    * pipeline: regexp-scrub emails and phone-shaped digit runs before
    * anything downstream sees the text. Pure regexp_replace (narrow,
    * codegen'd, no shuffle), with patterns restricted to the regex
    * subset Java and RE2 interpret identically so the DuckDB oracle
    * checks the transform bit-exactly. Counts are emitted per doc so a
    * pipeline can audit redaction volume. */
  private[text] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[text] val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}"

  private val textPiiRedact = Q(
    "text_pii_redact",
    s"""SELECT doc_id,
       |       regexp_replace(
       |         regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
       |         '$PhoneRe', '<PHONE>', 'g') AS redacted,
       |       CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
       |       CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("redacted"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"))
      .orderBy("doc_id")
  }

  /** Document chunking into overlapping token windows (size 50, stride
    * 40) — the context-window preprocessing every LLM training pipeline
    * runs. Chunk i covers tokens [i·S, i·S + C); a doc with n tokens
    * yields ceil(max(n−C, 0)/S) + 1 chunks, so short docs yield exactly
    * one and every token lands in ≥1 chunk. Narrow explode — rows grow
    * by the chunk factor, bytes by the overlap factor, no shuffle. */
  private[graft] val ChunkSize = 50
  private[graft] val ChunkStride = 40

  private val textChunk = Q(
    "text_chunk", {
      val n = "len(string_split(text, ' '))"
      val nch = s"CAST((greatest($n - $ChunkSize, 0) + $ChunkStride - 1) // $ChunkStride + 1 AS BIGINT)"
      s"""SELECT doc_id, chunk_id,
         |       array_to_string(list_slice(toks,
         |         chunk_id * $ChunkStride + 1,
         |         chunk_id * $ChunkStride + $ChunkSize), ' ') AS chunk_text,
         |       CAST(len(list_slice(toks,
         |         chunk_id * $ChunkStride + 1,
         |         chunk_id * $ChunkStride + $ChunkSize)) AS BIGINT) AS n_chunk_tokens
         |FROM (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |         unnest(range(0, $nch)) AS chunk_id
         |  FROM documents
         |)
         |ORDER BY doc_id, chunk_id""".stripMargin
    }) { (s, dir) =>
    val n = size(col("toks"))
    val nch = (greatest(n - ChunkSize, lit(0)) + (ChunkStride - 1))
      .divide(ChunkStride).cast("int") + 1
    val chunk = slice(col("toks"),
      col("chunk_id").cast("int") * ChunkStride + 1, lit(ChunkSize))
    Tables(s, dir).documents
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), nch.cast("long") - 1)).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id"),
        array_join(chunk, " ").as("chunk_text"),
        size(chunk).cast("long").as("n_chunk_tokens"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Deterministic train/val/test assignment by content-independent
    * hash of the doc id (90/5/5): the split a training pipeline needs
    * to be stable across runs, partitions and engines — no rand(), no
    * row order dependence. */
  private val splitAssign = Q(
    "split_assign", {
      val bucket = s"${sqlTokHash("CAST(doc_id AS VARCHAR)")} % 100"
      s"""SELECT doc_id, CAST($bucket AS BIGINT) AS bucket,
         |       ${graft.util.Hashes.sqlSplitOf("doc_id")} AS split
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    Tables(s, dir).documents
      .select(
        col("doc_id"),
        pmod(tokHash(col("doc_id").cast("string")), lit(100L)).as("bucket"),
        graft.util.Hashes.splitOf(col("doc_id")).as("split"))
      .orderBy("doc_id")
  }

  /** Repetition-based quality filter (the Gopher/C4-family rule a
    * training pipeline runs next to [[textQuality]]): the fraction of
    * duplicated 2-gram windows per document. Boilerplate/spam repeats
    * itself; high dup_ratio docs get flagged. Narrow per-row transform
    * over the native Shingles windows — no shuffle, no UDF; the ratio
    * is int-derived and division-guarded, so both engines agree
    * bit-exactly. */
  private val textRepetition = Q(
    "text_repetition", {
      val grams = graft.dedup.DedupQueries.sqlNgramsOf("string_split(text, ' ')", 2)
      s"""SELECT doc_id,
         |       CAST(len($grams) AS BIGINT) AS n_bigrams,
         |       CAST(len(list_distinct($grams)) AS BIGINT) AS n_distinct,
         |       (CAST(len($grams) AS BIGINT) - CAST(len(list_distinct($grams)) AS BIGINT))
         |         / greatest(CAST(len($grams) AS BIGINT), 1) AS dup_ratio,
         |       CASE WHEN (CAST(len($grams) AS BIGINT) - CAST(len(list_distinct($grams)) AS BIGINT))
         |                 / greatest(CAST(len($grams) AS BIGINT), 1) > 0.2
         |            THEN 1 ELSE 0 END AS repetition_flag
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    val grams = org.apache.spark.sql.graft.ColumnOps.shingles(toks, 2)
    val n = size(grams).cast("long")
    val d = size(array_distinct(grams)).cast("long")
    val ratio = (n - d) / greatest(n, lit(1L))
    Tables(s, dir).documents
      .select(
        col("doc_id"),
        n.as("n_bigrams"),
        d.as("n_distinct"),
        ratio.as("dup_ratio"),
        when(ratio > 0.2, 1).otherwise(0).as("repetition_flag"))
      .orderBy("doc_id")
  }

  /** Domain-mixture resampling — the data-mixing step that tunes a
    * training corpus toward a TARGET source distribution (e.g. upweight
    * curated sources against web crawl): per-source acceptance
    * thresholds are DERIVED FROM THE DATA (target share over observed
    * share, capped at keep-everything), unlike [[sampleStratified]]'s
    * fixed rates. Target weights here are a deterministic 1..5 hash of
    * the source name (a stand-in for a supplied mixture config — the
    * mechanism, not the weights, is the operator). All arithmetic is
    * exact int64 (ppm thresholds via integer division, both engines
    * truncate) and each doc's fate is a content-independent hash —
    * run-stable, order-stable, engine-stable. Plan shape: one tiny
    * per-source count aggregate, thresholds broadcast back onto a
    * narrow corpus scan — at 100 TB the histogram is sources-sized and
    * the corpus never shuffles. */
  private val sampleDomainMix = Q(
    "sample_domain_mix", {
      val bucket = sqlTokHash("'mix:' || CAST(d.doc_id AS VARCHAR)")
      s"""WITH n AS (SELECT source, count(*) AS ns FROM documents GROUP BY source),
         |w AS (SELECT source, ns, 1 + ${sqlTokHash("source")} % 5 AS wt FROM n),
         |tot AS (SELECT sum(ns) AS N, sum(wt) AS W FROM w),
         |th AS (
         |  SELECT source,
         |         LEAST(1000000, (wt * N * 1000000) // (W * ns)) AS thresh
         |  FROM w, tot
         |)
         |SELECT d.doc_id, d.source, CAST(th.thresh AS BIGINT) AS thresh
         |FROM documents d JOIN th USING (source)
         |WHERE $bucket % 1000000 < th.thresh
         |ORDER BY d.doc_id""".stripMargin
    }) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val hist = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      .withColumn("wt", lit(1L) + pmod(tokHash(col("source")), lit(5L)))
    val tot = hist.agg(sum(col("ns")).as("N"), sum(col("wt")).as("W"))
    val th = hist.crossJoin(broadcast(tot))
      .select(col("source"),
        least(lit(1000000L), expr("(wt * N * 1000000) div (W * ns)"))
          .as("thresh"))
    val bucket =
      pmod(tokHash(concat(lit("mix:"), col("doc_id").cast("string"))),
        lit(1000000L))
    docs.join(broadcast(th), Seq("source"))
      .filter(bucket < col("thresh"))
      .select(col("doc_id"), col("source"), col("thresh"))
      .orderBy("doc_id")
  }

  /** Bigram collocation mining — the phrase-discovery pass a tokenizer /
    * vocab pipeline runs to promote high-lift adjacent pairs ("new york")
    * into single tokens. Score = corpus lift (pointwise mutual
    * information's exp), kept ENTIRELY in integer arithmetic:
    * lift_e6 = c(xy)·N·1e6 div (c(x)·c(y)) — monotone in PMI (log is
    * libm-dependent, the [[textTfidf]] lesson), exact on both engines,
    * and overflow-safe (c(xy) ≤ N < 2^31 keeps the product < 2^63).
    * Plan shape: one explode for unigram counts, one index-zip for
    * bigram counts (both map-side combined), two broadcast joins of the
    * bigram frame against the unigram counts, global top-50 — the final
    * ORDER BY sees only what survives, and at 100 TB the unigram/bigram
    * count frames are vocabulary-sized, not corpus-sized. */
  private val textCollocations = Q(
    "text_collocations",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |), flat AS (
      |  SELECT unnest(ts) AS w FROM toks
      |), uni AS (
      |  SELECT w, count(*) AS c FROM flat GROUP BY w
      |), tot AS (SELECT sum(c) AS N FROM uni),
      |bflat AS (
      |  SELECT ts[i] AS w1, ts[i+1] AS w2
      |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM toks)
      |), big AS (
      |  SELECT w1, w2, count(*) AS cxy FROM bflat GROUP BY w1, w2
      |), scored AS (
      |  SELECT w1, w2, cxy,
      |         (cxy * N * 1000000) // (u1.c * u2.c) AS lift_e6
      |  FROM big JOIN uni u1 ON big.w1 = u1.w JOIN uni u2 ON big.w2 = u2.w, tot
      |)
      |SELECT w1, w2, CAST(cxy AS BIGINT) AS cxy, CAST(lift_e6 AS BIGINT) AS lift_e6
      |FROM scored
      |ORDER BY lift_e6 DESC, w1, w2 LIMIT 50""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val uni = docs.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")).as("N"))
    // zip_with over (ts, tail(ts)) emits each adjacent pair in one
    // narrow pass; slice keeps the zip aligned and drops the dangling
    // last element.
    val pairs = docs.select(explode(
      zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
    val scored = big
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("cxy"),
        expr("(cxy * N * 1000000) div (c1 * c2)").as("lift_e6"))
    scored.orderBy(col("lift_e6").desc, col("w1"), col("w2")).limit(50)
  }

  /** Deterministic stratified sampling — per-source keep rates, decided
    * by a content-independent hash of (source, doc_id). The downsampling
    * step every corpus-mixing pipeline runs (e.g. web-heavy corpora
    * thinned against curated ones), made engine- and run-stable: no
    * rand(), no row-order dependence, and a doc's fate never changes
    * when other docs appear. Narrow scan, no shuffle; the hash is salted
    * with the source so strata draw independently. */
  private val sampleStratified = Q(
    "sample_stratified", {
      val bucket = s"${sqlTokHash("source || ':' || CAST(doc_id AS VARCHAR)")} % 100"
      val rate = "CASE WHEN source IN ('src0', 'src1') THEN 90 " +
        "WHEN source IN ('src2', 'src3', 'src4') THEN 50 ELSE 20 END"
      s"""SELECT doc_id, source, CAST($bucket AS BIGINT) AS bucket
         |FROM documents
         |WHERE $bucket < $rate
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    val bucket = pmod(
      tokHash(concat(col("source"), lit(":"), col("doc_id").cast("string"))),
      lit(100L))
    val rate = when(col("source").isin("src0", "src1"), 90)
      .when(col("source").isin("src2", "src3", "src4"), 50)
      .otherwise(20)
    Tables(s, dir).documents
      .select(col("doc_id"), col("source"), bucket.as("bucket"), rate.as("r"))
      .filter(col("bucket") < col("r"))
      .drop("r")
      .orderBy("doc_id")
  }

  /** Sequence packing — map each document onto the fixed-length token
    * stream a trainer consumes: docs are concatenated in doc_id order
    * within their train/val/test split, and every doc reports its start
    * offset and the [[SeqLen]]-token sequences it lands in. A per-split
    * running offset is a prefix sum, so the obvious ordered window
    * (`PARTITION BY split`, 3 distinct values) would funnel the whole
    * corpus through 3 tasks at scale. The declared query therefore runs
    * [[PackSequences.twoPhase]] — range-sort by (split, doc_id),
    * per-range token subtotals (metadata-sized), broadcast the exclusive
    * scan of subtotals back as per-range base offsets — which
    * PackSequencesSpec proves row-identical to the windowed reference at
    * any partition count. The DuckDB oracle keeps the windowed SQL form
    * (single-node, where the funnel is irrelevant); both sides describe
    * the same global (split, doc_id) concatenation order. */
  private[graft] val SeqLen = 2048

  /** The (doc_id, split, n_tokens) frame both packer forms consume;
    * `nTokens` is the billing column (whitespace estimate for
    * `pack_sequences`, tokenizer-exact [[Bpe]] for the `_bpe` twin). */
  private[text] def packInput(
      s: SparkSession, dir: String,
      nTokens: Column = size(toks).cast("long")): DataFrame =
    Tables(s, dir).documents
      .select(
        col("doc_id"),
        nTokens.as("n_tokens"),
        graft.util.Hashes.splitOf(col("doc_id")).as("split"))

  /** Oracle twin of the packer: windowed prefix-sum form over the
    * given per-doc token count SQL. */
  private def sqlPackSequences(nTok: String): String = {
    s"""WITH d AS (
         |  SELECT doc_id, $nTok AS n_tokens,
         |         ${graft.util.Hashes.sqlSplitOf("doc_id")} AS split
         |  FROM documents
         |), w AS (
         |  SELECT doc_id, split, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
         |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |              AS BIGINT) - n_tokens AS start_offset
         |  FROM d
         |)
         |SELECT doc_id, split, n_tokens, start_offset,
         |       CAST(start_offset // $SeqLen AS BIGINT) AS seq_first,
         |       CAST((start_offset + n_tokens - 1) // $SeqLen AS BIGINT) AS seq_last
         |FROM w
         |ORDER BY doc_id""".stripMargin
  }

  private val packSequences = Q(
    "pack_sequences",
    sqlPackSequences("CAST(len(string_split(text, ' ')) AS BIGINT)")) {
    (s, dir) =>
      PackSequences.twoPhase(s, packInput(s, dir), SeqLen)
        .select("doc_id", "split", "n_tokens", "start_offset",
          "seq_first", "seq_last")
        .orderBy("doc_id")
  }

  /** Sequence packing billed in TOKENIZER-EXACT counts ([[Bpe]]) —
    * the layout a training run actually materializes (whitespace
    * estimates mis-place every downstream boundary once one doc's
    * estimate is off). Identical two-phase distributed packer; only
    * the billing column changes. */
  private val packSequencesBpe = Q(
    "pack_sequences_bpe",
    sqlPackSequences(Bpe.sqlCountFromMerged(
      s"(${Bpe.sqlMergedSymbols("text")})"))) { (s, dir) =>
    PackSequences.twoPhase(
      s, packInput(s, dir, Bpe.tokenCountNative(col("text"))), SeqLen)
      .select("doc_id", "split", "n_tokens", "start_offset",
        "seq_first", "seq_last")
      .orderBy("doc_id")
  }

  private val DriftBuckets = 64L

  /** SPLIT DRIFT report — is the validation (or test) split still
    * distributionally representative of train? The check every
    * training pipeline should run beside `split_leakage`: per split,
    * a hashed-unigram distribution over [[DriftBuckets]] buckets (the
    * DSIR hashing argument — collisions average out, the frame stays
    * metadata-sized), then the TOTAL-VARIATION distance of each
    * non-train split against train. TV is exact integer work until
    * the single final division ([[graft.util.Det]]'s discipline):
    * Σ|n_s·T_train − n_train·T_s| over the bucket spine is an int64
    * sum of cross-multiplied counts (documented headroom: products
    * stay in-range below ~3·10⁹ tokens per split at the e0 scale used
    * here; a 100 TB corpus pre-scales counts per the staged-division
    * policy), divided once by 2·T_train·T_s into a double both
    * engines compute identically. Plan: one token pass → (split,
    * bucket) partial agg (≤ 3·64 rows), everything after is
    * metadata-sized joins over the 64-bucket spine. */
  private val splitDriftReport = Q(
    "split_drift_report", {
      s"""WITH d AS (
         |  SELECT ${graft.util.Hashes.sqlSplitOf("doc_id")} AS split,
         |         text
         |  FROM documents
         |), tok AS (
         |  SELECT split, unnest(string_split(text, ' ')) AS t FROM d
         |), b AS (
         |  SELECT split, ${sqlTokHash("t")} % $DriftBuckets AS bucket,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM tok GROUP BY split, bucket
         |), tot AS (
         |  SELECT split, CAST(sum(n) AS BIGINT) AS tt FROM b GROUP BY split
         |), spine AS (
         |  -- split set read off the metadata-sized totals, NOT a
         |  -- second corpus scan (every doc yields >= 1 token, so a
         |  -- split with docs always appears in tot)
         |  SELECT s.split, i.range AS bucket
         |  FROM (SELECT split FROM tot WHERE split <> 'train') s
         |  CROSS JOIN range(0, $DriftBuckets) i
         |), filled AS (
         |  SELECT spine.split, spine.bucket,
         |         coalesce(o.n, 0) AS n_s, coalesce(tr.n, 0) AS n_tr
         |  FROM spine
         |  LEFT JOIN b o ON o.split = spine.split AND o.bucket = spine.bucket
         |  LEFT JOIN (SELECT bucket, n FROM b WHERE split = 'train') tr
         |    ON tr.bucket = spine.bucket
         |)
         |SELECT f.split, t.tt AS n_tokens,
         |       CAST(sum(abs(f.n_s * trt.tt - f.n_tr * t.tt)) AS DOUBLE)
         |         / (2.0 * trt.tt * t.tt) AS tv
         |FROM filled f
         |JOIN tot t ON t.split = f.split
         |JOIN (SELECT tt FROM tot WHERE split = 'train') trt ON TRUE
         |GROUP BY f.split, t.tt, trt.tt
         |ORDER BY f.split""".stripMargin
    }) { (s, dir) =>
    val d = Tables(s, dir).documents
      .select(graft.util.Hashes.splitOf(col("doc_id")).as("split"),
        col("text"))
    // Pinned: b is referenced four times below (o-side, train-side,
    // totals, spine) and Catalyst does not CSE across joins — without
    // the cut each reference would re-run the corpus token pass.
    val b = d.select(col("split"), explode(toks).as("t"))
      .groupBy(col("split"),
        pmod(tokHash(col("t")), lit(DriftBuckets)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .cut(false)
    val tot = b.groupBy(col("split")).agg(sum(col("n")).as("tt"))
    // Spine splits from the metadata-sized totals — never a second
    // corpus scan (every doc yields >= 1 token, so tot covers every
    // populated split).
    val spine = tot.filter(col("split") =!= "train").select("split")
      .crossJoin(s.range(DriftBuckets).select(col("id").as("bucket")))
    val trainB = b.filter(col("split") === "train")
      .select(col("bucket"), col("n").as("n_tr_raw"))
    val filled = spine
      .join(b, Seq("split", "bucket"), "left")
      .join(broadcast(trainB), Seq("bucket"), "left")
      .select(col("split"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n_s"),
        coalesce(col("n_tr_raw"), lit(0L)).as("n_tr"))
    val trainT = tot.filter(col("split") === "train")
      .select(col("tt").as("t_tr"))
    filled
      .join(broadcast(tot), Seq("split"))
      .crossJoin(broadcast(trainT))
      .groupBy(col("split"), col("tt"), col("t_tr"))
      .agg(sum(abs(col("n_s") * col("t_tr") - col("n_tr") * col("tt")))
        .as("dsum"))
      .select(col("split"), col("tt").as("n_tokens"),
        (col("dsum").cast("double") / (lit(2.0) * col("t_tr") * col("tt")))
          .as("tv"))
      .orderBy("split")
  }

  /** Benchmark decontamination — flag training docs sharing any 3-gram
    * with a held-out corpus. The n-gram-overlap check every serious
    * pretraining pipeline runs before training. The benchmark is a
    * PINNED fixture — src0 docs with doc_id < [[BenchmarkMaxDocId]],
    * exactly 25 docs at every driver SF — matching the real deployment
    * shape: the eval set is fixed while the training corpus grows, so
    * the broadcast gram set is constant-size no matter how far the
    * corpus scales (a corpus-fraction benchmark would quietly grow the
    * broadcast past executor memory at 100 TB). Shape: broadcast hash
    * join of the benchmark's distinct shingles against the candidates'
    * per-doc distinct shingles, count shared grams per doc. Cost scales
    * with corpus shingle volume (one scan, one constant broadcast),
    * never corpus × benchmark. */
  // final literal — constant-folded at compile time, immune to
  // object-initialization order (DedupQueries' fuzzy-decontamination
  // oracle interpolates it; a plain val read 0 during init — the
  // MultimodalQueries cap incident, third occurrence).
  private[graft] final val BenchmarkMaxDocId = 500L

  private val textDecontaminate = Q(
    "text_decontaminate", {
      val grams = graft.dedup.DedupQueries.sqlNgramsOf("string_split(text, ' ')", 3)
      s"""WITH bench AS (
         |  SELECT DISTINCT unnest($grams) AS sh
         |  FROM documents WHERE source = 'src0' AND doc_id < $BenchmarkMaxDocId
         |), cand AS (
         |  SELECT doc_id, unnest(list_distinct($grams)) AS sh
         |  FROM documents WHERE NOT (source = 'src0' AND doc_id < $BenchmarkMaxDocId)
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM cand JOIN bench USING (sh)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val grams = org.apache.spark.sql.graft.ColumnOps.shingles(toks, 3)
    val inBench = col("source") === "src0" && col("doc_id") < BenchmarkMaxDocId
    val bench = docs.filter(inBench)
      .select(explode(grams).as("sh")).distinct()
    val cand = docs.filter(!inBench)
      .select(col("doc_id"), explode(array_distinct(grams)).as("sh"))
    cand.join(broadcast(bench), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  /** Cross-document boilerplate ("line") dedup, CCNet-family: segment
    * every document, count how many distinct documents each exact
    * segment appears in, drop segments above a document-frequency
    * threshold (navigation chrome, license headers, templated footers),
    * and reassemble the survivors in order. The driver corpus has no
    * newlines, so a "line" here is a deterministic 5-token segment —
    * the segmentation both engines compute identically; on real data
    * the splitter would be `split(text, '\n')` and nothing downstream
    * changes. Scale: segments shuffle once to count (map-side
    * combined), the boilerplate set is matched with a left ANTI join on
    * the segment key — no broadcast assumption, works even when the
    * boilerplate set is huge — and reassembly is one groupBy on doc_id. */
  private val textLineDedup = Q(
    "text_line_dedup",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), segs0 AS (
      |  SELECT doc_id, toks, unnest(range(0, (len(toks)-1)//5 + 1)) AS pos FROM t
      |), segs AS (
      |  SELECT doc_id, pos, array_to_string(toks[pos*5+1 : pos*5+5], ' ') AS seg
      |  FROM segs0
      |), boiler AS (
      |  SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 3
      |), kept AS (
      |  SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM boiler)
      |), re AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |         string_agg(seg, ' ' ORDER BY pos) AS clean_text
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |       CAST((len(string_split(d.text, ' ')) - 1) // 5 + 1 AS BIGINT) AS n_segs,
      |       coalesce(re.n_kept, 0) AS n_kept,
      |       coalesce(re.clean_text, '') AS clean_text
      |FROM documents d LEFT JOIN re ON d.doc_id = re.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val segs = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        posexplode(transform(
          sequence(lit(0), expr("(size(toks) - 1) div 5")),
          i => array_join(slice(col("toks"), i * 5 + 1, lit(5)), " "))))
      .withColumnsRenamed(Map("pos" -> "pos", "col" -> "seg"))
    val boiler = segs
      .groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 3)
      .select(col("seg"))
    val reassembled = segs
      .join(boiler, Seq("seg"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("seg")))),
            x => x.getField("seg")),
          " ").as("clean_text"))
    docs
      .select(
        col("doc_id"),
        expr("CAST((size(split(text, ' ')) - 1) div 5 + 1 AS BIGINT)")
          .as("n_segs"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Per-document top-3 salient terms by a tf·idf-family score. The
    * textbook score multiplies tf by ln(N/df), but ln() is libm-
    * dependent — the two engines can disagree in the last ulp and flip
    * a ranking — so the score here is the log-free exact-integer
    * variant `tf * 1e6 // df` (monotone in tf and in 1/df, computed
    * identically everywhere). Scale: tf is one (doc, term) groupBy; df
    * is a second groupBy on the already-tiny tf frame; the df side is
    * vocabulary-sized (Zipf: millions of terms at 100 TB, not
    * trillions) and is broadcast back onto tf; top-3 is a per-doc rank
    * window after the one doc-key shuffle. */
  private val textTfidf = Q(
    "text_tfidf",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
      |), df AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY term
      |), sc AS (
      |  SELECT doc_id, term, tf, df,
      |         CAST(tf * 1000000 // df AS BIGINT) AS score_ppm
      |  FROM tf JOIN df USING (term)
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |                               ORDER BY score_ppm DESC, term) AS rnk
      |  FROM sc
      |)
      |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, df, score_ppm
      |FROM r WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin) { (s, dir) =>
    val tf = Tables(s, dir).documents
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("term"))
    tf.join(broadcast(df), Seq("term"))
      .withColumn("score_ppm", expr("CAST(tf * 1000000 DIV df AS BIGINT)"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("doc_id", "rnk", "term", "tf", "df", "score_ppm")
      .orderBy("doc_id", "rnk")
  }

  /** Hard bound on the vocabulary table: ranks beyond this never leave
    * the engine, and — more important at scale — never reach the
    * single-task global window (see the two-level rank below).
    * `final` literal: compile-time constant, immune to object-init
    * order (the eager oracle SQL above interpolates it). */
  private[text] final val MaxVocab = 1000

  /** Buckets for the local pre-rank. 64 × [[MaxVocab]] is the worst-
    * case global-window input — metadata by construction, not by a
    * Zipf assumption. */
  private final val VocabBuckets = 64

  /** Vocabulary building: corpus term frequencies ranked with a running
    * coverage fraction — the "how many types cover 95% of tokens" table
    * every tokenizer-training run starts from, bounded to the top
    * [[MaxVocab]] types. Scale: the full-corpus work is the map-side-
    * combined term count plus one narrow scan for the token total; the
    * global rank window is then fed by a TWO-LEVEL rank — terms are
    * hash-bucketed and ranked per bucket in parallel, and only bucket-
    * local ranks ≤ MaxVocab survive (a global top-N term's local rank
    * is ≤ its global rank, so the prune is lossless) — bounding the
    * single-task window at VocabBuckets × MaxVocab rows REGARDLESS of
    * vocabulary size. (Round 6 relied on Zipf keeping the vocab small;
    * at 100 TB distinct-token counts are corpus-sized, so the bound is
    * now enforced, not assumed.) Coverage divides the exact running
    * sum by the exact corpus token total — bit-identical cross-engine;
    * the total is computed from the documents scan, NOT the pruned
    * frame, so coverage still means "fraction of ALL tokens". */
  private val textVocab = Q(
    "text_vocab",
    s"""WITH vc AS (
       |  SELECT term, count(*) AS n FROM (
       |    SELECT unnest(string_split(text, ' ')) AS term FROM documents
       |  ) GROUP BY term
       |), tot AS (
       |  SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total
       |  FROM documents
       |)
       |SELECT rank, term, n, cum_n,
       |       CAST(cum_n AS BIGINT) / total AS coverage
       |FROM (
       |  SELECT CAST(row_number() OVER wr AS BIGINT) AS rank,
       |         term, n,
       |         CAST(sum(n) OVER (wr ROWS BETWEEN UNBOUNDED PRECEDING
       |                                       AND CURRENT ROW) AS BIGINT) AS cum_n
       |  FROM vc
       |  WINDOW wr AS (ORDER BY n DESC, term)
       |) CROSS JOIN tot
       |WHERE rank <= $MaxVocab
       |ORDER BY rank""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val counts = docs
      .select(explode(toks).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
    val localW = Window.partitionBy(col("bucket"))
      .orderBy(col("n").desc, col("term"))
    val pruned = counts
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(VocabBuckets)))
      .withColumn("lr", row_number().over(localW))
      .filter(col("lr") <= MaxVocab)
      .drop("bucket", "lr")
    val total = docs.select(sum(size(toks)).as("total"))
    val w = Window.orderBy(col("n").desc, col("term"))
    val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pruned
      .select(
        row_number().over(w).cast("long").as("rank"),
        col("term"), col("n"),
        sum(col("n")).over(wcum).as("cum_n"))
      .filter(col("rank") <= MaxVocab)
      .crossJoin(broadcast(total))
      .select(
        col("rank"), col("term"), col("n"), col("cum_n"),
        (col("cum_n").cast("double") / col("total").cast("double"))
          .as("coverage"))
      .orderBy("rank")
  }

  /** Deterministic text normalization (casefold → strip non-alnum →
    * collapse whitespace → trim), the canonical pre-dedup cleanup
    * pass. The driver corpus is already clean, which would make the
    * query vacuous — so BOTH engines first apply the same
    * deterministic perturbation (uppercase, comma injection, framing
    * junk) and then normalize it away; the `restored` flag (norm ==
    * original) proves the normalizer exactly inverts the perturbation
    * rather than both sides agreeing on a no-op. Purely narrow: four
    * codegen'd string expressions per row, no shuffle but the final
    * declared-order sort. Regex is shared-dialect ([a-z0-9 ], ' +'),
    * identical under Java regex and DuckDB RE2. */
  private val textNormalize = Q(
    "text_normalize",
    """WITH raw AS (
      |  SELECT doc_id, text,
      |         '  ' || regexp_replace(upper(text), ' ', ' , ', 'g') || ' !!' AS raw_text
      |  FROM documents
      |), norm AS (
      |  SELECT doc_id, text, raw_text,
      |         trim(regexp_replace(regexp_replace(lower(raw_text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
      |  FROM raw
      |)
      |SELECT doc_id, norm_text,
      |       CAST(length(raw_text) AS BIGINT) AS n_raw,
      |       CAST(length(norm_text) AS BIGINT) AS n_norm,
      |       CAST(CASE WHEN norm_text = text THEN 1 ELSE 0 END AS INTEGER) AS restored
      |FROM norm ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val rawText = concat(lit("  "),
      regexp_replace(upper(col("text")), " ", " , "), lit(" !!"))
    val normText = trim(regexp_replace(
      regexp_replace(lower(col("raw_text")), "[^a-z0-9 ]", " "), " +", " "))
    Tables(s, dir).documents
      .withColumn("raw_text", rawText)
      .withColumn("norm_text", normText)
      .select(
        col("doc_id"), col("norm_text"),
        length(col("raw_text")).cast("long").as("n_raw"),
        length(col("norm_text")).cast("long").as("n_norm"),
        when(col("norm_text") === col("text"), 1).otherwise(0)
          .cast("int").as("restored"))
      .orderBy("doc_id")
  }

  private val sqlToks = "string_split(text, ' ')"

  /** The fixed keyword workload for [[searchBm25]]: (query_id, term)
    * rows — in production this is the (tiny) query batch, broadcast.
    * private[graft]: the hybrid-retrieval query
    * (graft.sim.SimilarityQueries) fuses rankings over the same
    * workload. */
  private[graft] val Bm25Queries: Seq[(Long, String)] = Seq(
    0L -> "spark", 0L -> "join", 0L -> "merge",
    1L -> "window", 1L -> "sort", 1L -> "key",
    2L -> "customer", 2L -> "query", 2L -> "fast",
    3L -> "stream", 3L -> "batch",
    4L -> "vector", 4L -> "hash", 4L -> "agg")

  /** BM25-family keyword retrieval: top-10 documents per query for a
    * broadcast batch of keyword queries — the lexical complement to
    * the embedding-side ANN cascade (`similarity_rerank`). Okapi shape
    * with k1=1.2, b=0.75, kept ENTIRELY in int64 like the rest of the
    * text family (no libm in a declared query): the tf-saturation
    * factor tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)) is
    * 22·tf·1e6 / ⌊(10·A·tf + 3·A + 9000·dl) / A⌋ in the e3 domain
    * (A = avgdl·1000; the denominator is reduced by A before the 1e6
    * numerator multiplies in, for int64 headroom — same staged
    * rounding both engines); idf uses the Robertson–Spärck-Jones odds
    * (2(N−df)+1)/(2df+1) ×1e6 floored — the log's argument, monotone
    * in it, so per-term ranking is preserved while staying exact.
    *
    * Scale: the query-term broadcast prunes the token stream BEFORE
    * the tf groupBy, so the only wide ops are a shuffle of matching
    * postings and the corpus-stats scan (one 1-row frame, broadcast
    * back). df derives from the pruned postings, never a full-vocab
    * aggregate. Per-query ranking windows are keyed by query_id over
    * candidate docs only. At 100 TB the postings groupBy IS the
    * inverted-index build for the queried terms; a standing index
    * table bucketed by term turns the probe into a pruned scan. */
  /** DuckDB CTE chain ending in `r(query_id, doc_id, score_ppm, rnk)`
    * — the full BM25 ranking over [[Bm25Queries]]; consumers apply
    * their own rank cutoff. Shared with the hybrid-retrieval fusion
    * (graft.sim.SimilarityQueries). */
  private[graft] def sqlBm25RankedCte: String = {
      val vals = Bm25Queries
        .map { case (q, t) => s"($q, '$t')" }.mkString(",")
      s"""WITH tok AS (
         |  SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS dl,
         |         unnest($sqlToks) AS term
         |  FROM documents
         |), q(query_id, term) AS (VALUES $vals),
         |tf AS (
         |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok WHERE term IN (SELECT term FROM q)
         |  GROUP BY doc_id, dl, term
         |), df AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
         |), stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         (CAST(sum(len($sqlToks)) AS BIGINT) * 1000)
         |           // CAST(count(*) AS BIGINT) AS avgdl_e3
         |  FROM documents
         |), contrib AS (
         |  SELECT q.query_id, tf.doc_id,
         |         (((2*(n - df) + 1) * 1000 // (2*df + 1))
         |          * ((22 * tf * 1000000)
         |             // ((10 * avgdl_e3 * tf + 3 * avgdl_e3 + 9000 * dl)
         |                // avgdl_e3))
         |         ) // 1000 AS c
         |  FROM q JOIN tf USING (term) JOIN df USING (term), stats
         |), scored AS (
         |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_ppm
         |  FROM contrib GROUP BY query_id, doc_id
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                              ORDER BY score_ppm DESC, doc_id) AS rnk
         |  FROM scored
         |)""".stripMargin
  }

  /** The full BM25 ranking frame (query_id, doc_id, score_ppm, rnk) —
    * the Spark twin of [[sqlBm25RankedCte]]; consumers apply their own
    * rank cutoff. */
  private[graft] def bm25Ranked(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qdf = Bm25Queries.toDF("query_id", "term")
    val docs = Tables(s, dir).documents
    val tok = docs.select(col("doc_id"),
      size(toks).cast("long").as("dl"), explode(toks).as("term"))
    // Checkpointed: consumed by BOTH the df aggregate (broadcast build)
    // and the scoring probe — without the pin the token explode +
    // groupBy (the one heavy pass) runs once per consumer. The frame
    // is query-term-pruned (≤ docs × |terms| rows), safe to pin.
    val postings = tok
      .join(broadcast(qdf.select("term").distinct()), Seq("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .cut(false)
    val dfFrame = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs
      .agg(count(lit(1)).cast("long").as("n"),
        sum(size(toks)).cast("long").as("t"))
      .select(col("n"), expr("t * 1000 DIV n").as("avgdl_e3"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
    postings
      .join(broadcast(dfFrame), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qdf), Seq("term"))
      // idf in the e3 domain, not e6: the rare-term idf grows ~670·N,
      // and idf × saturation (≤ 2.2e6) must stay inside int64 — e3
      // headroom reaches N ≈ 6e9 docs where e6 wrapped at ~6e6
      // (Spark ANSI-off wraps silently; DuckDB raises — both wrong).
      // The saturation denominator is REDUCED by avgdl_e3 before the
      // ×1e6 numerator multiplies in: the unreduced form's
      // 22·tf·avgdl_e3·1e6 wraps int64 once tf·avgdl_e3 > ~4.2e11
      // (avgdl ~1000 with a pathological tf > ~4e5 doc). Reduced, the
      // largest products are 22·tf·1e6 (safe to tf ~4e11) and
      // 10·avgdl_e3·tf (safe to tf·avgdl ~9e14) — beyond any physical
      // document. Staging mirrored verbatim in the oracle so both
      // engines floor identically.
      .withColumn("c", expr(
        """((2*(n - df) + 1) * 1000 DIV (2*df + 1))
          | * ((22 * tf * 1000000)
          |    DIV ((10 * avgdl_e3 * tf + 3 * avgdl_e3 + 9000 * dl)
          |         DIV avgdl_e3))
          | DIV 1000""".stripMargin))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).cast("long").as("score_ppm"))
      .withColumn("rnk", row_number().over(w).cast("long"))
  }

  private val searchBm25 = Q(
    "search_bm25",
    s"""$sqlBm25RankedCte
       |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rnk,
       |       doc_id, score_ppm
       |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin) { (s, dir) =>
    bm25Ranked(s, dir)
      .filter(col("rnk") <= 10)
      .select("query_id", "rnk", "doc_id", "score_ppm")
      .orderBy("query_id", "rnk")
  }

  /** C4/Gopher-style filter funnel report — the per-source accounting
    * a curation pipeline publishes with every corpus release: each doc
    * is attributed to the FIRST filter stage that drops it (too-short
    * → stopword-heavy → repetitive), survivors to `n_kept`, so the
    * stage columns + kept sum exactly to `n_docs`. The rules are the
    * `text_quality` / `text_repetition` thresholds re-expressed as
    * pure integer comparisons (2·n_stop > n_tokens ⇔ ratio > 0.5;
    * 5·dup > n ⇔ ratio > 0.2) so both engines compare exactly. ONE
    * narrow scan + a source-keyed map-side-combining aggregate — at
    * 100 TB the funnel costs a single pass, which is why real
    * pipelines compute it alongside the filter itself. */
  private val corpusFilterReport = Q(
    "corpus_filter_report", {
      val grams = graft.dedup.DedupQueries.sqlNgramsOf(sqlToks, 2)
      s"""WITH f AS (
         |  SELECT source,
         |         CAST(len($sqlToks) AS BIGINT) AS nt,
         |         CAST(len(list_filter($sqlToks,
         |                  t -> t IN ('the', 'a'))) AS BIGINT) AS nstop,
         |         CAST(len($grams) AS BIGINT) AS ng,
         |         CAST(len(list_distinct($grams)) AS BIGINT) AS nd
         |  FROM documents
         |), staged AS (
         |  SELECT source,
         |         CASE WHEN nt < 20 THEN 'short'
         |              WHEN 2 * nstop > nt THEN 'stopword'
         |              WHEN 5 * (ng - nd) > ng THEN 'repetition'
         |              ELSE 'kept' END AS stage
         |  FROM f
         |)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN stage = 'short' THEN 1 ELSE 0 END) AS BIGINT) AS drop_short,
         |       CAST(sum(CASE WHEN stage = 'stopword' THEN 1 ELSE 0 END) AS BIGINT) AS drop_stopword,
         |       CAST(sum(CASE WHEN stage = 'repetition' THEN 1 ELSE 0 END) AS BIGINT) AS drop_repetition,
         |       CAST(sum(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM staged GROUP BY source ORDER BY source""".stripMargin
    }) { (s, dir) =>
    val grams = org.apache.spark.sql.graft.ColumnOps.shingles(toks, 2)
    val nt = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin("the", "a"))).cast("long")
    val ng = size(grams).cast("long")
    val nd = size(array_distinct(grams)).cast("long")
    val stage = when(nt < 20, "short")
      .when(nStop * 2 > nt, "stopword")
      .when((ng - nd) * 5 > ng, "repetition")
      .otherwise("kept")
    Tables(s, dir).documents
      .select(col("source"), stage.as("stage"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("stage") === "short", 1L).otherwise(0L)).as("drop_short"),
        sum(when(col("stage") === "stopword", 1L).otherwise(0L)).as("drop_stopword"),
        sum(when(col("stage") === "repetition", 1L).otherwise(0L)).as("drop_repetition"),
        sum(when(col("stage") === "kept", 1L).otherwise(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** HTML/markup main-content extraction [EXT] — the first stage of
    * every web-scale corpus (the C4/RefinedWeb tag-strip +
    * boilerplate-removal step the rest of the text family assumes
    * already happened; the reference ingests clean JSON, so this is
    * pure north-star surface). Input is a PLANTED HTML twin of
    * `documents`, constructed by a deterministic tag wrap both engines
    * build identically (title/script/style head, nav boilerplate, an
    * id="main" content div holding an h1 and the document text, a
    * footer) — the `er_candidates` dirty-twin discipline applied to
    * markup. Extraction is the standard regex/stack-free pipeline:
    *
    *   1. drop script/style ELEMENTS with their content (code and CSS
    *      are not text);
    *   2. drop nav/footer boilerplate elements with their content (the
    *      main-content-extraction step — chrome is not content);
    *   3. strip every remaining tag to a space (inline tags must not
    *      weld adjacent words);
    *   4. squeeze whitespace, trim.
    *
    * Reported per doc: the extracted main text, html/text char counts,
    * and `markup_frac` — the fraction of bytes that were markup, the
    * signal a corpus owner thresholds on before `corpus_filter_report`
    * (the composition is spec-pinned: extraction exactly recovers the
    * planted content, so every downstream text operator runs on it
    * unchanged). Scale: one narrow whole-stage-codegen projection —
    * per-row regex over kB strings, zero shuffle before the final
    * order. All five patterns are shared verbatim with the DuckDB
    * oracle (lazy quantifiers — supported by both Java regex and RE2;
    * no dotall needed, the planted twin is single-line by
    * construction). */
  private[text] def htmlTwin: Column = concat(
    lit("<html><head><title>Doc "), col("doc_id").cast("string"),
    lit("</title><script type=\"text/javascript\">var docId = "),
    col("doc_id").cast("string"), lit("; track();</script>"),
    lit("<style>.main { margin: "), (col("doc_id") % 7).cast("string"),
    lit("px; }</style></head><body>"),
    lit("<nav><a href=\"/home\">home</a> <a href=\"/d/"),
    ((col("doc_id") * 7) % 101).cast("string"),
    lit("\">rel</a> <a href=\"/about\">about</a></nav>"),
    lit("<div id=\"main\"><h1>"), col("source"), lit(" "),
    col("doc_id").cast("string"), lit("</h1><p>"), col("text"),
    lit("</p></div><footer>(c) corpus "), col("lang"),
    lit("</footer></body></html>"))

  /** The extraction passes, shared with the oracle: element drops
    * (title/script/style head metadata and nav/footer boilerplate WITH
    * their content — none of it is body text), then the generic tag
    * strip. */
  private[text] val HtmlStripPatterns = Seq(
    "<title[^>]*>.*?</title>",
    "<script[^>]*>.*?</script>", "<style[^>]*>.*?</style>",
    "<nav>.*?</nav>", "<footer>.*?</footer>", "<[^>]*>")

  private[text] def htmlMainText(html: Column): Column =
    trim(regexp_replace(
      HtmlStripPatterns.foldLeft(html)((c, p) => regexp_replace(c, p, " ")),
      " +", " "))

  /** DuckDB mirror of [[htmlTwin]] as a CTE `h(doc_id, html)` — shared
    * by `text_html_extract` and `text_html_links` so the two oracles
    * cannot drift from one planted twin. */
  private[text] val sqlHtmlTwinCte: String =
    """WITH h AS (
      |  SELECT doc_id,
      |         '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
      |      || '</title><script type="text/javascript">var docId = '
      |      || CAST(doc_id AS VARCHAR) || '; track();</script>'
      |      || '<style>.main { margin: ' || CAST(doc_id % 7 AS VARCHAR)
      |      || 'px; }</style></head><body>'
      |      || '<nav><a href="/home">home</a> <a href="/d/'
      |      || CAST((doc_id * 7) % 101 AS VARCHAR)
      |      || '">rel</a> <a href="/about">about</a></nav>'
      |      || '<div id="main"><h1>' || source || ' '
      |      || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
      |      || '</p></div><footer>(c) corpus ' || lang
      |      || '</footer></body></html>' AS html
      |  FROM documents
      |)""".stripMargin

  private val textHtmlExtract = Q(
    "text_html_extract", {
      val stripped = HtmlStripPatterns.foldLeft("html")((c, p) =>
        s"regexp_replace($c, '$p', ' ', 'g')")
      // Concatenated AFTER each part's own stripMargin: interpolating
      // the already-stripped CTE into a string that strips again would
      // mangle its `||` concatenations (stripMargin eats up to the
      // first `|` of a continuation line).
      sqlHtmlTwinCte + s""", x AS (
         |  SELECT doc_id, html,
         |         trim(regexp_replace($stripped, ' +', ' ', 'g'))
         |           AS main_text
         |  FROM h
         |)
         |SELECT doc_id, main_text,
         |       CAST(length(html) AS BIGINT) AS html_chars,
         |       CAST(length(main_text) AS BIGINT) AS text_chars,
         |       CAST(length(html) - length(main_text) AS DOUBLE)
         |         / CAST(length(html) AS DOUBLE) AS markup_frac
         |FROM x ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    Tables(s, dir).documents
      .select(col("doc_id"), htmlTwin.as("html"))
      .select(col("doc_id"),
        htmlMainText(col("html")).as("main_text"),
        length(col("html")).cast("long").as("html_chars"))
      .withColumn("text_chars", length(col("main_text")).cast("long"))
      .withColumn("markup_frac",
        (col("html_chars") - col("text_chars")).cast("double") /
          col("html_chars").cast("double"))
      .orderBy("doc_id")
  }

  /** Outlink extraction over the planted HTML twin — the link-graph
    * stage of a web corpus (crawl frontier, link-based quality, URL
    * dedup all start from exactly this edge list). Extracts every
    * href, explodes to (doc, target) edges, and aggregates per-target
    * in-degree with the smallest referencing doc — the twin plants
    * two global chrome targets (every doc) and a doc-dependent
    * `/d/(7·doc_id mod 101)` target so the in-degree distribution has
    * both a head and a tail. Scale: one regex pass + one explode
    * (map-side) + one partial-agg shuffle on the target key; edges are
    * metadata-sized (3 per doc). */
  private val textHtmlLinks = Q(
    "text_html_links",
    sqlHtmlTwinCte + """, e AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(html, 'href="([^"]+)"', 1))
       |           AS target
       |  FROM h
       |)
       |SELECT target,
       |       CAST(count(*) AS BIGINT) AS in_degree,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       min(doc_id) AS min_doc
       |FROM e GROUP BY target ORDER BY target""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .select(col("doc_id"), htmlTwin.as("html"))
      .select(col("doc_id"), explode(
        expr("regexp_extract_all(html, 'href=\"([^\"]+)\"', 1)"))
        .as("target"))
      .groupBy(col("target"))
      .agg(
        count(lit(1)).as("in_degree"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_doc"))
      .orderBy("target")
  }

  /** URL canonicalization + exact URL dedup — the CommonCrawl-family
    * first pass: the same page arrives under casing variants, default
    * ports, `www.` prefixes, tracking parameters, fragments, and
    * trailing slashes, and a corpus must collapse them BEFORE content
    * dedup ever runs. Input is a planted raw-URL twin of `documents`
    * (deterministic, collision-bearing by construction: scheme casing
    * varies with doc_id%2, host variant with %4, `:443` with %5,
    * utm/ref query with %3, fragment with %7 — so several raw forms
    * map to one canonical page). Canonicalization, all shared-subset
    * regex + list ops: lowercase scheme and host, strip the default
    * `:443` port and the `www.` prefix, drop the fragment, drop
    * `utm_*` tracking params (keeping the rest of the query), strip
    * trailing path slashes. Output: one row per canonical URL with
    * its duplicate count, distinct raw-form count, and min-doc
    * survivor. Scale: one narrow projection + one partial-agg shuffle
    * on the canonical key. */
  /** DuckDB CTE chain ending in `canon(doc_id, text, raw_url,
    * canonical_url)` — the planted raw-URL twin plus its
    * canonicalization, shared by `text_url_canonicalize` and the
    * `corpus_dedup_funnel` composition so the two cannot drift. */
  private[text] val sqlCanonCte: String =
    """WITH u AS (
      |  SELECT doc_id, text,
      |         (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END)
      |      || '://'
      |      || (CASE doc_id % 4 WHEN 0 THEN 'WWW.Example.COM'
      |                          WHEN 1 THEN 'www.example.com'
      |                          WHEN 2 THEN 'example.com'
      |                          ELSE 'Example.Com' END)
      |      || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
      |      || '/' || source || '/item-' || CAST(doc_id % 40 AS VARCHAR)
      |      || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
      |      || (CASE doc_id % 3
      |            WHEN 0 THEN '?utm_source=feed&utm_campaign=c'
      |                        || CAST(doc_id % 7 AS VARCHAR)
      |            WHEN 1 THEN '?ref=' || CAST(doc_id % 2 AS VARCHAR)
      |                        || '&utm_medium=social'
      |            ELSE '' END)
      |      || (CASE WHEN doc_id % 7 = 0
      |               THEN '#sec-' || CAST(doc_id AS VARCHAR) ELSE '' END)
      |           AS raw_url
      |  FROM documents
      |), parts AS (
      |  SELECT doc_id, text, raw_url,
      |         lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) AS scheme,
      |         regexp_replace(regexp_replace(
      |           lower(regexp_extract(raw_url, '^[A-Za-z]+://([^/?#]+)', 1)),
      |           ':443$', ''), '^www\.', '') AS host,
      |         regexp_replace(
      |           regexp_extract(raw_url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
      |           '/+$', '') AS path,
      |         coalesce(array_to_string(list_filter(
      |           string_split(regexp_extract(raw_url, '\?([^#]*)', 1), '&'),
      |           p -> p <> '' AND NOT starts_with(p, 'utm_')), '&'), '')
      |           AS q
      |  FROM u
      |), canon AS (
      |  SELECT doc_id, text, raw_url,
      |         scheme || '://' || host ||
      |         (CASE WHEN path = '' THEN '/' ELSE path END) ||
      |         (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canonical_url
      |  FROM parts
      |)""".stripMargin

  /** The Spark twin of [[sqlCanonCte]]: documents →
    * (doc_id, text, raw_url, canonical_url). `keep` names extra input
    * columns to carry through (the curation pipeline rides lang/source
    * along instead of joining the corpus back on doc_id). */
  private[text] def canonicalUrls(
      docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val rawUrl = concat(
      when(col("doc_id") % 2 === 0, "https").otherwise("HTTPS"),
      lit("://"),
      when(col("doc_id") % 4 === 0, "WWW.Example.COM")
        .when(col("doc_id") % 4 === 1, "www.example.com")
        .when(col("doc_id") % 4 === 2, "example.com")
        .otherwise("Example.Com"),
      when(col("doc_id") % 5 === 0, ":443").otherwise(""),
      lit("/"), col("source"), lit("/item-"),
      (col("doc_id") % 40).cast("string"),
      when(col("doc_id") % 6 === 0, "/").otherwise(""),
      when(col("doc_id") % 3 === 0,
        concat(lit("?utm_source=feed&utm_campaign=c"),
          (col("doc_id") % 7).cast("string")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("?ref="), (col("doc_id") % 2).cast("string"),
            lit("&utm_medium=social")))
        .otherwise(""),
      when(col("doc_id") % 7 === 0,
        concat(lit("#sec-"), col("doc_id").cast("string"))).otherwise(""))
    val scheme = lower(regexp_extract(col("raw_url"), "^([A-Za-z]+)://", 1))
    val host = regexp_replace(regexp_replace(
      lower(regexp_extract(col("raw_url"), "^[A-Za-z]+://([^/?#]+)", 1)),
      ":443$", ""), "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(col("raw_url"), "^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    val q = array_join(filter(
      split(regexp_extract(col("raw_url"), "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_")), "&")
    docs
      .select(col("doc_id") +: keep.map(col) :+ col("text")
        :+ rawUrl.as("raw_url"): _*)
      .select(col("doc_id") +: keep.map(col) :+ col("text")
        :+ col("raw_url") :+
        concat(scheme, lit("://"), host,
          when(path === "", "/").otherwise(path),
          when(q === "", "").otherwise(concat(lit("?"), q)))
          .as("canonical_url"): _*)
  }

  private val textUrlCanonicalize = Q(
    "text_url_canonicalize",
    sqlCanonCte + """
      |SELECT canonical_url,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(count(DISTINCT raw_url) AS BIGINT) AS n_raw_forms,
      |       min(doc_id) AS survivor_doc
      |FROM canon GROUP BY canonical_url
      |ORDER BY canonical_url""".stripMargin) { (s, dir) =>
    canonicalUrls(Tables(s, dir).documents)
      .groupBy(col("canonical_url"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("raw_url")).as("n_raw_forms"),
        min(col("doc_id")).as("survivor_doc"))
      .orderBy("canonical_url")
  }

  /** The DEDUP FUNNEL — the pipeline-order composition report: URL
    * dedup FIRST (cheap metadata equality on the canonical page key),
    * exact content dedup SECOND on the URL survivors (md5 of the
    * text) — the order every web corpus runs, because a page's
    * thousand tracking-parameter aliases should never reach content
    * hashing. One row per stage with docs in, docs out, and removed —
    * the table a corpus owner reads to see where volume actually
    * dies. Survivorship is min-doc per key at both stages (the
    * family's rule). Scale: stage 1 is one partial-agg shuffle on the
    * canonical key; stage 2 hashes only the SURVIVOR frame (the
    * composition is the point: content hashing runs on the
    * already-URL-deduped corpus); the report is 2 rows. */
  private val corpusDedupFunnel = Q(
    "corpus_dedup_funnel",
    sqlCanonCte + """, surv AS (
      |  SELECT min(doc_id) AS doc_id FROM canon GROUP BY canonical_url
      |), s1 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(count(DISTINCT canonical_url) AS BIGINT) AS n_url
      |  FROM canon
      |), s2 AS (
      |  SELECT CAST(count(DISTINCT md5(c.text)) AS BIGINT) AS n_content
      |  FROM canon c JOIN surv USING (doc_id)
      |)
      |SELECT stage, n_in, n_out, n_in - n_out AS n_removed FROM (
      |  SELECT '1_url_exact' AS stage, n_docs AS n_in, n_url AS n_out
      |  FROM s1
      |  UNION ALL
      |  SELECT '2_content_exact', n_url, n_content FROM s1 CROSS JOIN s2
      |) ORDER BY stage""".stripMargin) { (s, dir) =>
    val canon = canonicalUrls(Tables(s, dir).documents)
    val surv = canon.groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val s1 = canon.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("canonical_url")).as("n_url"))
    val s2 = canon.join(surv, Seq("doc_id"), "left_semi")
      .agg(countDistinct(md5(col("text"))).as("n_content"))
    val both = s1.crossJoin(broadcast(s2))
    both.select(lit("1_url_exact").as("stage"),
        col("n_docs").as("n_in"), col("n_url").as("n_out"))
      .unionByName(both.select(lit("2_content_exact").as("stage"),
        col("n_url").as("n_in"), col("n_content").as("n_out")))
      .withColumn("n_removed", col("n_in") - col("n_out"))
      .orderBy("stage")
  }

  /** Language-ID CONFUSION audit — the evidence query behind `lang_id`
    * (the `er_quality` discipline applied to the classifier): cross the
    * model's prediction with the corpus's planted `lang` label and
    * report the confusion matrix plus per-cell hit flags. The corpus
    * plants five labels while the pinned model knows four, so the audit
    * honestly shows where `zh` lands (forced mispredictions) and what
    * the per-language accuracy actually is — what an operator reads
    * before trusting lang-ID-based filtering at corpus scale. One
    * narrow scoring pass + one tiny groupBy; matrix-sized output. */
  private val langIdConfusion = Q(
    "lang_id_confusion",
    s"""WITH scored AS ($sqlLangScoredSelect)
       |SELECT d.lang AS true_lang, s.pred_lang,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(CASE WHEN d.lang = s.pred_lang THEN 1 ELSE 0 END
       |            AS INTEGER) AS hit
       |FROM documents d JOIN scored s USING (doc_id)
       |GROUP BY d.lang, s.pred_lang
       |ORDER BY true_lang, pred_lang""".stripMargin) { (s, dir) =>
    langScored(Tables(s, dir).documents, keep = Seq("lang"))
      .select(col("lang").as("true_lang"), col("pred_lang"))
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        when(col("true_lang") === col("pred_lang"), 1).otherwise(0)
          .cast("int").as("hit"))
      .orderBy("true_lang", "pred_lang")
  }

  /** Per-document unigram-LM cross-entropy — the CCNet-family quality
    * signal: score each document by how surprising its tokens are under
    * a language model trained on the corpus itself (boilerplate and
    * repeated spam score low; rare-token noise scores high). The model
    * is add-one-smoothed unigram counts; a token with corpus count c
    * has surprisal log2((N+V)/(c+1)). Per repo policy, no libm log ever
    * runs: surprisal is quantized to WHOLE BITS via binary-string
    * length — `length(bin(x))` = floor(log2 x)+1, exact int64 on both
    * engines — and the doc score is mean whole-bit surprisal ×1000.
    * Monotone in true surprisal per token, engine-deterministic.
    *
    * Scale: one (doc, term) groupBy over the token stream (map-side
    * combined); corpus counts derive from THAT frame (vocabulary-sized,
    * Zipf-bounded — never a second token pass), broadcast back like
    * text_tfidf's df; totals are a 1-row cross join. The only
    * corpus-sized shuffles are the two groupBys every scoring pass
    * needs. */
  /** DuckDB CTE chain ending in `ppx(doc_id, n_tokens, sum_bits,
    * bits_e3)` — shared by text_perplexity_bits and the tier report. */
  private val sqlPerplexityCte: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), dt AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS k
      |  FROM tok GROUP BY doc_id, term
      |), vc AS (
      |  SELECT term, CAST(sum(k) AS BIGINT) AS cnt FROM dt GROUP BY term
      |), tot AS (
      |  SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
      |  FROM vc
      |), ppx AS (
      |  SELECT dt.doc_id,
      |         CAST(sum(dt.k) AS BIGINT) AS n_tokens,
      |         CAST(sum(dt.k * length(bin((tot.n + tot.v) // (vc.cnt + 1))))
      |           AS BIGINT) AS sum_bits,
      |         CAST(sum(dt.k * length(bin((tot.n + tot.v) // (vc.cnt + 1))))
      |           * 1000 // sum(dt.k) AS BIGINT) AS bits_e3
      |  FROM dt JOIN vc USING (term) CROSS JOIN tot
      |  GROUP BY dt.doc_id
      |)""".stripMargin

  /** The per-doc unigram surprisal frame (Spark twin of
    * [[sqlPerplexityCte]]), unordered. */
  private[graft] def perplexityFrame(t: Tables): DataFrame = {
    val dt = t.documents
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("k"))
    val vc = dt.groupBy(col("term")).agg(sum(col("k")).as("cnt"))
    val tot = vc.agg(sum(col("cnt")).as("n"), count(lit(1)).as("v"))
    dt.join(broadcast(vc), Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("bits", expr("length(bin((n + v) DIV (cnt + 1)))"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("k")).as("n_tokens"),
        sum(col("k") * col("bits")).cast("long").as("sum_bits"))
      .withColumn("bits_e3", expr("sum_bits * 1000 DIV n_tokens"))
  }

  private val textPerplexityBits = Q(
    "text_perplexity_bits",
    s"""$sqlPerplexityCte
       |SELECT doc_id, n_tokens, sum_bits, bits_e3
       |FROM ppx ORDER BY doc_id""".stripMargin) { (s, dir) =>
    perplexityFrame(Tables(s, dir))
      .select("doc_id", "n_tokens", "sum_bits", "bits_e3")
      .orderBy("doc_id")
  }

  /** Bigram-LM twin of [[textPerplexityBits]] — conditional surprisal
    * log2(P(cur|prev)) under add-one smoothing over the corpus bigram
    * table: bits(prev,cur) = floor-log2((c(prev·) + V) / (c(prev,cur)
    * + 1)) via the same exact binary-length trick; doc score = mean
    * whole-bit conditional surprisal ×1000 over the doc's bigram
    * instances (docs with <2 tokens have no bigrams and drop out, as
    * in the oracle). The context-sensitive quality signal: templated
    * boilerplate scores even lower than under the unigram model, while
    * shuffled-token spam — invisible to unigrams — scores high.
    * Scale: per-doc bigram counts are one groupBy over the adjacent-
    * pair stream (zip_with, narrow); the bigram and left-context
    * models derive from THAT frame; vocabulary is Zipf-bounded and the
    * model joins broadcast exactly like text_tfidf/text_collocations. */
  private val textBigramBits = Q(
    "text_bigram_bits",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |), dbgf AS (
      |  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
      |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks)
      |), dbg AS (
      |  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS k
      |  FROM dbgf GROUP BY doc_id, w1, w2
      |), big AS (
      |  SELECT w1, w2, CAST(sum(k) AS BIGINT) AS cnt2 FROM dbg GROUP BY w1, w2
      |), lft AS (
      |  SELECT w1, CAST(sum(cnt2) AS BIGINT) AS cnt1 FROM big GROUP BY w1
      |), voc AS (
      |  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
      |  FROM (SELECT unnest(ts) AS w FROM toks)
      |), sc AS (
      |  SELECT dbg.doc_id, dbg.k,
      |         length(bin((lft.cnt1 + voc.v) // (big.cnt2 + 1))) AS bits
      |  FROM dbg JOIN big USING (w1, w2) JOIN lft USING (w1) CROSS JOIN voc
      |)
      |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
      |       CAST(sum(k * bits) AS BIGINT) AS sum_bits,
      |       CAST(sum(k * bits) * 1000 // sum(k) AS BIGINT) AS bits_e3
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val dbg = docs.select(col("doc_id"), explode(
      zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("k"))
    val big = dbg.groupBy(col("w1"), col("w2")).agg(sum(col("k")).as("cnt2"))
    val lft = big.groupBy(col("w1")).agg(sum(col("cnt2")).as("cnt1"))
    val voc = docs.select(explode(toks).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    dbg.join(broadcast(big), Seq("w1", "w2"))
      .join(broadcast(lft), Seq("w1"))
      .crossJoin(broadcast(voc))
      .withColumn("bits", expr("length(bin((cnt1 + v) DIV (cnt2 + 1)))"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("k")).as("n_bigrams"),
        sum(col("k") * col("bits")).cast("long").as("sum_bits"))
      .withColumn("bits_e3", expr("sum_bits * 1000 DIV n_bigrams"))
      .orderBy("doc_id")
  }

  /** Deterministic uniform k-sample — the distributed equivalent of
    * reservoir sampling: rank every doc by a content-independent hash
    * of its key and keep the k smallest. Same fate for the same doc on
    * every run and every cluster size (no rand(), no partition-order
    * dependence), uniform because md5 is uniform over keys. Scale: the
    * cut is TakeOrderedAndProject — each partition keeps a local
    * k-heap and only k rows per partition reach the driver-side merge;
    * no global sort, no shuffle of the corpus. The eval-set carve-out
    * every training pipeline needs ("sample 10k docs for human
    * review") with audit-reproducible membership. */
  private val sampleUniformHash = Q(
    "sample_uniform_hash",
    """SELECT doc_id, source, n_chars
      |FROM documents
      |ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |LIMIT 100""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(100)
  }

  /** Perplexity-decile tier report — CCNet's head/middle/tail bucketing
    * generalized to ten tiers: every doc ranked by its unigram
    * surprisal ([[perplexityFrame]]), deciles cut by GLOBAL rank, and
    * each tier reported with its doc count, token mass, and surprisal
    * range — the table a curriculum or filtering decision reads.
    *
    * The scale point is HOW the global rank is computed: a naive
    * `ntile(10) OVER (ORDER BY score)` is a single-partition window
    * over the corpus — the anti-pattern text_vocab's two-level rank
    * exists to avoid. Here the rank decomposes exactly: a per-SCORE
    * rank (window partitioned by bits_e3 — distributed), plus a
    * cumulative base per score from the score HISTOGRAM (metadata-
    * sized: one row per distinct surprisal value, windowed in one
    * task, broadcast back). global_rank = base(score) + rank-in-score
    * reproduces `row_number() OVER (ORDER BY bits_e3, doc_id)`
    * bit-exactly — the oracle computes it with the naive global window
    * and must agree. tier = (rank-1)·10 div n. */
  private val textQualityTiers = Q(
    "text_quality_tiers",
    s"""$sqlPerplexityCte, r AS (
       |  SELECT n_tokens, bits_e3,
       |         row_number() OVER (ORDER BY bits_e3, doc_id) AS grank,
       |         count(*) OVER () AS n
       |  FROM ppx
       |)
       |SELECT CAST((grank - 1) * 10 // n AS BIGINT) AS tier,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |       min(bits_e3) AS min_bits_e3, max(bits_e3) AS max_bits_e3
       |FROM r GROUP BY (grank - 1) * 10 // n
       |ORDER BY tier""".stripMargin) { (s, dir) =>
    val ppx = perplexityFrame(Tables(s, dir)).cut()
    val inScore = Window.partitionBy(col("bits_e3")).orderBy(col("doc_id"))
    val hist = ppx.groupBy(col("bits_e3")).agg(count(lit(1)).as("c"))
    val byScore = Window.orderBy(col("bits_e3"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val bases = hist
      .select(col("bits_e3"), coalesce(sum(col("c")).over(byScore), lit(0L))
        .as("base"))
    val tot = ppx.agg(count(lit(1)).as("n"))
    ppx
      .withColumn("rn", row_number().over(inScore).cast("long"))
      .join(broadcast(bases), Seq("bits_e3"))
      .crossJoin(broadcast(tot))
      .withColumn("grank", col("base") + col("rn"))
      .withColumn("tier", expr("(grank - 1) * 10 DIV n"))
      .groupBy(col("tier"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        min(col("bits_e3")).as("min_bits_e3"),
        max(col("bits_e3")).as("max_bits_e3"))
      .orderBy("tier")
  }

  /** Token-budget mixture planning — the step between corpus profiling
    * and `sample_domain_mix`'s per-doc sampling: given the measured
    * per-source token mass, plan a training run with an equal-weight
    * target mixture over a budget of half the corpus tokens. Emits per
    * source its token share, the target token count, the sampling rate
    * (≤ 1000 e3 = downsample) and the epoch multiplier (> 1000 e3 =
    * repeat the source). All arithmetic is exact int64 at e3 scale —
    * x·1000 stays in-range below 9.2e15 tokens (≈ 400× a 100 TB
    * corpus's token mass, documented headroom per the staged-division
    * policy). Plan: one corpus scan → per-source partial-agg groupBy
    * (sources are few: the grouped frame is metadata), one broadcast
    * totals join. At 100 TB this is a single aggregation pass — the
    * cheapest query in the curation suite, run before every mixture
    * decision. */
  /** The shared plan body: per-source (n_docs, n_tokens) → shares,
    * targets, sampling rates. Both the estimate-token and BPE-token
    * mixture queries feed it; the token definition is the ONLY
    * difference between them. */
  private def mixturePlanFrom(per: DataFrame): DataFrame = {
    val tot = per.agg(sum(col("n_tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000 DIV total_tokens").as("share_e3"),
        expr("total_tokens DIV 2 DIV n_sources").as("target_tokens"),
        least(lit(1000L),
          expr("(total_tokens DIV 2 DIV n_sources) * 1000 DIV n_tokens"))
          .as("rate_e3"),
        expr("(total_tokens DIV 2 DIV n_sources) * 1000 DIV n_tokens")
          .as("epochs_e3"))
      .orderBy("source")
  }

  /** Oracle twin of [[mixturePlanFrom]]: takes the SQL for the per-doc
    * token count and emits the full plan query. */
  private def sqlMixturePlan(perDocTokens: String): String =
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum($perDocTokens) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source
       |), tot AS (
       |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |         count(*) AS n_sources
       |  FROM per
       |)
       |SELECT source, n_docs, n_tokens,
       |       CAST(n_tokens * 1000 // total_tokens AS BIGINT) AS share_e3,
       |       CAST(total_tokens // 2 // n_sources AS BIGINT) AS target_tokens,
       |       CAST(least(1000, (total_tokens // 2 // n_sources) * 1000 // n_tokens)
       |            AS BIGINT) AS rate_e3,
       |       CAST((total_tokens // 2 // n_sources) * 1000 // n_tokens
       |            AS BIGINT) AS epochs_e3
       |FROM per CROSS JOIN tot
       |ORDER BY source""".stripMargin

  private val mixturePlan = Q(
    "mixture_plan",
    sqlMixturePlan("len(string_split(text, ' '))")) { (s, dir) =>
    mixturePlanFrom(Tables(s, dir).documents
      .select(col("source"), size(toks).cast("long").as("tk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("n_tokens")))
  }

  /** The mixture plan billed in TOKENIZER-EXACT counts ([[Bpe]]) —
    * the production budget (a source whose docs compress well under
    * the merges weighs measurably less than its whitespace estimate,
    * shifting shares and epoch rates). Same single-pass plan shape as
    * `mixture_plan`; only the per-doc count expression changes. */
  private val mixturePlanBpe = Q(
    "mixture_plan_bpe",
    sqlMixturePlan(Bpe.sqlCountFromMerged(
      s"(${Bpe.sqlMergedSymbols("text")})"))) { (s, dir) =>
    mixturePlanFrom(Tables(s, dir).documents
      .select(col("source"), Bpe.tokenCountNative(col("text")).as("tk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("n_tokens")))
  }

  /** TEMPERATURE-resampled mixture (the multilingual α-sampling rule,
    * Conneau & Lample 2019 / XLM-R: sample source i proportional to
    * p_i^α with α < 1, boosting tails and flattening heads so
    * low-resource slices aren't drowned). α = 1/2, integerized
    * exactly: the √-weight is `isqrt(n_tokens·10^6)` — the ±1-fixed
    * integer sqrt ([[graft.util.Det.isqrt]], = 10^3·√n_tokens), so
    * shares come out of exact BIGINT sums (no floating Σ over a
    * nondeterministic row order; exact while per-source tokens stay
    * under 2^62/10^6 ≈ 4.6·10^12 — [[graft.util.Det.isqrt]]'s single
    * ±1 fixup and its overflow-free (s0+1)² probe are only guaranteed
    * below 2^62; still far above any real source). A source holding
    * < 1 ppm of total tokens floors share_e6 to 0, so boost_e6 guards
    * the denominator with greatest(·,1) on BOTH engines — Spark DIV
    * would return NULL where DuckDB // raises, and the guard keeps
    * degenerate tails identical cross-engine. Per
    * source: raw share, temperature share, and the boost ratio the
    * resampling applies (tail sources read boost_e6 > 10^6, heads
    * < 10^6). Same single-pass shape as `mixture_plan`: one partial
    * agg on source, 1-row broadcast totals, output is
    * source-cardinality metadata. */
  private val mixtureTemperature = Q(
    "mixture_temperature", {
      val w = graft.util.Det.sqlIsqrt("n_tokens * 1000000")
      s"""WITH per AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         |           AS n_tokens
         |  FROM documents GROUP BY source
         |), wts AS (
         |  SELECT source, n_docs, n_tokens,
         |         CAST($w AS BIGINT) AS w
         |  FROM per
         |), tot AS (
         |  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
         |         CAST(sum(w) AS BIGINT) AS tot_w
         |  FROM wts
         |)
         |SELECT source, n_docs, n_tokens,
         |       CAST(n_tokens * 1000000 // tot_tokens AS BIGINT)
         |         AS share_e6,
         |       CAST(w * 1000000 // tot_w AS BIGINT) AS temp_share_e6,
         |       CAST((w * 1000000 // tot_w) * 1000000
         |            // greatest(n_tokens * 1000000 // tot_tokens, 1)
         |            AS BIGINT)
         |         AS boost_e6
         |FROM wts CROSS JOIN tot ORDER BY source""".stripMargin
    }) { (s, dir) =>
    val per = Tables(s, dir).documents
      .select(col("source"), size(toks).cast("long").as("tk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("n_tokens"))
      .withColumn("w", graft.util.Det.isqrt(col("n_tokens") * 1000000L))
    val tot = per.agg(sum(col("n_tokens")).as("tot_tokens"),
      sum(col("w")).as("tot_w"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000000 DIV tot_tokens").as("share_e6"),
        expr("w * 1000000 DIV tot_w").as("temp_share_e6"),
        expr("(w * 1000000 DIV tot_w) * 1000000 " +
          "DIV greatest(n_tokens * 1000000 DIV tot_tokens, 1)")
          .as("boost_e6"))
      .orderBy("source")
  }

  /** Tokenizer FERTILITY audit — the multilingual-fairness table
    * (Ács 2019 / the XLM-R tokenizer literature): how many subword
    * tokens the pinned BPE spends per whitespace word, per language.
    * A language with high fertility pays more sequence length for the
    * same text — the signal that drives vocab rebalancing and the
    * α-sampling `mixture_temperature` applies. Per lang: docs,
    * whitespace words, BPE tokens (the exact pinned-merge kernel the
    * billing queries share), fertility in e3 (BPE per word) and
    * chars-per-BPE-token in e3 — all exact integer ratios. Plan: one
    * narrow pass, both token counts ride the same projection into one
    * partial agg on lang; output is language-cardinality metadata. */
  private val tokenFertility = Q(
    "token_fertility", {
      val bpe = Bpe.sqlCountFromMerged(s"(${Bpe.sqlMergedSymbols("text")})")
      s"""WITH per AS (
         |  SELECT lang,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
         |         CAST($bpe AS BIGINT) AS bpe,
         |         CAST(length(text) AS BIGINT) AS chars
         |  FROM documents
         |)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(ws) AS BIGINT) AS n_words,
         |       CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
         |       CAST(sum(bpe) * 1000 // sum(ws) AS BIGINT)
         |         AS fertility_e3,
         |       CAST(sum(chars) * 1000 // sum(bpe) AS BIGINT)
         |         AS chars_per_token_e3
         |FROM per GROUP BY lang ORDER BY lang""".stripMargin
    }) { (s, dir) =>
    Tables(s, dir).documents
      .select(col("lang"),
        size(toks).cast("long").as("ws"),
        Bpe.tokenCountNative(col("text")).as("bpe"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("n_words"),
        sum(col("bpe")).as("n_bpe_tokens"),
        sum(col("chars")).as("sc"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"),
        expr("n_bpe_tokens * 1000 DIV n_words").as("fertility_e3"),
        expr("sc * 1000 DIV n_bpe_tokens").as("chars_per_token_e3"))
      .orderBy("lang")
  }

  /** PII COMPLIANCE report — the per-source accounting a data-release
    * review reads before `text_pii_redact` ever rewrites a byte: how
    * many documents carry emails/phones, total hit counts, and the
    * affected-doc rate per source (e6). The driver corpus carries no
    * organic PII (the redactor's spec plants its own fixtures), so the
    * report runs over a planted PII twin — the dirty-twin discipline:
    * every 9th doc gains a deterministic contact email, every 17th a
    * phone, both matching the redactor's pinned patterns exactly, so
    * the report measures real per-source rate variation. Plan: one
    * regex projection into one partial agg on source. */
  private val piiReport = Q(
    "pii_report",
    s"""WITH aug AS (
       |  SELECT source,
       |         text ||
       |         (CASE WHEN doc_id % 9 = 2
       |               THEN ' contact user' || CAST(doc_id AS VARCHAR)
       |                    || '@ex-' || CAST(doc_id % 5 AS VARCHAR)
       |                    || '.com' ELSE '' END) ||
       |         (CASE WHEN doc_id % 17 = 4
       |               THEN ' tel 555-123-'
       |                    || CAST(1000 + doc_id % 9000 AS VARCHAR)
       |               ELSE '' END) AS text
       |  FROM documents
       |), per AS (
       |  SELECT source,
       |         CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT)
       |           AS ne,
       |         CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT)
       |           AS np
       |  FROM aug
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS docs_with_email,
       |       CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS docs_with_phone,
       |       CAST(sum(ne) AS BIGINT) AS n_emails,
       |       CAST(sum(np) AS BIGINT) AS n_phones,
       |       CAST(sum(CASE WHEN ne > 0 OR np > 0 THEN 1 ELSE 0 END)
       |            * 1000000 // count(*) AS BIGINT) AS pii_doc_rate_e6
       |FROM per GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val aug = concat(col("text"),
      when(col("doc_id") % 9 === 2,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@ex-"), (col("doc_id") % 5).cast("string"), lit(".com")))
        .otherwise(""),
      when(col("doc_id") % 17 === 4,
        concat(lit(" tel 555-123-"),
          (lit(1000) + col("doc_id") % 9000).cast("string")))
        .otherwise(""))
    Tables(s, dir).documents
      .select(col("source"), aug.as("text"))
      .select(col("source"),
        // functions-API patterns (no SQL-literal escape pass — the
        // regexes carry backslashes the SQL parser would eat).
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .cast("long").as("ne"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
          .cast("long").as("np"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("ne") > 0).cast("long")).as("docs_with_email"),
        sum((col("np") > 0).cast("long")).as("docs_with_phone"),
        sum(col("ne")).as("n_emails"),
        sum(col("np")).as("n_phones"),
        sum((col("ne") > 0 || col("np") > 0).cast("long")).as("hit"))
      .select(col("source"), col("n_docs"), col("docs_with_email"),
        col("docs_with_phone"), col("n_emails"), col("n_phones"),
        expr("hit * 1000000 DIV n_docs").as("pii_doc_rate_e6"))
      .orderBy("source")
  }

  /** Hashed-feature buckets for the importance scorer. Small enough
    * that both model frames stay broadcast-metadata, large enough that
    * bucket collisions average out (DSIR's own hashing argument). */
  private final val DsirBuckets = 1024L

  /** The curated exemplar slice the importance scorer targets —
    * declared as a literal because the driver corpus has no explicit
    * "high-quality" marker; production passes any target predicate. */
  private final val DsirTarget = "src0"

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every doc
    * by the log-likelihood ratio of a TARGET hashed-unigram LM over
    * the RAW-pool LM — the signal importance resampling keeps
    * target-like data with. Whole-bit arithmetic end to end (the
    * perplexity family's `length(bin(D DIV (n+1)))` floor-log2 — add-
    * one smoothed, exact int64, zero libm): per token the surprisal
    * under the raw model minus the surprisal under the target model,
    * summed per doc; positive = more target-like than the pool.
    *
    * Plan at 100 TB: ONE token pass builds BOTH models in a single
    * bucket-keyed partial aggregate (≤ [[DsirBuckets]] rows — the
    * conditional sums share the shuffle), the scoring pass joins the
    * broadcast bucket frame + 1-row totals, and the per-doc sum is a
    * map-side-combining groupBy. Composes with `sample_uniform_hash` /
    * `sample_domain_mix` for the actual resampling draw. */
  private val dsirImportance = Q(
    "dsir_importance", {
      val b = s"${sqlTokHash("term")} % $DsirBuckets"
      s"""WITH tok AS (
         |  SELECT doc_id, source, unnest($sqlToks) AS term FROM documents
         |), tb AS (
         |  SELECT doc_id, source, $b AS b FROM tok
         |), bc AS (
         |  SELECT b,
         |         CAST(sum(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         |         CAST(sum(CASE WHEN source <> '$DsirTarget' THEN 1 ELSE 0 END) AS BIGINT) AS nr
         |  FROM tb GROUP BY b
         |), tot AS (
         |  SELECT CAST(sum(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END) AS BIGINT) AS tt,
         |         CAST(sum(CASE WHEN source <> '$DsirTarget' THEN 1 ELSE 0 END) AS BIGINT) AS tr
         |  FROM tb
         |)
         |SELECT t.doc_id, count(*) AS n_tokens,
         |       CAST(sum(length(bin((tot.tr + $DsirBuckets) // (bc.nr + 1)))
         |              - length(bin((tot.tt + $DsirBuckets) // (bc.nt + 1))))
         |            AS BIGINT) AS score_bits,
         |       CAST(CASE WHEN t.source = '$DsirTarget' THEN 1 ELSE 0 END
         |            AS INTEGER) AS is_target
         |FROM tb t JOIN bc USING (b) CROSS JOIN tot
         |GROUP BY t.doc_id, t.source
         |ORDER BY t.doc_id""".stripMargin
    }) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val isT = col("source") === DsirTarget
    val tb = docs
      .select(col("doc_id"), col("source"), explode(toks).as("term"))
      .withColumn("b", pmod(tokHash(col("term")), lit(DsirBuckets)))
    // BOTH models from one bucket-keyed aggregate: the conditional
    // sums ride the same shuffle.
    val bc = tb.groupBy(col("b")).agg(
      sum(isT.cast("long")).as("nt"),
      sum((!isT).cast("long")).as("nr"))
    val tot = tb.agg(
      sum(isT.cast("long")).as("tt"),
      sum((!isT).cast("long")).as("tr"))
    tb.join(broadcast(bc), Seq("b"))
      .crossJoin(broadcast(tot))
      .withColumn("c", expr(
        s"""length(bin((tr + $DsirBuckets) DIV (nr + 1)))
           | - length(bin((tt + $DsirBuckets) DIV (nt + 1)))""".stripMargin))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("c")).as("score_bits"))
      .select(col("doc_id"), col("n_tokens"), col("score_bits"),
        isT.cast("int").as("is_target"))
      .orderBy("doc_id")
  }

  /** Curriculum ordering plan — the deterministic batch order an
    * easy-to-hard training run reads: quartile tiers over the unigram
    * surprisal score (clean/fluent text first), a hash-shuffled
    * position WITHIN each tier (deterministic "random" order — no
    * rand()), and a GLOBAL position composed as tier offset +
    * within-tier rank. The global order costs no global sort: exact
    * quartile thresholds are ONE aggregate (the ×4 trick makes the
    * interpolated quantile integer-valued, so the tier comparison is
    * exact on both engines), the rank window partitions by tier, and
    * the offsets frame is 4 rows. At 100 TB the same plan writes
    * per-tier shards and the trainer concatenates — exactly what
    * global_pos encodes. */
  private val curriculumOrder = Q(
    "curriculum_order",
    s"""$sqlPerplexityCte, th AS (
       |  SELECT quantile_cont(bits_e3 * 4, 0.25) AS t25,
       |         quantile_cont(bits_e3 * 4, 0.5) AS t50,
       |         quantile_cont(bits_e3 * 4, 0.75) AS t75
       |  FROM ppx
       |), tiered AS (
       |  SELECT p.doc_id, p.bits_e3,
       |         CAST(CASE WHEN p.bits_e3 * 4 <= th.t25 THEN 0
       |                   WHEN p.bits_e3 * 4 <= th.t50 THEN 1
       |                   WHEN p.bits_e3 * 4 <= th.t75 THEN 2
       |                   ELSE 3 END AS INTEGER) AS tier,
       |         md5(CAST(p.doc_id AS VARCHAR)) AS shuf
       |  FROM ppx p CROSS JOIN th
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY tier
       |                               ORDER BY shuf, doc_id) AS pos_in_tier
       |  FROM tiered
       |), offs AS (
       |  SELECT tier, CAST(coalesce(sum(n) OVER (ORDER BY tier
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |         AS BIGINT) AS off
       |  FROM (SELECT tier, count(*) AS n FROM tiered GROUP BY tier)
       |)
       |SELECT r.doc_id, r.tier, r.bits_e3,
       |       CAST(r.pos_in_tier AS BIGINT) AS pos_in_tier,
       |       o.off + r.pos_in_tier AS global_pos
       |FROM ranked r JOIN offs o ON r.tier = o.tier
       |ORDER BY global_pos""".stripMargin) { (s, dir) =>
    val ppx = perplexityFrame(Tables(s, dir)).cut(false)
    val th = ppx.agg(
      expr("percentile(bits_e3 * 4, 0.25)").as("t25"),
      expr("percentile(bits_e3 * 4, 0.5)").as("t50"),
      expr("percentile(bits_e3 * 4, 0.75)").as("t75"))
    val tiered = ppx.crossJoin(broadcast(th))
      .select(
        col("doc_id"), col("bits_e3"),
        when(col("bits_e3") * 4 <= col("t25"), 0)
          .when(col("bits_e3") * 4 <= col("t50"), 1)
          .when(col("bits_e3") * 4 <= col("t75"), 2)
          .otherwise(3).cast("int").as("tier"),
        md5(col("doc_id").cast("string")).as("shuf"))
    // Within-tier rank WITHOUT a per-tier single-task sort: the first
    // two hex chars of the md5 shuffle key split each tier into ≤ 256
    // cells that are CONTIGUOUS under the (shuf, doc_id) sort order
    // (the cell id is a prefix of the primary sort key), so the global
    // within-tier position decomposes exactly into cells-before offset
    // + rank within the cell — 256-way parallel rank windows plus a
    // ≤ 1024-row broadcast offsets frame. Same decomposition the tier
    // offsets below use, applied one level down; the oracle keeps the
    // plain per-tier row_number and the hash match proves equality.
    val wCell = Window.partitionBy(col("tier"), col("cell"))
      .orderBy(col("shuf"), col("doc_id"))
    val celled = tiered.withColumn("cell", substring(col("shuf"), 1, 2))
    val cellRanked = celled
      .withColumn("r_in_cell", row_number().over(wCell).cast("long"))
      .cut(false)
    val wCellOff = Window.partitionBy(col("tier")).orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cellOffs = cellRanked.groupBy(col("tier"), col("cell"))
      .agg(count(lit(1)).as("cn"))
      .withColumn("cell_off", coalesce(sum(col("cn")).over(wCellOff), lit(0L)))
      .select(col("tier"), col("cell"), col("cell_off"))
    val ranked = cellRanked
      .join(broadcast(cellOffs), Seq("tier", "cell"))
      .withColumn("pos_in_tier", col("cell_off") + col("r_in_cell"))
    val wOff = Window.orderBy(col("tier"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranked.groupBy(col("tier"))
      .agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(wOff), lit(0L)))
      .select(col("tier"), col("off"))
    ranked.join(broadcast(offs), Seq("tier"))
      .select(
        col("doc_id"), col("tier"), col("bits_e3"), col("pos_in_tier"),
        (col("off") + col("pos_in_tier")).as("global_pos"))
      .orderBy("global_pos")
  }

  val queries: Seq[Q] =
    Seq(curriculumOrder,
      textNormalize, textTokens, tokenCount, tokenCountBpe, textQuality,
      langId, docFingerprint,
      textPiiRedact, textChunk, splitAssign, textRepetition,
      sampleStratified, sampleDomainMix, textCollocations,
      packSequences, packSequencesBpe, textDecontaminate,
      textLineDedup, textTfidf, textVocab, searchBm25, corpusFilterReport,
      textHtmlExtract, textHtmlLinks, textUrlCanonicalize, langIdConfusion,
      corpusDedupFunnel, tokenFertility, piiReport,
      textPerplexityBits, textBigramBits, sampleUniformHash,
      textQualityTiers, mixturePlan, mixturePlanBpe, mixtureTemperature,
      dsirImportance,
      splitDriftReport)
}

/** Spec fixture surface for [[TextQueries]]: the redaction expression
  * applied to an arbitrary column, so tests can plant PII. */
object PiiRedact {
  def redact(c: Column): Column =
    regexp_replace(regexp_replace(c, TextQueries.EmailRe, "<EMAIL>"),
      TextQueries.PhoneRe, "<PHONE>")
}
