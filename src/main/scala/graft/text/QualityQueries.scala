package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.util.Hashes

/** The TRAINED quality filter — the last pipeline stage that, until
  * round 15, ran on imported constants (`text_quality`'s hand-set
  * ratio weights, `dsir_importance`'s source-conditioned LM): a
  * hashed-feature multinomial Naive Bayes classifier trained
  * IN-ENGINE on planted labels, scored over the corpus, and
  * thresholded by a measured precision/recall sweep. The shape is the
  * fastText/CCNet-family quality-classifier recipe (Joulin et al.
  * 2017 hashed bag-of-words; Wenzek et al. 2020 CCNet filtering),
  * reduced to algebra both engines replay bit-identically:
  *
  *  - PLANTED LABELS: a doc is `good` iff its function-word ratio
  *    (tokens in {a, the} per 1000) is under [[FnThresholdE3]] — a
  *    deterministic text-derived quality rule the classifier must
  *    recover from content alone (it never sees the ratio, only
  *    hashed token counts; the planted rule stands in for human
  *    quality labels, which the driver corpus lacks).
  *  - TRAINING is one bucket-keyed aggregate over the train split of
  *    the canonical 90/5/5 hash split ([[Hashes.splitOf]] — the same
  *    split every split-aware operator shares): per-bucket class
  *    token counts -> add-one-smoothed log-likelihood-ratio weights.
  *  - NO LIBM LOG EVER RUNS (repo policy, the perplexity family's
  *    discipline): weights are FIXED-POINT log2 in units of 1/1024
  *    bit, computed deterministically in int64 as exponent
  *    (`length(bin(x)) - 1`, the exact floor-log2) plus a
  *    quadratically-corrected mantissa term — max error 0.0085 bit
  *    ([[fxL]]), an order finer than the per-token class signal, so
  *    the many small positive non-function-word weights that
  *    length-compensate the strong negative function-word weights
  *    survive (whole-bit quantization floored them to zero and left
  *    the classifier at chance). Both engines run the same integer
  *    expression bit-for-bit; exact while class token totals stay
  *    under 2^53 (the *1024 scaling headroom).
  *  - THRESHOLD SELECTION sweeps 17 evenly-spaced candidate cutoffs
  *    over the VAL-split score range and reports the confusion table,
  *    precision/recall/F1 (e6 integers) per cutoff, marking the
  *    argmax-F1 row — the `dedup_banding_select` decision-table
  *    pattern applied to the classifier's operating point.
  *
  * Scale posture at 100 TB: the label is a narrow per-row array
  * expression (no label join — the token stream re-explodes WITH the
  * label attached); training is ONE shuffle (the 64-bucket partial
  * aggregate); the model is 65 rows and broadcast for scoring; the
  * per-doc score is one map-side-combining groupBy; the sweep reads
  * only the val split (5%) against a 17-row broadcast grid. Nothing
  * is corpus-squared, nothing single-partition. Smoothed counts stay
  * exact while class token totals are under 2^53 (the *1024 scaling
  * headroom), far above any real corpus.
  */
object QualityQueries {

  private def toks: Column = split(col("text"), " ")
  private def sqlTokHash(t: String): String = Hashes.sqlTokHash(t)

  /** Hashed feature buckets. Small enough that the model frame is
    * always broadcast metadata, large enough that the planted signal
    * words land in their own buckets at the driver vocab (31 words:
    * 'a' -> 57, 'the' -> 45, pinned in QualityQueriesSpec). */
  private final val QBuckets = 64L

  /** Planted label rule: good iff function-word tokens per 1000 under
    * this. 60 splits the driver corpora near 50/50 at every SF
    * (sf0.001: 220/500, sf0.01: 241/500, sf0.1: 2368/5000). */
  private final val FnThresholdE3 = 60L

  /** Fixed-point log2 of a positive int64 `x` in units of 1/1024 bit,
    * pure integer arithmetic (deterministic on both engines, no libm):
    * exponent e = length(bin(x)) - 1 (exact floor-log2), mantissa
    * m = x*1024 / 2^e in [1024, 2048), fraction = (m-1024) +
    * (m-1024)(2048-m)*360 / 2^20 — the quadratic correction of the
    * linear-mantissa approximation, max error 9 units = 0.0085 bit
    * over the full mantissa range (constant 360 chosen by exhaustive
    * scan). `div` is the engine's integer-division spelling; `shl`
    * renders the variable left shift (DuckDB `<<`, Spark shiftleft). */
  private def fxL(
      x: String, div: String, shl: (String, String) => String): String = {
    val e = s"(length(bin($x)) - 1)"
    val m = s"((($x) * 1024) $div ${shl("CAST(1 AS BIGINT)", e)})"
    val t = s"($m - 1024)"
    s"(1024 * $e + $t + ($t * (2048 - $m) * 360) $div 1048576)"
  }

  private def duckL(x: String): String =
    fxL(x, "//", (a, b) => s"($a << $b)")
  private def sparkL(x: String): String =
    fxL(x, "DIV", (a, b) => s"shiftleft($a, $b)")

  /** The shared DuckDB CTE chain ending in `scored(doc_id, n_tokens,
    * label, split, score_fx)` plus the model CTEs (`w2`, `pri`) — all
    * three declared queries project off it, so the training algebra
    * is written once and the oracle replays it end to end (the
    * `bpe_train` discipline). */
  private[text] def sqlQualityCtes: String = {
    s"""WITH base AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
       |), lab AS (
       |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
       |         CAST(CASE WHEN CAST(len(list_filter(ts,
       |                t -> t = 'a' OR t = 'the')) AS BIGINT) * 1000
       |              // CAST(len(ts) AS BIGINT) < $FnThresholdE3
       |           THEN 1 ELSE 0 END AS BIGINT) AS label,
       |         ${Hashes.sqlSplitOf("doc_id")} AS split, ts
       |  FROM base
       |), tb AS (
       |  SELECT doc_id, label, split,
       |         ${sqlTokHash("term")} % $QBuckets AS b
       |  FROM (SELECT doc_id, label, split, unnest(ts) AS term FROM lab)
       |), bc AS (
       |  SELECT b,
       |         CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS ng,
       |         CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS nb
       |  FROM tb WHERE split = 'train' GROUP BY b
       |), bcf AS (
       |  SELECT d.b, coalesce(bc.ng, 0) AS ng, coalesce(bc.nb, 0) AS nb
       |  FROM (SELECT unnest(range(0, ${QBuckets.toInt})) AS b) d
       |  LEFT JOIN bc USING (b)
       |), tot AS (
       |  SELECT CAST(sum(ng) AS BIGINT) AS tg, CAST(sum(nb) AS BIGINT) AS tb0
       |  FROM bcf
       |), w2 AS (
       |  SELECT b, ng, nb,
       |         CAST(${duckL("ng + 1")} - ${duckL("nb + 1")}
       |              - (${duckL(s"tg + $QBuckets")}
       |                 - ${duckL(s"tb0 + $QBuckets")})
       |           AS BIGINT) AS w_fx
       |  FROM bcf CROSS JOIN tot
       |), dtrain AS (
       |  SELECT CAST(sum(label) AS BIGINT) AS dg,
       |         CAST(sum(1 - label) AS BIGINT) AS db
       |  FROM lab WHERE split = 'train'
       |), pri AS (
       |  SELECT dg, db,
       |         CAST(${duckL("dg + 1")} - ${duckL("db + 1")} AS BIGINT)
       |           AS prior_fx
       |  FROM dtrain
       |), sc AS (
       |  SELECT tb.doc_id, CAST(sum(w2.w_fx) AS BIGINT) AS sw
       |  FROM tb JOIN w2 USING (b) GROUP BY tb.doc_id
       |), scored AS (
       |  SELECT l.doc_id, l.n_tokens, l.label, l.split,
       |         CAST(pri.prior_fx + coalesce(sc.sw, 0) AS BIGINT) AS score_fx
       |  FROM lab l LEFT JOIN sc USING (doc_id) CROSS JOIN pri
       |)""".stripMargin
  }

  /** The labeled per-doc frame: (doc_id, n_tokens, label, split, ts).
    * Label and split are NARROW per-row expressions — no join attaches
    * them, so the token re-explode below carries them for free. */
  private def labeled(t: Tables): DataFrame = labeledDocs(t.documents)

  /** The labeling projection over an arbitrary (doc_id, text) frame —
    * the streaming loop labels its batch with the same expressions the
    * batch trainer uses. */
  private[graft] def labeledDocs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), toks.as("ts"))
      .withColumn("n_tokens", size(col("ts")).cast("long"))
      .withColumn("label",
        (expr("CAST(size(filter(ts, t -> t = 'a' OR t = 'the')) AS BIGINT)" +
          " * 1000 DIV CAST(size(ts) AS BIGINT)") < FnThresholdE3)
          .cast("long"))
      .withColumn("split", Hashes.splitOf(col("doc_id")))

  /** (doc_id, label, split, b): the hashed token stream. */
  private[graft] def tokenBuckets(lab: DataFrame): DataFrame =
    lab.select(col("doc_id"), col("label"), col("split"),
        explode(col("ts")).as("term"))
      .withColumn("b", pmod(Hashes.tokHash(col("term")), lit(QBuckets)))
      .drop("term")

  /** Per-bucket class token counts over the train split, bucket domain
    * filled: (b, ng, nb). These are NB's sufficient statistics and a
    * MONOID under per-bucket addition — the streaming loop lands one
    * such frame per epoch and derives the standing model from their
    * sum, which is exactly the from-scratch model over the union. */
  private[graft] def bucketCounts(tb: DataFrame): DataFrame = {
    val spark = tb.sparkSession
    val bc = tb.filter(col("split") === "train")
      .groupBy(col("b"))
      .agg(sum((col("label") === 1).cast("long")).as("ng"),
        sum((col("label") === 0).cast("long")).as("nb"))
    spark.range(0, QBuckets).select(col("id").as("b"))
      .join(bc, Seq("b"), "left")
      .select(col("b"), coalesce(col("ng"), lit(0L)).as("ng"),
        coalesce(col("nb"), lit(0L)).as("nb"))
  }

  /** Weights off a (b, ng, nb) counts frame (domain already filled):
    * the add-one-smoothed fixed-point LLR algebra. */
  private[graft] def weightsFromCounts(bcf: DataFrame): DataFrame = {
    val tot = bcf.agg(sum(col("ng")).as("tg"), sum(col("nb")).as("tb0"))
    bcf.crossJoin(broadcast(tot))
      .withColumn("w_fx",
        expr(s"${sparkL("ng + 1")} - ${sparkL("nb + 1")} " +
          s"- (${sparkL(s"tg + $QBuckets")} " +
          s"- ${sparkL(s"tb0 + $QBuckets")})").cast("long"))
      .select(col("b"), col("ng"), col("nb"), col("w_fx"))
  }

  /** The trained model: 64 weight rows (bucket, n_good, n_bad, w_fx). */
  private def weights(tb: DataFrame): DataFrame =
    weightsFromCounts(bucketCounts(tb))

  /** Doc-level class counts over the train split: 1 row (dg, db) —
    * the prior's sufficient statistics, additive like
    * [[bucketCounts]]. */
  private[graft] def classCounts(lab: DataFrame): DataFrame =
    lab.filter(col("split") === "train")
      .agg(sum(col("label")).as("dg"), sum(lit(1L) - col("label")).as("db"))

  /** The class prior off a (dg, db) counts frame: adds prior_fx. */
  private[graft] def priorFromCounts(cc: DataFrame): DataFrame =
    cc.withColumn("prior_fx",
      expr(s"${sparkL("dg + 1")} - ${sparkL("db + 1")}").cast("long"))

  /** The class prior: 1 row (dg, db, prior_fx). */
  private def prior(lab: DataFrame): DataFrame =
    priorFromCounts(classCounts(lab))

  /** The token stream collapsed ONCE into per-(doc, bucket) counts —
    * the frame the streaming loop derives BOTH its commits from, so
    * an epoch pays a single token pass: (doc_id, label, split, b, c).
    * `sum(c)` per doc is exactly the doc's token count (split never
    * yields an empty array), and the NB score is `Σ_b c·w_fx(b)` —
    * the same integer sum the raw token stream produces. */
  private[graft] def docBucketCounts(lab: DataFrame): DataFrame =
    tokenBuckets(lab)
      .groupBy(col("doc_id"), col("label"), col("split"), col("b"))
      .agg(count(lit(1)).as("c"))

  /** [[bucketCounts]] off the collapsed frame — identical algebra
    * (token counts per class per bucket, domain filled). */
  private[graft] def bucketCountsFromPairs(db: DataFrame): DataFrame = {
    val spark = db.sparkSession
    val bc = db.filter(col("split") === "train")
      .groupBy(col("b"))
      .agg(sum(when(col("label") === 1, col("c")).otherwise(0L)).as("ng"),
        sum(when(col("label") === 0, col("c")).otherwise(0L)).as("nb"))
    spark.range(0, QBuckets).select(col("id").as("b"))
      .join(bc, Seq("b"), "left")
      .select(col("b"), coalesce(col("ng"), lit(0L)).as("ng"),
        coalesce(col("nb"), lit(0L)).as("nb"))
  }

  /** Per-doc NB scores: (doc_id, n_tokens, label, split, score_fx).
    * The 65-row model broadcasts; the per-doc sum is one map-side-
    * combining groupBy — the only corpus-sized shuffle in scoring. */
  private[graft] def scoredFrame(t: Tables): DataFrame = {
    val lab = labeled(t)
    val tb = tokenBuckets(lab)
    val w = weights(tb)
    val sc = tb.join(broadcast(w.select(col("b"), col("w_fx"))), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w_fx")).cast("long").as("sw"))
    lab.drop("ts")
      .join(sc, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior(lab).select(col("prior_fx"))))
      .select(col("doc_id"), col("n_tokens"), col("label"), col("split"),
        (col("prior_fx") + coalesce(col("sw"), lit(0L))).cast("long")
          .as("score_fx"))
  }

  /** `quality_train` — the model table a production run persists:
    * per-bucket class token counts + fixed-point LLR weight, plus the
    * class-prior row at bucket = -1. Fixed 65 rows at any corpus
    * size. */
  private val qualityTrain = Q(
    "quality_train",
    s"""$sqlQualityCtes
       |SELECT b AS bucket, ng AS n_good, nb AS n_bad, w_fx FROM w2
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), dg, db, prior_fx FROM pri
       |ORDER BY bucket""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val lab = labeled(t)
    val w = weights(tokenBuckets(lab))
      .select(col("b").as("bucket"), col("ng").as("n_good"),
        col("nb").as("n_bad"), col("w_fx"))
    val pri = prior(lab)
      .select(lit(-1L).as("bucket"), col("dg").as("n_good"),
        col("db").as("n_bad"), col("prior_fx").as("w_fx"))
    w.unionByName(pri).orderBy("bucket")
  }

  /** `quality_score` — every doc scored by the trained model, with
    * the MAP decision (score_fx > 0) and the planted truth alongside:
    * the frame a filtering run consumes and an audit reads. */
  private val qualityScore = Q(
    "quality_score",
    s"""$sqlQualityCtes
       |SELECT doc_id, n_tokens, label, split, score_fx,
       |       CAST(CASE WHEN score_fx > 0 THEN 1 ELSE 0 END AS BIGINT)
       |         AS pred
       |FROM scored ORDER BY doc_id""".stripMargin) { (s, dir) =>
    scoredFrame(Tables(s, dir))
      .withColumn("pred", (col("score_fx") > 0L).cast("long"))
      .orderBy("doc_id")
  }

  /** `quality_threshold_select` — the operating-point sweep: 17
    * evenly-spaced cutoffs over the val-split score range, confusion
    * table + precision/recall/F1 per cutoff, argmax-F1 marked (ties
    * break to the smallest cutoff). Val-only, so at 100 TB the sweep
    * reads 5% of the corpus against a broadcast 17-row grid. */
  private val qualityThresholdSelect = Q(
    "quality_threshold_select",
    s"""$sqlQualityCtes, v AS (
       |  SELECT score_fx, label FROM scored WHERE split = 'val'
       |), rng AS (
       |  SELECT min(score_fx) AS smin, max(score_fx) AS smax FROM v
       |), taus AS (
       |  SELECT DISTINCT smin + (smax - smin) * i // 16 AS tau_fx
       |  FROM rng CROSS JOIN (SELECT unnest(range(0, 17)) AS i)
       |), conf AS (
       |  SELECT tau_fx,
       |    CAST(sum(CASE WHEN score_fx > tau_fx AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN score_fx > tau_fx AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN score_fx <= tau_fx AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN score_fx <= tau_fx AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM taus CROSS JOIN v GROUP BY tau_fx
       |), m AS (
       |  SELECT tau_fx, tp, fp, fn, tn,
       |    CAST(tp * 1000000 // greatest(tp + fp, 1) AS BIGINT) AS precision_e6,
       |    CAST(tp * 1000000 // greatest(tp + fn, 1) AS BIGINT) AS recall_e6,
       |    CAST(2 * tp * 1000000 // greatest(2 * tp + fp + fn, 1) AS BIGINT) AS f1_e6
       |  FROM conf
       |), best AS (
       |  SELECT max(f1_e6) AS bf FROM m
       |), bestt AS (
       |  SELECT min(tau_fx) AS bt FROM m, best WHERE f1_e6 = bf
       |)
       |SELECT m.tau_fx, m.tp, m.fp, m.fn, m.tn,
       |       m.precision_e6, m.recall_e6, m.f1_e6,
       |       CAST(CASE WHEN m.tau_fx = bestt.bt THEN 1 ELSE 0 END AS BIGINT)
       |         AS chosen
       |FROM m CROSS JOIN bestt
       |ORDER BY tau_fx""".stripMargin) { (s, dir) =>
    import graft.ops.Checkpoints.CheckpointOps
    // Pinned: the sweep fans the val frame into the grid, the
    // confusion pass, and the argmax branches — without the pin each
    // branch would replay the whole train+score subtree.
    val v = scoredFrame(Tables(s, dir))
      .filter(col("split") === "val")
      .select(col("score_fx"), col("label"))
      .cut(false)
    val rng = v.agg(min(col("score_fx")).as("smin"),
      max(col("score_fx")).as("smax"))
    val taus = s.range(0, 17).crossJoin(broadcast(rng))
      .select((col("smin") +
        expr("(smax - smin) * id DIV 16")).cast("long").as("tau_fx"))
      .distinct()
    val conf = broadcast(taus).crossJoin(v)
      .groupBy(col("tau_fx"))
      .agg(
        sum((col("score_fx") > col("tau_fx") && col("label") === 1)
          .cast("long")).as("tp"),
        sum((col("score_fx") > col("tau_fx") && col("label") === 0)
          .cast("long")).as("fp"),
        sum((col("score_fx") <= col("tau_fx") && col("label") === 1)
          .cast("long")).as("fn"),
        sum((col("score_fx") <= col("tau_fx") && col("label") === 0)
          .cast("long")).as("tn"))
    val m = conf
      .withColumn("precision_e6",
        expr("tp * 1000000 DIV greatest(tp + fp, 1)"))
      .withColumn("recall_e6",
        expr("tp * 1000000 DIV greatest(tp + fn, 1)"))
      .withColumn("f1_e6",
        expr("2 * tp * 1000000 DIV greatest(2 * tp + fp + fn, 1)"))
      .cut(false) // 17 rows, read by the argmax pair and the output
    val best = m.agg(max(col("f1_e6")).as("bf"))
    val bestt = m.join(broadcast(best), col("f1_e6") === col("bf"))
      .agg(min(col("tau_fx")).as("bt"))
    m.crossJoin(broadcast(bestt))
      .withColumn("chosen", (col("tau_fx") === col("bt")).cast("long"))
      .select(col("tau_fx"), col("tp"), col("fp"), col("fn"), col("tn"),
        col("precision_e6"), col("recall_e6"), col("f1_e6"), col("chosen"))
      .orderBy("tau_fx")
  }

  /** `quality_uncertainty_sample` — the ACTIVE-LEARNING batch: the 50
    * docs closest to the trained decision boundary (smallest |score|,
    * doc_id tie-break), i.e. the docs whose human labels would improve
    * the classifier most per label bought (uncertainty sampling,
    * Lewis & Gale 1994). At 100 TB this is a TakeOrderedAndProject
    * over the scored corpus — per-partition top-k then one k-sized
    * merge, never a global sort. The planted label rides along as the
    * audit column (in production it is what the annotator fills in). */
  private val qualityUncertaintySample = Q(
    "quality_uncertainty_sample",
    s"""$sqlQualityCtes
       |SELECT doc_id, score_fx, abs(score_fx) AS abs_fx, label, split
       |FROM scored
       |ORDER BY abs_fx, doc_id LIMIT 50""".stripMargin) { (s, dir) =>
    scoredFrame(Tables(s, dir))
      .withColumn("abs_fx", abs(col("score_fx")))
      .select(col("doc_id"), col("score_fx"), col("abs_fx"),
        col("label"), col("split"))
      .orderBy(col("abs_fx"), col("doc_id"))
      .limit(50)
  }

  val queries: Seq[Q] =
    Seq(qualityTrain, qualityScore, qualityThresholdSelect,
      qualityUncertaintySample)
}
