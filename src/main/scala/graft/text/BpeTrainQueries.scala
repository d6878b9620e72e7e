package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.Checkpoints.CheckpointOps

/** Distributed BPE merge TRAINING (Sennrich et al. 2016,
  * `learn_bpe.py`) — the step that closes the billing chain the
  * round-12 verdict named as the north star: corpus in → learned
  * merges → tokenizer-exact counts, with NO pinned vocabulary. The
  * pinned 32-rule table in [[Bpe]] was trained offline by exactly this
  * loop; `bpe_train`'s oracle-green row now re-derives its prefix from
  * the corpus on both engines every round (the first 16 learned rules
  * ARE `Bpe.Merges.take(16)` — the fixture table stops being an
  * import and becomes a reproducible artifact).
  *
  * Algorithm (classic count-and-merge):
  *   1. word vocabulary: one corpus pass, `(word, count)` +
  *      per-character symbolization — the ONLY corpus-sized step;
  *   2. per round: count adjacent symbol pairs over the vocab
  *      (weighted by word count, overlaps included — the reference
  *      `get_stats`), take the max-count pair (ties: lexicographic
  *      smallest, pinning determinism cross-engine), merge every
  *      occurrence greedily left-to-right, repeat.
  *
  * Scale posture: the corpus enters ONCE (the vocab groupBy — the
  * same shuffle `text_vocab` pays). Every round then runs on the
  * VOCAB frame, which stays a DataFrame (at 100 TB the distinct-word
  * frame is ~10⁸ rows — far too big to collect, small enough that a
  * round is one partial-agg shuffle + one TakeOrdered(1) + one narrow
  * codegen'd map). Driver state is ONE (pair, count) row per round —
  * the same driver-orchestration shape as `similarity_graph_search`'s
  * beam (training rounds are inherently sequential: round r's stats
  * depend on round r−1's merge). Cost is linear in rounds × vocab;
  * the production shortcut for huge vocabularies — train on a hash
  * sample, assign the full corpus — changes only step 1's input, per
  * the `similarity_ivf_scaled` sample-training discipline. Lineage is
  * cut per round ([[graft.ops.Checkpoints]]), so round r's plan never
  * replays rounds 1..r−1.
  *
  * The per-round MERGE is a higher-order `aggregate` fold (codegen'd
  * builtins, no UDF): the accumulator is the merged-so-far symbol
  * array whose LAST element doubles as the pending left symbol. This
  * is exact for identical-pair rules (a, a) too — the case the
  * two-pass replace chain in [[Bpe]] structurally cannot express
  * (its a ≠ b guard), and rules like ("o","o") are standard training
  * output on English corpora. The DuckDB oracle replays the identical
  * fold via `list_reduce` (BpeTrainSpec pins both against a plain
  * driver-side reference trainer on a fixture WITH identical-pair
  * runs).
  */
object BpeTrain {

  /** Rounds for the declared queries — enough to cover the pinned
    * table's distinctive prefix while keeping the unrolled oracle CTE
    * chain readable. The library `train` takes any count;
    * [[graft.tools.BpeTrainScale]] trains to exhaustion. */
  final val DeclaredRounds = 16

  /** One learned rule: rank (1-based), the pair, its count when
    * selected. */
  final case class Learned(rank: Int, a: String, b: String, pairCount: Long)

  /** Symbolized word vocabulary: (word, cnt, syms) — one corpus pass,
    * one shuffle. Symbolization matches [[Bpe]] (per-char via the
    * `(.)` capture trick, proven cross-engine). */
  def vocabOf(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        filter(split(regexp_replace(col("word"), "(.)", "$1 "), " "),
          x => x =!= ""))

  /** Adjacent-pair counts over the vocab, overlaps included, weighted
    * by word count — the reference `get_stats`. Map-side combinable:
    * one explode + one partial-agg shuffle per round. */
  def pairStats(vocab: DataFrame): DataFrame =
    vocab
      .select(col("cnt"), explode(expr(
        "transform(slice(syms, 1, size(syms) - 1)," +
          " (x, i) -> struct(x AS a, syms[i + 1] AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("c"))

  private def sqlQuote(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** Greedy left-to-right merge of the pair (a, b) over the `syms`
    * array — the accumulator's last element is the pending left
    * symbol, so a merged output (strictly longer than `a`) can never
    * be re-consumed as a left partner within the round: exact for
    * (a, a) rules on any run length, where literal replace diverges
    * (the run-of-5 case documented at [[Bpe]]). */
  private[text] def mergeExpr(a: String, b: String): Column = {
    val (qa, qb, qab) = (sqlQuote(a), sqlQuote(b), sqlQuote(a + b))
    expr(s"""aggregate(
      slice(syms, 2, greatest(size(syms) - 1, 0)),
      array(syms[0]),
      (acc, x) -> IF(element_at(acc, -1) = '$qa' AND x = '$qb',
        concat(slice(acc, 1, size(acc) - 1), array('$qab')),
        concat(acc, array(x))))""")
  }

  /** Train up to `rounds` merges over `docs`; stops early if the pair
    * space exhausts (every word a single symbol). Returns the learned
    * rules in rank order plus the final encoded vocab frame
    * (word, cnt, syms) — `len(syms)` is the word's tokenizer-exact
    * token count under the learned table. */
  def train(docs: DataFrame, rounds: Int): (Seq[Learned], DataFrame) = {
    var vocab = vocabOf(docs).cut(false)
    val learned = scala.collection.mutable.ArrayBuffer.empty[Learned]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairStats(vocab)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += Learned(r, a, b, c)
        vocab = vocab.withColumn("syms", mergeExpr(a, b)).cut(false)
        r += 1
      }
    }
    (learned.toSeq, vocab)
  }

  /** Deterministic 25% document sample for the sample-trained variant:
    * content-independent md5 rank on doc_id (the `sample_uniform_hash`
    * rule), identical on both engines. */
  private val SampleHexDigits = Seq("0", "1", "2", "3")

  private def sampledDocs(docs: DataFrame): DataFrame =
    docs.filter(substring(md5(col("doc_id").cast("string")), 1, 1)
      .isin(SampleHexDigits: _*))

  private def sqlSampleWhere: String =
    s"WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN " +
      SampleHexDigits.mkString("('", "', '", "')")

  /** Train-once memo per (corpus FINGERPRINT, rounds, sampled) — the
    * in-process form of the write-once layout discipline (the learned
    * table is 16 tiny rows; a production run would store it beside the
    * tokenizer artifacts). The declared queries and any bench pass
    * after the first reuse the training. Keyed by [[corpusStamp]],
    * not the bare dir: a corpus REWRITTEN under the same path in one
    * JVM (the ScaleStress replicate/overwrite pattern, a test
    * regenerating a fixture dir) must re-train, never bill against a
    * stale merges table. The stamp is one listStatus of the documents
    * dir (name+length+mtime per file) — metadata-sized per query
    * call, and any rewrite changes it. */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Boolean), Seq[Learned]]()

  /** Cheap corpus fingerprint: the documents table's file listing
    * (name, byte length, modification time), order-normalized.
    * Hoisted to [[graft.util.Layouts.tableStamp]] in round 18 so the
    * write-once flags/navgraph layouts key on the same stamp. */
  private[text] def corpusStamp(
      s: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.util.Layouts.tableStamp(dir, "documents")

  private[text] def trainedMerges(
      s: org.apache.spark.sql.SparkSession, dir: String,
      rounds: Int, sampled: Boolean = false): Seq[Learned] =
    memo.computeIfAbsent((corpusStamp(s, dir), rounds, sampled), _ => {
      // Fresh read, NOT Tables' cached relation handle: a re-train
      // exists precisely because the corpus was rewritten, and the
      // cached handle pins the pre-rewrite file listing. One extra
      // footer resolution per training — noise against the rounds.
      val docs = s.read.parquet(s"$dir/documents.parquet")
      train(if (sampled) sampledDocs(docs) else docs, rounds)._1
    })

  /** COLD sampled training — the gated bench cell's entry point
    * (`bpe_train_loop` in [[graft.BenchStreams]]): BYPASSES the memo
    * by design, because the cell prices the training rounds
    * themselves, not the cache in front of them (the declared
    * `bpe_train` cell measures the memoized emission — ~0.06 s — so a
    * regression in the actual per-round cost was driver-invisible
    * until this cell). Trains `rounds` merges on the deterministic
    * 25% sample (the production scaling path `bpe_train_sampled`
    * declares) reading the corpus fresh each call. */
  def trainColdSampled(
      s: org.apache.spark.sql.SparkSession, dir: String,
      rounds: Int): Seq[Learned] =
    train(sampledDocs(s.read.parquet(s"$dir/documents.parquet")), rounds)._1

  // ---- DuckDB oracle: the identical loop, unrolled round by round ----

  /** CTE chain `<p>v0, <p>p1, <p>best1, <p>v1, …, <p>v<k>`: v0 is the
    * symbolized vocab (optionally over a filtered `documents` — the
    * sampled-training variant), each round counts pairs, picks the
    * (count DESC, a, b) max, and merges via the same
    * last-element-pending fold (`list_reduce`). The `p` prefix lets
    * two training chains coexist in one statement (the sample-drift
    * audit), the `sqlBandsCteBR` convention. MATERIALIZED is
    * load-bearing: v_i is referenced by both p_{i+1} and v_{i+1}, so
    * default CTE inlining would expand v0 2^k times (measured: the
    * un-materialized 16-round chain exhausts file handles re-opening
    * the corpus). EXHAUSTION-SAFE: a round whose pair space is empty
    * yields an empty best_i, and the LEFT JOIN ON TRUE + NULL-guard
    * keeps v_i = v_{i-1} instead of annihilating the vocab (a CROSS
    * JOIN would), so a fixed-K oracle stays correct on corpora that
    * exhaust before round K — the merges union simply stops where the
    * Spark trainer's early-stop does. */
  private[text] def sqlTrainCtes(
      k: Int, p: String = "", where: String = ""): String = {
    val base =
      s"""WITH ${p}v0 AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         |         list_filter(string_split(
         |           regexp_replace(word, '(.)', '\\1 ', 'g'), ' '),
         |           x -> x <> '') AS syms
         |  FROM (SELECT unnest(string_split(text, ' ')) AS word
         |        FROM documents $where)
         |  WHERE length(word) > 0 GROUP BY word
         |)""".stripMargin
    val rounds = (1 to k).map { i =>
      s""", ${p}p$i AS (
         |  SELECT pr.a AS a, pr.b AS b, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT unnest(list_transform(range(1, len(syms)),
         |             j -> {'a': syms[j], 'b': syms[j+1]})) AS pr, cnt
         |    FROM ${p}v${i - 1}) GROUP BY pr.a, pr.b
         |), ${p}best$i AS MATERIALIZED (
         |  SELECT a, b, c FROM ${p}p$i ORDER BY c DESC, a, b LIMIT 1
         |), ${p}v$i AS MATERIALIZED (
         |  SELECT word, cnt,
         |    CASE WHEN ${p}best$i.a IS NULL THEN syms ELSE
         |    list_reduce(list_transform(syms, s -> [s]),
         |      (acc, x) -> CASE WHEN acc[-1] = ${p}best$i.a AND x[1] = ${p}best$i.b
         |        THEN list_append(acc[1:len(acc)-1], ${p}best$i.a || ${p}best$i.b)
         |        ELSE list_concat(acc, x) END) END AS syms
         |  FROM ${p}v${i - 1} LEFT JOIN ${p}best$i ON TRUE
         |)""".stripMargin
    }.mkString
    base + rounds
  }

  /** The learned merges table: rank, pair, selection-time count. */
  private val bpeTrainQ = Q(
    "bpe_train", {
      val k = DeclaredRounds
      val union = (1 to k).map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, a, b, c AS pair_count" +
          s" FROM best$i").mkString("\n  UNION ALL ")
      s"""${sqlTrainCtes(k)}
         |SELECT * FROM (
         |  $union
         |) ORDER BY rank""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    // Training runs as Spark jobs inside the builder (the documented
    // driver-orchestration shape — rounds are sequential, and the
    // driver holds one row per round); the emitted frame is the
    // metadata-sized merges table.
    trainedMerges(s, dir, DeclaredRounds)
      .map(l => (l.rank.toLong, l.a, l.b, l.pairCount))
      .toDF("rank", "a", "b", "pair_count")
      .orderBy("rank")
  }

  /** Tokenizer-exact per-doc counts under the CORPUS-TRAINED table —
    * `token_count_bpe` with the pinned vocabulary removed: the merges
    * come from `bpe_train` and the counting runs the native min-rank
    * kernel bound to them. The oracle recounts from the training
    * chain's OWN final vocab (a word's token count is the length of
    * its round-k symbol list), so the green row proves the kernel's
    * min-rank loop ≡ the trainer's rank-order greedy encoding
    * cross-engine — the parity BpeEncode's scaladoc argues, measured. */
  private val tokenCountBpeTrainedQ = Q(
    "token_count_bpe_trained", {
      val k = DeclaredRounds
      s"""${sqlTrainCtes(k)},
         |wtoks AS (
         |  SELECT word, CAST(len(syms) AS BIGINT) AS w_tokens FROM v$k
         |), docw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |  FROM documents
         |), counted AS (
         |  SELECT doc_id, sum(w_tokens) AS s
         |  FROM docw JOIN wtoks USING (word) GROUP BY doc_id
         |)
         |SELECT d.doc_id, CAST(coalesce(c.s, 0) AS BIGINT) AS n_tokens_bpe
         |FROM documents d LEFT JOIN counted c USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    val merges = trainedMerges(s, dir, DeclaredRounds).map(l => (l.a, l.b))
    Tables(s, dir).documents
      .select(col("doc_id"),
        org.apache.spark.sql.graft.ColumnOps
          .bpeTokenCount(col("text"), merges).as("n_tokens_bpe"))
      .orderBy("doc_id")
  }

  /** SAMPLE-TRAINED merges — the production path for vocabularies too
    * large to pair-count in full every round (the
    * `similarity_ivf_scaled` sample-training discipline applied to the
    * tokenizer): train on a deterministic 25% md5-rank document sample
    * (content-independent, the `sample_uniform_hash` rule), bill the
    * full corpus with the kernel. At 100 TB this turns the per-round
    * vocab from the full distinct-word frame into the sample's — the
    * rounds' cost scales with the sample while the one corpus-sized
    * step stays a single groupBy over the sampled docs. */
  private val bpeTrainSampledQ = Q(
    "bpe_train_sampled", {
      val k = DeclaredRounds
      val union = (1 to k).map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, a, b, c AS pair_count" +
          s" FROM best$i").mkString("\n  UNION ALL ")
      s"""${sqlTrainCtes(k, "", sqlSampleWhere)}
         |SELECT * FROM (
         |  $union
         |) ORDER BY rank""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    trainedMerges(s, dir, DeclaredRounds, sampled = true)
      .map(l => (l.rank.toLong, l.a, l.b, l.pairCount))
      .toDF("rank", "a", "b", "pair_count")
      .orderBy("rank")
  }

  /** Sample-drift audit — the table an operator reads to decide
    * whether the sample is big enough. BPE training is
    * PATH-DEPENDENT: one near-tie reordered by sampling permutes every
    * later rank even when the learned merge SET is identical
    * (measured: rank-for-rank equality read 4/16 on a sample whose
    * first four merges were the same pairs permuted), so the audit
    * joins on the PAIR, not the position: for each full-corpus merge,
    * did the sample learn the same pair within its K rounds
    * (`in_sample`), and how far did its rank wander (`sample_rank`,
    * 0 = not learned). Set recall is the operator's signal; rank
    * wander on near-tied counts is expected noise. Two independent
    * training chains run in one oracle statement (prefix convention);
    * the Spark side reuses both memoized trainings. */
  private val bpeTrainSampleDriftQ = Q(
    "bpe_train_sample_drift", {
      val k = DeclaredRounds
      val full = (1 to k).map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, a, b FROM f_best$i")
        .mkString("\n  UNION ALL ")
      val samp = (1 to k).map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, a, b FROM s_best$i")
        .mkString("\n  UNION ALL ")
      s"""${sqlTrainCtes(k, "f_")},
         |${sqlTrainCtes(k, "s_", sqlSampleWhere).stripPrefix("WITH ")},
         |fm AS ($full),
         |sm AS ($samp)
         |SELECT fm.rank, fm.a, fm.b,
         |       CAST(coalesce(sm.rank, 0) AS BIGINT) AS sample_rank,
         |       CAST(CASE WHEN sm.rank IS NULL THEN 0 ELSE 1 END
         |            AS INTEGER) AS in_sample
         |FROM fm LEFT JOIN sm USING (a, b)
         |ORDER BY fm.rank""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    val full = trainedMerges(s, dir, DeclaredRounds)
    val sampRank = trainedMerges(s, dir, DeclaredRounds, sampled = true)
      .map(l => (l.a, l.b) -> l.rank.toLong).toMap
    full.map { f =>
      val sr = sampRank.getOrElse((f.a, f.b), 0L)
      (f.rank.toLong, f.a, f.b, sr, if (sr > 0) 1 else 0)
    }.toDF("rank", "a", "b", "sample_rank", "in_sample")
      .orderBy("rank")
  }

  /** The actual token SEGMENTATION under the corpus-trained table —
    * what a training run materializes (the counts the other queries
    * bill are len() of this): per doc, the merged symbol string
    * ("sym sym | sym …", '|' the word sentinel) plus its token count.
    * The Spark side runs the rank-order two-pass replace chain
    * ([[Bpe.mergedSymbolsWith]] — all codegen'd builtins, zero
    * shuffle, legal because a trained-16 table is a≠b; an
    * identical-pair table would take the id-emitting kernel path);
    * the ORACLE reconstructs the segmentation from the training
    * chain's OWN final vocab (word → round-k symbol list, re-joined
    * in document word order), so the green row proves chain
    * segmentation ≡ trainer encoding cross-engine — the segmentation
    * analog of `token_count_bpe_trained`'s count proof. Whitespace is
    * squeezed first on BOTH sides so the word sentinel structure is
    * identical. */
  private val bpeSegmentQ = Q(
    "bpe_segment", {
      val k = DeclaredRounds
      s"""${sqlTrainCtes(k)},
         |docw AS (
         |  SELECT doc_id, unnest(words) AS word,
         |         unnest(range(1, len(words) + 1)) AS ord
         |  FROM (
         |    SELECT doc_id,
         |           list_filter(string_split(
         |             regexp_replace(trim(text), ' +', ' ', 'g'), ' '),
         |             x -> x <> '') AS words
         |    FROM documents)
         |), seg AS (
         |  SELECT d.doc_id,
         |         string_agg(array_to_string(v.syms, ' '), ' | '
         |                    ORDER BY d.ord) AS segments,
         |         CAST(sum(len(v.syms)) AS BIGINT) AS n_tokens
         |  FROM docw d JOIN v$k v USING (word)
         |  GROUP BY d.doc_id
         |)
         |SELECT doc_id, coalesce(s.segments, '') AS segments,
         |       CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens
         |FROM documents LEFT JOIN seg s USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    val merges = trainedMerges(s, dir, DeclaredRounds).map(l => (l.a, l.b))
    val normalized = trim(regexp_replace(col("text"), " +", " "))
    // Path choice by TABLE SHAPE: an a≠b table takes the replace
    // chain (pure codegen'd builtins); a table with identical-pair
    // rules — legal training output, e.g. ("o","o") — takes the
    // min-rank segmentation kernel, which computes the same function
    // (BpeTrainSpec pins chain ≡ kernel on a≠b tables and kernel ≡
    // reference encoder on an (a,a)-bearing one).
    val segments =
      if (merges.forall { case (a, b) => a != b })
        trim(Bpe.mergedSymbolsWith(normalized, merges))
      else org.apache.spark.sql.graft.ColumnOps
        .bpeSegment(normalized, merges)
    Tables(s, dir).documents
      .select(col("doc_id"),
        segments.as("segments"),
        org.apache.spark.sql.graft.ColumnOps
          .bpeTokenCount(normalized, merges).as("n_tokens"))
      .orderBy("doc_id")
  }

  val queries: Seq[Q] =
    Seq(bpeTrainQ, tokenCountBpeTrainedQ, bpeTrainSampledQ,
      bpeTrainSampleDriftQ, bpeSegmentQ)
}
