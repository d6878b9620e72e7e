package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.SnapshotTable
import graft.text.CurationQueries
import graft.ops.Checkpoints.CheckpointOps

/** STREAMING CURATION — the six-stage batch pipeline
  * (`corpus_curation_pipeline`, [[graft.text.CurationQueries]]) as an
  * epoch-wise loop against STANDING planes (the round-16 verdict's
  * missing item 3): per epoch the new document batch runs the same six
  * gates, landing per-epoch funnel partials and stage-5 survivors; the
  * final near-dup re-selection folds at READ time over the standing
  * dedup pair table (the [[PairConsumers]] discipline), so late
  * cross-epoch component merges resolve exactly like the batch run.
  *
  * Gate-by-gate incrementality:
  *   1. URL canonical dedup — FIRST-SEEN-WINS against a standing
  *      (canonical_url, min_doc) table. Under the loop's INSERT-ONLY
  *      MONOTONE-ID contract (a crawl assigns increasing doc ids, the
  *      same contract [[IncrementalDomain]] documents), first-seen ≡
  *      the batch pipeline's global min-doc rule, so the per-epoch
  *      flag is EXACT.
  *   2./3. HTML boilerplate and LID-agreement gates — pure per-row
  *      expressions ([[CurationQueries.narrowFlags]], shared verbatim).
  *   4. Quality gate — the batch's MAP decision against the STANDING
  *      classifier ([[IncrementalQuality.scoreAgainst]], counts table
  *      frozen for the epoch; production serves a frozen model and
  *      retrains on its own cadence).
  *   5. Domain gate — a broadcast probe of the standing verdict table
  *      ([[CurationQueries.domainVerdicts]] seeded/refreshed on its
  *      own cadence via [[seedVerdicts]]).
  *   6. Near-dup survivor re-selection — NOT decided per epoch:
  *      stage-5 survivors accumulate, and [[standingSurvivors]] folds
  *      min-doc-per-component over the standing dedup pair graph at
  *      read, which is what makes the loop's final survivor set
  *      EQUAL to the batch pipeline on the union corpus even when an
  *      epoch-2 bridge doc merges two earlier clusters.
  *
  * IncrementalCurationSpec pins the summed 3-epoch funnel ≡ the batch
  * `corpus_curation_pipeline` rows on the union corpus, and the
  * standing survivor set ≡ the batch survivor frame — bit-equal, not
  * recall-bounded — plus replay no-op and epoch-gap refusal.
  *
  * Scale posture: per epoch one narrow batch scan (stages 1-3), one
  * standing-URL anti-probe (key join on canonical_url), one broadcast
  * model join (65 rows), one broadcast verdict probe
  * (domain-cardinality), and three batch-sized appends. The standing
  * planes are maintained by THEIR loops on their own cadences —
  * composition, not duplication. */
object IncrementalCuration {

  /** Seed (or refresh) the standing per-domain verdict table from a
    * hosted corpus — stage 5's plane, on its own cadence. */
  def seedVerdicts(docs: DataFrame, dverDir: String): Unit =
    SnapshotTable.overwrite(
      CurationQueries.domainVerdicts(docs), dverDir): Unit

  /** One epoch: gate the batch against the standing planes, land the
    * URL-min partial, the stage-5 survivor rows, and the funnel
    * partial (one row: this epoch's n0..n5). `countsDir`/`dverDir` are
    * READ-ONLY standing planes. */
  def processBatch(
      docs: DataFrame, urlsDir: String, a5Dir: String, funnelDir: String,
      countsDir: String, dverDir: String, batchId: Long): Unit = {
    val spark = docs.sparkSession
    // The three state ledgers advance together (the quality-loop
    // lockstep discipline): refuse gaps and split-brain resumes.
    val nexts = Seq(urlsDir, a5Dir, funnelDir)
      .map(d => SnapshotTable.maxCommittedBatch(spark, d) + 1)
    require(nexts.max - nexts.min <= 1,
      s"curation ledgers out of lockstep (next epochs $nexts) — the " +
        "triple must only ever be advanced through processBatch")
    require(batchId <= nexts.min,
      s"epoch gap: batch $batchId after high-water mark ${nexts.min - 1}")
    if (docs.isEmpty) return
    val nf = CurationQueries.narrowFlags(docs).cut()
    // Stage 1: first-seen-wins against the standing URL table, min-doc
    // within the batch (≡ the batch pipeline's global min-doc window
    // under the monotone-id contract).
    val standingUrls =
      if (SnapshotTable.currentSnapshot(spark, urlsDir).nonEmpty)
        IncrementalDedup.committedBefore(
          SnapshotTable.read(spark, urlsDir), batchId)
          .select(col("canonical_url")).distinct()
          .withColumn("seen", lit(1L))
      else nf.select(col("canonical_url")).limit(0)
        .withColumn("seen", lit(1L))
    val batchMin = nf.groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("min_doc"))
    val withUrl = nf
      .join(batchMin, Seq("canonical_url"))
      .join(standingUrls, Seq("canonical_url"), "left")
      .withColumn("f_url",
        (col("seen").isNull && col("doc_id") === col("min_doc"))
          .cast("long"))
      .drop("seen", "min_doc")
    // Stage 4: the frozen standing classifier's MAP decision.
    val qual = IncrementalQuality.scoreAgainst(docs, countsDir)
      .select(col("doc_id"),
        (col("score_fx") > 0L).cast("long").as("f_qual"))
    // Stage 5: broadcast probe of the standing verdicts.
    val dver = SnapshotTable.read(spark, dverDir)
      .select(col("reg"), col("f_dom"))
    val fl = CurationQueries
      .withDomainFlag(withUrl.join(qual, Seq("doc_id")), dver)
      .cut()
    // Land: URL mins, stage-5 survivors, funnel partial — all
    // batch-stamped appendOnce commits (replays no-op).
    SnapshotTable.appendOnce(
      batchMin.withColumn("batch_id", lit(batchId)),
      urlsDir, batchId): Unit
    val a5 = fl.filter(col("f_url") === 1 && col("f_html") === 1 &&
      col("f_lang") === 1 && col("f_qual") === 1 && col("f_dom") === 1)
      .select(col("doc_id"), col("source"), col("tk"))
    SnapshotTable.appendOnce(
      a5.withColumn("batch_id", lit(batchId)), a5Dir, batchId): Unit
    val partial = fl.agg(
      count(lit(1)).as("n0"),
      sum(col("f_url")).as("n1"),
      sum(col("f_url") * col("f_html")).as("n2"),
      sum(col("f_url") * col("f_html") * col("f_lang")).as("n3"),
      sum(col("f_url") * col("f_html") * col("f_lang") * col("f_qual"))
        .as("n4"),
      sum(col("f_url") * col("f_html") * col("f_lang") * col("f_qual")
        * col("f_dom")).as("n5"))
    SnapshotTable.appendOnce(
      partial.withColumn("batch_id", lit(batchId)),
      funnelDir, batchId): Unit
  }

  /** The standing CURATED SURVIVORS — stage-6 fold at read: landed
    * stage-5 survivors, components from the standing dedup pair
    * table, min-doc representative per component among survivors
    * (exactly the batch rule, so late cross-epoch merges resolve
    * identically). */
  def standingSurvivors(
      spark: SparkSession, a5Dir: String, pairsDir: String): DataFrame = {
    val a5 = SnapshotTable.read(spark, a5Dir)
      .select(col("doc_id"), col("source"), col("tk"))
    val labels = PairConsumers
      .componentsOf(spark, pairsDir, "new_doc", "corpus_doc", "doc_id")
      .cut(false)
    val annotated = graft.ops.ScaleGates.annotateWithLabels(
      a5, labels, labels.count(), "doc_id")
    val reps = annotated.filter(col("component").isNotNull)
      .groupBy(col("component")).agg(min(col("doc_id")).as("rep"))
    annotated.join(reps, Seq("component"), "left")
      .filter(col("component").isNull || col("doc_id") === col("rep"))
      .select(col("doc_id"), col("source"), col("tk"), col("component"))
  }

  /** The standing FUNNEL — six reconciling rows: stages 1-5 are sums
    * of the landed per-epoch partials; stage 6's n_out is the
    * read-time survivor fold. Same schema as the batch
    * `corpus_curation_pipeline`. */
  def standingFunnel(
      spark: SparkSession, funnelDir: String, a5Dir: String,
      pairsDir: String): DataFrame = {
    val st = SnapshotTable.read(spark, funnelDir).agg(
      sum(col("n0")).as("n0"), sum(col("n1")).as("n1"),
      sum(col("n2")).as("n2"), sum(col("n3")).as("n3"),
      sum(col("n4")).as("n4"), sum(col("n5")).as("n5"))
    val s6 = standingSurvivors(spark, a5Dir, pairsDir)
      .agg(count(lit(1)).as("n6"))
    val both = st.crossJoin(broadcast(s6))
    def stage(name: String, in: String, out: String): DataFrame =
      both.select(lit(name).as("stage"), col(in).as("n_in"),
        col(out).as("n_out"))
    stage("1_url_canonical", "n0", "n1")
      .unionByName(stage("2_html_extract", "n1", "n2"))
      .unionByName(stage("3_lang_gate", "n2", "n3"))
      .unionByName(stage("4_quality_gate", "n3", "n4"))
      .unionByName(stage("5_domain_gate", "n4", "n5"))
      .unionByName(stage("6_near_dedup", "n5", "n6"))
      .withColumn("n_removed", col("n_in") - col("n_out"))
      .orderBy("stage")
  }
}
