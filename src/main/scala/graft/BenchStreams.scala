package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The streaming incremental loops as REPLAYABLE bench cells — the
  * spec-only surface brought under the regression gate (each cell is a
  * deterministic 3-epoch run of one loop's `processBatch` against
  * fresh state dirs, so a timing regression in the probe/append
  * machinery reads as a flagged cell, not a silent drift).
  *
  * Batches split the SF corpus by key mod 3 — every row passes through
  * the loop exactly once, so the cell prices the full standing-index
  * lifecycle at that SF: epoch 0 cold (no standing side), epochs 1-2
  * probing + growing it. Wall time is the three calls end to end,
  * including the effectively-once partitioned appends, PLUS the
  * downstream closure — each cell finishes with the loop's
  * components+survivors consumers over the accumulated pair table
  * (the [[streaming.PairConsumers]] steps), so a regression in the
  * propagation/survivor path is a flagged cell, not a silent drift.
  * Since round 15 the three dedup loops also run a MID-LIFECYCLE
  * maintenance leg (compact + expire between epochs 1 and 2 — see
  * [[maintain]]), so the priced lifecycle is the loop's real hourly
  * steady state, manifests bounded, with the epoch ledger carrying
  * continuity across the fold.
  */
object BenchStreams {

  /** MID-LIFECYCLE MAINTENANCE (round 15): after epoch 1, COMPACT each
    * committed state table and EXPIRE past the grace window
    * (keepLast=1, age 0 — the stop-the-world test posture), then let
    * epoch 2 land ON TOP of the maintained layout. This prices the
    * real steady-state of an hourly loop — per-epoch manifests do not
    * accumulate unboundedly; maintenance runs on a cadence BETWEEN
    * epochs — and it keeps the epoch-ledger contract under the gate:
    * epoch 2 must still land (no high-water wedge) and a replay must
    * still no-op (no double count) with every pre-maintenance
    * batch-stamped manifest gone. BOUNDED METADATA is asserted after
    * the run: ≤ 2 retained manifests per state table (the folded head
    * + epoch 2's commit). */
  private def maintain(spark: SparkSession, tables: String*): Unit =
    for (t <- tables
         if etl.SnapshotTable.currentSnapshot(spark, t).nonEmpty) {
      etl.SnapshotTable.compact(spark, t)
      etl.SnapshotTable.expire(spark, t, keepLast = 1, minAgeMs = 0): Unit
    }

  private def requireBoundedMeta(
      spark: SparkSession, tables: String*): Unit =
    for (t <- tables
         if etl.SnapshotTable.currentSnapshot(spark, t).nonEmpty) {
      val n = etl.SnapshotTable.snapshots(spark, t).length
      require(n <= 2,
        s"maintenance must bound the manifest chain: $t retains $n")
    }

  /** name → (session, sfDir, scratchDir) => Unit. Callers provide a
    * FRESH scratch dir per attempt (state is the product; reusing one
    * would trip the epoch-continuity guard by design). */
  val cells: Seq[(String, (SparkSession, String, String) => Unit)] = Seq(
    "stream_dedup_loop" -> { (spark, sfDir, dir) =>
      val docs = Tables(spark, sfDir).documents.select("doc_id", "text")
      for (b <- 0L to 2L) {
        streaming.IncrementalDedup.processBatch(
          docs.filter(col("doc_id") % 3 === b),
          s"$dir/index", s"$dir/pairs", b)
        if (b == 1L) maintain(spark, s"$dir/index", s"$dir/pairs")
      }
      requireBoundedMeta(spark, s"$dir/index", s"$dir/pairs")
      streaming.IncrementalDedup.survivors(docs, s"$dir/pairs")
        .write.format("noop").mode("overwrite").save()
    },
    "stream_semdedup_loop" -> { (spark, sfDir, dir) =>
      val vecs = Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
      for (b <- 0L to 2L) {
        streaming.IncrementalSemDedup.processBatch(
          vecs.filter(col("vec_id") % 3 === b),
          s"$dir/index", s"$dir/pairs", b)
        if (b == 1L) maintain(spark, s"$dir/index", s"$dir/pairs")
      }
      requireBoundedMeta(spark, s"$dir/index", s"$dir/pairs")
      streaming.IncrementalSemDedup.survivors(vecs, s"$dir/pairs")
        .write.format("noop").mode("overwrite").save()
    },
    "stream_bars_loop" -> { (spark, sfDir, dir) =>
      val trades = Tables(spark, sfDir).events
        .select("event_type", "ts", "event_id", "value")
      // Epoch 0 lands SHORT one trade (the planted late arrival), the
      // other two land whole — then the late trade triggers a reopen
      // of its epoch (the force-backfill analog), so the gated cell
      // prices the full lifecycle including the correction path, the
      // same consumer-fold-in discipline as the dedup loops.
      val late = col("event_id") === 0
      streaming.IncrementalBars.processBatch(
        trades.filter(col("event_id") % 3 === 0 && !late), s"$dir/bars", 0L)
      for (b <- 1L to 2L)
        streaming.IncrementalBars.processBatch(
          trades.filter(col("event_id") % 3 === b), s"$dir/bars", b)
      streaming.IncrementalBars.reopen(
        trades.filter(col("event_id") % 3 === 0), s"$dir/bars", 0L)
      streaming.IncrementalBars.bars(spark, s"$dir/bars")
        .write.format("noop").mode("overwrite").save()
    },
    "snapshot_maintenance_loop" -> { (spark, sfDir, dir) =>
      // The maintenance pair every snapshot-committed state table needs
      // on a cadence now that the loops land per-epoch manifests
      // (round 14): 3 epoch commits of bar partials, then COMPACT
      // (fold the small epoch files into one), EXPIRE past the
      // reader-grace window (keepLast=1, age 0 — the stop-the-world
      // test posture; production keeps a grace window), and a pinned
      // read of the maintained head. Prices the full
      // commit→fold→GC→read lifecycle so a regression in the metadata
      // plane (manifest churn, footer counting, GC sweeps) is a
      // flagged cell, not a silent drift.
      val trades = Tables(spark, sfDir).events
        .select("event_type", "ts", "event_id", "value")
      for (b <- 0L to 2L)
        streaming.IncrementalBars.processBatch(
          trades.filter(col("event_id") % 3 === b), s"$dir/bars", b)
      etl.SnapshotTable.compact(spark, s"$dir/bars")
      val (m, f) = etl.SnapshotTable.expire(
        spark, s"$dir/bars", keepLast = 1, minAgeMs = 0)
      require(m >= 3 && f >= 3,
        s"maintenance must fold and sweep the epoch commits ($m, $f)")
      streaming.IncrementalBars.bars(spark, s"$dir/bars")
        .write.format("noop").mode("overwrite").save()
    },
    "stream_quality_loop" -> { (spark, sfDir, dir) =>
      // The trained quality filter as a standing loop (round 15): per
      // epoch, land the 65-row NB count partial (sufficient statistics
      // are a mergeable aggregate — the bars discipline applied to a
      // MODEL) and the batch's scores against the standing model; the
      // mid-lifecycle maintenance leg folds the counts chain exactly
      // like the other loops. Consumer: the decision tally over every
      // landed score — what a filtering run gates on.
      val docs = Tables(spark, sfDir).documents.select("doc_id", "text")
      for (b <- 0L to 2L) {
        streaming.IncrementalQuality.processBatch(
          docs.filter(col("doc_id") % 3 === b),
          s"$dir/counts", s"$dir/scores", b)
        if (b == 1L) maintain(spark, s"$dir/counts", s"$dir/scores")
      }
      requireBoundedMeta(spark, s"$dir/counts", s"$dir/scores")
      streaming.IncrementalQuality.accuracyByEpoch(spark, s"$dir/scores")
        .write.format("noop").mode("overwrite").save()
    },
    "stream_domain_loop" -> { (spark, sfDir, dir) =>
      // The standing domain plane (round 16): per epoch, land the
      // count-map partial (every additive + multiset stat in one
      // mergeable table) and the first-seen canonicality argmin
      // partial; maintenance folds both chains mid-lifecycle like the
      // other loops. Consumer: the standing domain_stats read — what
      // the domain gate consumes (spec-pinned bit-equal to batch).
      val docs = Tables(spark, sfDir).documents
      for (b <- 0L to 2L) {
        streaming.IncrementalDomain.processBatch(
          docs.filter(col("doc_id") % 3 === b),
          s"$dir/maps", s"$dir/mins", b)
        // Fold after epoch 2 (not 1) so the retraction epoch below
        // still lands within the <= 2 retained-manifest bound.
        if (b == 2L) maintain(spark, s"$dir/maps", s"$dir/mins")
      }
      // Epoch 3: a RETRACTING crawl slice (round 17 — the correction
      // path priced in-gate, the bars-loop reopen discipline): negated
      // count-map, tombstones, bounded rescan of affected keys.
      streaming.IncrementalDomain.processRetractions(
        docs.filter(col("doc_id") % 10 === 3),
        docs.filter(col("doc_id") % 10 =!= 3),
        s"$dir/maps", s"$dir/mins", 3L)
      requireBoundedMeta(spark, s"$dir/maps", s"$dir/mins")
      streaming.IncrementalDomain
        .standingStats(spark, s"$dir/maps", s"$dir/mins")
        .write.format("noop").mode("overwrite").save()
    },
    "stream_curation_loop" -> { (spark, sfDir, dir) =>
      // Streaming curation (round 17): the six-stage funnel per epoch
      // against standing planes. The frozen classifier counts and the
      // domain verdicts seed ONCE (production: trained upstream on
      // their own cadences); epochs split by doc_id RANGE — the loop's
      // insert-only monotone-id contract (a crawl assigns increasing
      // ids), under which the per-epoch funnel is EXACT vs batch.
      // Consumer: the standing funnel (stage-6 survivor fold included).
      val docs = Tables(spark, sfDir).documents
      val maxId = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
        .collect()(0).getLong(0)
      streaming.IncrementalQuality.processBatch(
        docs, s"$dir/qcounts", s"$dir/qscores", 0L)
      streaming.IncrementalCuration.seedVerdicts(docs, s"$dir/dver")
      for (b <- 0L to 2L) {
        val lo = (maxId + 1) * b / 3
        val hi = if (b == 2L) maxId + 1 else (maxId + 1) * (b + 1) / 3
        val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        streaming.IncrementalDedup.processBatch(
          batch.select("doc_id", "text"), s"$dir/index", s"$dir/pairs", b)
        streaming.IncrementalCuration.processBatch(
          batch, s"$dir/urls", s"$dir/a5", s"$dir/funnel",
          s"$dir/qcounts", s"$dir/dver", b)
        if (b == 1L)
          maintain(spark, s"$dir/urls", s"$dir/a5", s"$dir/funnel",
            s"$dir/index", s"$dir/pairs")
      }
      requireBoundedMeta(spark, s"$dir/urls", s"$dir/a5", s"$dir/funnel")
      streaming.IncrementalCuration
        .standingFunnel(spark, s"$dir/funnel", s"$dir/a5", s"$dir/pairs")
        .write.format("noop").mode("overwrite").save()
    },
    "stream_ann_loop" -> { (spark, sfDir, dir) =>
      // Incremental ANN maintenance (round 17): per epoch, the batch
      // LSH-probes the standing bucket index for un-thresholded
      // candidate edges, NN-descent-refreshes locally around the
      // insertions, and lands both tables under the loop discipline.
      // Consumer: the standing LAYERED graph read (layer-0 fold +
      // measured-depth closure) — what the serving search walks
      // (spec-pinned recall-equal to the rebuilt layout).
      val vecs = Tables(spark, sfDir).embeddings
        .select("vec_id", "embedding")
      for (b <- 0L to 2L) {
        streaming.IncrementalAnn.processBatch(
          vecs.filter(col("vec_id") % 3 === b),
          s"$dir/index", s"$dir/cands", b)
        if (b == 1L) maintain(spark, s"$dir/index", s"$dir/cands")
      }
      requireBoundedMeta(spark, s"$dir/index", s"$dir/cands")
      // Consumer: the standing LAYER-0 fold — the loop's own product
      // (the candidate table served as a graph). The upper-layer
      // closure is the write-once BUILD cost the batch cell
      // (similarity_graph_search's layout) already prices, and the
      // full layered serving read is spec-pinned recall-equal to that
      // rebuild (IncrementalAnnSpec) — pricing it per cell attempt
      // would bill the build twice.
      streaming.IncrementalAnn
        .standingLayer0(spark, s"$dir/cands")
        .write.format("noop").mode("overwrite").save()
    },
    "bpe_train_loop" -> { (spark, sfDir, _) =>
      // COLD BPE training priced under the gate (round-13 verdict §4:
      // the declared bpe_train cell measures the memoized emission, so
      // a per-round training-cost regression was driver-invisible).
      // 6 rounds on the deterministic 25% sample — the bpe_train_sampled
      // production path — re-trained from scratch every attempt.
      val learned = text.BpeTrain.trainColdSampled(spark, sfDir, rounds = 6)
      require(learned.nonEmpty, "cold training must learn at least one rule")
    },
    "stream_media_loop" -> { (spark, sfDir, dir) =>
      val items = mm.Multimodal.mediaItems(spark, sfDir, "image").toDF()
      // Image item ids are ≡ 0 (mod 3) by the modality layout, so the
      // epoch split keys on id/3 — a bare mod-3 would funnel the whole
      // corpus into one epoch and silently skip the other two.
      for (b <- 0L to 2L) {
        streaming.IncrementalMediaDedup.processBatch(
          items.filter((col("item_id") / 3).cast("long") % 3 === b), "image",
          s"$dir/index", s"$dir/pairs", b)
        if (b == 1L) maintain(spark, s"$dir/index", s"$dir/pairs")
      }
      requireBoundedMeta(spark, s"$dir/index", s"$dir/pairs")
      // Survivor selection is a labels-over-keys step (payloads join
      // back only in materialize*) — annotating the BLOB column here
      // would price a corpus byte-shuffle the consumer never does.
      streaming.IncrementalMediaDedup.survivors(
          items.select("item_id"), s"$dir/pairs")
        .write.format("noop").mode("overwrite").save()
    })

  /** Run one cell in a fresh scratch dir; returns wall seconds or -1
    * on failure. Scratch is deleted afterwards — the cell prices the
    * loop, not the disk it leaves behind. */
  def runCell(
      spark: SparkSession, sfDir: String,
      cell: (String, (SparkSession, String, String) => Unit)): Double = {
    val scratch =
      java.nio.file.Files.createTempDirectory("bench-" + cell._1).toString
    val t0 = System.nanoTime()
    val wall =
      try { cell._2(spark, sfDir, scratch); (System.nanoTime() - t0) / 1e9 }
      catch { case scala.util.control.NonFatal(e) =>
        // Fatal JVM errors (OOM, StackOverflow) propagate — a bench
        // run on a corrupted JVM would record garbage for every
        // remaining cell.
        System.err.println(s"[bench] ${cell._1} failed: ${e.getMessage}")
        -1.0
      }
    try {
      val root = new org.apache.hadoop.fs.Path(scratch)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
    } catch { case scala.util.control.NonFatal(_) => () }
    wall
  }
}
