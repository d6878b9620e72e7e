package graft.streaming

import graft.SparkSpec
import graft.etl.SnapshotTable
import graft.mm.Multimodal
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The round-14 unification: all four streaming loops land their
  * standing state through SnapshotTable commits. These specs plant,
  * PER LOOP, the two failure modes the directory conventions could
  * not close — a reader RACING an epoch append/correction (must keep
  * its pinned snapshot, never FileNotFound or a torn mix) and a
  * CRASHED HALF-COMMIT (torn manifest + orphan staged file: invisible
  * to readers, does not block the next commit). */
class SnapshotLoopSpec extends SparkSpec {

  private val base = ("spark catalyst shuffles partition data across " +
    "executors for wide joins and aggregations at scale ") * 8
  private val far = "completely different words about cooking pasta " +
    "with tomatoes basil garlic olive oil and fresh bread " * 3
  private val baseVec: Seq[Float] = (0 until 64).map(i => 0.1f + 0.01f * i)
  private val dupVec: Seq[Float] = baseVec.map(_ * 2.0f)

  /** Plant the crash state: a torn manifest at the next id plus an
    * orphan staged file — what a writer killed between stage and the
    * end of publish leaves behind. */
  private def plantTornCommit(dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val next = SnapshotTable.snapshots(spark, dir).map(_.id).max + 1
    val torn = fs.create(
      new Path(f"$dir/manifests/snap-$next%08d.manifest"), false)
    torn.write("files=3\nrows=9\n_data/b9-dead-0.parquet\n".getBytes("UTF-8"))
    torn.close() // no terminator, wrong count: torn by both rules
    val orphan = fs.create(new Path(s"$dir/_data/b9-dead-0.parquet"), false)
    orphan.write(Array[Byte](1, 2, 3)); orphan.close()
  }

  test("text loop: a consumer racing an epoch append keeps its pinned " +
      "pairs snapshot; a crashed half-commit is invisible and unblocking") {
    import spark.implicits._
    val indexDir = tmpDir("snap-text") + "/bands"
    val pairsDir = tmpDir("snap-text-pairs") + "/pairs"
    // Epoch 0 carries an intra-batch dup so the pairs table exists.
    IncrementalDedup.processBatch(
      Seq((1L, base), (2L, far), (3L, base)).toDF("doc_id", "text"),
      indexDir, pairsDir, 0L)
    // The racing consumer resolves the pairs head NOW …
    val pinned = SnapshotTable.read(spark, pairsDir)
    // … a crashed half-commit lands in both state tables …
    plantTornCommit(indexDir)
    plantTornCommit(pairsDir)
    // … and epoch 1 commits new pairs underneath the reader.
    IncrementalDedup.processBatch(
      Seq((9L, base)).toDF("doc_id", "text"), indexDir, pairsDir, 1L)
    assert(pinned.select("new_doc", "corpus_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((3L, 1L)),
      "the pinned consumer must keep exactly its resolved epoch-0 view")
    assert(IncrementalDedup.components(spark, pairsDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 1L), (3L, 1L), (9L, 1L)),
      "a fresh consumer reads through the torn manifest to the new head")
  }

  test("semantic loop: torn pairs commit invisible; epoch replay " +
      "converges off the manifest ledger") {
    import spark.implicits._
    val indexDir = tmpDir("snap-sem") + "/buckets"
    val pairsDir = tmpDir("snap-sem-pairs") + "/pairs"
    IncrementalSemDedup.processBatch(
      Seq((1L, baseVec), (3L, dupVec)).toDF("vec_id", "embedding"),
      indexDir, pairsDir, 0L)
    plantTornCommit(pairsDir)
    val before = readStateTable(pairsDir).collect().map(_.toString).sorted
    // The crash replay: same epoch id — the ledger says batch 0
    // committed, so nothing doubles, torn junk notwithstanding.
    IncrementalSemDedup.processBatch(
      Seq((1L, baseVec), (3L, dupVec)).toDF("vec_id", "embedding"),
      indexDir, pairsDir, 0L)
    assert(readStateTable(pairsDir).collect().map(_.toString).sorted
      .sameElements(before), "replay over a torn commit must converge")
  }

  test("media loop: a reader racing the index append keeps its pinned " +
      "band rows; the next epoch commits past the torn manifest") {
    import spark.implicits._
    def item(id: Long, seed: Long) = Multimodal.MediaItem(
      id, "image", Multimodal.syntheticPng(seed, 16, 14),
      Map("seed" -> seed.toString))
    val indexDir = tmpDir("snap-med") + "/hashes"
    val pairsDir = tmpDir("snap-med-pairs") + "/pairs"
    IncrementalMediaDedup.processBatch(
      Seq(item(1L, 7L), item(2L, 99L)).toDS().toDF(), "image",
      indexDir, pairsDir, 0L)
    val pinnedIndex = SnapshotTable.read(spark, indexDir)
    plantTornCommit(indexDir)
    IncrementalMediaDedup.processBatch(
      Seq(item(20L, 7L)).toDS().toDF(), "image", indexDir, pairsDir, 1L)
    assert(pinnedIndex.select("item_id").distinct().count() == 2,
      "the pinned reader must not see epoch 1's rows or the torn junk")
    assert(readStateTable(indexDir).select("item_id").distinct().count() == 3)
    assert(readStateTable(pairsDir).select("new_item", "corpus_item")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((20L, 1L)))
  }

  test("bars loop: a reader racing a late-trade reopen keeps computing " +
      "the PRE-correction bars — the directory-overwrite tear, closed") {
    val sf = "/root/testdata/sf0.001"
    val trades = graft.Tables(spark, sf).events
      .select("event_type", "ts", "event_id", "value")
    val dir = tmpDir("snap-bars") + "/bars"
    val lateId = trades.agg(min(col("event_id"))).head.getLong(0)
    val late = col("event_id") === lateId
    for (b <- 0L to 2L)
      IncrementalBars.processBatch(
        trades.filter(col("event_id") % 3 === b && !late), dir, b)
    def merged(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("event_type", "hour").collect().map(_.toSeq.toSeq).toSeq
    // The racing reader resolves its plan BEFORE the correction lands.
    val pinned = IncrementalBars.bars(spark, dir)
    val preCorrection = merged(pinned)
    IncrementalBars.reopen(
      trades.filter(col("event_id") % 3 === lateId % 3), dir, lateId % 3)
    // Under the retired directory-overwrite reopen this collect hit
    // FileNotFound (the epoch's files were replaced in place); under
    // the snapshot swap the pinned files are immutable until expire.
    assert(merged(pinned) == preCorrection,
      "the racing reader must keep its pre-correction snapshot")
    // A fresh reader sees the corrected bars — and they equal the
    // batch OHLC over the full feed (the spec-pinned reopen contract).
    val corrected = merged(IncrementalBars.bars(spark, dir)
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_trades")))
    val batch = graft.SparkEntry.queries("timeseries_ohlc")(spark, sf)
      .collect().map(_.toSeq.toSeq).toSeq
    assert(corrected == batch)
  }

  test("bars loop: reopen AFTER a compaction folded the epoch's files " +
      "takes the batch_id row-rewrite fallback and stays exact") {
    val sf = "/root/testdata/sf0.001"
    val trades = graft.Tables(spark, sf).events
      .select("event_type", "ts", "event_id", "value")
    val dir = tmpDir("snap-bars-compact") + "/bars"
    val lateId = trades.agg(min(col("event_id"))).head.getLong(0)
    val late = col("event_id") === lateId
    for (b <- 0L to 2L)
      IncrementalBars.processBatch(
        trades.filter(col("event_id") % 3 === b && !late), dir, b)
    // Compaction folds every epoch's files into one — the stage-tag
    // epoch→file mapping is gone; only the batch_id column remains.
    SnapshotTable.compact(spark, dir)
    IncrementalBars.reopen(
      trades.filter(col("event_id") % 3 === lateId % 3), dir, lateId % 3)
    val corrected = IncrementalBars.bars(spark, dir)
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_trades"))
      .orderBy("event_type", "hour").collect().map(_.toSeq.toSeq).toSeq
    val batch = graft.SparkEntry.queries("timeseries_ohlc")(spark, sf)
      .collect().map(_.toSeq.toSeq).toSeq
    assert(corrected == batch,
      "post-compaction reopen must rewrite by batch_id and stay exact")
  }

  test("snapshot index: fresh checkpoint refused; the snapshot-layout " +
      "fold-to-base recovery lands restarted epochs in BOTH state tables") {
    import spark.implicits._
    val indexDir = tmpDir("snap-fresh") + "/bands"
    val pairsDir = tmpDir("snap-fresh-pairs") + "/pairs"
    val index = IncrementalDedup.SnapIndex(indexDir)
    // Epoch 0 carries an intra-batch dup so the PAIRS table commits a
    // batch-0 manifest too — the recovery must expunge that ledger as
    // well, or the restarted epoch 0's pairs silently no-op.
    IncrementalDedup.processBatch(
      Seq((1L, base), (2L, base)).toDF("doc_id", "text"),
      index, pairsDir, 0L)
    IncrementalDedup.processBatch(
      Seq((4L, far)).toDF("doc_id", "text"), index, pairsDir, 1L)
    val e = intercept[IllegalStateException] {
      IncrementalDedup.processBatch(
        Seq((3L, base)).toDF("doc_id", "text"), index, pairsDir, 0L)
    }
    assert(e.getMessage.contains("fresh checkpoint"))
    // The prescribed snapshot-layout recovery: fold BOTH state tables
    // to the base epoch (batch_id = -1), one overwrite commit each —
    // overwrite resets each table's manifest epoch ledger.
    for (d <- Seq(indexDir, pairsDir))
      SnapshotTable.overwrite(
        SnapshotTable.read(spark, d).withColumn("batch_id", lit(-1L)), d)
    val indexBefore = readStateTable(indexDir).count()
    IncrementalDedup.processBatch(
      Seq((3L, base)).toDF("doc_id", "text"), index, pairsDir, 0L)
    // The restarted epoch's PAIRS landed — into a table whose OLD
    // sequence already carried batch 0 (pre-fix: appendOnce saw the
    // stale batch-0 manifest and dropped them).
    assert(readStateTable(pairsDir)
      .filter(col("batch_id") === 0L).select("new_doc", "corpus_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((3L, 1L), (3L, 2L)),
      "the restarted epoch must probe the folded base and land its " +
        "pairs past the old sequence's batch-0 manifest")
    // And its BANDS entered the standing index (pre-fix: silently
    // dropped, so later epochs never dedup'd against doc 3) …
    assert(readStateTable(indexDir).count() > indexBefore,
      "the restarted epoch's bands must land in the standing index")
    // … proven end-to-end: the NEXT epoch's duplicate of doc 3 pairs
    // against it.
    IncrementalDedup.processBatch(
      Seq((9L, base)).toDF("doc_id", "text"), index, pairsDir, 1L)
    assert(readStateTable(pairsDir)
      .filter(col("batch_id") === 1L).select("new_doc", "corpus_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .contains((9L, 3L)),
      "post-recovery epochs must dedup against restarted-epoch docs")
  }

  test("bars loop: compact + expire maintenance neither wedges the " +
      "epoch sequence nor double-counts a replay; merge stays exact") {
    val sf = "/root/testdata/sf0.001"
    val trades = graft.Tables(spark, sf).events
      .select("event_type", "ts", "event_id", "value")
    val dir = tmpDir("snap-bars-maint") + "/bars"
    for (b <- 0L to 2L)
      IncrementalBars.processBatch(
        trades.filter(col("event_id") % 4 === b), dir, b)
    // Steady-state maintenance: fold the epoch files, keep ONLY the
    // folded manifest — the posture that used to erase the ledger.
    SnapshotTable.compact(spark, dir)
    SnapshotTable.expire(spark, dir, keepLast = 1, minAgeMs = 0)
    // A replayed epoch must no-op (pre-fix: appendOnce had forgotten
    // batch 1 and re-appended its partials — double-counted bars) …
    IncrementalBars.processBatch(
      trades.filter(col("event_id") % 4 === 1), dir, 1L)
    // … and the next real epoch must land (pre-fix: the high-water
    // mark read empty, so epoch 3 was refused as a gap — loop wedged).
    IncrementalBars.processBatch(
      trades.filter(col("event_id") % 4 === 3), dir, 3L)
    val merged = IncrementalBars.bars(spark, dir)
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_trades"))
      .orderBy("event_type", "hour").collect().map(_.toSeq.toSeq).toSeq
    val batch = graft.SparkEntry.queries("timeseries_ohlc")(spark, sf)
      .collect().map(_.toSeq.toSeq).toSeq
    assert(merged == batch,
      "post-maintenance merge must equal the batch OHLC over the feed")
  }

  test("quality loop: a reader racing an epoch keeps its pinned scores; " +
      "a torn commit on both tables is invisible and unblocking") {
    import spark.implicits._
    val countsDir = tmpDir("snap-qual") + "/counts"
    val scoresDir = tmpDir("snap-qual-scores") + "/scores"
    IncrementalQuality.processBatch(
      Seq((1L, base), (2L, far)).toDF("doc_id", "text"),
      countsDir, scoresDir, 0L)
    // The racing consumer resolves the scores head NOW …
    val pinned = SnapshotTable.read(spark, scoresDir)
    // … a crashed half-commit lands in both state tables …
    plantTornCommit(countsDir)
    plantTornCommit(scoresDir)
    // … and epoch 1 commits new counts + scores underneath it.
    IncrementalQuality.processBatch(
      Seq((9L, base)).toDF("doc_id", "text"), countsDir, scoresDir, 1L)
    assert(pinned.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L),
      "the pinned consumer must keep exactly its resolved epoch-0 view")
    assert(IncrementalQuality.scores(spark, scoresDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 9L),
      "a fresh consumer reads through the torn manifest to the new head")
    // The standing model summed through the torn junk stays the union
    // model: a replay of epoch 1 must no-op on both ledgers.
    val model = IncrementalQuality.model(spark, countsDir)
      .collect().map(_.toSeq.toSeq).toSeq
    IncrementalQuality.processBatch(
      Seq((9L, base)).toDF("doc_id", "text"), countsDir, scoresDir, 1L)
    assert(IncrementalQuality.model(spark, countsDir)
      .collect().map(_.toSeq.toSeq).toSeq == model,
      "replay over a torn commit must converge on the counts ledger")
    assert(IncrementalQuality.scores(spark, scoresDir).count() == 3,
      "replay must not re-land score rows")
  }

  test("pairs consumers: a crashed FIRST pairs commit (torn manifest, " +
      "no valid snapshot) reads as the empty graph, not a failure") {
    val pairsDir = tmpDir("snap-torn-first") + "/pairs"
    val fs = new Path(pairsDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val torn = fs.create(
      new Path(s"$pairsDir/manifests/snap-00000000.manifest"), false)
    torn.write("files=1\nrows=3\n_data/b0-dead-0.parquet\n"
      .getBytes("UTF-8"))
    torn.close() // no terminator: torn
    val orphan = fs.create(new Path(s"$pairsDir/_data/b0-dead-0.parquet"),
      false)
    orphan.write(Array[Byte](1, 2, 3)); orphan.close()
    // Pre-fix this took the plain-directory read path and crashed
    // trying to parse manifests/snap-*.manifest as parquet.
    assert(IncrementalDedup.components(spark, pairsDir).isEmpty,
      "a table with only a torn commit must read as empty")
    val corpus = spark.range(3).select(col("id").as("doc_id"))
    assert(IncrementalDedup.survivors(corpus, pairsDir).count() == 3,
      "survivors over an all-torn pairs table must keep every row")
  }
}
