package graft

import org.apache.spark.sql.functions.col

/** The streaming bench cells: replayable, state-producing, and
  * self-cleaning — so the bench gate prices the loops without leaving
  * scratch behind. */
class BenchStreamsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The round-15 bounded-metadata contract: the mid-lifecycle
    * maintenance leg (compact + expire after epoch 1) leaves each
    * state table with at most the folded head + epoch 2's commit. */
  private def assertMaintained(dir: String): Unit =
    for (t <- Seq("index", "pairs")) {
      val p = s"$dir/$t"
      if (graft.etl.SnapshotTable.currentSnapshot(spark, p).nonEmpty) {
        val snaps = graft.etl.SnapshotTable.snapshots(spark, p)
        assert(snaps.length <= 2,
          s"$p must retain <= 2 manifests after maintenance: $snaps")
      }
    }

  test("dedup cell runs the full corpus through 3 epochs, maintains " +
      "mid-lifecycle, and emits pairs") {
    val dir = tmpDir("bench-stream-spec")
    val cell = BenchStreams.cells.find(_._1 == "stream_dedup_loop").get
    cell._2(spark, sf, dir)
    val idx = readStateTable(s"$dir/index")
    // Every doc banded exactly once, across the three epoch commits —
    // the compact+expire between epochs 1 and 2 must lose none of
    // them and must not block epoch 2 (the ledger carries the
    // high-water mark through the fold).
    assert(idx.select("doc_id").distinct().count() == 500)
    assert(idx.select("batch_id").distinct().count() == 3)
    // The planted duplicates in the corpus cross epochs, so the loop
    // must have emitted pairs.
    assert(readStateTable(s"$dir/pairs").count() > 0)
    assertMaintained(dir)
  }

  test("semantic and media cells run the full corpus through 3 epochs") {
    val semDir = tmpDir("bench-stream-sem")
    BenchStreams.cells.find(_._1 == "stream_semdedup_loop").get._2(spark, sf, semDir)
    val semIdx = readStateTable(s"$semDir/index")
    assert(semIdx.select("vec_id").distinct().count() == 500)
    assert(semIdx.select("batch_id").distinct().count() == 3)
    // 4 OR-amplified table rows per vector.
    assert(semIdx.count() == 4 * 500)
    assertMaintained(semDir)

    val mmDir = tmpDir("bench-stream-mm")
    BenchStreams.cells.find(_._1 == "stream_media_loop").get._2(spark, sf, mmDir)
    val mmIdx = readStateTable(s"$mmDir/index")
    val nImages = graft.mm.Multimodal.mediaItems(spark, sf, "image").count()
    assert(nImages > 0)
    assert(mmIdx.select("item_id").distinct().count() == nImages)
    assert(mmIdx.select("batch_id").distinct().count() == 3)
    assertMaintained(mmDir)
  }

  test("the cold-training cell re-trains every attempt (no memo hit)") {
    val cell = BenchStreams.cells.find(_._1 == "bpe_train_loop").get
    // Two attempts must both pay real training: if the second read a
    // memo it would complete in ~ms — assert it still runs jobs by
    // timing floor being comparable (>= 25% of the first attempt).
    val t1 = BenchStreams.runCell(spark, sf, cell)
    val t2 = BenchStreams.runCell(spark, sf, cell)
    assert(t1 > 0 && t2 > 0)
    assert(t2 >= t1 * 0.25,
      s"second attempt ($t2 s) looks memoized vs first ($t1 s) — the " +
        "cell must price cold training every time")
  }

  test("runCell times an attempt and removes its scratch") {
    val before = java.nio.file.Files.list(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
      .filter(_.getFileName.toString.startsWith("bench-stream_semdedup_loop"))
      .count()
    val wall = BenchStreams.runCell(spark, sf,
      BenchStreams.cells.find(_._1 == "stream_semdedup_loop").get)
    assert(wall > 0, "cell must complete and report wall seconds")
    val after = java.nio.file.Files.list(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
      .filter(_.getFileName.toString.startsWith("bench-stream_semdedup_loop"))
      .count()
    assert(after == before, "scratch dirs must be deleted")
  }

  test("all ten cells are declared") {
    assert(BenchStreams.cells.map(_._1).sorted ==
      Seq("bpe_train_loop", "snapshot_maintenance_loop",
        "stream_ann_loop", "stream_bars_loop", "stream_curation_loop",
        "stream_dedup_loop", "stream_domain_loop", "stream_media_loop",
        "stream_quality_loop", "stream_semdedup_loop"))
  }

  test("the maintenance cell folds to one manifest and the merged bars " +
      "survive the GC unchanged") {
    val dir = tmpDir("bench-snap-maint")
    BenchStreams.cells.find(_._1 == "snapshot_maintenance_loop").get
      ._2(spark, sf, dir)
    val snaps = graft.etl.SnapshotTable.snapshots(spark, s"$dir/bars")
    assert(snaps.length == 1 && snaps.head.files.length == 1,
      s"compact+expire must leave one single-file snapshot: $snaps")
    val merged = streaming.IncrementalBars.bars(spark, s"$dir/bars").count()
    val batch = SparkEntry.queries("timeseries_ohlc")(spark, sf).count()
    assert(merged == batch,
      "the maintained table must still merge to the exact batch bars")
  }
}
