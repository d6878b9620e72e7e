package graft.streaming

import graft.SparkSpec
import graft.mm.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming incremental MEDIA near-dedup (image modality as the
  * representative — the probe machinery is shared across modalities): micro-batches
  * fingerprint through the real PNG codec, probe the standing hash
  * index, emit hamming pairs, grow the index. */
class IncrementalMediaDedupSpec extends SparkSpec {

  // Same-seed PNGs are byte-identical → hamming 0; different seeds
  // move the aHash (the audio energy ENVELOPE, by contrast, is nearly
  // seed-invariant under the generative sawtooth — every synthetic WAV
  // is a true near-dup, so audio cannot plant a negative here).
  private def item(id: Long, seed: Long): Multimodal.MediaItem =
    Multimodal.MediaItem(id, "image",
      Multimodal.syntheticPng(seed, 16, 14),
      Map("seed" -> seed.toString))

  test("media pairs accumulate against the growing standing hash index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Multimodal.MediaItem]
    val indexDir = tmpDir("med-index") + "/hashes"
    val pairsDir = tmpDir("med-pairs") + "/pairs"
    val ckpt = tmpDir("med-ckpt")
    val q = IncrementalMediaDedup.start(
      input.toDF(), "image", indexDir, pairsDir, ckpt,
      Trigger.ProcessingTime(0))
    try {
      def pairs(): Set[(Long, Long, Long)] =
        if (new java.io.File(pairsDir).exists())
          spark.read.parquet(pairsDir).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        else Set.empty

      input.addData(item(1L, seed = 7L), item(2L, seed = 99L))
      q.processAllAvailable()
      assert(pairs().isEmpty)
      assert(spark.read.parquet(indexDir).count() == 2)

      // A same-seed copy pairs with the standing original at hamming 0.
      input.addData(item(20L, seed = 7L))
      q.processAllAvailable()
      assert(pairs() == Set((20L, 1L, 0L)))

      // Another copy pairs with BOTH standing copies.
      input.addData(item(40L, seed = 7L))
      q.processAllAvailable()
      assert(pairs() == Set((20L, 1L, 0L), (40L, 1L, 0L), (40L, 20L, 0L)))
    } finally q.stop()
  }

  test("duplicates landing in the SAME micro-batch pair with each other") {
    import spark.implicits._
    val indexDir = tmpDir("med-ib-index") + "/hashes"
    val pairsDir = tmpDir("med-ib-pairs") + "/pairs"
    IncrementalMediaDedup.processBatch(
      Seq(item(1L, 7L), item(2L, 99L), item(3L, 7L)).toDF(),
      "image", indexDir, pairsDir)
    val got = spark.read.parquet(pairsDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 1L)),
      "same-batch dup items must pair, oriented new > corpus")
    IncrementalMediaDedup.processBatch(
      Seq(item(9L, 7L)).toDF(), "image", indexDir, pairsDir)
    val got2 = spark.read.parquet(pairsDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == Set((3L, 1L), (9L, 1L), (9L, 3L)))
  }
}
