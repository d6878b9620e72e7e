package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming incremental SEMANTIC near-dedup: micro-batches of vectors
  * bucket against the standing embedding index, emit cosine near-dup
  * pairs, and grow the index — batch ↔ streaming parity for the
  * embedding modality, mirroring [[IncrementalDedupSpec]]. */
class IncrementalSemDedupSpec extends SparkSpec {

  // Base vector and a same-direction twin (cosine 1.0 — identical
  // direction always shares every sign-LSH bucket); `far` flips signs
  // on half the dims, pushing cosine ≈ 0 < the 0.15 threshold.
  private val base: Seq[Float] = (0 until 64).map(i => 0.1f + 0.01f * i)
  private val scaledDup: Seq[Float] = base.map(_ * 2.0f)
  private val far: Seq[Float] =
    (0 until 64).map(i => if (i % 2 == 0) 0.1f + 0.01f * i else -(0.1f + 0.01f * i))

  test("semantic pairs accumulate against the growing standing index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val indexDir = tmpDir("sem-index") + "/buckets"
    val pairsDir = tmpDir("sem-pairs") + "/pairs"
    val ckpt = tmpDir("sem-ckpt")
    val q = IncrementalSemDedup.start(
      input.toDF().toDF("vec_id", "embedding"),
      indexDir, pairsDir, ckpt, Trigger.ProcessingTime(0))
    try {
      def pairs(): Set[(Long, Long, Long)] =
        if (new java.io.File(pairsDir).exists())
          spark.read.parquet(pairsDir).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        else Set.empty

      // Batch 1 seeds: nothing standing, unrelated vectors, no pairs.
      input.addData((1L, base), (2L, far))
      q.processAllAvailable()
      assert(pairs().isEmpty)
      assert(spark.read.parquet(indexDir).count() == 2)

      // Batch 2: a scaled copy of vec 1 (cosine exactly 1.0) pairs
      // with it through the standing index; nothing pairs with `far`.
      input.addData((20L, scaledDup))
      q.processAllAvailable()
      assert(pairs() == Set((20L, 1L, 1000000L)))

      // Batch 3: another copy pairs with BOTH standing copies.
      input.addData((40L, base))
      q.processAllAvailable()
      assert(pairs() == Set(
        (20L, 1L, 1000000L), (40L, 1L, 1000000L), (40L, 20L, 1000000L)))
    } finally q.stop()
  }

  test("duplicates landing in the SAME micro-batch pair with each other") {
    import spark.implicits._
    val indexDir = tmpDir("sem-ib-index") + "/buckets"
    val pairsDir = tmpDir("sem-ib-pairs") + "/pairs"
    IncrementalSemDedup.processBatch(
      Seq((1L, base), (2L, far), (3L, scaledDup))
        .toDF("vec_id", "embedding"),
      indexDir, pairsDir)
    val got = spark.read.parquet(pairsDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 1L)),
      "same-batch near-dups must pair, oriented new > corpus")
    // The next batch still pairs with both through the standing index.
    IncrementalSemDedup.processBatch(
      Seq((9L, base)).toDF("vec_id", "embedding"), indexDir, pairsDir)
    val got2 = spark.read.parquet(pairsDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == Set((3L, 1L), (9L, 1L), (9L, 3L)))
  }
}
