package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.dedup.DedupQueries
import graft.ops.Checkpoints.CheckpointOps
import graft.etl.Sinks

/** Streaming twin of the `dedup_incremental` batch query: the day-N+1
  * loop run continuously. Each micro-batch of new documents is
  * MinHash-banded through the exact machinery the batch query uses
  * ([[DedupQueries.bandsOfDocs]]), probed against the STANDING band
  * index ([[DedupQueries.incrementalPairsBetween]] — batch side
  * broadcast, standing side semi-narrowed to colliding buckets, the
  * family's degenerate-bucket cap intact), and then appended to that
  * index so later batches dedup against it. Emitted (new_doc,
  * corpus_doc) candidate pairs append to their own table for the
  * downstream merge step (`dedup_incremental_components`).
  *
  * Scale posture: per micro-batch the standing index is touched by one
  * semi-join (prunable to colliding buckets — at 100 TB the index is a
  * table bucketed by (band, bh), so the probe reads matching buckets,
  * not the corpus) and is NEVER re-banded, self-joined, or broadcast.
  * State lives in storage, not the state store — the index is the
  * product, exactly like the batch pipeline's, so batch and streaming
  * runs are interchangeable mid-corpus. The checkpoint gives
  * restart-without-reprocessing on planned restarts; the appends
  * themselves are AT-LEAST-ONCE (standard foreachBatch contract): a
  * crash between the pairs append and the index append replays the
  * epoch and can duplicate rows in either table. Both duplications are
  * made harmless downstream — pair edges are distinct-emitted and
  * set-semantics for the components consumer, and the probe collapses
  * duplicate standing band rows on the bucket-pruned slice BEFORE cap
  * ranking ([[DedupQueries.incrementalPairsBetween]]), so replays
  * never consume degenerate-bucket cap headroom.
  */
object IncrementalDedup {

  /** Storage abstraction for the STANDING band index — where the
    * streaming loop's state actually lives. Two layouts:
    *
    *  - [[DirIndex]]: plain parquet appends. The probe's rank window
    *    re-shuffles the bucket-pruned slice on (band, bh) every batch.
    *  - [[BucketedIndex]]: a managed table bucketed on `bh`
    *    ([[graft.ops.Bucketing.appendBucketed]]). Because
    *    HashPartitioning(bh) satisfies every (band, bh)-clustered
    *    requirement downstream (bh alone is a subset of the clustering
    *    keys), the probe's distinct + rank window + pair join read the
    *    standing side with ZERO Exchange — at 100 TB this removes the
    *    per-batch shuffle of the collision slice, the only
    *    index-proportional data movement in the loop
    *    (IncrementalDedupSpec pins the Exchange-free plan).
    */
  sealed trait BandIndex {
    def exists(spark: org.apache.spark.sql.SparkSession): Boolean
    def read(spark: org.apache.spark.sql.SparkSession): DataFrame
    def append(bands: DataFrame): Unit
  }

  final case class DirIndex(dir: String) extends BandIndex {
    def exists(spark: org.apache.spark.sql.SparkSession): Boolean = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    def read(spark: org.apache.spark.sql.SparkSession): DataFrame =
      spark.read.parquet(dir)
    def append(bands: DataFrame): Unit = Sinks.appendParquet(bands, dir)
  }

  final case class BucketedIndex(table: String, buckets: Int = 32)
      extends BandIndex {
    def exists(spark: org.apache.spark.sql.SparkSession): Boolean =
      spark.catalog.tableExists(table)
    def read(spark: org.apache.spark.sql.SparkSession): DataFrame =
      spark.table(table)
    def append(bands: DataFrame): Unit =
      graft.ops.Bucketing.appendBucketed(bands, table, "bh", buckets)
  }

  /** One micro-batch step: probe, emit pairs, grow the index.
    * Exposed for specs; [[start]] wires it behind a checkpoint. */
  private[streaming] def processBatch(
      docs: DataFrame, indexDir: String, pairsDir: String): Unit =
    processBatch(docs, DirIndex(indexDir), pairsDir)

  private[streaming] def processBatch(
      docs: DataFrame, index: BandIndex, pairsDir: String): Unit = {
    if (docs.isEmpty) return
    val spark = docs.sparkSession
    // The batch is re-read below the pair join AND the index append;
    // checkpoint so banding (the CPU-heavy md5/minhash pass) runs once.
    val newBands = DedupQueries.bandsOfDocs(docs).cut(false)
    // Same-batch duplicates must pair too: the standing-index probe
    // below runs before this batch's bands join the index, so two
    // copies landing in ONE batch would otherwise stay unlinked
    // forever (strictly lower recall than the batch pipeline's
    // corpus-vs-corpus pass). The batch is probed against itself with
    // the same capped machinery; doc_id ordering drops self edges and
    // mirror duplicates.
    val intra = DedupQueries.incrementalPairsBetween(newBands, newBands)
      .filter(col("new_doc") > col("corpus_doc"))
    val emitted =
      if (index.exists(spark))
        DedupQueries.incrementalPairsBetween(newBands, index.read(spark))
          .unionByName(intra)
      else intra
    // Checkpointed: isEmpty is an action, and without the pin the
    // append below would re-run the whole standing-index probe
    // (semi-join + rank window + pair join) a second time.
    val pairs = emitted.cut(false)
    if (!pairs.isEmpty) Sinks.appendParquet(pairs, pairsDir)
    index.append(newBands)
  }

  /** Starts the loop over a stream of (doc_id, text) documents against
    * a directory-layout index; pass a [[BucketedIndex]] to the overload
    * for the Exchange-free standing side. */
  def start(
      docs: DataFrame, indexDir: String, pairsDir: String,
      checkpointDir: String,
      trigger: Trigger): StreamingQuery =
    start(docs, DirIndex(indexDir), pairsDir, checkpointDir, trigger)

  def start(
      docs: DataFrame, indexDir: String, pairsDir: String,
      checkpointDir: String): StreamingQuery =
    start(docs, DirIndex(indexDir), pairsDir, checkpointDir,
      Streaming.HourlyTrigger)

  def start(
      docs: DataFrame, index: BandIndex, pairsDir: String,
      checkpointDir: String,
      trigger: Trigger = Streaming.HourlyTrigger): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        processBatch(batch.toDF(), index, pairsDir)
      }
      .start()
}
