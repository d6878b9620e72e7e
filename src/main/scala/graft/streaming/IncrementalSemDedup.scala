package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sim.SimilarityQueries
import graft.ops.Checkpoints.CheckpointOps
import graft.etl.Sinks

/** Streaming SEMANTIC near-dedup: the embedding twin of
  * [[IncrementalDedup]] — a continuous day-N+1 loop where each
  * micro-batch of new vectors is sign-LSH-bucketed through the
  * similarity family's machinery ([[SimilarityQueries.bucketRowsOf]]),
  * probed against the STANDING bucket index
  * ([[SimilarityQueries.incrementalSemPairsBetween]] — batch side
  * broadcast, standing side semi-narrowed to colliding buckets, the
  * family's degenerate-bucket cap intact, cosine scored only on the
  * collision frame), and appended to that index so later batches dedup
  * against it. Emitted (new_vec, corpus_vec, sim_e6) pairs append to
  * their own table for a downstream components/survivors consumer —
  * the same contract as the text loop's pair table.
  *
  * Same-batch duplicates pair through the batch-vs-itself pass
  * (orientation-filtered), closing the recall gap the text loop closed
  * in round 9. Appends are AT-LEAST-ONCE (standard foreachBatch): a
  * replay can duplicate index rows, which the probe collapses on the
  * bucket-pruned slice before cap ranking, and pair rows, which are
  * distinct-emitted and set-semantics downstream.
  *
  * Scale posture: per batch the standing index is touched by ONE
  * semi-join on bucket keys — at 100 TB the index is a table bucketed
  * on `bucket` (the [[IncrementalDedup.BucketedIndex]] layout applies
  * verbatim: HashPartitioning(bucket) satisfies the rank window and
  * pair join, zero Exchange on the standing side) — and the index is
  * never re-bucketed, self-joined, or broadcast. Embedding payloads DO
  * live in the index (the probe must score cosine), which is the real
  * storage trade vs the text loop's key-only bands: 256 B/vector at
  * 64-dim f32, the same bytes an ANN serving index carries.
  */
object IncrementalSemDedup {

  /** One micro-batch step over (vec_id, embedding) rows: probe, emit
    * pairs, grow the index. Exposed for specs; [[start]] wires it
    * behind a checkpoint. */
  private[streaming] def processBatch(
      vecs: DataFrame, indexDir: String, pairsDir: String): Unit = {
    if (vecs.isEmpty) return
    val spark = vecs.sparkSession
    // Bucketing (the plane dot products) runs once: the batch frame is
    // consumed by the intra pass, the standing probe, and the append.
    val newRows = SimilarityQueries.bucketRowsOf(vecs).cut(false)
    val intra = SimilarityQueries
      .incrementalSemPairsBetween(newRows, newRows)
      .filter(col("new_vec") > col("corpus_vec"))
    val exists = {
      val p = new org.apache.hadoop.fs.Path(indexDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val emitted =
      if (exists)
        SimilarityQueries
          .incrementalSemPairsBetween(newRows, spark.read.parquet(indexDir))
          .unionByName(intra)
      else intra
    val pairs = emitted.cut(false)
    if (!pairs.isEmpty) Sinks.appendParquet(pairs, pairsDir)
    Sinks.appendParquet(newRows, indexDir)
  }

  /** Starts the loop over a stream of (vec_id, embedding) rows. */
  def start(
      vecs: DataFrame, indexDir: String, pairsDir: String,
      checkpointDir: String,
      trigger: Trigger = Streaming.HourlyTrigger): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        processBatch(batch.toDF(), indexDir, pairsDir)
      }
      .start()
}
