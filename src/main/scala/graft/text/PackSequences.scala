package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.CheckpointOps

/** The fully-parallel form of [[TextQueries]]' `pack_sequences` — the
  * two-phase distributed prefix sum that replaces the per-split ordered
  * window at extreme scale (where an ordered window funnels each split
  * through one task):
  *
  *  1. range-partition and sort by (split, doc_id) — the global pack
  *     order, each partition a contiguous slice of it;
  *  2. per-partition (split, token subtotal) pairs — P·splits tiny rows
  *     collected to the driver (metadata-sized, the canonical
  *     broadcast-scan step);
  *  3. exclusive-scan the subtotals into per-(partition, split) base
  *     offsets, broadcast them back, and compute each partition's local
  *     running offsets on top — one sequential pass per PARTITION, all
  *     partitions independent.
  *
  * Output is identical to the windowed query for ANY partitioning: the
  * base-offset correction makes every doc's start offset depend only on
  * the global (split, doc_id) order, never on where range boundaries
  * fell — which is what PackSequencesSpec proves row-for-row.
  *
  * mapPartitions is the right tool here (the documented last resort):
  * a running prefix within a sorted partition is genuinely per-partition
  * imperative state that no built-in expression provides without the
  * single-task window.
  */
/** Row types for [[PackSequences]] — top-level (not nested private)
  * because encoder-generated code instantiates them reflectively. */
private[text] case class DocTok(doc_id: Long, split: String, n_tokens: Long)
private[text] case class Packed(
    doc_id: Long, split: String, n_tokens: Long,
    start_offset: Long, seq_first: Long, seq_last: Long)

object PackSequences {

  /** `docs` must carry (doc_id: long, split: string, n_tokens: long). */
  def twoPhase(
      spark: SparkSession, docs: DataFrame,
      seqLen: Int, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    // The lineage cut PINS the partition layout: RangePartitioner's
    // boundaries come from reservoir sampling whose seed varies per
    // job, so without materializing once, the subtotal job and the
    // output job could range-partition the SAME rows differently — and
    // phase 3 would apply partition p's base offset to rows that were
    // counted in partition p±1. Cutting makes both passes read the one
    // materialized layout. Fault tolerance is config-gated
    // ([[graft.ops.Checkpoints]]): by default the cut is a
    // localCheckpoint, whose unreplicated blocks fail-loud (never wrong
    // offsets) on executor loss; on a real cluster set
    // `graft.checkpoint.dir` and every cut becomes a reliable
    // checkpoint that survives executor loss.
    val ranged = docs
      .select(col("doc_id"), col("split"), col("n_tokens"))
      .as[DocTok]
      .repartitionByRange(partitions, col("split"), col("doc_id"))
      .sortWithinPartitions(col("split"), col("doc_id"))
      .cut()

    // Phase 1+2: per-(partition, split) token subtotals, driver-side
    // exclusive scan in global (split, doc_id) order. P·splits rows —
    // metadata, not data.
    val subtotals: Array[(Int, String, Long)] = ranged
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach(d => sums.update(d.split, sums.getOrElse(d.split, 0L) + d.n_tokens))
        sums.iterator.map { case (s, n) => (pid, s, n) }
      }
      .collect()
    val base: Map[(Int, String), Long] = {
      val bySplit = subtotals.groupBy(_._2)
      bySplit.flatMap { case (split, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, n) =>
          val b = ((pid, split), acc); acc += n; b
        }
      }
    }
    val baseB = spark.sparkContext.broadcast(base)

    // Phase 3: local running offsets on top of the broadcast bases.
    ranged
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val running = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { d =>
          val start = baseB.value.getOrElse((pid, d.split), 0L) +
            running.getOrElse(d.split, 0L)
          running.update(d.split, running.getOrElse(d.split, 0L) + d.n_tokens)
          Packed(d.doc_id, d.split, d.n_tokens, start,
            start / seqLen, (start + d.n_tokens - 1) / seqLen)
        }
      }
      .toDF()
  }
}
