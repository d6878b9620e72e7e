package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-strategy gates for frames whose size is corpus-dependent.
  *
  * The dup-labels frames produced by the dedup family (doc labels,
  * image labels, standing incremental state) scale with
  * dup-rate × corpus: tiny at test SFs, billions of rows on a 100 TB
  * crawl at a realistic 30–50% dup rate. An unconditional
  * `broadcast(labels)` is therefore silently fatal at scale — it OOMs
  * the driver/executors exactly when the pipeline is doing its job.
  * These helpers make the decision explicit: shuffled equi-join is the
  * default, broadcast is a fast path taken only below a row gate the
  * caller measures on the (already checkpointed) labels frame.
  */
object ScaleGates {

  /** Max label rows eligible for the broadcast fast path. A label row
    * is a handful of longs; 1M rows is ~tens of MB broadcast — safely
    * inside any executor budget. Above this the join shuffles on the
    * key (and AQE may still convert at runtime if observed sizes
    * allow, which is the correct, size-informed call). */
  val LabelsBroadcastMaxRows: Long = 1L << 20

  /** Left-joins a corpus-scale frame against a labels frame on `key`.
    * `labelRows` is the measured labels row count (cheap when the
    * labels frame is checkpointed, which every caller's is): below the
    * gate the labels side is broadcast; at or above it the join
    * shuffles — the labels side is NEVER force-broadcast on size it
    * hasn't earned. */
  def annotateWithLabels(
      corpus: DataFrame, labels: DataFrame, labelRows: Long,
      key: String): DataFrame =
    if (labelRows < LabelsBroadcastMaxRows)
      corpus.join(broadcast(labels), Seq(key), "left")
    else corpus.join(labels, Seq(key), "left")

  /** Anti-joins a corpus-scale frame against a drop-list on `key`,
    * same gate discipline: the drop side broadcasts only below the
    * measured row gate (survivor-selection's "remove the losers"
    * step — the drop list is dup-graph-sized, which earns broadcast
    * at test SFs and must NOT assume it at crawl scale). */
  def dropByKeys(
      corpus: DataFrame, drops: DataFrame, dropRows: Long,
      key: String): DataFrame =
    if (dropRows < LabelsBroadcastMaxRows)
      corpus.join(broadcast(drops), Seq(key), "left_anti")
    else corpus.join(drops, Seq(key), "left_anti")
}
