package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental OHLC bar building — the streaming twin of
  * `timeseries_ohlc` (graft/ops/MarketQueries.scala), built on the
  * bar-composition property `timeseries_ohlc_daily` proves: a bar is a
  * MERGEABLE aggregate (open/close carry their ordering key, high/low/n
  * fold), so each epoch appends only its PARTIAL bars (metadata-sized:
  * one row per bar the batch touched) and the read-side merge
  * reconstructs exact bars without ever revisiting trade rows.
  *
  * This is the streaming pre-aggregation pattern: state grows with
  * (bars × epochs), not with trades; a compactor can fold epochs
  * whenever it likes because the merge is associative. Epoch writes are
  * per-epoch-directory overwrites, so replays of the same batch id are
  * idempotent; out-of-order epochs (a gap) are refused — the same
  * continuity discipline as the dedup loops, minus the standing-index
  * probe this loop doesn't need.
  */
object IncrementalBars {

  /** Exact partial bars for one batch of trades: one row per
    * (instrument, hour) present in the batch. Open/close keep their
    * (micros, event_id) ordering key so partials from different epochs
    * merge exactly. */
  private[graft] def partialBars(trades: DataFrame): DataFrame =
    trades
      .select(
        col("event_type"),
        date_trunc("hour", col("ts")).as("hour"),
        struct(expr("unix_micros(ts)").as("us"), col("event_id").as("eid"))
          .as("k"),
        graft.util.Det.toUnits(col("value"), 100L).cast("long").as("cents"))
      .groupBy(col("event_type"), col("hour"))
      .agg(
        min(struct(col("k"), col("cents"))).as("open_k"),
        max(struct(col("k"), col("cents"))).as("close_k"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        count(lit(1)).as("n_trades"))

  /** Land one epoch's partial bars. Idempotent per batch id (directory
    * overwrite); refuses a batch id that would leave an epoch gap. */
  private[graft] def processBatch(
      trades: DataFrame, barsDir: String, batchId: Long): Unit = {
    val spark = trades.sparkSession
    val root = new org.apache.hadoop.fs.Path(barsDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // Only COMMITTED epochs advance the high-water mark: a crashed
    // half-written epoch N must force a replay of N before N+1 can
    // land, otherwise the reader-side _SUCCESS filter would silently
    // hide N forever while N+1.. keep accumulating.
    val existing: Set[Long] =
      if (!fs.exists(root)) Set.empty
      else fs.listStatus(root).toSeq
        .map(_.getPath)
        .filter(p => p.getName.startsWith("epoch=") &&
          fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
        .map(_.getName.stripPrefix("epoch=").toLong).toSet
    val next = if (existing.isEmpty) 0L else existing.max + 1
    require(batchId <= next,
      s"epoch gap: batch $batchId after ${existing.toSeq.sorted}")
    // Empty batches COMMIT an empty epoch (zero partial-bar rows, real
    // _SUCCESS): an early return here would never advance the
    // high-water mark, wedging the sequence — every later batch id
    // would read as a gap and a replay of the empty batch could never
    // un-wedge it. Unconditional write also means the batch pipeline
    // runs exactly once (no isEmpty probe job).
    partialBars(trades)
      .write.mode("overwrite").parquet(s"$barsDir/epoch=$batchId")
  }

  /** Late-trade correction — the `force` backfill analog for the bars
    * loop ([[graft.etl.Backfill]]'s named-partition recompute): epoch
    * `epoch` is RE-OPENED by recomputing its partial bars from the
    * corrected trade feed (the epoch's original trades plus the late
    * arrivals, replayed from the upstream source of truth) and
    * overwriting exactly that epoch's directory. Full recompute, not
    * a merge of late partials into the committed ones: a merge
    * double-counts n_trades under the at-least-once redelivery this
    * loop must tolerate, while recompute is idempotent — replaying
    * the same correction converges (same input, same partials, same
    * directory overwrite). Only COMMITTED epochs can be reopened (an
    * uncommitted or gap epoch is a replay, [[processBatch]]'s job);
    * later epochs are untouched, and the read-side merge picks up the
    * correction because bars are mergeable aggregates —
    * IncrementalBarsSpec pins merged-after-reopen ≡ the batch
    * `timeseries_ohlc` over the corrected feed. */
  private[graft] def reopen(
      trades: DataFrame, barsDir: String, epoch: Long): Unit = {
    val spark = trades.sparkSession
    val root = new org.apache.hadoop.fs.Path(barsDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val p = new org.apache.hadoop.fs.Path(root, s"epoch=$epoch")
    require(fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")),
      s"epoch $epoch is not committed under $barsDir — a late-trade " +
        "reopen corrects a landed epoch; use processBatch to land new ones")
    partialBars(trades)
      .write.mode("overwrite").parquet(p.toString)
  }

  /** The merged exact bars across all COMMITTED epochs — identical to
    * running the batch OHLC over every trade ever landed (spec-pinned
    * against `timeseries_ohlc`). Reads partial-bar rows only, and only
    * from epoch directories whose _SUCCESS marker exists: a crashed
    * half-written epoch is invisible to readers until its replay
    * overwrites it (the same torn-write discipline as SnapshotTable's
    * manifest reads). */
  private[graft] def bars(spark: org.apache.spark.sql.SparkSession,
      barsDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(barsDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(root), s"no committed epochs under $barsDir")
    val committed = fs.listStatus(root).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("epoch=") &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(_.toString)
    require(committed.nonEmpty, s"no committed epochs under $barsDir")
    spark.read.parquet(committed: _*)
      .groupBy(col("event_type"), col("hour"))
      .agg(
        min(col("open_k")).getField("cents").as("open_cents"),
        max(col("high_cents")).as("high_cents"),
        min(col("low_cents")).as("low_cents"),
        max(col("close_k")).getField("cents").as("close_cents"),
        sum(col("n_trades")).as("n_trades"))
  }
}
