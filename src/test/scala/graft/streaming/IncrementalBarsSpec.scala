package graft.streaming

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Incremental bar building: epoch-merged partial bars must equal the
  * batch OHLC over all trades (the mergeable-aggregate contract), the
  * state must be bar-sized not trade-sized, replays must be idempotent,
  * and epoch gaps must be refused. */
class IncrementalBarsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def trades = Tables(spark, sf).events
    .select("event_type", "ts", "event_id", "value")

  test("3-epoch merged bars equal the batch timeseries_ohlc") {
    val dir = tmpDir("bars")
    for (b <- 0L to 2L)
      IncrementalBars.processBatch(
        trades.filter(col("event_id") % 3 === b), s"$dir/bars", b)
    val merged = IncrementalBars.bars(spark, s"$dir/bars")
      .select(
        col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_trades"))
      .orderBy("event_type", "hour")
      .collect().map(_.toSeq)
    val batch = SparkEntry.queries("timeseries_ohlc")(spark, sf)
      .collect().map(_.toSeq)
    assert(merged.toSeq == batch.toSeq,
      "incremental merge must reconstruct the exact batch bars")
  }

  test("state is bar-sized: each epoch lands one row per touched bar") {
    val dir = tmpDir("bars-size")
    val epoch0 = trades.filter(col("event_id") % 3 === 0)
    IncrementalBars.processBatch(epoch0, s"$dir/bars", 0L)
    val landed = readStateTable(s"$dir/bars")
      .filter(col("batch_id") === 0L)
    val touched = epoch0
      .select(col("event_type"), date_trunc("hour", col("ts"))).distinct()
    assert(landed.count() == touched.count(),
      "partial-bar state must be (instrument x hour)-sized, never trade-sized")
  }

  test("a late trade re-opens its epoch: merged bars equal the batch " +
      "OHLC over the corrected feed; the correction replays idempotently") {
    val dir = tmpDir("bars-late")
    val lateId = trades.agg(min(col("event_id"))).collect().head.getLong(0)
    val late = col("event_id") === lateId
    // the late trade is withheld from its epoch at landing time
    for (b <- 0L to 2L)
      IncrementalBars.processBatch(
        trades.filter(col("event_id") % 3 === b && !late), s"$dir/bars", b)
    def merged = IncrementalBars.bars(spark, s"$dir/bars")
      .select(
        col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_trades"))
      .orderBy("event_type", "hour")
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("timeseries_ohlc")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(merged != batch,
      "the withheld trade must make the landed bars visibly short")
    // the late trade arrives: re-open its epoch with the corrected feed
    def correct(): Unit = IncrementalBars.reopen(
      trades.filter(col("event_id") % 3 === lateId % 3),
      s"$dir/bars", lateId % 3)
    correct()
    assert(merged == batch,
      "reopened epoch + untouched epochs must reconstruct the batch bars")
    // redelivery of the same correction converges
    correct()
    assert(merged == batch, "reopen replay must be idempotent")
    // an epoch that never committed cannot be 'reopened'
    val e = intercept[IllegalArgumentException] {
      IncrementalBars.reopen(trades.limit(1), s"$dir/bars", 9L)
    }
    assert(e.getMessage.contains("not committed"))
  }

  test("replaying an epoch is idempotent; an epoch gap is refused") {
    val dir = tmpDir("bars-replay")
    IncrementalBars.processBatch(
      trades.filter(col("event_id") % 3 === 0), s"$dir/bars", 0L)
    IncrementalBars.processBatch(
      trades.filter(col("event_id") % 3 === 1), s"$dir/bars", 1L)
    val before = IncrementalBars.bars(spark, s"$dir/bars")
      .orderBy("event_type", "hour").collect().toSeq
    // redelivery of epoch 1 (at-least-once) — same data, same result
    IncrementalBars.processBatch(
      trades.filter(col("event_id") % 3 === 1), s"$dir/bars", 1L)
    val after = IncrementalBars.bars(spark, s"$dir/bars")
      .orderBy("event_type", "hour").collect().toSeq
    assert(before == after, "replay must not change the merged bars")
    // skipping epoch 2 and landing 3 would leave a gap
    val e = intercept[IllegalArgumentException] {
      IncrementalBars.processBatch(
        trades.filter(col("event_id") % 3 === 2), s"$dir/bars", 3L)
    }
    assert(e.getMessage.contains("epoch gap"))
  }
}
