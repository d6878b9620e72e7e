package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Streaming tests (SURVEY.md §2.6/§5): watermarked tumbling windows
  * over a MemoryStream (manual event times only — never the wall
  * clock), append-sink accumulation, and checkpoint restart without
  * reprocessing. */
class StreamingSpec extends SparkSpec {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2022-12-18 $hhmm:00")

  test("watermark closes hour windows; append emits only finalized windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = Streaming.hourlyTumbling(
      input.toDF().toDF("ts", "value"), watermark = "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("tumbling").start()
    try {
      input.addData((ts("10:05"), 1.0), (ts("10:20"), 2.0), (ts("11:05"), 4.0))
      q.processAllAvailable()
      // Watermark after batch 1 = 11:05 - 10m = 10:55 < 11:00 → the
      // 10:00 window is still open; append has emitted nothing.
      assert(spark.table("tumbling").isEmpty)

      input.addData((ts("12:30"), 8.0)) // watermark → 12:20, closes 10:00 + 11:00
      q.processAllAvailable()
      val rows = spark.table("tumbling").collect()
        .map(r => r.getAs[Timestamp]("hour_start") ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
      assert(rows(ts("10:00")) == ((2L, 3.0)))
      assert(rows(ts("11:00")) == ((1L, 4.0)))
      assert(!rows.contains(ts("12:00"))) // still open
    } finally q.stop()
  }

  test("checkpointed append sink: restart does not reprocess") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val table = tmpDir("stream-table") + "/t"
    val ckpt = tmpDir("stream-ckpt")
    val df = input.toDF().toDF("ts", "value")

    input.addData((ts("10:00"), 1.0), (ts("10:30"), 2.0))
    val q1 = Streaming.startAppend(df, table, ckpt, Trigger.AvailableNow())
    q1.awaitTermination()
    assert(spark.read.parquet(table).count() == 2)

    // Restart from the same checkpoint with one new record: only the
    // new record is appended (offsets recovered, no duplicates).
    input.addData((ts("11:00"), 4.0))
    val q2 = Streaming.startAppend(df, table, ckpt, Trigger.AvailableNow())
    q2.awaitTermination()
    val rows = spark.read.parquet(table)
    assert(rows.count() == 3)
    assert(rows.agg(sum("value")).collect().head.getDouble(0) == 7.0)
  }

  test("stream-stream interval join pairs within the horizon, drops outside it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = Streaming.intervalJoin(
      clicks.toDF().toDF("user_id", "ts"),
      buys.toDF().toDF("user_id", "ts").withColumnRenamed("ts", "ts"),
      key = "user_id", horizon = "15 MINUTE")
      .select(col("l.user_id"), col("l.ts").as("click_ts"), col("r.ts").as("buy_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attribution").start()
    try {
      clicks.addData((1L, ts("10:00")), (2L, ts("10:00")))
      buys.addData((1L, ts("10:10")),  // within 15m of user 1's click
        (2L, ts("10:30")),             // outside user 2's horizon
        (3L, ts("10:05")))             // no click at all
      q.processAllAvailable()
      val rows = spark.table("attribution").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2))).toSet
      assert(rows == Set((1L, ts("10:10"))),
        s"only the in-horizon same-key pair joins: ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("dedupWithinWatermark drops repeats across micro-batches, bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val deduped = Streaming.dedupWithinWatermark(
      input.toDF().toDF("event_id", "ts", "value"),
      Seq("event_id"), watermark = "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      // Batch 1: two events, one internal duplicate.
      input.addData((1L, ts("10:00"), 1.0), (1L, ts("10:00"), 1.0),
        (2L, ts("10:01"), 2.0))
      q.processAllAvailable()
      // Batch 2: id 1 retried (at-least-once upstream) within the
      // watermark → dropped; id 3 is new.
      input.addData((1L, ts("10:02"), 1.0), (3L, ts("10:03"), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect()
        .map(_.getAs[Long]("event_id")).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"retries must dedup: $ids")

      // Advance the watermark far past id 1's horizon; its state is
      // evicted, so a very-late replay of id 1 is admitted again —
      // bounded state trades unbounded-history dedup for a horizon,
      // which is the 100 TB contract.
      input.addData((9L, ts("11:00"), 9.0))
      q.processAllAvailable()
      input.addData((1L, ts("11:01"), 1.0))
      q.processAllAvailable()
      val after = spark.table("dedup_stream").collect()
        .map(_.getAs[Long]("event_id")).sorted.toSeq
      assert(after == Seq(1L, 1L, 2L, 3L, 9L),
        s"post-horizon replay re-admitted (state evicted): $after")
    } finally q.stop()
  }

  test("stream-static enrichment joins per batch with no state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
    val input = MemoryStream[(Long, Timestamp, Double)]
    val enriched = Streaming.enrichWithStatic(
      input.toDF().toDF("user_id", "ts", "value"), dim, "user_id")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enriched_stream").start()
    try {
      input.addData((1L, ts("10:00"), 5.0), (3L, ts("10:01"), 7.0))
      q.processAllAvailable()
      input.addData((2L, ts("10:02"), 9.0))
      q.processAllAvailable()
      val rows = spark.table("enriched_stream").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("segment"))).toSet
      // inner join: user 3 (no dimension row) is dropped; both batches
      // enrich against the same broadcast dimension.
      assert(rows == Set((1L, "gold"), (2L, "basic")), rows.toString)
      // No stateful operator: the progress metrics carry no state rows.
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join must not allocate a state store")
    } finally q.stop()
  }
}
