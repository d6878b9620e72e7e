package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import Funnel.{Event, Transition}

/** Streaming funnel behavior over a MemoryStream: stages advance in
  * order with strict inequalities and the conversion window, emit
  * exactly once, survive across micro-batches, and lock monotonically
  * (a later-batch earlier event does not retroactively move a locked
  * stage — the documented live-vs-replay divergence). */
class FunnelSpec extends SparkSpec {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2022-12-18 $hhmm:00")

  private val Hour = 60 * 60 * 1000L

  test("stages advance in order across batches; window and order gates hold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = Funnel(input.toDS(), windowMs = Hour)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_stream").start()
    try {
      // Batch 1: user 1 signs up then views; user 2 views FIRST (no
      // signup yet — must not advance), then signs up.
      input.addData(
        Event(1L, ts("10:00"), "signup"),
        Event(1L, ts("10:10"), "view"),
        Event(2L, ts("09:50"), "view"),
        Event(2L, ts("10:05"), "signup"))
      q.processAllAvailable()
      // Batch 2: user 1 purchases in-window; user 2's view is now
      // valid (after signup); user 3 purchases with no funnel at all.
      input.addData(
        Event(1L, ts("10:30"), "purchase"),
        Event(2L, ts("10:20"), "view"),
        Event(3L, ts("10:00"), "purchase"))
      q.processAllAvailable()
      // Batch 3: out-of-window purchase for user 2 (2h after the
      // view) must NOT fire stage 3; duplicate signup for user 1 must
      // not re-emit stage 1.
      input.addData(
        Event(2L, ts("12:30"), "purchase"),
        Event(1L, ts("11:00"), "signup"))
      q.processAllAvailable()
      val rows = spark.table("funnel_stream").as[Transition].collect()
        .map(t => (t.user_id, t.stage, t.ts)).toSet
      assert(rows == Set(
        (1L, 1, ts("10:00")), (1L, 2, ts("10:10")), (1L, 3, ts("10:30")),
        (2L, 1, ts("10:05")), (2L, 2, ts("10:20"))),
        s"unexpected transitions: ${rows.toSeq.sortBy(r => (r._1, r._2)).mkString(", ")}")
    } finally q.stop()
  }

  test("within-batch disorder sorts; locked stages are monotone across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = Funnel(input.toDS(), windowMs = Hour)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_stream2").start()
    try {
      // One batch, delivered out of order: the per-batch sort must
      // find signup@10:00 before view@10:10 despite arrival order.
      input.addData(
        Event(1L, ts("10:10"), "view"),
        Event(1L, ts("10:00"), "signup"))
      q.processAllAvailable()
      // Later batch carries an EARLIER signup (9:00). Batch replay
      // would have picked it; the live funnel keeps the locked 10:00
      // stage and emits nothing new.
      input.addData(Event(1L, ts("09:00"), "signup"))
      q.processAllAvailable()
      val rows = spark.table("funnel_stream2").as[Transition].collect()
        .map(t => (t.stage, t.ts)).toSet
      assert(rows == Set((1, ts("10:00")), (2, ts("10:10"))),
        s"unexpected transitions: $rows")
    } finally q.stop()
  }
}
