package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import Sessionize.Event

/** Sessionization behavior over a MemoryStream with manual event times:
  * in-gap events merge, a gap closes the session (emitted once the
  * watermark passes), per-user isolation holds. */
class SessionizeSpec extends SparkSpec {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2022-12-18 $hhmm:00")

  test("gap closes a session; in-gap events merge; users are isolated") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize(
      input.toDS(), gapMs = 30 * 60 * 1000, watermarkDelay = "5 minutes")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      // user 1: two events 10 min apart (one session), then a 2h gap
      // user 2: one event
      input.addData(
        Event(1L, ts("10:00"), 1.0),
        Event(1L, ts("10:10"), 2.0),
        Event(2L, ts("10:05"), 5.0))
      q.processAllAvailable()
      input.addData(Event(1L, ts("12:30"), 4.0)) // past gap → closes session 1
      q.processAllAvailable()
      // watermark now 12:25 > 10:10+30m → user 1's first session closed
      // (either emitted by the arrival-past-gap path or the timeout path)
      val afterGap = spark.table("sessions").as[Sessionize.Session].collect()
      val u1 = afterGap.filter(_.user_id == 1L)
      assert(u1.length == 1)
      assert(u1.head.session_start == ts("10:00"))
      assert(u1.head.session_end == ts("10:10"))
      assert(u1.head.n_events == 2 && u1.head.sum_value == 3.0)

      // user 2's lone session closes via event-time TIMEOUT once the
      // watermark advances far enough (no further user-2 events).
      input.addData(Event(3L, ts("15:00"), 0.0))
      q.processAllAvailable()
      val u2 = spark.table("sessions").as[Sessionize.Session]
        .collect().filter(_.user_id == 2L)
      assert(u2.length == 1)
      assert(u2.head.n_events == 1 && u2.head.sum_value == 5.0)
    } finally q.stop()
  }

  test("cross-batch out-of-order event widens the session's start bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize(
      input.toDS(), gapMs = 30 * 60 * 1000, watermarkDelay = "2 hours")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("ooo_sessions").start()
    try {
      input.addData(Event(7L, ts("10:00"), 1.0))
      q.processAllAvailable()
      // Watermark lag is 2h, so a 09:45 event in the next batch is
      // admitted; it must EXTEND the session backwards.
      input.addData(Event(7L, ts("09:45"), 2.0))
      q.processAllAvailable()
      input.addData(Event(7L, ts("14:00"), 0.0)) // closes the session
      input.addData(Event(8L, ts("23:30"), 0.0)) // push watermark far along
      q.processAllAvailable()
      val u7 = spark.table("ooo_sessions").as[Sessionize.Session]
        .collect().filter(s => s.user_id == 7L && s.n_events == 2)
      assert(u7.length == 1)
      assert(u7.head.session_start == ts("09:45"))
      assert(u7.head.session_end == ts("10:00"))
      assert(u7.head.sum_value == 3.0)
    } finally q.stop()
  }
}
