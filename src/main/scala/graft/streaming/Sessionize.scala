package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom streaming state via flatMapGroupsWithState (SURVEY.md §2.6's
  * KeyValueGroupedDataset surface): per-user event-time sessionization
  * with a gap timeout — the state pattern windowed aggregates can't
  * express (session bounds depend on the data, not the clock grid).
  *
  * State is one [[Sessionize.Open]] per active user: bounded by user
  * cardinality, evicted by event-time timeout as the watermark passes
  * `last event + gap`. At scale the state store shards by the group key
  * (user), so a 1000-executor cluster holds 1/1000th of the open
  * sessions per executor, checkpointed incrementally.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)

  final case class Open(startMs: Long, lastMs: Long, n: Int, sum: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Int,
      sum_value: Double)

  implicit val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit val openEnc: Encoder[Open] = Encoders.product[Open]
  implicit val sessionEnc: Encoder[Session] = Encoders.product[Session]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  private def toSession(uid: Long, s: Open): Session =
    Session(uid, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sum)

  /** The state function: merge in-gap events into the open session,
    * close it (emit) when a new event arrives past the gap or when the
    * event-time timeout fires. */
  private def stateFn(gapMs: Long)(
      uid: Long, events: Iterator[Event], state: GroupState[Open]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(uid, _)).iterator
      state.remove()
      return out
    }
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      open match {
        // In-gap on either side (watermark admits bounded disorder
        // across batches, so t can precede the open session): merge and
        // widen BOTH bounds — a session must contain its events.
        case Some(s) if t >= s.startMs - gapMs && t - s.lastMs <= gapMs =>
          open = Some(Open(
            math.min(s.startMs, t), math.max(s.lastMs, t),
            s.n + 1, s.sum + e.value))
        case Some(s) if t - s.lastMs > gapMs =>
          closed += toSession(uid, s)
          open = Some(Open(t, t, 1, e.value))
        case Some(_) =>
          // More than a gap BEFORE the open session: a stray event from
          // an already-elapsed window; emit it as its own session.
          closed += toSession(uid, Open(t, t, 1, e.value))
        case None =>
          open = Some(Open(t, t, 1, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastMs + gapMs)
    }
    closed.result().iterator
  }

  /** Sessionize a stream of events. `watermarkDelay` bounds lateness;
    * sessions close `gap` after their last event (by watermark). */
  def apply(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] =
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, es: Iterator[Event], st: GroupState[Open]) =>
          stateFn(gapMs)(uid, es, st))
}
