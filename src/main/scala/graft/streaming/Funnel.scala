package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming twin of the batch `funnel_steps` query: a per-user
  * signup→view→purchase state machine over
  * `flatMapGroupsWithState`, emitting a transition record the moment a
  * user reaches a new stage — the live form of the batch funnel's
  * three stacked window passes (conversion dashboards want the
  * transition stream, not a nightly recompute).
  *
  * Semantics match the batch query when each user's events arrive
  * in event-time order or within one micro-batch (events are sorted
  * per batch): stage k locks at the earliest qualifying event, with
  * the same strict-inequality ordering and conversion window. Stages
  * lock MONOTONICALLY — an even-earlier qualifying event arriving in
  * a LATER batch does not retroactively move a locked stage (the
  * batch query, seeing all data at once, would pick the earlier one);
  * that replay-vs-live divergence is inherent to incremental funnels
  * and is bounded by the upstream watermark, which callers should set
  * to their disorder horizon.
  *
  * State is three epoch-millis per user (24 bytes), NOT evicted by
  * timeout: a funnel's later steps may arrive days after the first
  * (unlike sessions, which close after a gap), so state is bounded by
  * user cardinality — sharded across the cluster by group key,
  * 1/1000th per executor at 1000 executors, same posture as
  * [[Sessionize]] minus the eviction.
  */
object Funnel {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)

  /** -1 = stage not reached. */
  final case class Progress(t1: Long, t2: Long, t3: Long)

  final case class Transition(user_id: Long, stage: Int, ts: Timestamp)

  implicit val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit val progressEnc: Encoder[Progress] = Encoders.product[Progress]
  implicit val transitionEnc: Encoder[Transition] = Encoders.product[Transition]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  private def stateFn(windowMs: Long)(
      uid: Long, events: Iterator[Event], state: GroupState[Progress]): Iterator[Transition] = {
    var p = state.getOption.getOrElse(Progress(-1L, -1L, -1L))
    val out = Seq.newBuilder[Transition]
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      e.event_type match {
        case "signup" if p.t1 < 0 =>
          p = p.copy(t1 = t); out += Transition(uid, 1, e.ts)
        case "view" if p.t1 >= 0 && p.t2 < 0 && t > p.t1 && t - p.t1 <= windowMs =>
          p = p.copy(t2 = t); out += Transition(uid, 2, e.ts)
        case "purchase" if p.t2 >= 0 && p.t3 < 0 && t > p.t2 && t - p.t2 <= windowMs =>
          p = p.copy(t3 = t); out += Transition(uid, 3, e.ts)
        case _ => ()
      }
    }
    state.update(p)
    out.result().iterator
  }

  /** Funnel a stream of typed events; emits one [[Transition]] per
    * newly reached stage. `windowMs` is the per-step conversion window
    * (the batch query uses 2 days). */
  def apply(
      events: Dataset[Event],
      windowMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Transition] =
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, es: Iterator[Event], st: GroupState[Progress]) =>
          stateFn(windowMs)(uid, es, st))
}
