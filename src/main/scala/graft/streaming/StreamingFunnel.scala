package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Behavior.funnel`: per-user keyed state tracks the
  * earliest strictly-ordered step chain, emitting a progress row each
  * time a user's reached depth advances. Fed time-ordered input it
  * produces exactly the batch funnel's chain (each step's first
  * qualifying event IS the conditional minimum — proven by the parity
  * spec); its one documented divergence is late data: an event that
  * failed to chain on arrival (e.g. a purchase seen before the click
  * that would unlock it) is dropped, not buffered — re-run the batch
  * funnel to reconcile, the lambda-architecture contract.
  *
  * Scale: state is ≤ |steps| longs per user, hash-partitioned by the
  * state store; each micro-batch sorts only ITS OWN per-user slice.
  */
object StreamingFunnel {

  final case class FunnelEvent(user_id: Long, event_id: Long, us: Long,
      event_type: String)
  final case class FunnelState(times: List[Long])
  /** Emitted when `user_id` first reaches `depth` (at event time `t_us`). */
  final case class FunnelProgress(user_id: Long, depth: Int, t_us: Long)

  def track(events: Dataset[FunnelEvent], steps: Seq[String])(
      implicit spark: SparkSession): Dataset[FunnelProgress] = {
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var times = state.getOption.map(_.times).getOrElse(Nil)
          val out = List.newBuilder[FunnelProgress]
          // replay this batch's slice in event-time order (unique-id
          // tiebreak; ties never chain — strict > — but the order must
          // still be total for determinism)
          for (e <- it.toArray.sortBy(e => (e.us, e.event_id))) {
            val depth = times.length
            if (depth < steps.length && e.event_type == steps(depth) &&
                (depth == 0 || e.us > times.head)) {
              times = e.us :: times // head = latest reached step's time
              out += FunnelProgress(user, times.length, e.us)
            }
          }
          val progressed = out.result()
          if (progressed.nonEmpty) state.update(FunnelState(times))
          progressed.iterator
      }
  }
}
