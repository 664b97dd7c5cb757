package graft.streaming

import graft.model.ChangeEvent
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Full delivery state machine (W2+W4+W6): per-group FIFO with in-flight
  * tracking, ack/nack, visibility timeout, redelivery counting, and
  * dead-lettering — the reference's consumer-event lifecycle
  * (`/root/reference/lib/sequin/consumers/consumer_event.ex:36-41,88-92,
  * 167-185` — not_visible_until/deliver_count;
  * `slot_message_store_state.ex:289-363` visibility reset / stale nack;
  * `:432-478` deliverable = oldest per group with at most one in-flight
  * batch; `sink_consumer.ex:86-90` ack_wait_ms / max_ack_pending /
  * max_retry_count).
  *
  * One keyed state machine over a merged command stream (events ∪ acks ∪
  * nacks ∪ ticks), `flatMapGroupsWithState`:
  *   - an event is accepted once (cursor + pending/inflight dedup), queued
  *     in `(commit_lsn, commit_idx)` order;
  *   - at most `maxInflight` deliveries are outstanding per group (the
  *     reference delivers one batch per group at a time — strict FIFO);
  *   - ack removes the in-flight entry and advances the acked cursor;
  *   - nack makes it immediately redeliverable; otherwise it redelivers
  *     once `ackWaitMs` has elapsed, evaluated whenever the group is next
  *     woken — by any command, or by an explicit `tick`. (A Spark
  *     processing-time timeout also works but makes the micro-batch engine
  *     busy-loop empty batches while any group is in flight; the reference
  *     likewise drives visibility checks from its own timer process, which
  *     here is a periodic tick stream unioned into the commands.);
  *   - a message that has already been delivered `maxRetry` times
  *     (`deliver_count >= maxRetry` at redelivery time) dead-letters
  *     instead of redelivering (emitted with `kind = "dlq"`), so the group
  *     is never wedged — `maxRetry` is the max TOTAL delivery attempts.
  *
  * State per group is O(pending + inflight) events; groups shard across
  * executors by hash — the same partitioning the delivery runtime uses.
  */
object AckDelivery {

  final case class DeliveryCommand(
      group_id: String,
      kind: String, // event | ack | nack
      event: Option[ChangeEvent],
      ack_id: Option[String])

  object DeliveryCommand {
    def event(e: ChangeEvent): DeliveryCommand =
      DeliveryCommand(Option(e.group_id).getOrElse(s"__pk:${e.record_pk}"),
        "event", Some(e), None)
    def ack(groupId: String, ackId: String): DeliveryCommand =
      DeliveryCommand(groupId, "ack", None, Some(ackId))
    def nack(groupId: String, ackId: String): DeliveryCommand =
      DeliveryCommand(groupId, "nack", None, Some(ackId))
    /** Wake a group so expired visibility timeouts are evaluated. */
    def tick(groupId: String): DeliveryCommand =
      DeliveryCommand(groupId, "tick", None, None)
  }

  /** Emitted delivery attempt. `ack_id` (= idempotency key) is what the
    * consumer acks/nacks with.
    */
  final case class Delivery(
      kind: String, // deliver | redeliver | dlq
      ack_id: String,
      deliver_count: Int,
      event: ChangeEvent)

  final case class Inflight(event: ChangeEvent, deliver_count: Int,
      not_visible_until: Long)

  final case class GroupDeliveryState(
      pending: List[ChangeEvent],
      inflight: Map[String, Inflight],
      acked_lsn: Long,
      acked_idx: Long)

  private val emptyState =
    GroupDeliveryState(Nil, Map.empty, Long.MinValue, Long.MinValue)

  def run(commands: Dataset[DeliveryCommand],
      ackWaitMs: Long = 30000L,
      maxInflight: Int = 1,
      maxRetry: Int = 3,
      nowMs: () => Long = () => System.currentTimeMillis())(
      implicit spark: SparkSession): Dataset[Delivery] = {
    import spark.implicits._
    commands
      .groupByKey(_.group_id)
      .flatMapGroupsWithState[GroupDeliveryState, Delivery](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[DeliveryCommand], state: GroupState[GroupDeliveryState]) =>
          val now = nowMs()
          var st = state.getOption.getOrElse(emptyState)
          val out = scala.collection.mutable.ArrayBuffer.empty[Delivery]

          def cursorOf(e: ChangeEvent) = (e.commit_lsn, e.commit_idx)
          def advanceAcked(l: Long, i: Long): Unit = {
            // lexicographic max — an out-of-order or duplicate ack must
            // never regress the cursor
            if (l > st.acked_lsn || (l == st.acked_lsn && i > st.acked_idx))
              st = st.copy(acked_lsn = l, acked_idx = i)
          }
          def afterAcked(e: ChangeEvent) =
            e.commit_lsn > st.acked_lsn ||
              (e.commit_lsn == st.acked_lsn && e.commit_idx > st.acked_idx)

          // 1. apply incoming commands
          it.foreach { cmd =>
            cmd.kind match {
              case "event" =>
                val e = cmd.event.get
                val seen = st.pending.exists(cursorOf(_) == cursorOf(e)) ||
                  st.inflight.contains(e.idempotency_key)
                if (afterAcked(e) && !seen)
                  st = st.copy(pending =
                    (e :: st.pending).sortBy(x => (x.commit_lsn, x.commit_idx)))
              case "ack" =>
                cmd.ack_id.flatMap(st.inflight.get).foreach { inf =>
                  val (l, i) = cursorOf(inf.event)
                  st = st.copy(inflight = st.inflight - cmd.ack_id.get)
                  advanceAcked(l, i)
                }
              case "nack" =>
                cmd.ack_id.flatMap(id => st.inflight.get(id).map(id -> _))
                  .foreach { case (id, inf) =>
                    st = st.copy(inflight =
                      st.inflight.updated(id, inf.copy(not_visible_until = 0L)))
                  }
              case "tick" => () // wake-up only
            }
          }

          // 2. expire / redeliver / dead-letter in-flight entries
          st.inflight.toSeq.sortBy(x => cursorOf(x._2.event)).foreach {
            case (id, inf) if inf.not_visible_until <= now =>
              if (inf.deliver_count >= maxRetry) {
                out += Delivery("dlq", id, inf.deliver_count, inf.event)
                val (l, i) = cursorOf(inf.event)
                st = st.copy(inflight = st.inflight - id)
                advanceAcked(l, i)
              } else {
                val n = inf.deliver_count + 1
                out += Delivery("redeliver", id, n, inf.event)
                st = st.copy(inflight = st.inflight.updated(id,
                  inf.copy(deliver_count = n, not_visible_until = now + ackWaitMs)))
              }
            case _ => ()
          }

          // 3. deliver pending head(s) while capacity remains (strict FIFO)
          while (st.inflight.size < maxInflight && st.pending.nonEmpty) {
            val e = st.pending.head
            out += Delivery("deliver", e.idempotency_key, 1, e)
            st = st.copy(
              pending = st.pending.tail,
              inflight = st.inflight.updated(e.idempotency_key,
                Inflight(e, 1, now + ackWaitMs)))
          }

          if (st == emptyState) state.remove()
          else state.update(st)
          out.iterator
      }
  }
}
