package graft.streaming

import graft.model.ChangeEvent
import graft.streaming.AckDelivery.Delivery

/** In-process delivery ledger — the driver-side rendition of the
  * reference's per-consumer SlotMessageStore, which is likewise a plain
  * in-memory table owned by the delivery process
  * (`/root/reference/lib/sequin/runtime/slot_message_store.ex` +
  * `slot_message_store_state.ex`: ETS-backed message map, `:432-478`
  * deliverable = oldest per group with at most one in-flight batch,
  * `:289-363` visibility reset / stale nack), with the SAME lifecycle
  * contract as the [[AckDelivery]] state machine (W2+W4+W6):
  *
  *   - admission bounded by `max_ack_pending` with the consumer's
  *     load-shedding policy (pause consumes an in-order prefix, discard
  *     counts overflow exactly once — `sink_consumer.ex:86-90`,
  *     `consumers.ex` load_shedding_policy);
  *   - replays of an unresolved idempotency key pass through without
  *     consuming capacity or re-queuing (cursor + pending/inflight
  *     dedup);
  *   - per-group FIFO in `(commit_lsn, commit_idx)` order, at most
  *     `maxInflight` outstanding per group;
  *   - `ack` resolves and advances the group's acked cursor (duplicate /
  *     out-of-order acks never regress it); `nack` makes the delivery
  *     immediately redeliverable; an unacked delivery redelivers once
  *     `ackWaitMs` elapses (evaluated at every drain — no tick stream
  *     needed, the clock is readable in-process);
  *   - a message already delivered `maxRetry` times dead-letters instead
  *     of redelivering, so a group is never wedged.
  *
  * Why this exists next to [[SequinStreamPull]] (the Spark state-machine
  * form): [[ConsumerRuntime]]'s dispatch loop is driver-coordinated by
  * nature — its batch is already collected (bounded by source admission
  * and `max_ack_pending`), and every hand-out is acked or nacked within
  * the same micro-batch. Running the bookkeeping through a streaming
  * state store costs a full micro-batch (measured 250–600 ms) per
  * ingest/ack round, which serializes deep FIFO groups at ~2 waves/sec;
  * this ledger does the identical bookkeeping in O(batch) driver time —
  * the reference makes exactly this trade (ETS tables in the consumer
  * process, not a distributed store). The Spark state machine remains
  * the right form where the state must live IN the stream (the HTTP
  * pull surface, cross-process replay) — both are specced against the
  * same scenarios.
  */
final class DeliveryLedger(
    ackWaitMs: Long = 30000L,
    maxInflight: Int = 1,
    maxRetry: Int = 3,
    maxAckPending: Int = 10000,
    fullPolicy: String = "pause_on_full",
    nowMs: () => Long = () => System.currentTimeMillis()) {

  require(maxAckPending >= 1, s"max_ack_pending must be >= 1: $maxAckPending")
  require(SequinStreamPull.FullPolicies.contains(fullPolicy),
    s"load-shedding policy must be one of " +
      s"${SequinStreamPull.FullPolicies.mkString("/")}: $fullPolicy")

  private final case class Inflight(event: ChangeEvent, var deliverCount: Int,
      var notVisibleUntil: Long)

  private final class Group {
    // pending kept sorted by (commit_lsn, commit_idx); value carries the
    // event plus its BASE deliver count (attempts already burned before
    // admission — e.g. the runtime's batch dispatch)
    val pending = scala.collection.mutable.TreeMap
      .empty[(Long, Long), (ChangeEvent, Int)]
    val inflight = scala.collection.mutable.LinkedHashMap
      .empty[String, Inflight]
    var ackedLsn: Long = Long.MinValue
    var ackedIdx: Long = Long.MinValue
    def afterAcked(e: ChangeEvent): Boolean =
      e.commit_lsn > ackedLsn ||
        (e.commit_lsn == ackedLsn && e.commit_idx > ackedIdx)
    def advanceAcked(l: Long, i: Long): Unit =
      if (l > ackedLsn || (l == ackedLsn && i > ackedIdx)) {
        ackedLsn = l; ackedIdx = i
      }
  }

  private val groups = scala.collection.mutable.LinkedHashMap.empty[String, Group]
  private val groupOfAck = scala.collection.mutable.Map.empty[String, String]
  private val dlq = scala.collection.mutable.ArrayBuffer.empty[Delivery]
  // admitted-but-unresolved idempotency keys: the max_ack_pending
  // quantity (driver-path bound), same accounting as SequinStreamPull
  private val unresolved = scala.collection.mutable.Set.empty[String]
  // the at-least-once AUDIT ledger (reference message_ledgers.ex:
  // undelivered_cursors sorted set, scored by ingest time): cursors
  // enter on admission and leave on resolution (ack or DLQ); anything
  // still here past a staleness threshold may indicate a missed
  // delivery. Bounded by max_ack_pending, same as `unresolved`.
  private val undeliveredCursors =
    scala.collection.mutable.LinkedHashMap.empty[String, Long]

  /** Events discarded by `discard_on_full` (spec/metrics hook). */
  private[graft] var droppedCount: Long = 0L

  private def groupKey(e: ChangeEvent): String =
    Option(e.group_id).getOrElse(s"__pk:${e.record_pk}")

  /** Admitted-but-unresolved count (spec/metrics hook). */
  def outstandingEvents: Int = this.synchronized(unresolved.size)

  /** Admit events under `max_ack_pending`; returns the number CONSUMED
    * (same contract as [[SequinStreamPull.ingest]]: `pause_on_full`
    * consumes an in-order prefix the caller re-offers the rest of;
    * `discard_on_full` consumes everything, counting overflow dropped
    * exactly once).
    */
  def ingest(events: Seq[ChangeEvent],
      initialDeliverCount: Int = 0): Int = this.synchronized {
    var used = 0
    var stop = false
    events.foreach { e =>
      if (!stop) {
        if (unresolved.contains(e.idempotency_key)) {
          used += 1 // unresolved replay: free pass, state dedups below
          enqueue(e, initialDeliverCount)
        } else if (unresolved.size < maxAckPending) {
          unresolved += e.idempotency_key
          used += 1
          enqueue(e, initialDeliverCount)
        } else if (fullPolicy == "discard_on_full") {
          droppedCount += 1; used += 1
        } else stop = true // pause: stop at the first overflow (in order)
      }
    }
    used
  }

  private def enqueue(e: ChangeEvent, baseCount: Int): Unit = {
    val g = groups.getOrElseUpdate(groupKey(e), new Group)
    val cursor = (e.commit_lsn, e.commit_idx)
    val seen = g.pending.contains(cursor) ||
      g.inflight.contains(e.idempotency_key)
    if (g.afterAcked(e) && !seen) {
      g.pending.put(cursor, (e, baseCount))
      if (!undeliveredCursors.contains(e.idempotency_key))
        undeliveredCursors.put(e.idempotency_key, nowMs())
    }
  }

  /** Hand out every currently-deliverable message: expired visibility
    * timeouts redeliver or dead-letter first, then each group's pending
    * heads fill remaining in-flight capacity — strict FIFO per group.
    * Returned in global commit order; size ≤ groups × maxInflight ≤
    * max_ack_pending (the driver-path bound).
    */
  def drainDeliverable(): Seq[Delivery] =
    this.synchronized {
      val now = nowMs()
      val out = scala.collection.mutable.ArrayBuffer.empty[Delivery]
      val emptied = scala.collection.mutable.ArrayBuffer.empty[String]
      groups.toSeq.foreach { case (gid, g) =>
        // expire / redeliver / dead-letter in-flight entries
        g.inflight.toSeq.sortBy(x =>
          (x._2.event.commit_lsn, x._2.event.commit_idx)).foreach {
          case (id, inf) if inf.notVisibleUntil <= now =>
            if (inf.deliverCount >= maxRetry) {
              val d = Delivery("dlq", id, inf.deliverCount, inf.event)
              dlq += d
              g.inflight.remove(id)
              g.advanceAcked(inf.event.commit_lsn, inf.event.commit_idx)
              unresolved -= id
              groupOfAck -= id
              undeliveredCursors -= id
            } else {
              inf.deliverCount += 1
              inf.notVisibleUntil = now + ackWaitMs
              out += Delivery("redeliver", id, inf.deliverCount, inf.event)
            }
          case _ => ()
        }
        // deliver pending heads while capacity remains (strict FIFO);
        // the hand-out's deliver_count continues from the base count
        while (g.inflight.size < maxInflight && g.pending.nonEmpty) {
          val (cursor, (e, base)) = g.pending.head
          g.pending.remove(cursor)
          if (base >= maxRetry) {
            // the base count alone exhausts the budget (max_retry = max
            // TOTAL attempts): dead-letter WITHOUT another hand-out —
            // the reference DLQs when deliver_count >= max_retry_count
            // rather than burning an extra attempt
            dlq += Delivery("dlq", e.idempotency_key, base, e)
            g.advanceAcked(e.commit_lsn, e.commit_idx)
            unresolved -= e.idempotency_key
            groupOfAck -= e.idempotency_key
            undeliveredCursors -= e.idempotency_key
          } else {
            val n = base + 1
            g.inflight.put(e.idempotency_key, Inflight(e, n, now + ackWaitMs))
            groupOfAck(e.idempotency_key) = gid
            out += Delivery(if (base == 0) "deliver" else "redeliver",
              e.idempotency_key, n, e)
          }
        }
        if (g.pending.isEmpty && g.inflight.isEmpty) emptied += gid
      }
      emptied.foreach(groups.remove)
      out.sortBy(d => (d.event.commit_lsn, d.event.commit_idx)).toSeq
    }

  /** Permanently complete deliveries (idempotent; unknown ids no-op).
    * Frees `max_ack_pending` capacity and advances the group cursor.
    */
  def ack(ackIds: Seq[String]): Unit = this.synchronized {
    ackIds.foreach { id =>
      groupOfAck.get(id).flatMap(groups.get).foreach { g =>
        g.inflight.remove(id).foreach { inf =>
          g.advanceAcked(inf.event.commit_lsn, inf.event.commit_idx)
          unresolved -= id
          groupOfAck -= id
          undeliveredCursors -= id
        }
      }
    }
  }

  /** Make deliveries immediately redeliverable (still outstanding) —
    * the next drain re-emits (or dead-letters at the retry cap).
    */
  def nack(ackIds: Seq[String]): Unit = this.synchronized {
    ackIds.foreach { id =>
      groupOfAck.get(id).flatMap(groups.get)
        .flatMap(_.inflight.get(id))
        .foreach(_.notVisibleUntil = 0L)
    }
  }

  /** Dead-lettered messages observed so far. */
  def deadLetters(): Seq[Delivery] = this.synchronized(dlq.toList)

  /** Undelivered-cursor audit (reference
    * message_consistency_check_worker.ex:25-43 over
    * message_ledgers.ex `count_undelivered_wal_cursors`): idempotency
    * keys admitted before the `cutoffEpochMs` instant and still unresolved — each may
    * indicate a missed delivery (a transport that never acked, a wave
    * that never drained).
    */
  def staleUndelivered(cutoffEpochMs: Long): Seq[String] =
    this.synchronized {
      undeliveredCursors.iterator
        .collect { case (id, at) if at < cutoffEpochMs => id }.toList
    }

  /** Trim stale audit entries (the reference's
    * `trim_stale_undelivered_wal_cursors`): reclaims ONLY the audit
    * ledger — pending/in-flight delivery state is untouched, so a
    * trimmed message still delivers; it just stops re-alarming.
    * Returns the number trimmed.
    */
  def trimStaleUndelivered(cutoffEpochMs: Long): Int = this.synchronized {
    val stale = undeliveredCursors.iterator
      .collect { case (id, at) if at < cutoffEpochMs => id }.toList
    stale.foreach(undeliveredCursors -= _)
    stale.size
  }

  def stop(): Unit = ()
}
