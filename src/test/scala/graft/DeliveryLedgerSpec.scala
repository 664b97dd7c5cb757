package graft

import graft.model.ChangeEvent
import graft.streaming.DeliveryLedger
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** The in-process ledger must honor the SAME lifecycle contract as the
  * [[graft.streaming.AckDelivery]] state machine (mirrors
  * `AckDeliverySpec`, which mirrors the reference oracle
  * `slot_message_store_state_test.exs`): strict per-group FIFO, ack
  * cursor, nack immediate redelivery, visibility timeout, retry cap →
  * DLQ — plus the admission contract ([[graft.streaming.SequinStreamPull]]
  * shape: max_ack_pending with pause/discard shedding, replay-free
  * re-admission).
  */
class DeliveryLedgerSpec extends AnyFunSuite {

  private def ev(lsn: Long, group: String): ChangeEvent =
    ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"), "update",
      "public", "t0", 16384L, s"pk$lsn", lsn, group.toLong, 1.0, "{}",
      None, s"$group:$lsn", group, 100L)

  private def ledger(now: () => Long, ackWaitMs: Long = 60000L,
      maxRetry: Int = 3, maxAckPending: Int = 10000,
      policy: String = "pause_on_full") =
    new DeliveryLedger(ackWaitMs = ackWaitMs, maxRetry = maxRetry,
      maxAckPending = maxAckPending, fullPolicy = policy, nowMs = now)

  test("strict FIFO: second message of a group held until the first acks") {
    val l = ledger(() => 0L)
    assert(l.ingest(Seq(ev(8, "1"), ev(16, "1"), ev(8, "2"))) == 3)
    val w1 = l.drainDeliverable()
    assert(w1.map(d => (d.event.group_id, d.event.commit_lsn)).sorted ==
      Seq(("1", 8L), ("2", 8L))) // one in-flight per group; 1:16 held
    assert(l.drainDeliverable().isEmpty) // nothing new without an ack
    l.ack(Seq("1:8"))
    val w2 = l.drainDeliverable()
    assert(w2.map(d => (d.kind, d.ack_id)) == Seq(("deliver", "1:16")))
    l.ack(Seq("1:16", "2:8"))
    assert(l.outstandingEvents == 0)
    assert(l.drainDeliverable().isEmpty)
  }

  test("nack makes the message immediately redeliverable with count+1; " +
      "the retry cap dead-letters instead of wedging the group") {
    val l = ledger(() => 0L, maxRetry = 2)
    l.ingest(Seq(ev(8, "1"), ev(16, "1")))
    assert(l.drainDeliverable().map(_.deliver_count) == Seq(1))
    l.nack(Seq("1:8"))
    val r = l.drainDeliverable()
    assert(r.map(d => (d.kind, d.ack_id, d.deliver_count)) ==
      Seq(("redeliver", "1:8", 2)))
    l.nack(Seq("1:8"))
    // count == maxRetry at redelivery time → DLQ, and the group moves on
    val next = l.drainDeliverable()
    assert(l.deadLetters().map(_.ack_id) == Seq("1:8"))
    assert(next.map(_.ack_id) == Seq("1:16")) // successor unblocked
    assert(l.outstandingEvents == 1) // 1:16 still outstanding
  }

  test("visibility timeout: an unacked delivery redelivers once " +
      "ack_wait_ms elapses — evaluated at drain, no tick needed") {
    var now = 0L
    val l = ledger(() => now, ackWaitMs = 1000L)
    l.ingest(Seq(ev(8, "1")))
    assert(l.drainDeliverable().map(_.kind) == Seq("deliver"))
    now = 999L
    assert(l.drainDeliverable().isEmpty) // still in flight
    now = 1000L
    assert(l.drainDeliverable().map(d => (d.kind, d.deliver_count)) ==
      Seq(("redeliver", 2)))
  }

  test("duplicate and out-of-order acks never regress the cursor; " +
      "an event at or before the acked cursor is not re-admitted") {
    val l = ledger(() => 0L)
    l.ingest(Seq(ev(8, "1"), ev(16, "1")))
    l.ack(l.drainDeliverable().map(_.ack_id)) // acks 1:8
    l.ack(l.drainDeliverable().map(_.ack_id)) // acks 1:16
    l.ack(Seq("1:8", "ghost")) // duplicate + unknown: no-ops
    // replayed events at/below the cursor are consumed but not re-queued
    assert(l.ingest(Seq(ev(8, "1"), ev(16, "1"))) == 2)
    assert(l.drainDeliverable().isEmpty)
    assert(l.outstandingEvents == 2) // replays admitted as unresolved keys
  }

  test("unresolved replay passes through without consuming extra " +
      "capacity or double-queuing") {
    val l = ledger(() => 0L, maxAckPending = 2)
    assert(l.ingest(Seq(ev(8, "1"), ev(8, "1"))) == 2) // replay is free
    assert(l.outstandingEvents == 1)
    assert(l.drainDeliverable().size == 1) // queued once
  }

  test("pause_on_full consumes an in-order prefix; capacity frees on ack") {
    val l = ledger(() => 0L, maxAckPending = 2)
    val events = Seq(ev(8, "1"), ev(8, "2"), ev(8, "3"))
    assert(l.ingest(events) == 2) // third event NOT consumed
    l.ack(l.drainDeliverable().map(_.ack_id))
    assert(l.ingest(events.drop(2)) == 1) // re-offer succeeds after acks
    assert(l.drainDeliverable().map(_.ack_id) == Seq("3:8"))
  }

  test("discard_on_full consumes everything, counting overflow exactly once") {
    val l = ledger(() => 0L, maxAckPending = 2, policy = "discard_on_full")
    assert(l.ingest(Seq(ev(8, "1"), ev(8, "2"), ev(8, "3"), ev(8, "4"))) == 4)
    assert(l.droppedCount == 2L)
    assert(l.outstandingEvents == 2)
  }

  test("initialDeliverCount: attempts burned before admission count " +
      "against max_retry (the runtime's batch dispatch is attempt #1)") {
    val l = ledger(() => 0L, maxRetry = 2)
    l.ingest(Seq(ev(8, "1")), initialDeliverCount = 1)
    val d = l.drainDeliverable()
    assert(d.map(x => (x.kind, x.deliver_count)) == Seq(("redeliver", 2)))
    l.nack(d.map(_.ack_id))
    assert(l.drainDeliverable().isEmpty)
    assert(l.deadLetters().map(_.deliver_count) == Seq(2)) // 2 total attempts
    assert(l.outstandingEvents == 0)
  }

  test("base count alone exhausting the budget dead-letters WITHOUT " +
      "another hand-out (max_retry = max TOTAL attempts)") {
    // maxRetry = 1 and the batch dispatch already burned attempt #1:
    // the pending hand-out must go straight to the DLQ — handing it out
    // again would make 2 total attempts (the reference DLQs when
    // deliver_count >= max_retry_count without another delivery)
    val l = ledger(() => 0L, maxRetry = 1)
    l.ingest(Seq(ev(8, "1"), ev(16, "1")), initialDeliverCount = 1)
    assert(l.drainDeliverable().isEmpty)
    assert(l.deadLetters().map(d => (d.ack_id, d.deliver_count)) ==
      Seq(("1:8", 1), ("1:16", 1)))
    assert(l.outstandingEvents == 0) // capacity freed, cursor advanced
  }

  test("global commit order across groups in a drained wave") {
    val l = ledger(() => 0L)
    l.ingest(Seq(ev(24, "3"), ev(8, "1"), ev(16, "2")))
    assert(l.drainDeliverable().map(_.event.commit_lsn) == Seq(8L, 16L, 24L))
  }

  test("undelivered-cursor audit: acked and dead-lettered entries resolve out; " +
    "stale survivors are reported and trim touches only the audit ledger") {
    var now = 0L
    val l = ledger(() => now, ackWaitMs = 10L, maxRetry = 1)
    // t=0: three messages in three groups
    l.ingest(Seq(ev(8, "1"), ev(16, "2"), ev(24, "3")))
    val w = l.drainDeliverable()
    assert(w.size == 3)
    // group 1 acks; group 2 exhausts its budget and dead-letters
    l.ack(Seq("1:8"))
    now = 20L // past visibility; group 2 and 3 deliverCount=1 == maxRetry
    l.drainDeliverable() // expiry pass dead-letters 2:16 and 3:24
    assert(l.deadLetters().map(_.ack_id).toSet == Set("2:16", "3:24"))
    // everything resolved -> nothing stale no matter the threshold
    assert(l.staleUndelivered(Long.MaxValue).isEmpty)

    // t=100: one admitted-but-never-resolved message goes stale; a
    // fresh one does not
    now = 100L
    l.ingest(Seq(ev(32, "4")))
    now = 250L
    l.ingest(Seq(ev(40, "5")))
    val stale = l.staleUndelivered(now - 100L) // older than t=150
    assert(stale == Seq("4:32"), s"stale: $stale")
    // trim reclaims the audit entry ONLY — the message still delivers
    assert(l.trimStaleUndelivered(now - 100L) == 1)
    assert(l.staleUndelivered(Long.MaxValue) == Seq("5:40"))
    val after = l.drainDeliverable().map(_.ack_id)
    assert(after.contains("4:32"),
      s"trim must not cancel delivery state: $after")
  }
}
