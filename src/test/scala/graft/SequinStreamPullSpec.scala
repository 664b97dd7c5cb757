package graft

import graft.model.ChangeEvent
import graft.streaming.SequinStreamPull
import java.sql.Timestamp

/** JVM-singleton clock so the state function does not capture the spec. */
object PullClock {
  @volatile var now: Long = 0L
  def get(): Long = now
}

/** HTTP-pull shim over AckDelivery: receive/ack/nack verb semantics from
  * pull_controller.ex — batch bounds, exactly-once hand-out, nack
  * redelivery, visibility-timeout redelivery on the next receive, DLQ.
  */
class SequinStreamPullSpec extends SparkSpec {
  import graft.{PullClock => Clock}

  private def ev(lsn: Long, group: String): ChangeEvent =
    ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"), "update",
      "public", "t0", 16384L, s"pk$lsn", lsn, group.toLong, 1.0, "{}",
      None, s"$group:$lsn", group, 100L)

  test("receive hands out each delivery once; ack completes; nack redelivers") {
    implicit val s = spark
    Clock.now = 0L
    val pull = new SequinStreamPull(ackWaitMs = 60000L, maxRetry = 5,
      nowMs = PullClock.get)
    try {
      pull.ingest(Seq(ev(8, "1"), ev(16, "1"), ev(8, "2")))

      // FIFO: one in-flight per group → first receive sees group heads
      val b1 = pull.receive(maxBatchSize = 10)
      assert(b1.map(_.event.commit_lsn).sorted == Seq(8L, 8L))
      assert(b1.map(d => (d.event.group_id, d.event.commit_lsn)).toSet ==
        Set(("1", 8L), ("2", 8L)))

      // nothing new while in flight (withheld, not redelivered)
      assert(pull.receive(maxBatchSize = 10).isEmpty)

      // ack group 1's head → its next message becomes deliverable
      val g1head = b1.find(_.event.group_id == "1").get
      pull.ack(Seq(g1head.ack_id))
      val b2 = pull.receive(maxBatchSize = 10)
      assert(b2.map(_.event.commit_lsn) == Seq(16L))

      // nack redelivers immediately with a bumped deliver_count
      pull.nack(Seq(b2.head.ack_id))
      val b3 = pull.receive(maxBatchSize = 10)
      assert(b3.map(_.event.commit_lsn) == Seq(16L))
      assert(b3.head.deliver_count == 2)

      // batch-size bounds from the controller
      intercept[IllegalArgumentException](pull.receive(maxBatchSize = 0))
      intercept[IllegalArgumentException](pull.receive(maxBatchSize = 1001))
      intercept[IllegalArgumentException](pull.ack(Nil))
    } finally pull.stop()
  }

  test("visibility timeout redelivers on next receive; retry cap dead-letters") {
    implicit val s = spark
    Clock.now = 0L
    val pull = new SequinStreamPull(ackWaitMs = 1000L, maxRetry = 2,
      nowMs = PullClock.get)
    try {
      pull.ingest(Seq(ev(8, "7")))
      val b1 = pull.receive(maxBatchSize = 1)
      assert(b1.size == 1 && b1.head.deliver_count == 1)

      // not yet expired → withheld
      Clock.now = 500L
      assert(pull.receive(maxBatchSize = 1).isEmpty)

      // expired → the stale message is redelivered (deliver_count = 2)
      Clock.now = 2000L
      val b2 = pull.receive(maxBatchSize = 1)
      assert(b2.size == 1 && b2.head.deliver_count == 2)

      // expired again at the retry cap → DLQ, never wedged
      Clock.now = 4000L
      assert(pull.receive(maxBatchSize = 1).isEmpty)
      assert(pull.deadLetters().map(_.event.commit_lsn) == Seq(8L))
    } finally pull.stop()
  }

  test("per-call read volume is O(new deliveries), not O(delivery table)") {
    implicit val s = spark
    Clock.now = 0L
    val pull = new SequinStreamPull(ackWaitMs = 60000L, maxInflight = 10,
      nowMs = PullClock.get)
    try {
      val n = 20
      pull.ingest((1 to n).map(i => ev(i * 8L, "1")))
      // drain one at a time: 20 receive calls against a 20-row delivery
      // history; a re-collect-the-table implementation would read
      // O(n²) = 210+ rows, the incremental drain reads each delivery once
      var handed = 0
      (1 to n).foreach { _ =>
        val b = pull.receive(maxBatchSize = 1)
        handed += b.size
        b.foreach(d => pull.ack(Seq(d.ack_id)))
      }
      assert(handed == n)
      assert(pull.totalDrainedRows == n.toLong,
        s"expected exactly $n rows drained, got ${pull.totalDrainedRows}")
    } finally pull.stop()
  }

  test("long-poll wait returns as soon as messages arrive") {
    implicit val s = spark
    Clock.now = 0L
    val pull = new SequinStreamPull(ackWaitMs = 60000L, nowMs = PullClock.get)
    try {
      val t0 = System.nanoTime()
      assert(pull.receive(maxBatchSize = 1, waitForMs = 300).isEmpty)
      assert((System.nanoTime() - t0) / 1000000L >= 300)

      pull.ingest(Seq(ev(8, "1")))
      val got = pull.receive(maxBatchSize = 1, waitForMs = 5000)
      assert(got.size == 1)
    } finally pull.stop()
  }

  test("max_ack_pending bounds the driver path: pause_on_full " +
      "backpressures, acks free capacity, replays ride free") {
    implicit val s = spark
    Clock.now = 0L
    val pull = new SequinStreamPull(ackWaitMs = 60000L, maxInflight = 10,
      maxAckPending = 50, nowMs = PullClock.get)
    try {
      // a 500-event flood (500 distinct groups): only 50 admitted
      val flood = (1 to 500).map(i => ev(8L * i, i.toString))
      val admitted = pull.ingest(flood)
      assert(admitted == 50)
      assert(pull.outstandingEvents == 50)
      // re-offering the SAME unresolved events consumes no capacity
      assert(pull.ingest(flood.take(50)) == 50)
      assert(pull.outstandingEvents == 50)
      // ...and fresh ones are refused while full
      assert(pull.ingest(flood.slice(50, 60)) == 0)
      // ack 20 → capacity frees exactly 20 (the backpressure contract:
      // the producer re-offers the remainder)
      val batch = pull.receive(maxBatchSize = 20)
      assert(batch.size == 20)
      pull.ack(batch.map(_.ack_id))
      assert(pull.outstandingEvents == 30)
      assert(pull.ingest(flood.slice(50, 500)) == 20)
      assert(pull.outstandingEvents == 50)
      assert(pull.droppedCount == 0L)
    } finally pull.stop()
  }

  test("discard_on_full drops overflow and counts it; admitted events " +
      "deliver normally") {
    implicit val s = spark
    Clock.now = 0L
    val pull = new SequinStreamPull(ackWaitMs = 60000L, maxInflight = 10,
      maxAckPending = 25, fullPolicy = "discard_on_full",
      nowMs = PullClock.get)
    try {
      val flood = (1 to 100).map(i => ev(8L * i, i.toString))
      // discard CONSUMES the whole offer: 25 admitted, 75 dropped —
      // nothing left for the caller to re-offer
      assert(pull.ingest(flood) == 100)
      assert(pull.droppedCount == 75L)
      assert(pull.outstandingEvents == 25)
      val got = pull.receive(maxBatchSize = 1000)
      assert(got.size == 25)
      // policy names are validated up front
      intercept[IllegalArgumentException](
        new SequinStreamPull(fullPolicy = "explode_on_full"))
    } finally pull.stop()
  }
}
