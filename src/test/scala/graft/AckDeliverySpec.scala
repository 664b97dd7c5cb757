package graft

import graft.model.ChangeEvent
import graft.streaming.AckDelivery
import graft.streaming.AckDelivery.{Delivery, DeliveryCommand}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** W4 delivery-lifecycle semantics: ack, nack-redeliver, visibility
  * timeout, strict per-group FIFO under in-flight lock, retry cap → DLQ.
  * Mirrors the reference oracle `slot_message_store_state_test.exs`.
  */
/** Deterministic test clock: a JVM-singleton object resolves to the same
  * instance after task deserialization in local mode, so the state
  * function sees updates from the test thread.
  */
object AckClock {
  @volatile var now: Long = 0L
}

class AckDeliverySpec extends SparkSpec {

  private def ev(lsn: Long, group: String): ChangeEvent =
    ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"), "update",
      "public", "t0", 16384L, s"pk$lsn", lsn, group.toLong, 1.0, "{}",
      None, s"$group:$lsn", group, 100L)

  private def collected(name: String): Seq[Delivery] = {
    import SparkSpec.session.implicits._
    SparkSpec.session.table(name).as[Delivery].collect().toSeq
  }

  test("strict FIFO: second message held until the first is acked") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DeliveryCommand]
    val q = AckDelivery.run(in.toDS(), ackWaitMs = 60000L)
      .writeStream.format("memory").queryName("ack_fifo")
      .outputMode("append").start()
    try {
      in.addData(DeliveryCommand.event(ev(8, "1")), DeliveryCommand.event(ev(16, "1")))
      q.processAllAvailable()
      assert(collected("ack_fifo").map(d => (d.kind, d.event.commit_lsn)) ==
        Seq(("deliver", 8L))) // lsn 16 held: one in-flight batch per group
      in.addData(DeliveryCommand.ack("1", "1:8"))
      q.processAllAvailable()
      assert(collected("ack_fifo").map(d => (d.kind, d.event.commit_lsn)) ==
        Seq(("deliver", 8L), ("deliver", 16L)))
    } finally q.stop()
  }

  test("nack makes the message immediately redeliverable with deliver_count+1") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DeliveryCommand]
    val q = AckDelivery.run(in.toDS(), ackWaitMs = 60000L)
      .writeStream.format("memory").queryName("ack_nack")
      .outputMode("append").start()
    try {
      in.addData(DeliveryCommand.event(ev(8, "2")))
      q.processAllAvailable()
      in.addData(DeliveryCommand.nack("2", "2:8"))
      q.processAllAvailable()
      val out = collected("ack_nack").map(d => (d.kind, d.deliver_count))
      assert(out == Seq(("deliver", 1), ("redeliver", 2)))
    } finally q.stop()
  }

  test("visibility timeout redelivers without an explicit nack") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DeliveryCommand]
    AckClock.now = 1000L
    val q = AckDelivery.run(in.toDS(), ackWaitMs = 300L,
        nowMs = () => AckClock.now)
      .writeStream.format("memory").queryName("ack_vis")
      .outputMode("append").start()
    try {
      in.addData(DeliveryCommand.event(ev(8, "3"))) // delivered, nvu=1300
      q.processAllAvailable()
      AckClock.now = 1200L
      in.addData(DeliveryCommand.tick("3")) // before expiry: no redelivery
      q.processAllAvailable()
      AckClock.now = 1400L // past the visibility window
      in.addData(DeliveryCommand.tick("3"))
      q.processAllAvailable()
      val g3 = collected("ack_vis").filter(_.event.group_id == "3")
        .map(d => (d.kind, d.deliver_count))
      assert(g3 == Seq(("deliver", 1), ("redeliver", 2)))
    } finally q.stop()
  }

  test("retry cap dead-letters the message and unblocks the group") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DeliveryCommand]
    val q = AckDelivery.run(in.toDS(), ackWaitMs = 60000L, maxRetry = 2)
      .writeStream.format("memory").queryName("ack_dlq")
      .outputMode("append").start()
    try {
      in.addData(DeliveryCommand.event(ev(8, "4")), DeliveryCommand.event(ev(16, "4")))
      q.processAllAvailable()
      in.addData(DeliveryCommand.nack("4", "4:8")) // -> redeliver (count 2)
      q.processAllAvailable()
      in.addData(DeliveryCommand.nack("4", "4:8")) // count == maxRetry -> dlq
      q.processAllAvailable()
      val out = collected("ack_dlq").map(d => (d.kind, d.event.commit_lsn))
      assert(out == Seq(("deliver", 8L), ("redeliver", 8L), ("dlq", 8L),
        ("deliver", 16L))) // group unblocked after DLQ
    } finally q.stop()
  }

  test("out-of-order acks never regress the cursor (same-lsn edge)") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val e0 = ev(8, "6"); val e1 = ev(8, "6").copy(commit_idx = 1L,
      record_pk = "pk8b", idempotency_key = "6:8b")
    val in = MemoryStream[DeliveryCommand]
    val q = AckDelivery.run(in.toDS(), ackWaitMs = 60000L, maxInflight = 2)
      .writeStream.format("memory").queryName("ack_ooo")
      .outputMode("append").start()
    try {
      in.addData(DeliveryCommand.event(e0), DeliveryCommand.event(e1))
      q.processAllAvailable()
      // ack the LATER cursor first, then the earlier one
      in.addData(DeliveryCommand.ack("6", "6:8b"))
      q.processAllAvailable()
      in.addData(DeliveryCommand.ack("6", "6:8"))
      q.processAllAvailable()
      // replays of both must be rejected — cursor is at (8,1), not (8,0)
      in.addData(DeliveryCommand.event(e0), DeliveryCommand.event(e1))
      q.processAllAvailable()
      assert(collected("ack_ooo").map(_.kind).count(_ == "deliver") == 2)
    } finally q.stop()
  }

  test("duplicate event arrivals are accepted once (pending/inflight/acked dedup)") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DeliveryCommand]
    val q = AckDelivery.run(in.toDS(), ackWaitMs = 60000L)
      .writeStream.format("memory").queryName("ack_dup")
      .outputMode("append").start()
    try {
      in.addData(DeliveryCommand.event(ev(8, "5")), DeliveryCommand.event(ev(8, "5")))
      q.processAllAvailable()
      in.addData(DeliveryCommand.event(ev(8, "5"))) // replay while in flight
      q.processAllAvailable()
      in.addData(DeliveryCommand.ack("5", "5:8"))
      in.addData(DeliveryCommand.event(ev(8, "5"))) // replay after ack
      q.processAllAvailable()
      assert(collected("ack_dup").map(_.kind) == Seq("deliver"))
    } finally q.stop()
  }
}
