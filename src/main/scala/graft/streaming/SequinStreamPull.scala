package graft.streaming

import graft.model.ChangeEvent
import graft.streaming.AckDelivery.{Delivery, DeliveryCommand}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** HTTP-pull ("Sequin Stream") consumer shim: the receive / ack / nack
  * interface of the reference's pull API
  * (`lib/sequin_web/controllers/pull_controller.ex:14-110`) in front of
  * the [[AckDelivery]] state machine. The network layer is out of scope
  * in this zero-egress environment; everything behind the three verbs —
  * batch-size bounds, long-poll waiting, stale-redelivery wakeups,
  * exactly-once hand-out, ack-id validation — is implemented and
  * spec-tested, so an HTTP framework binding is a thin JSON shim.
  *
  * Semantics mirrored:
  *   - `receive(max_batch_size)`: 1..1000 bound (pull_controller.ex:76-88);
  *     wakes groups first so expired visibility timeouts redeliver
  *     (`nack_stale_produced_messages`); each delivery attempt is handed
  *     out exactly once; messages are withheld, not duplicated, while
  *     in flight.
  *   - `wait_for` long-poll: bounded wait until messages exist
  *     (pull_controller.ex:93-110).
  *   - `ack(ack_ids)`: permanent removal; unknown ids are no-ops
  *     (idempotent acks).
  *   - `nack(ack_ids)`: immediate redeliverability.
  *
  * Driver-side facade over a streaming query: commands flow through a
  * MemoryStream into the keyed state machine; deliveries land in a memory
  * sink this class pages through. One instance per consumer.
  */
final class SequinStreamPull(
    ackWaitMs: Long = 30000L,
    maxInflight: Int = 1,
    maxRetry: Int = 3,
    nowMs: () => Long = () => System.currentTimeMillis())(
    implicit spark: SparkSession) {
  import spark.implicits._
  implicit private val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val name = s"graft_pull_${java.util.UUID.randomUUID().toString.replace("-", "")}"
  private val input = MemoryStream[DeliveryCommand]
  private val query = AckDelivery.run(input.toDS(), ackWaitMs, maxInflight,
      maxRetry, nowMs)
    .writeStream.format("memory").queryName(name)
    .outputMode("append").start()

  // delivery attempts already handed to the client: (ack_id, deliver_count)
  private val handedOut = scala.collection.mutable.Set.empty[(String, Int)]
  private val groupOfAck = scala.collection.mutable.Map.empty[String, String]
  private val knownGroups = scala.collection.mutable.Set.empty[String]

  /** Feed source events (the slot's decoded stream) into the store. */
  def ingest(events: Seq[ChangeEvent]): Unit = {
    events.foreach(e => knownGroups += Option(e.group_id)
      .getOrElse(s"__pk:${e.record_pk}"))
    input.addData(events.map(DeliveryCommand.event))
    query.processAllAvailable()
  }

  /** Pull up to `maxBatchSize` deliveries; long-polls up to `waitForMs`
    * when none are immediately available.
    */
  def receive(maxBatchSize: Int = 1, waitForMs: Long = 0L): Seq[Delivery] = {
    require(maxBatchSize >= 1 && maxBatchSize <= 1000,
      "max_batch_size must be an integer between 1 and 1000")
    require(waitForMs >= 0L && waitForMs <= 5L * 60 * 1000,
      "wait_for must be between 0ms and 5m")
    val deadline = System.nanoTime() + waitForMs * 1000000L
    var batch = pull(maxBatchSize)
    while (batch.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(25)
      batch = pull(maxBatchSize)
    }
    batch
  }

  /** Permanently complete deliveries (idempotent; unknown ids no-op). */
  def ack(ackIds: Seq[String]): Unit = sendFor(ackIds, DeliveryCommand.ack)

  /** Make deliveries immediately redeliverable. */
  def nack(ackIds: Seq[String]): Unit = sendFor(ackIds, DeliveryCommand.nack)

  /** Dead-lettered messages observed so far. */
  def deadLetters(): Seq[Delivery] =
    spark.table(name).as[Delivery].collect().filter(_.kind == "dlq").toSeq

  def stop(): Unit = query.stop()

  private def sendFor(ackIds: Seq[String],
      mk: (String, String) => DeliveryCommand): Unit = {
    require(ackIds.nonEmpty && ackIds.forall(_.nonEmpty),
      "ack_ids must be a non-empty list of non-empty ids")
    val cmds = ackIds.flatMap(id => groupOfAck.get(id).map(g => mk(g, id)))
    if (cmds.nonEmpty) {
      input.addData(cmds)
      query.processAllAvailable()
    }
  }

  private def pull(maxBatchSize: Int): Seq[Delivery] = {
    // wake every group so expired visibility timeouts redeliver — the
    // controller's nack_stale_produced_messages step
    if (knownGroups.nonEmpty) {
      input.addData(knownGroups.toSeq.sorted.map(DeliveryCommand.tick))
      query.processAllAvailable()
    }
    val fresh = spark.table(name).as[Delivery].collect()
      .filter(d => d.kind != "dlq" && !handedOut.contains((d.ack_id, d.deliver_count)))
      .sortBy(d => (d.event.commit_lsn, d.event.commit_idx))
      .take(maxBatchSize).toSeq
    fresh.foreach { d =>
      handedOut += ((d.ack_id, d.deliver_count))
      groupOfAck(d.ack_id) = Option(d.event.group_id)
        .getOrElse(s"__pk:${d.event.record_pk}")
    }
    fresh
  }
}
