package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.model.ChangeEvent
import graft.sinks.{SinkAdapters, WireSink, WireSinkProvider}
import graft.streaming.AckDelivery
import graft.streaming.AckDelivery.DeliveryCommand
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dead-letter path end to end: deliveries that exhaust max_retry in the
  * AckDelivery state machine flow through the DLQ wire adapter into the
  * epoch-idempotent wire sink — the full "undeliverable message lands
  * durably with its post-mortem" loop.
  */
class DlqWireSpec extends SparkSpec {

  private def ev(lsn: Long, group: String): ChangeEvent =
    ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"), "update",
      "public", "t0", 16384L, s"pk$lsn", lsn, group.toLong, 1.0, "{}",
      None, s"$group:$lsn", group, 100L)

  test("exhausted deliveries land in the DLQ wire log with attempt post-mortem") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wire = Files.createTempDirectory("dlq_wire").toString

    val in = MemoryStream[DeliveryCommand]
    val q = SinkAdapters.dlqWire(
        AckDelivery.run(in.toDS(), ackWaitMs = 60000L, maxRetry = 2).toDF(),
        dest = "dlq.topic")
      .writeStream.format(classOf[WireSinkProvider].getName)
      .option("path", wire)
      .option("checkpointLocation",
        Files.createTempDirectory("dlq_ckpt").toString)
      .outputMode("append").start()
    try {
      in.addData(DeliveryCommand.event(ev(8, "4")))
      q.processAllAvailable()
      in.addData(DeliveryCommand.nack("4", "4:8")) // attempt 2 (redeliver)
      q.processAllAvailable()
      in.addData(DeliveryCommand.nack("4", "4:8")) // attempts exhausted -> dlq
      q.processAllAvailable()

      val rows = WireSink.readWireLog(spark, wire).collect()
      assert(rows.length == 1) // deliver/redeliver kinds never hit the DLQ wire
      val r = rows.head
      assert(r.getString(0) == "dlq" && r.getString(1) == "dlq.topic" &&
        r.getString(2) == "4")
      val body = r.getString(3)
      assert(body.contains("\"commit_lsn\":8") &&
        body.contains("\"deliver_count\":2") &&
        body.contains("\"record_pk\":\"pk8\""))
    } finally q.stop()
  }
}
