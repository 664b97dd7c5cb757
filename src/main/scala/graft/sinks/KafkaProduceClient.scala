package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** The Kafka PRODUCE client — the socket half of the kafka sink,
  * speaking the public Kafka wire protocol: int32-framed requests,
  * request header v1, Produce v3 with MESSAGE FORMAT V2 record batches
  * (magic 2, CRC32C over the post-crc section, zigzag-varint records),
  * acks=-1 so the broker's base_offset response is the durability
  * confirmation.
  *
  * Reference analog: `kafka_pipeline.ex` + `sinks/kafka/kafka.ex`
  * (`:aiokafka`-like produce of `kafkaWire`'s (topic, key, value) rows,
  * message key = the routing key so a key's messages stay ordered in
  * one partition). [[SinkAdapters.kafkaWire]] decides WHAT to send;
  * this client owns framing, batch encoding and the ack protocol.
  *
  * Scale shape: one connection per partition-task, one record batch per
  * chunk in wire order (the per-partition commit order is the delivery
  * contract), partitions in parallel = N producer lanes. The batch is
  * the unit of both network amortization and acknowledgment, exactly
  * like a real producer's in-flight batch.
  *
  * Egress: dials only the host given; the spec's scripted loopback
  * broker DECODES the batches (varints, CRC32C re-computation) with an
  * independent parser, so the encoder is checked against the format
  * spec, not against itself.
  */
object KafkaProduceClient {

  // ---- primitive encoders (network byte order) ---------------------------

  private def str(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    ByteBuffer.allocate(2).putShort(b.length.toShort).array() ++ b
  }

  private def nullableStr(s: Option[String]): Array[Byte] = s match {
    case Some(v) => str(v)
    case None    => Array[Byte](-1, -1)
  }

  /** Zigzag + LEB128 varint (the record-format integer encoding). */
  def varint(v: Long): Array[Byte] = {
    var z = (v << 1) ^ (v >> 63)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while ((z & ~0x7FL) != 0) {
      out += ((z & 0x7F) | 0x80).toByte
      z >>>= 7
    }
    out += z.toByte
    out.toArray
  }

  /** One record in message-format v2 (attributes 0, no headers). */
  def encodeRecord(offsetDelta: Int, timestampDelta: Long,
      key: Option[Array[Byte]], value: Array[Byte]): Array[Byte] = {
    val body = Array[Byte](0) ++ // attributes
      varint(timestampDelta) ++ varint(offsetDelta.toLong) ++
      key.map(k => varint(k.length.toLong) ++ k).getOrElse(varint(-1L)) ++
      varint(value.length.toLong) ++ value ++
      varint(0L) // headers count
    varint(body.length.toLong) ++ body
  }

  /** A v2 record batch: magic 2, CRC32C over everything after the crc
    * field, uncompressed, producer fields unset (idempotence off).
    */
  def encodeRecordBatch(baseTimestamp: Long,
      records: Seq[(Option[Array[Byte]], Array[Byte])]): Array[Byte] = {
    require(records.nonEmpty, "empty record batch")
    val recBytes = records.zipWithIndex.flatMap { case ((k, v), i) =>
      encodeRecord(i, 0L, k, v)
    }.toArray
    val afterCrc = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4)
      .putShort(0)                       // attributes
      .putInt(records.length - 1)        // lastOffsetDelta
      .putLong(baseTimestamp)
      .putLong(baseTimestamp)
      .putLong(-1L)                      // producerId
      .putShort(-1)                      // producerEpoch
      .putInt(-1)                        // baseSequence
      .putInt(records.length)
      .array() ++ recBytes
    val crc = new java.util.zip.CRC32C()
    crc.update(afterCrc)
    val postLength = ByteBuffer.allocate(4 + 1 + 4)
      .putInt(-1)                        // partitionLeaderEpoch
      .put(2.toByte)                     // magic
      .putInt(crc.getValue.toInt)
      .array() ++ afterCrc
    ByteBuffer.allocate(8 + 4).putLong(0L) // baseOffset
      .putInt(postLength.length).array() ++ postLength
  }

  /** Produce v3 request (header v1): transactional_id null, acks -1. */
  def encodeProduceRequest(correlationId: Int, clientId: String,
      topic: String, partition: Int, batch: Array[Byte],
      timeoutMs: Int): Array[Byte] = {
    val payload =
      ByteBuffer.allocate(2 + 2 + 4).putShort(0) // api_key Produce
        .putShort(3).putInt(correlationId).array() ++
      str(clientId) ++
      nullableStr(None) ++                         // transactional_id
      ByteBuffer.allocate(2 + 4).putShort(-1)      // acks
        .putInt(timeoutMs).array() ++
      ByteBuffer.allocate(4).putInt(1).array() ++  // one topic
      str(topic) ++
      ByteBuffer.allocate(4).putInt(1).array() ++  // one partition
      ByteBuffer.allocate(4).putInt(partition).array() ++
      ByteBuffer.allocate(4).putInt(batch.length).array() ++ batch
    ByteBuffer.allocate(4).putInt(payload.length).array() ++ payload
  }

  /** Kafka error code → reference-style reason (subset we act on). */
  def errorName(code: Short): String = code match {
    case 0  => "none"
    case 3  => "unknown_topic_or_partition"
    case 6  => "not_leader_or_follower"
    case 7  => "request_timed_out"
    case 10 => "message_too_large"
    case c  => s"error_$c"
  }

  // ---- connection --------------------------------------------------------

  final class Connection(host: String, port: Int, timeoutMs: Int = 15000)
      extends AutoCloseable {
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), timeoutMs)
    socket.setSoTimeout(timeoutMs)
    socket.setTcpNoDelay(true)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private val in = new DataInputStream(
      new BufferedInputStream(socket.getInputStream))
    private var correlation = 0

    /** One produce round trip; returns (error_code, base_offset). */
    def produce(topic: String, partition: Int,
        records: Seq[(Option[Array[Byte]], Array[Byte])],
        timeoutMs: Int = 30000): (Short, Long) = {
      correlation += 1
      val batch = encodeRecordBatch(System.currentTimeMillis(), records)
      out.write(encodeProduceRequest(correlation, "graft", topic,
        partition, batch, timeoutMs))
      out.flush()
      val len = in.readInt()
      val body = new Array[Byte](len)
      in.readFully(body)
      val b = ByteBuffer.wrap(body)
      val corr = b.getInt
      require(corr == correlation, s"correlation mismatch: $corr")
      val nTopics = b.getInt
      require(nTopics == 1, s"unexpected topic count $nTopics")
      val tLen = b.getShort
      b.position(b.position() + tLen)
      val nParts = b.getInt
      require(nParts == 1, s"unexpected partition count $nParts")
      b.getInt // partition index
      val err = b.getShort
      val baseOffset = b.getLong
      (err, baseOffset)
    }

    override def close(): Unit = socket.close()
  }

  // ---- wire rows → delivery ----------------------------------------------

  final case class KafkaRequest(
      ack_id: String,
      group_id: String,
      topic: String,
      key: Option[String],
      value: String)

  final case class KafkaResult(
      ack_id: String,
      group_id: String,
      topic: String,
      ok: Boolean,
      base_offset: Long,
      err: String)

  /** [[SinkAdapters.kafkaWire]] rows → produce requests. `ack_id` /
    * `group_id` are the wire's LEDGER identity (the event's idempotency
    * key + AckDelivery group), so the broker's per-batch outcome acks
    * the exact in-flight entries it covered.
    */
  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[KafkaRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"),
        col("topic"), col("key"), col("value"))
      .as[(String, String, String, Option[String], String)]
      .map { case (ackId, groupId, topic, key, value) =>
        KafkaRequest(ackId, groupId, topic, key, value)
      }
  }

  /** Deliver: per partition-task one connection, one record batch per
    * (topic, chunk) in wire order; the broker's error_code resolves the
    * whole batch (the producer retry unit), base_offset + index gives
    * each record its assigned offset.
    */
  def deliver(reqs: Dataset[KafkaRequest], host: String, port: Int,
      partition: Int = 0, chunkSize: Int = 100, timeoutMs: Int = 15000)(
      implicit spark: SparkSession): Dataset[KafkaResult] = {
    import spark.implicits._
    reqs.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val conn =
          try Some(new Connection(host, port, timeoutMs))
          catch { case _: Exception => None }
        val results = Vector.newBuilder[KafkaResult]
        var broken: Option[String] = if (conn.isEmpty) Some("no_connection") else None
        // batch per topic run, preserving wire order within the partition
        val runs = new Iterator[Seq[KafkaRequest]] {
          val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Seq[KafkaRequest] = {
            val topic = buf.head.topic
            val chunk = Vector.newBuilder[KafkaRequest]
            var n = 0
            while (buf.hasNext && buf.head.topic == topic && n < chunkSize) {
              chunk += buf.next(); n += 1
            }
            chunk.result()
          }
        }
        runs.foreach { chunk =>
          broken match {
            case Some(e) =>
              chunk.foreach(r => results += KafkaResult(r.ack_id, r.group_id, r.topic,
                ok = false, -1L, e))
            case None =>
              try {
                val (err, base) = conn.get.produce(chunk.head.topic,
                  partition, chunk.map(r => (r.key.map(_.getBytes(UTF_8)),
                    r.value.getBytes(UTF_8))))
                if (err == 0)
                  chunk.zipWithIndex.foreach { case (r, i) =>
                    results += KafkaResult(r.ack_id, r.group_id, r.topic,
                      ok = true, base + i, "")
                  }
                else
                  chunk.foreach(r => results += KafkaResult(r.ack_id,
                    r.group_id, r.topic, ok = false, -1L, errorName(err)))
              } catch {
                case _: java.net.SocketTimeoutException =>
                  broken = Some("timeout")
                  chunk.foreach(r => results += KafkaResult(r.ack_id,
                    r.group_id, r.topic, ok = false, -1L, "timeout"))
                case _: Exception =>
                  broken = Some("no_connection")
                  chunk.foreach(r => results += KafkaResult(r.ack_id,
                    r.group_id, r.topic, ok = false, -1L, "no_connection"))
              }
          }
        }
        conn.foreach(c => try c.close() catch { case _: Exception => () })
        results.result().iterator
      }
    }
  }

  def commands(results: Dataset[KafkaResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
