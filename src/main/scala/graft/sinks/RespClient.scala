package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** The Redis delivery CLIENT — the socket half of the redis_stream /
  * redis_string sinks, speaking RESP2 (the public Redis serialization
  * protocol) over a plain TCP socket.
  *
  * Reference semantics (`/root/reference/lib/sequin/sinks/redis/
  * client.ex`): stream messages become pipelined
  * `XADD <stream_key> * field value ...` commands (`:119-138`), string
  * messages `SET key payload [PX expire_ms]` / `DEL key` (`:36-58`),
  * all sent through `:eredis.qp` — one pipelined write, one batched
  * reply read, 15 s timeout (`:100-107`) — with connection tests via
  * `PING`→`PONG` (`:85-97`) and errors classified as `no_connection` /
  * `timeout` / `command_failed` (`:141-160`). This object reproduces
  * that contract: [[SinkAdapters.redisStreamWire]] /
  * [[SinkAdapters.redisStringWire]] decide WHAT to send (oracle-checked
  * DataFrames); this client turns wire rows into RESP frames and
  * performs the socket I/O at the very edge of the plan.
  *
  * Scale shape: same as [[HttpPushClient]] — one connection per
  * partition-task, commands pipelined WITHIN a partition in wire order
  * (the per-partition commit order is the delivery-order contract),
  * partitions in parallel across executors = N concurrent connection
  * lanes. Pipelining matters at scale: one round-trip per
  * `pipelineDepth` commands instead of per command.
  *
  * Egress note: the client only ever dials the host it is given;
  * production points it at real Redis, the spec at a scripted
  * 127.0.0.1 loopback server that byte-checks every frame (zero-egress
  * sandbox).
  *
  * Strictness: the reference collapses per-command replies to `:ok`
  * once the pipeline transport succeeds (`client.ex:103` — `_res ->
  * :ok`). This client CLASSIFIES per-command `-ERR` replies as failed
  * deliveries instead (nack → redelivery ladder): silently acking a
  * rejected XADD would violate the at-least-once contract the
  * reference's own DLQ machinery exists for. `strictReplies = false`
  * restores reference parity.
  */
object RespClient {

  // ---------- RESP2 frame encoding ----------

  private val CRLF = Array[Byte]('\r', '\n')

  /** Encode one command as a RESP array of bulk strings:
    * `*<n>\r\n` then `$<len>\r\n<bytes>\r\n` per argument — the only
    * request form the protocol defines for clients.
    */
  def encodeCommand(args: Seq[String]): Array[Byte] = {
    require(args.nonEmpty, "empty RESP command")
    val out = new java.io.ByteArrayOutputStream(64)
    out.write(s"*${args.length}".getBytes(UTF_8)); out.write(CRLF)
    args.foreach { a =>
      val b = a.getBytes(UTF_8)
      out.write(s"$$${b.length}".getBytes(UTF_8)); out.write(CRLF)
      out.write(b); out.write(CRLF)
    }
    out.toByteArray
  }

  // ---------- RESP2 reply decoding ----------

  sealed trait Reply
  final case class SimpleStr(s: String) extends Reply
  final case class ErrorStr(msg: String) extends Reply
  final case class IntReply(v: Long) extends Reply
  final case class Bulk(value: Option[String]) extends Reply
  final case class ArrReply(items: Seq[Reply]) extends Reply

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new java.io.EOFException("RESP stream closed mid-line")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new java.io.IOException("RESP: CR without LF")
    sb.toString
  }

  /** Decode one reply frame (recursive for arrays). */
  def readReply(in: InputStream): Reply = {
    val t = in.read()
    if (t < 0) throw new java.io.EOFException("RESP stream closed")
    val line = readLine(in)
    t.toChar match {
      case '+' => SimpleStr(line)
      case '-' => ErrorStr(line)
      case ':' => IntReply(line.toLong)
      case '$' =>
        val n = line.toInt
        if (n < 0) Bulk(None)
        else {
          val buf = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(buf, off, n - off)
            if (r < 0) throw new java.io.EOFException("RESP bulk truncated")
            off += r
          }
          if (in.read() != '\r' || in.read() != '\n')
            throw new java.io.IOException("RESP: bulk missing CRLF")
          Bulk(Some(new String(buf, UTF_8)))
        }
      case '*' =>
        val n = line.toInt
        if (n < 0) ArrReply(Nil)
        else ArrReply(Vector.fill(n)(readReply(in)))
      case other =>
        throw new java.io.IOException(s"RESP: unknown type byte '$other'")
    }
  }

  // ---------- connection ----------

  /** One TCP connection. `pipeline` is the `:eredis.qp` analog: write
    * every frame, flush once, then read exactly one reply per command —
    * the socket read timeout bounds the whole batch like the
    * reference's 15 s `qp` timeout.
    */
  final class Connection(host: String, port: Int,
      timeoutMs: Int = 15000) extends AutoCloseable {
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), timeoutMs)
    socket.setSoTimeout(timeoutMs)
    socket.setTcpNoDelay(true)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private val in = new BufferedInputStream(socket.getInputStream)

    def pipeline(cmds: Seq[Seq[String]]): Seq[Reply] = {
      cmds.foreach(c => out.write(encodeCommand(c)))
      out.flush()
      cmds.map(_ => readReply(in))
    }

    def command(cmd: Seq[String]): Reply = pipeline(Seq(cmd)).head

    /** `test_connection` parity: PING must answer +PONG. */
    def ping(): Boolean = command(Seq("PING")) == SimpleStr("PONG")

    /** `message_count` parity: XLEN of a stream key. */
    def xlen(streamKey: String): Long = command(Seq("XLEN", streamKey)) match {
      case IntReply(n) => n
      case other => throw new java.io.IOException(s"XLEN: unexpected $other")
    }

    override def close(): Unit = socket.close()
  }

  // ---------- wire rows → commands ----------

  /** One delivery request: an already-encoded argument vector plus the
    * delivery identity it acks under.
    */
  final case class RespRequest(
      ack_id: String,
      group_id: String,
      args: Seq[String])

  final case class RespResult(
      ack_id: String,
      group_id: String,
      ok: Boolean,
      err: String)

  /** [[SinkAdapters.redisStreamWire]] rows → `XADD key * f v ...`
    * requests (client.ex:119-138). `map_entries` keeps the wire's field
    * order — a Scala `Map` collect would not.
    */
  def streamRequests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[RespRequest] = {
    import spark.implicits._
    // ack_id / group_id are the wire's LEDGER identity (idempotency key
    // + AckDelivery group) — not transport-local ids — so the result's
    // ack lands on the exact in-flight entry the delivery covers
    wire.select(col("ack_id"), col("ledger_group_id"),
        col("stream_key"), col("entry_id"),
        map_entries(col("fields")).as("fs"))
      .as[(String, String, String, String, Seq[(String, String)])]
      .map { case (ackId, groupId, key, entryId, fs) =>
        RespRequest(ackId, groupId,
          Vector("XADD", key, entryId) ++ fs.flatMap(kv => Seq(kv._1, kv._2)))
      }
  }

  /** [[SinkAdapters.redisStringWire]] rows → `SET key v [PX ms]` /
    * `DEL key` requests (client.ex:36-58; TTL is stored in seconds on
    * the wire, sent as PX milliseconds like the reference's expire_ms).
    */
  def stringRequests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[RespRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"),
        col("key"), col("value"), col("op"), col("ttl"))
      .as[(String, String, String, Option[String], String, Option[Long])]
      .map { case (ackId, groupId, key, value, op, ttl) =>
        val args: Vector[String] =
          if (op == "DEL") Vector("DEL", key)
          else ttl match {
            case Some(s) => Vector("SET", key, value.getOrElse(""),
              "PX", (s * 1000L).toString)
            case None => Vector("SET", key, value.getOrElse(""))
          }
        RespRequest(ackId, groupId, args)
      }
  }

  // ---------- delivery ----------

  /** Deliver every request: one connection per partition-task, commands
    * pipelined in `pipelineDepth` chunks in partition order. A transport
    * failure (connect refused / reset / read timeout) fails the
    * remaining requests of the partition with `no_connection` /
    * `timeout` — the reference's error taxonomy (client.ex:141-152) —
    * so they nack toward redelivery instead of silently vanishing.
    */
  def deliver(requests: Dataset[RespRequest], host: String, port: Int,
      timeoutMs: Int = 15000, pipelineDepth: Int = 50,
      strictReplies: Boolean = true)(
      implicit spark: SparkSession): Dataset[RespResult] = {
    import spark.implicits._
    requests.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val conn =
          try Some(new Connection(host, port, timeoutMs))
          catch { case _: Exception => None }
        val results = Vector.newBuilder[RespResult]
        var transportErr: Option[String] = if (conn.isEmpty) Some("no_connection") else None
        it.grouped(pipelineDepth).foreach { chunk =>
          transportErr match {
            case Some(e) =>
              chunk.foreach(r => results += RespResult(r.ack_id, r.group_id, ok = false, e))
            case None =>
              try {
                val replies = conn.get.pipeline(chunk.map(_.args))
                chunk.zip(replies).foreach { case (r, rep) =>
                  rep match {
                    case ErrorStr(msg) if strictReplies =>
                      results += RespResult(r.ack_id, r.group_id, ok = false,
                        s"command_failed: $msg")
                    case _ =>
                      results += RespResult(r.ack_id, r.group_id, ok = true, "")
                  }
                }
              } catch {
                case _: java.net.SocketTimeoutException =>
                  transportErr = Some("timeout")
                  chunk.foreach(r =>
                    results += RespResult(r.ack_id, r.group_id, ok = false, "timeout"))
                case _: java.io.IOException =>
                  transportErr = Some("no_connection")
                  chunk.foreach(r =>
                    results += RespResult(r.ack_id, r.group_id, ok = false, "no_connection"))
              }
          }
        }
        conn.foreach(c => try c.close() catch { case _: Exception => () })
        results.result().iterator
      }
    }
  }

  /** Results → delivery state machine commands (ack delivered, nack
    * failed) — the same bridge [[HttpPushClient.commands]] provides.
    */
  def commands(results: Dataset[RespResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
