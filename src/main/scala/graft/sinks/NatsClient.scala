package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** The NATS delivery CLIENT — the socket half of the nats sink, speaking
  * the public text protocol (nats.io docs: INFO/CONNECT, HPUB with the
  * NATS/1.0 header block, PING/PONG, SUB/MSG).
  *
  * Reference semantics (`/root/reference/lib/sequin/sinks/nats/
  * client.ex`): each routed message publishes to its subject with the
  * header list and the JSON envelope as payload (`:80-102`, Gnat.pub
  * with `headers:` opts → HPUB frames); `test_connection` subscribes to
  * a random `_SEQUIN.TEST.*` subject, publishes a ping, and expects the
  * echo back (`:30-77`). [[SinkAdapters.natsWire]] decides WHAT to send
  * (subject, `Nats-Msg-Id` header, payload — oracle-checked); this
  * client owns the socket.
  *
  * Delivery confirmation: NATS is fire-and-forget per PUB, so the
  * client sends a PING after each pipelined chunk — the protocol is
  * ordered, so the PONG confirms the server consumed every preceding
  * frame (the same barrier Gnat's flush uses). A chunk whose barrier
  * never returns fails closed toward the redelivery ladder.
  *
  * Scale shape: one connection per partition-task, publishes pipelined
  * in wire order within the partition, partitions in parallel across
  * executors. Egress: dials only the host it is given; the spec runs a
  * scripted 127.0.0.1 server.
  */
object NatsClient {

  // ---- frame encoding ----------------------------------------------------

  /** HPUB frame: `HPUB <subject> <hdr_len> <total_len>\r\nNATS/1.0\r\n
    * <k: v>...\r\n\r\n<payload>\r\n`. With no headers, a plain PUB.
    */
  def pubFrame(subject: String, headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    require(subject.nonEmpty && !subject.exists(c => c == ' ' || c == '\r' ||
      c == '\n'), s"invalid NATS subject: '$subject'")
    if (headers.isEmpty) {
      val head = s"PUB $subject ${payload.length}\r\n".getBytes(UTF_8)
      head ++ payload ++ "\r\n".getBytes(UTF_8)
    } else {
      val block = ("NATS/1.0\r\n" +
        headers.map { case (k, v) => s"$k: $v\r\n" }.mkString +
        "\r\n").getBytes(UTF_8)
      val head = s"HPUB $subject ${block.length} ${block.length + payload.length}\r\n"
        .getBytes(UTF_8)
      head ++ block ++ payload ++ "\r\n".getBytes(UTF_8)
    }
  }

  def connectFrame(verbose: Boolean): Array[Byte] =
    (s"""CONNECT {"verbose":$verbose,"pedantic":false,"headers":true,""" +
      s""""lang":"scala","version":"1.0.0"}""" + "\r\n").getBytes(UTF_8)

  // ---- connection --------------------------------------------------------

  final class Connection(host: String, port: Int, timeoutMs: Int = 10000)
      extends AutoCloseable {
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), timeoutMs)
    socket.setSoTimeout(timeoutMs)
    socket.setTcpNoDelay(true)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private val in = new BufferedInputStream(socket.getInputStream)

    // server speaks first: INFO {...}
    val serverInfo: String = {
      val line = readLine()
      require(line.startsWith("INFO "), s"expected INFO, got: $line")
      line.stripPrefix("INFO ")
    }
    out.write(connectFrame(verbose = false))
    out.flush()

    private def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\r') {
        if (c < 0) throw new java.io.EOFException("NATS stream closed")
        sb.append(c.toChar)
        c = in.read()
      }
      require(in.read() == '\n', "CR without LF")
      sb.toString
    }

    private def readN(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new java.io.EOFException("NATS payload truncated")
        off += r
      }
      buf
    }

    /** Write pub frames for a chunk, then the PING barrier; returns once
      * the PONG confirms the server consumed the chunk.
      */
    def publishChunk(frames: Seq[Array[Byte]]): Unit = {
      frames.foreach(out.write)
      out.write("PING\r\n".getBytes(UTF_8))
      out.flush()
      var line = readLine()
      // skip +OK / MSG traffic until the barrier answers
      while (line != "PONG") {
        if (line.startsWith("-ERR"))
          throw new java.io.IOException(s"NATS error: $line")
        if (line.startsWith("MSG ") || line.startsWith("HMSG ")) {
          val parts = line.split(" ")
          val n = parts.last.toInt
          readN(n + 2) // payload + CRLF
        }
        line = readLine()
      }
    }

    def ping(): Boolean = {
      out.write("PING\r\n".getBytes(UTF_8))
      out.flush()
      readLine() == "PONG"
    }

    /** `test_connection` parity (client.ex:30-77): SUB a test subject,
      * UNSUB after 1, PUB a ping payload to it, expect the echo MSG.
      */
    def testLoopback(subject: String, payload: String): Boolean = {
      out.write(s"SUB $subject 1\r\n".getBytes(UTF_8))
      out.write(s"UNSUB 1 1\r\n".getBytes(UTF_8))
      out.write(pubFrame(subject, Nil, payload.getBytes(UTF_8)))
      out.flush()
      var line = readLine()
      while (!line.startsWith("MSG ")) {
        if (line.startsWith("-ERR")) return false
        line = readLine()
      }
      val parts = line.split(" ")
      parts(1) == subject &&
        new String(readN(parts.last.toInt + 2).dropRight(2), UTF_8) == payload
    }

    override def close(): Unit = socket.close()
  }

  // ---- wire rows → requests ---------------------------------------------

  final case class NatsRequest(
      ack_id: String,
      group_id: String,
      subject: String,
      headers: Seq[(String, String)],
      payload: String)

  final case class NatsResult(
      ack_id: String,
      group_id: String,
      ok: Boolean,
      err: String)

  /** [[SinkAdapters.natsWire]] rows → publish requests. The Nats-Msg-Id
    * header (= idempotency key) is the delivery identity.
    */
  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[NatsRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"), col("subject"),
        map_entries(col("headers")).as("hs"), col("payload"))
      .as[(String, String, String, Seq[(String, String)], String)]
      .map { case (ackId, groupId, subject, hs, payload) =>
        NatsRequest(ackId, groupId, subject, hs, payload)
      }
  }

  /** Deliver with per-chunk PING barriers; a failed barrier fails the
    * chunk's requests closed (nack → redelivery), mirroring the halt-on
    * -error reduce in `send_messages` (client.ex:14-27).
    */
  def deliver(reqs: Dataset[NatsRequest], host: String, port: Int,
      timeoutMs: Int = 10000, chunkSize: Int = 50)(
      implicit spark: SparkSession): Dataset[NatsResult] = {
    import spark.implicits._
    reqs.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val conn =
          try Some(new Connection(host, port, timeoutMs))
          catch { case _: Exception => None }
        val results = Vector.newBuilder[NatsResult]
        var broken: Option[String] = if (conn.isEmpty) Some("no_connection") else None
        it.grouped(chunkSize).foreach { chunk =>
          broken match {
            case Some(e) =>
              chunk.foreach(r =>
                results += NatsResult(r.ack_id, r.group_id, ok = false, e))
            case None =>
              try {
                conn.get.publishChunk(chunk.map(r =>
                  pubFrame(r.subject, r.headers, r.payload.getBytes(UTF_8))))
                chunk.foreach(r =>
                  results += NatsResult(r.ack_id, r.group_id, ok = true, ""))
              } catch {
                case _: java.net.SocketTimeoutException =>
                  broken = Some("timeout")
                  chunk.foreach(r =>
                    results += NatsResult(r.ack_id, r.group_id, ok = false, "timeout"))
                case e: java.io.IOException =>
                  broken = Some("no_connection")
                  chunk.foreach(r =>
                    results += NatsResult(r.ack_id, r.group_id, ok = false,
                      if (e.getMessage != null && e.getMessage.startsWith("NATS error"))
                        e.getMessage else "no_connection"))
              }
          }
        }
        conn.foreach(c => try c.close() catch { case _: Exception => () })
        results.result().iterator
      }
    }
  }

  def commands(results: Dataset[NatsResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
