package graft

import graft.sources.{PgOutput, ReplicationClient, WalSpool}
import graft.sources.PgOutput._
import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** The replication TCP client driven against a scripted loopback server
  * speaking the Postgres server half: startup handshake in replication
  * mode, the reference-shaped START_REPLICATION query, XLogData frames
  * carrying REAL pgoutput bytes ([[PgOutput.encode]]), keepalive →
  * Standby Status Update acks carrying only DURABLY-SPOOLED lsns, and
  * spool segments that feed the existing decode chain.
  */
class ReplicationClientSpec extends SparkSpec {

  private def pgFrame(lsn: Long, msg: PgMessage): (Long, Array[Byte]) =
    lsn -> PgOutput.encode(msg)

  private def xlog(lsn: Long, payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 24 + payload.length)
    buf.put('w'.toByte).putLong(lsn).putLong(lsn).putLong(0L).put(payload)
    buf.array()
  }

  private def typed(t: Char, body: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + body.length)
    buf.put(t.toByte).putInt(4 + body.length).put(body)
    buf.array()
  }

  test("standby status update and COPY payload layouts match the reference bit for bit") {
    // ack_message/1: <<?r, lsn::64, lsn::64, lsn::64, clock::64, 0>>
    val ack = ReplicationClient.standbyStatusUpdate(0x1234L, 77L)
    val b = ByteBuffer.wrap(ack)
    assert(b.get() == 'r'.toByte)
    assert(b.getLong == 0x1234L && b.getLong == 0x1234L && b.getLong == 0x1234L)
    assert(b.getLong == 77L && b.get() == 0.toByte && !b.hasRemaining)

    val w = ReplicationClient.parseCopyPayload(xlog(42L, Array[Byte](1, 2, 3)))
    assert(w == ReplicationClient.XLogData(42L, 42L, 0L,
      Array[Byte](1, 2, 3)) || (w match {
        case ReplicationClient.XLogData(42L, 42L, 0L, p) => p.toSeq == Seq[Byte](1, 2, 3)
        case _ => false
      }))
    val k = ReplicationClient.parseCopyPayload(
      ByteBuffer.allocate(18).put('k'.toByte).putLong(9L).putLong(8L)
        .put(1.toByte).array())
    assert(k == ReplicationClient.Keepalive(9L, 8L, replyRequested = true))

    // start_replication_query/1 parity (slot_producer.ex:763-768)
    assert(ReplicationClient.startReplicationQuery("s1", "pub1", messages = true) ==
      "START_REPLICATION SLOT s1 LOGICAL 0/0 (proto_version '1', " +
        "publication_names 'pub1', messages 'true')")
  }

  test("full loopback session: handshake, START_REPLICATION, XLogData spooling, durable-lsn ack") {
    val spool = Files.createTempDirectory("repl-spool").toString
    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    @volatile var startupParams = ""
    @volatile var receivedSql = ""
    @volatile var ackedLsn = -1L

    // two txns of real pgoutput frames; commits at lsn 100 and 200
    val rel = Relation(7L, "public", "t", "d",
      Seq(RelationColumn("id", isKey = true, 20L, -1)))
    val txns: Seq[(Long, Array[Byte])] = Seq(
      pgFrame(100L, rel),
      pgFrame(100L, Begin(100L, 1000L, 1L)),
      pgFrame(100L, Insert(7L, Seq(Cell.Text("a")))),
      pgFrame(100L, Commit(0, 100L, 101L, 1000L)),
      pgFrame(200L, Begin(200L, 2000L, 2L)),
      pgFrame(200L, Insert(7L, Seq(Cell.Text("b")))),
      pgFrame(200L, Commit(0, 200L, 201L, 2000L)))

    val serverThread = new Thread(() => {
      val sock = server.accept()
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      // StartupMessage: int32 len, int32 proto, k/v body
      val len = in.readInt()
      val body = new Array[Byte](len - 4); in.readFully(body)
      val proto = ByteBuffer.wrap(body).getInt
      assert(proto == 196608)
      startupParams = new String(body.drop(4), StandardCharsets.UTF_8)
      out.write(typed('R', ByteBuffer.allocate(4).putInt(0).array())) // AuthOk
      out.write(typed('Z', Array('I'.toByte)))                        // Ready
      out.flush()
      // Query ('Q')
      val qt = in.readByte(); assert(qt == 'Q'.toByte)
      val qlen = in.readInt()
      val qbody = new Array[Byte](qlen - 4); in.readFully(qbody)
      receivedSql = new String(qbody.dropRight(1), StandardCharsets.UTF_8)
      // CopyBothResponse: format 0, zero columns
      out.write(typed('W', ByteBuffer.allocate(3).put(0.toByte)
        .putShort(0.toShort).array()))
      out.flush()
      // stream the txns as XLogData CopyData frames
      txns.foreach { case (lsn, payload) =>
        out.write(typed('d', xlog(lsn, payload)))
      }
      // keepalive with reply requested → client must ack durable lsn
      out.write(typed('d', ByteBuffer.allocate(18).put('k'.toByte)
        .putLong(200L).putLong(0L).put(1.toByte).array()))
      out.flush()
      // read the Standby Status Update
      val at = in.readByte(); assert(at == 'd'.toByte)
      val alen = in.readInt()
      val abody = new Array[Byte](alen - 4); in.readFully(abody)
      val ab = ByteBuffer.wrap(abody)
      assert(ab.get() == 'r'.toByte)
      ab.getLong // written
      ackedLsn = ab.getLong // flushed
      // graceful end: CopyDone
      out.write(typed('c', Array.emptyByteArray)); out.flush()
      sock.close()
    })
    serverThread.start()

    val client = new ReplicationClient("127.0.0.1", server.getLocalPort,
      "u", "db", "s1", "pub1", spool, nowMicros = () => 555L)
    client.start() // blocking; returns on CopyDone
    serverThread.join(10000)
    server.close()
    assert(client.lastError.isEmpty, s"client error: ${client.lastError}")

    // the handshake carried replication mode; the query is the
    // reference's exact START_REPLICATION string
    assert(startupParams.contains("replication") &&
      startupParams.contains("database"))
    assert(receivedSql ==
      ReplicationClient.startReplicationQuery("s1", "pub1", messages = true))

    // the ack horizon is the durably spooled commit lsn, not raw receipt
    assert(ackedLsn == 200L, s"acked $ackedLsn")
    assert(client.flushedLsn == 200L)

    // segments: commit-bounded flushes → 2 segments, payloads
    // byte-identical to what crossed the socket, seq strictly monotone
    val segs = WalSpool.listSegments(spool)
    assert(segs.size == 2, s"segments: $segs")
    val frames = segs.flatMap(WalSpool.readSegment)
    assert(frames.size == txns.size)
    frames.zip(txns).foreach { case (f, (_, sent)) =>
      assert(f.slot_id == "s1" && f.payload.toSeq == sent.toSeq)
    }
    assert(frames.map(_.seq) == frames.map(_.seq).sorted &&
      frames.map(_.seq).distinct.size == frames.size)

    // and the spooled bytes decode through the existing pgoutput path
    val decoded = frames.map(f => PgOutput.decode(f.payload))
    assert(decoded.collect { case i: Insert => i }.size == 2)
    assert(decoded.collect { case c: Commit => c }.map(_.lsn) ==
      Seq(100L, 200L))
  }
}
