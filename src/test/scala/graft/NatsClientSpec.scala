package graft

import graft.model.Cdc
import graft.sinks.{NatsClient, SinkAdapters}
import graft.sinks.NatsClient.NatsRequest
import java.io.{BufferedInputStream, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The NATS client driven against a scripted loopback server speaking
  * the public text protocol: INFO greeting, CONNECT, PUB/HPUB parsing
  * by an independent line-based reader, PING/PONG barriers, SUB/MSG
  * echo for the test_connection parity path. Byte-exact frame checks
  * against hand-written expectations. Zero egress: 127.0.0.1 only.
  */
class NatsClientSpec extends SparkSpec {

  private final class ScriptedNats(failSubjects: Set[String] = Set.empty) {
    val frames = new ConcurrentLinkedQueue[String]()   // raw op frames
    val connects = new ConcurrentLinkedQueue[String]()
    private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    @volatile private var running = true

    private def readLine(in: InputStream): Option[String] = {
      val sb = new StringBuilder
      var c = in.read()
      if (c < 0) return None
      while (c != '\r') {
        sb.append(c.toChar)
        c = in.read()
        if (c < 0) return None
      }
      in.read() // LF
      Some(sb.toString)
    }

    private def readN(in: InputStream, n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        require(r >= 0, "truncated payload")
        off += r
      }
      buf
    }

    private val thread = new Thread(() => {
      while (running) {
        var sock: Socket = null
        try {
          sock = server.accept()
          val in = new BufferedInputStream(sock.getInputStream)
          val out: OutputStream = sock.getOutputStream
          out.write("INFO {\"server_id\":\"scripted\",\"max_payload\":1048576}\r\n"
            .getBytes(UTF_8))
          out.flush()
          val subs = scala.collection.mutable.Map.empty[String, String] // subject -> sid
          var line = readLine(in)
          while (line.isDefined) {
            val l = line.get
            val op = l.split(" ", 2).head.toUpperCase
            op match {
              case "CONNECT" => connects.add(l)
              case "PING" => out.write("PONG\r\n".getBytes(UTF_8)); out.flush()
              case "SUB" =>
                val p = l.split(" "); subs(p(1)) = p(2)
              case "UNSUB" => () // max_messages bookkeeping not needed
              case "PUB" =>
                val p = l.split(" ")
                val n = p.last.toInt
                val payload = readN(in, n + 2).dropRight(2)
                frames.add(l + "\r\n" + new String(payload, UTF_8))
                val subject = p(1)
                if (failSubjects(subject))
                  out.write("-ERR 'Permissions Violation'\r\n".getBytes(UTF_8))
                else subs.get(subject).foreach { sid =>
                  out.write(s"MSG $subject $sid $n\r\n".getBytes(UTF_8))
                  out.write(payload)
                  out.write("\r\n".getBytes(UTF_8))
                }
                out.flush()
              case "HPUB" =>
                val p = l.split(" ")
                val total = p.last.toInt
                val body = readN(in, total + 2).dropRight(2)
                frames.add(l + "\r\n" + new String(body, UTF_8))
                if (failSubjects(p(1)))
                  out.write("-ERR 'Permissions Violation'\r\n".getBytes(UTF_8))
                out.flush()
              case _ => ()
            }
            line = readLine(in)
          }
          sock.close()
        } catch { case _: Exception => if (sock != null) sock.close() }
      }
    })
    thread.setDaemon(true)
    thread.start()
    def stop(): Unit = { running = false; server.close() }
  }

  test("HPUB/PUB frames are byte-exact against hand-written expectations") {
    val hpub = new String(NatsClient.pubFrame("orders.update",
      Seq("Nats-Msg-Id" -> "abc"), "{}".getBytes(UTF_8)), UTF_8)
    // header block = NATS/1.0(10) + "Nats-Msg-Id: abc\r\n"(18) + \r\n(2) = 30
    assert(hpub ==
      "HPUB orders.update 30 32\r\nNATS/1.0\r\nNats-Msg-Id: abc\r\n\r\n{}\r\n")
    val pub = new String(NatsClient.pubFrame("t", Nil,
      "ping".getBytes(UTF_8)), UTF_8)
    assert(pub == "PUB t 4\r\nping\r\n")
    intercept[IllegalArgumentException](
      NatsClient.pubFrame("has space", Nil, Array.emptyByteArray))
  }

  test("publishes cross the socket with a PING barrier; CONNECT advertises headers") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedNats()
    try {
      val reqs = (1 to 75).map(i => NatsRequest(s"m$i", "g", f"subj.$i%03d",
        Seq("Nats-Msg-Id" -> s"m$i"), s"""{"n":$i}"""))
      val out = NatsClient.deliver(spark.createDataset(reqs).repartition(1),
        "127.0.0.1", srv.port, chunkSize = 50).collect()
      assert(out.length == 75 && out.forall(_.ok))
      val got = srv.frames.asScala.toVector
      assert(got.length == 75)
      // in partition order, every payload intact
      val subjects = got.map(_.split(" ")(1))
      assert(subjects == subjects.sorted)
      assert(got.forall(f => f.startsWith("HPUB ") && f.contains("Nats-Msg-Id")))
      assert(srv.connects.asScala.head.contains("\"headers\":true"))
    } finally srv.stop()
  }

  test("a -ERR at the barrier fails the chunk closed; dead server = no_connection") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedNats(failSubjects = Set("forbidden"))
    try {
      val reqs = Seq(
        NatsRequest("a1", "g", "allowed", Nil, "x"),
        NatsRequest("a2", "g", "forbidden", Nil, "y"))
      val out = NatsClient.deliver(spark.createDataset(reqs).repartition(1),
        "127.0.0.1", srv.port, chunkSize = 2).collect()
      assert(out.forall(!_.ok), "a chunk with a -ERR must fail closed")
      assert(out.forall(_.err.contains("NATS error")))
      val cmds = NatsClient.commands(NatsClient.deliver(
          spark.createDataset(reqs).repartition(1), "127.0.0.1", srv.port,
          chunkSize = 2)).collect()
      assert(cmds.forall(_.kind == "nack"))
    } finally srv.stop()
    val tmp = new ServerSocket(0)
    val dead = tmp.getLocalPort
    tmp.close()
    val out2 = NatsClient.deliver(
      spark.createDataset(Seq(NatsRequest("a", "g", "s", Nil, "p")))
        .repartition(1), "127.0.0.1", dead).collect()
    assert(out2.forall(r => !r.ok && r.err == "no_connection"))
  }

  test("STREAMING: a CDC micro-batch stream HPUBs over the live socket per batch") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.model.ChangeEvent
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ev(lsn: Long, idx: Long, group: String): ChangeEvent =
      ChangeEvent(lsn, idx, Timestamp.valueOf("2024-01-01 00:00:00"),
        "update", "public", "t0", 16384L, s"pk$lsn-$idx", lsn, group.toLong,
        1.0, "{}", Some(0.5), s"$group:$lsn:$idx", group, 100L)
    val srv = new ScriptedNats()
    val results = new ConcurrentLinkedQueue[NatsClient.NatsResult]()
    try {
      val input = MemoryStream[ChangeEvent]
      val query = input.toDS().toDF().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          NatsClient.deliver(
            NatsClient.requests(SinkAdapters.natsWire(batch)),
            "127.0.0.1", srv.port).collect().foreach(results.add)
        }
        .start()
      try {
        input.addData(ev(8, 0, "1"), ev(8, 1, "2"))
        query.processAllAvailable()
        input.addData(ev(16, 0, "3"))
        query.processAllAvailable()
      } finally query.stop()
      val rs = results.asScala.toSeq
      assert(rs.size == 3 && rs.forall(_.ok))
      val subjects = srv.frames.asScala.toVector.map(_.split(" ")(1))
      assert(subjects.size == 3 &&
        subjects.forall(_ == "sequin.postgres.public.t0.update"))
    } finally srv.stop()
  }

  test("test_connection parity: SUB + UNSUB + PUB, echo confirms the session") {
    val srv = new ScriptedNats()
    try {
      val conn = new NatsClient.Connection("127.0.0.1", srv.port)
      assert(conn.serverInfo.contains("max_payload"))
      assert(conn.testLoopback("_SEQUIN.TEST.abc123", "ping"))
      assert(conn.ping())
      conn.close()
    } finally srv.stop()
  }

  test("END TO END: the nats wire publishes per-subject with Nats-Msg-Id identity") {
    implicit val s = spark
    val srv = new ScriptedNats()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(25)
      val wire = SinkAdapters.natsWire(cdc)
      val reqs = NatsClient.requests(wire)
      val out = NatsClient.deliver(reqs, "127.0.0.1", srv.port).collect()
      assert(out.length == 25 && out.forall(_.ok))
      val got = srv.frames.asScala.toVector
      assert(got.length == 25)
      // subject = sequin.<db>.<schema>.<table>.<action>
      assert(got.forall(_.split(" ")(1).startsWith("sequin.postgres.")))
      // ack identity = the Nats-Msg-Id header (idempotency key)
      val wireIds = wire.select("headers").collect()
        .map(_.getMap[String, String](0)("Nats-Msg-Id")).toSet
      assert(out.map(_.ack_id).toSet == wireIds)
    } finally srv.stop()
  }
}
