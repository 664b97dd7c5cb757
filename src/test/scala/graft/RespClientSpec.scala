package graft

import graft.model.Cdc
import graft.sinks.{RespClient, SinkAdapters}
import graft.sinks.RespClient.{RespRequest, RespResult}
import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The RESP client driven against a scripted loopback Redis: frames are
  * parsed server-side by an INDEPENDENT hand-rolled parser (not the
  * client's own decoder) while the raw bytes are captured, so the spec
  * asserts byte-exact RESP against hand-written expected frames. Zero
  * egress: the server binds 127.0.0.1.
  */
class RespClientSpec extends SparkSpec {

  /** Scripted loopback Redis. Parses RESP arrays with its own parser,
    * records (argv, raw frame bytes) per command, and answers from a
    * fixed script: PING→+PONG, XADD→$-bulk entry id, SET→+OK, DEL→:1,
    * XLEN→:42; keys in `failKeys` answer -ERR; after `closeAfter`
    * replies the connection is dropped mid-pipeline.
    */
  private final class ScriptedRedis(failKeys: Set[String] = Set.empty,
      closeAfter: Int = Int.MaxValue) {
    val commands = new ConcurrentLinkedQueue[(Seq[String], Array[Byte])]()
    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    def port: Int = server.getLocalPort
    @volatile private var running = true

    private def readLine(in: InputStream, raw: ByteArrayOutputStream): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\r' && c >= 0) { raw.write(c); sb.append(c.toChar); c = in.read() }
      if (c < 0) throw new java.io.EOFException
      raw.write('\r')
      val lf = in.read()
      require(lf == '\n', s"expected LF, got $lf")
      raw.write('\n')
      sb.toString
    }

    // independent RESP array-of-bulks parser (deliberately NOT
    // RespClient.readReply — the client must match the PROTOCOL, not
    // its own mirror image)
    private def readCommand(in: InputStream): Option[(Seq[String], Array[Byte])] = {
      val first = in.read()
      if (first < 0) return None
      require(first == '*', s"expected '*', got ${first.toChar}")
      val raw = new ByteArrayOutputStream()
      raw.write('*')
      val n = readLine(in, raw).toInt
      val args = (0 until n).map { _ =>
        val t = in.read()
        require(t == '$', s"expected '$$', got ${t.toChar}")
        raw.write('$')
        val len = readLine(in, raw).toInt
        val buf = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val r = in.read(buf, off, len - off)
          require(r >= 0, "truncated bulk")
          off += r
        }
        raw.write(buf)
        require(in.read() == '\r' && in.read() == '\n', "bulk missing CRLF")
        raw.write('\r'); raw.write('\n')
        new String(buf, UTF_8)
      }
      Some((args, raw.toByteArray))
    }

    private val thread = new Thread(() => {
      while (running) {
        var sock: Socket = null
        try {
          sock = server.accept()
          val in = sock.getInputStream
          val out = sock.getOutputStream
          var replied = 0
          var cmd = readCommand(in)
          while (cmd.isDefined && replied < closeAfter) {
            val (argv, raw) = cmd.get
            commands.add(argv -> raw)
            val reply = argv.head.toUpperCase match {
              case _ if argv.length > 1 && failKeys(argv(1)) =>
                "-ERR scripted failure\r\n"
              case "PING" => "+PONG\r\n"
              case "XADD" => "$3\r\n1-1\r\n"
              case "SET"  => "+OK\r\n"
              case "DEL"  => ":1\r\n"
              case "XLEN" => ":42\r\n"
              case _      => "-ERR unknown command\r\n"
            }
            out.write(reply.getBytes(UTF_8)); out.flush()
            replied += 1
            cmd = if (replied < closeAfter) readCommand(in) else None
          }
          sock.close()
        } catch { case _: Exception => if (sock != null) sock.close() }
      }
    })
    thread.setDaemon(true)
    thread.start()
    def stop(): Unit = { running = false; server.close() }
  }

  private def req(ack: String, args: String*): RespRequest =
    RespRequest(ack, "g0", args.toVector)

  test("frames on the wire are byte-exact RESP2 against hand-written expectations") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedRedis()
    try {
      val rs = Seq(
        req("a1", "PING"),
        req("a2", "XADD", "events", "*", "action", "insert"),
        req("a3", "SET", "k1", "v1", "PX", "5000"),
        req("a4", "DEL", "k1"))
      val out = RespClient.deliver(spark.createDataset(rs).repartition(1),
        "127.0.0.1", srv.port).collect()
      assert(out.length == 4 && out.forall(_.ok))
      val seen = srv.commands.asScala.toVector
      val rawByFirst = seen.map { case (argv, raw) =>
        argv.take(2).mkString(" ") -> new String(raw, UTF_8) }.toMap
      // hand-written RESP, not derived from encodeCommand
      assert(rawByFirst("PING") == "*1\r\n$4\r\nPING\r\n")
      assert(rawByFirst("XADD events") ==
        "*5\r\n$4\r\nXADD\r\n$6\r\nevents\r\n$1\r\n*\r\n$6\r\naction\r\n$6\r\ninsert\r\n")
      assert(rawByFirst("SET k1") ==
        "*5\r\n$3\r\nSET\r\n$2\r\nk1\r\n$2\r\nv1\r\n$2\r\nPX\r\n$4\r\n5000\r\n")
      assert(rawByFirst("DEL k1") == "*2\r\n$3\r\nDEL\r\n$2\r\nk1\r\n")
    } finally srv.stop()
  }

  test("pipelining: one connection, commands in partition order, replies matched") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedRedis()
    try {
      val rs = (1 to 120).map(i => req(s"a$i", "SET", f"key$i%03d", s"v$i"))
      val out = RespClient.deliver(spark.createDataset(rs).repartition(1),
        "127.0.0.1", srv.port, pipelineDepth = 50).collect()
      assert(out.length == 120 && out.forall(_.ok))
      // server saw every key exactly once, in partition (= input) order
      val keys = srv.commands.asScala.toVector.map(_._1(1))
      assert(keys == keys.sorted && keys.length == 120)
    } finally srv.stop()
  }

  test("per-command -ERR replies nack under strictReplies, ack under reference parity") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedRedis(failKeys = Set("bad"))
    try {
      val rs = Seq(req("a1", "SET", "ok1", "v"), req("a2", "SET", "bad", "v"),
        req("a3", "SET", "ok2", "v"))
      val strict = RespClient.deliver(spark.createDataset(rs).repartition(1),
        "127.0.0.1", srv.port).collect().sortBy(_.ack_id)
      assert(strict.map(_.ok).toSeq == Seq(true, false, true))
      assert(strict(1).err.startsWith("command_failed"))
      val lax = RespClient.deliver(spark.createDataset(rs).repartition(1),
        "127.0.0.1", srv.port, strictReplies = false).collect()
      assert(lax.forall(_.ok), "reference parity collapses reply errors to ok")
      // nack feeds the redelivery ladder; ack clears
      val cmds = RespClient.commands(RespClient.deliver(
          spark.createDataset(rs).repartition(1), "127.0.0.1", srv.port))
        .collect().map(c => c.ack_id.get -> c.kind).toMap
      assert(cmds == Map("a1" -> "ack", "a2" -> "nack", "a3" -> "ack"))
    } finally srv.stop()
  }

  test("transport failures use the reference error taxonomy") {
    implicit val s = spark
    import s.implicits._
    // dead port: bind-then-close
    val tmp = new ServerSocket()
    tmp.bind(new InetSocketAddress("127.0.0.1", 0))
    val deadPort = tmp.getLocalPort
    tmp.close()
    val rs = Seq(req("a1", "SET", "k", "v"), req("a2", "SET", "k2", "v"))
    val dead = RespClient.deliver(spark.createDataset(rs).repartition(1),
      "127.0.0.1", deadPort).collect()
    assert(dead.forall(r => !r.ok && r.err == "no_connection"))
    // connection dropped mid-pipeline: the whole chunk fails closed
    val srv = new ScriptedRedis(closeAfter = 1)
    try {
      val out = RespClient.deliver(spark.createDataset(rs).repartition(1),
        "127.0.0.1", srv.port, timeoutMs = 2000, pipelineDepth = 2).collect()
      assert(out.exists(!_.ok), "dropped connection must fail deliveries")
      assert(out.filter(!_.ok).forall(r =>
        r.err == "no_connection" || r.err == "timeout"))
    } finally srv.stop()
  }

  test("END TO END: redis stream + string wires deliver over the socket") {
    implicit val s = spark
    val srv = new ScriptedRedis()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(30).cache()
      // stream sink: XADD per event with the wire's field order
      val streamWire = SinkAdapters.redisStreamWire(cdc)
      val sreqs = RespClient.streamRequests(streamWire)
      val sout = RespClient.deliver(sreqs, "127.0.0.1", srv.port).collect()
      assert(sout.length == 30 && sout.forall(_.ok))
      val xadds = srv.commands.asScala.toVector.filter(_._1.head == "XADD")
      assert(xadds.length == 30)
      xadds.foreach { case (argv, _) =>
        assert(argv(2) == "*") // server-assigned entry id
        val fields = argv.drop(3).grouped(2).map(_.head).toVector
        assert(fields == Vector("record", "changes", "action", "metadata"),
          s"field order drifted: $fields")
      }
      srv.commands.clear()
      // string sink: SET with PX from ttl, DEL for deletes
      val stringWire = SinkAdapters.redisStringWire(cdc, ttlSeconds = Some(60L))
      val kreqs = RespClient.stringRequests(stringWire)
      val kout = RespClient.deliver(kreqs, "127.0.0.1", srv.port).collect()
      assert(kout.nonEmpty && kout.forall(_.ok))
      val byOp = srv.commands.asScala.toVector.groupBy(_._1.head)
      val wireOps = stringWire.groupBy("op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byOp.getOrElse("SET", Nil).size.toLong ==
        wireOps.getOrElse("SET", 0L))
      assert(byOp.getOrElse("DEL", Nil).size.toLong ==
        wireOps.getOrElse("DEL", 0L))
      byOp.getOrElse("SET", Nil).foreach { case (argv, _) =>
        assert(argv.takeRight(2) == Seq("PX", "60000"),
          s"SET must carry PX expire_ms: $argv")
      }
      cdc.unpersist()
    } finally srv.stop()
  }

  test("STREAMING: a CDC micro-batch stream XADDs over the live socket per batch") {
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
    val srv = new ScriptedRedis()
    val results = new ConcurrentLinkedQueue[RespResult]()
    try {
      val input = MemoryStream[ChangeEvent]
      // stream → redis-stream wire per micro-batch → live RESP delivery:
      // the same foreachBatch boundary the reference's sink pipeline draws
      val query = input.toDS().toDF().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val wire = SinkAdapters.redisStreamWire(batch)
          RespClient.deliver(RespClient.streamRequests(wire),
            "127.0.0.1", srv.port).collect().foreach(results.add)
        }
        .start()
      try {
        input.addData(ev(8, 0, "1"), ev(8, 1, "2"))
        query.processAllAvailable()
        input.addData(ev(16, 0, "1"))
        query.processAllAvailable()
      } finally query.stop()
      val rs = results.asScala.toSeq
      assert(rs.size == 3 && rs.forall(_.ok))
      val xadds = srv.commands.asScala.toVector.filter(_._1.head == "XADD")
      assert(xadds.size == 3)
      // stream key routing sequin.<schema>.<table> crossed the socket
      assert(xadds.forall(_._1(1) == "sequin.public.t0"))
    } finally srv.stop()
  }

  test("ping + xlen match the reference test_connection/message_count shapes") {
    val srv = new ScriptedRedis()
    try {
      val conn = new RespClient.Connection("127.0.0.1", srv.port)
      assert(conn.ping())
      assert(conn.xlen("events") == 42L)
      conn.close()
    } finally srv.stop()
  }
}
