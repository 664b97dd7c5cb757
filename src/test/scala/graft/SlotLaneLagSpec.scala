package graft

import graft.config.PipelineSpec
import graft.model.ChangeEvent
import graft.sinks.SinkDispatch
import graft.streaming.SlotRuntime
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.jdk.CollectionConverters._

/** Bounded per-lane lag on a shared slot: a persistently slow consumer
  * is DECOUPLED from the commit fence — it drains its own queue while
  * siblings proceed at their own rate — up to a `max_ack_pending`-style
  * event fence, after which the shared source throttles. The reference's
  * per-consumer message stores give exactly this shape
  * (`/root/reference/lib/sequin/runtime/slot_message_store_state.ex:432-478`:
  * a slow consumer fills its own buffer; siblings proceed; admission
  * caps the buffer). Exactly-once bookkeeping and per-group FIFO hold
  * on the slow lane throughout, and a decoupled batch is durable
  * (parquet spool under the checkpoint) BEFORE its commit, so a crash
  * replays it to every lane.
  */
class SlotLaneLagSpec extends SparkSpec {

  /** Loopback redis recording XADD frames, with a settable per-command
    * delay and an optional hold-gate — the deliberately slow transport.
    * The gate is read per command: a connection that sampled a latched
    * gate blocks on it forever; connections opened after `gate = null`
    * flow freely.
    */
  private final class DelayRedis {
    val xadds = new ConcurrentLinkedQueue[String]()
    @volatile var delayMs: Long = 0L
    @volatile var gate: CountDownLatch = null
    private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    private val acceptor = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        val t = new Thread(() => {
          val in = sock.getInputStream
          val out = sock.getOutputStream
          def line(): String = {
            val sb = new StringBuilder
            var c = in.read()
            while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
            in.read(); sb.toString
          }
          try while (true) {
            if (in.read() < 0) throw new java.io.EOFException
            val n = line().toInt
            val args = (0 until n).map { _ =>
              in.read()
              val len = line().toInt
              val buf = new Array[Byte](len)
              var off = 0
              while (off < len) off += in.read(buf, off, len - off)
              in.read(); in.read()
              new String(buf, UTF_8)
            }
            if (args.head == "XADD") {
              val g = gate
              if (g != null) g.await()
              val d = delayMs
              if (d > 0) Thread.sleep(d)
              xadds.add(args.mkString("|"))
            }
            out.write("$3\r\n1-1\r\n".getBytes(UTF_8)); out.flush()
          } catch { case _: Exception => sock.close() }
        })
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    def stop(): Unit = server.close()
  }

  private def ev(lsn: Long, group: String, value: Double): ChangeEvent =
    ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"), "insert",
      "public", "t0", 16384L, s"pk$group-$lsn", lsn, group.toLong, value,
      "{}", Some(0.5), s"$group:$lsn", group, 100L)

  private def cfgFor(name: String): graft.streaming.ConsumerConfig =
    PipelineSpec.parse(
      s"""{"name":"$name",
         |"destination":{"type":"redis_stream","stream_key":"k"}}"""
        .stripMargin)

  private def keysOn(srv: DelayRedis): Vector[String] =
    srv.xadds.asScala.toVector.flatMap(x =>
      "\"idempotency_key\":\"([^\"]+)\"".r.findFirstMatchIn(x)
        .map(_.group(1)))

  test("a 10x-slow lane decouples from the commit fence after the skew " +
      "streak: siblings' batches commit at their own rate while the slow " +
      "lane drains its queue; FIFO + exactly-once hold; a recovered lane " +
      "rejoins the fence") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fastSrv = new DelayRedis()
    val slowSrv = new DelayRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val input = MemoryStream[ChangeEvent]
    val slot = new SlotRuntime(input.toDS().toDF(), laneSkewStreak = 3)
    var lsn = 0L
    def batch(groupsToValues: (String, Double)*): Seq[String] = {
      val evs = groupsToValues.map { case (g, v) =>
        lsn += 8; ev(lsn, g, v)
      }
      input.addData(evs: _*)
      slot.query.processAllAvailable()
      evs.map(_.idempotency_key)
    }
    try {
      slot.attach(cfgFor("fast"),
        SinkDispatch.Env(host = "127.0.0.1", port = fastSrv.port),
        metrics, health, "fast")
      val hSlow = slot.attach(cfgFor("slow"),
        SinkDispatch.Env(host = "127.0.0.1", port = slowSrv.port),
        metrics, health, "slow")
      // WARMUP: both lanes healthy — EWMAs settle, nobody flags
      (1 to 4).foreach(_ => batch("1" -> 1.0, "2" -> 2.0))
      slot.awaitQuiesce()
      assert(slot.laggingLanes.isEmpty)
      // SKEW: the slow transport now takes 500 ms per event — decisive
      // against the fast lane's own deliverBatch EWMA, which includes a
      // real Spark action (~100-500 ms cold-JIT): the skew must dwarf
      // job-latency noise or detection flakes on a cold JVM. Detection
      // needs the streak of out-of-band batches (plus however long the
      // fast lane's warmup EWMA takes to decay under it); commit waits
      // for BOTH lanes until the flag flips — so the queue is drained
      // when the loop exits
      slowSrv.delayMs = 500L
      var flagBatches = 0
      while (slot.laggingLanes.isEmpty && flagBatches < 10) {
        batch("1" -> 1.0, "2" -> 2.0); flagBatches += 1
      }
      assert(slot.laggingLanes == Seq("slow"),
        s"'slow' not flagged after $flagBatches skewed batches")
      // DECOUPLED: the next commits wait only for the fast lane — the
      // slow lane (600 ms/batch at 4 events) trails in its own queue
      val d1 = batch("1" -> 3.0, "2" -> 4.0, "3" -> 5.0, "4" -> 6.0)
      val fastAfterD1 = keysOn(fastSrv)
      d1.foreach(k => assert(fastAfterD1.contains(k),
        s"fast lane must have $k the moment the batch commits"))
      assert(!d1.forall(keysOn(slowSrv).contains),
        "slow lane should still be draining when the commit returns")
      val d2 = batch("1" -> 7.0, "2" -> 8.0, "3" -> 9.0, "4" -> 10.0)
      assert(keysOn(fastSrv).count(d2.contains) == d2.size)
      // drain: everything arrives on the slow lane too — exactly once,
      // in per-group FIFO order
      slot.awaitQuiesce()
      val slowKeys = keysOn(slowSrv)
      (d1 ++ d2).foreach(k =>
        assert(slowKeys.count(_ == k) == 1, s"$k exactly once on slow"))
      assert(slowKeys.distinct == slowKeys, "no duplicates on the slow wire")
      // group-1 events in commit order on the slow wire
      val g1 = slowKeys.filter(_.startsWith("1:")).map(_.drop(2).toLong)
      assert(g1 == g1.sorted, s"per-group FIFO violated: $g1")
      assert(hSlow.ledger.outstandingEvents == 0)
      assert(hSlow.ledger.deadLetters().isEmpty)
      // RECOVERY: transport back in band — after the streak of healthy
      // batches with no accumulation, the lane rejoins the fence
      slowSrv.delayMs = 0L
      var unflagBatches = 0
      while (slot.laggingLanes.nonEmpty && unflagBatches < 12) {
        batch("1" -> 1.0); unflagBatches += 1
      }
      slot.awaitQuiesce()
      assert(slot.laggingLanes.isEmpty,
        s"recovered lane should rejoin within $unflagBatches batches")
    } finally { slot.stop(); fastSrv.stop(); slowSrv.stop() }
  }

  test("max-lag admission fence: a lagging lane's queued events are " +
      "capped — the shared commit throttles (pause_on_full semantics) " +
      "until the lane drains back inside the fence") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fastSrv = new DelayRedis()
    val slowSrv = new DelayRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val input = MemoryStream[ChangeEvent]
    val slot = new SlotRuntime(input.toDS().toDF(),
      maxLaneLagEvents = 4L, laneSkewStreak = 3)
    var lsn = 0L
    def batch(n: Int): Seq[String] = {
      val evs = (1 to n).map { i => lsn += 8; ev(lsn, i.toString, 1.0) }
      input.addData(evs: _*)
      slot.query.processAllAvailable()
      evs.map(_.idempotency_key)
    }
    try {
      slot.attach(cfgFor("fast"),
        SinkDispatch.Env(host = "127.0.0.1", port = fastSrv.port),
        metrics, health, "fast")
      slot.attach(cfgFor("slow"),
        SinkDispatch.Env(host = "127.0.0.1", port = slowSrv.port),
        metrics, health, "slow")
      (1 to 4).foreach(_ => batch(2))
      slot.awaitQuiesce()
      slowSrv.delayMs = 500L
      var flagBatches = 0
      while (slot.laggingLanes.isEmpty && flagBatches < 10) {
        batch(2); flagBatches += 1
      }
      assert(slot.laggingLanes == Seq("slow"))
      val before = keysOn(slowSrv).size
      // two decoupled 4-event batches: the second OVERFLOWS the 4-event
      // fence, so its commit must wait until the slow lane has drained
      // the first — delivered-on-slow >= 4 by the time it returns
      batch(4)
      batch(4)
      val after = keysOn(slowSrv).size
      assert(after - before >= 4,
        s"fence breached: commit returned with only ${after - before} of " +
          "the first decoupled batch delivered on the slow lane")
      slot.awaitQuiesce()
      assert(keysOn(slowSrv).distinct.size == keysOn(slowSrv).size)
    } finally { slot.stop(); fastSrv.stop(); slowSrv.stop() }
  }

  test("RESTART with a decoupled lane mid-lag: a committed batch the " +
      "slow lane never resolved survives in the checkpoint spool and " +
      "replays to every lane on restart (at-least-once)") {
    implicit val s = spark
    import s.implicits._
    import graft.sources.{PgOutput, PgStream, WalSpool, WalSpoolProvider}
    import graft.sources.PgOutput._
    import org.apache.spark.sql.functions._
    val fastSrv = new DelayRedis()
    val slowSrv = new DelayRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val dir = java.nio.file.Files.createTempDirectory("lag_wal").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lag_ckpt").toString
    val relation = Relation(16384L, "public", "events_src", "d", Seq(
      RelationColumn("event_id", isKey = true, 20L, -1),
      RelationColumn("user_id", isKey = false, 20L, -1),
      RelationColumn("event_type", isKey = false, 25L, -1),
      RelationColumn("value", isKey = false, 701L, -1),
      RelationColumn("props", isKey = false, 3802L, -1)))
    def txn(eventId: Long, seqBase: Long): Seq[PgStream.Frame] = {
      val lsn = eventId * 8
      val cells = Seq(Cell.Text(eventId.toString), Cell.Text("1"),
        Cell.Text("purchase"), Cell.Text("5.0"), Cell.Text("{}"))
      Seq(
        PgStream.Frame("slot", seqBase,
          PgOutput.encode(Begin(lsn, eventId * 1000, eventId))),
        PgStream.Frame("slot", seqBase + 1,
          PgOutput.encode(Insert(16384L, cells))),
        PgStream.Frame("slot", seqBase + 2,
          PgOutput.encode(Commit(0, lsn, lsn + 8, eventId * 1000))))
    }
    def startSlot(): SlotRuntime = {
      val decoded = PgStream.decodeStateful(
        spark.readStream.format(classOf[WalSpoolProvider].getName)
          .option("path", dir).load().as[PgStream.Frame])
      val typed = PgStream.toRecords(decoded.toDF(), relation)
        .select(col("event_id"),
          timestamp_micros(col("commit_ts_us")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      val slot = new SlotRuntime(graft.model.Cdc.fromEvents(typed),
        checkpointLocation = Some(ckpt), laneSkewStreak = 3)
      slot.attach(cfgFor("fast"),
        SinkDispatch.Env(host = "127.0.0.1", port = fastSrv.port),
        metrics, health, "fast")
      slot.attach(cfgFor("slow"),
        SinkDispatch.Env(host = "127.0.0.1", port = slowSrv.port),
        metrics, health, "slow")
      slot
    }
    def spoolBatches(): Seq[String] = {
      val d = new java.io.File(s"$ckpt/graft_lane_spool")
      if (!d.isDirectory) Seq.empty
      else d.listFiles().filter(_.getName.startsWith("batch-"))
        .map(_.getName).toSeq.sorted
    }
    def slowIds(): Vector[Long] = slowSrv.xadds.asScala.toVector.flatMap(x =>
      "\"id\":(\\d+)".r.findFirstMatchIn(x).map(_.group(1).toLong))
    try {
      var seg = 0
      var frameSeq = 10L
      var nextId = 1L
      def writeTxn(slot: SlotRuntime): Long = {
        val id = nextId
        nextId += 1
        val frames =
          if (seg == 0)
            PgStream.Frame("slot", 1L, PgOutput.encode(relation)) +:
              txn(id, frameSeq)
          else txn(id, frameSeq)
        WalSpool.writeSegment(dir, WalSpool.segmentName(seg), frames)
        seg += 1; frameSeq += 10
        slot.query.processAllAvailable()
        id
      }
      val s1 = startSlot()
      // warmup then flag the slow lane (1-event batches, 1 s vs the
      // fast lane's Spark-action-dominated EWMA)
      (1 to 3).foreach(_ => writeTxn(s1))
      s1.awaitQuiesce()
      slowSrv.delayMs = 1000L
      var flagBatches = 0
      while (s1.laggingLanes.isEmpty && flagBatches < 10) {
        writeTxn(s1); flagBatches += 1
      }
      assert(s1.laggingLanes == Seq("slow"))
      s1.awaitQuiesce() // drain the detection batches before gating
      // HOLD the slow transport: the next decoupled batch commits (and
      // spools — durability before commit) while the slow lane hangs
      // inside its XADD, so the spool entry is UNRESOLVED at stop()
      slowSrv.delayMs = 0L
      slowSrv.gate = new CountDownLatch(1)
      val heldId = writeTxn(s1)
      assert(spoolBatches().nonEmpty, "decoupled batches must be spooled")
      s1.stop() // joins time out on the held lane; spool must survive
      val leftover = spoolBatches()
      assert(leftover.nonEmpty,
        "an unresolved spooled batch must survive the shutdown")
      assert(!slowIds().contains(heldId),
        s"precondition: the slow lane never saw event $heldId before stop")
      // RESTART: fresh connections bypass the (never-released) gate; the
      // old incarnation's worker stays parked and can never delete the
      // spool out from under the recovery
      slowSrv.gate = null
      val s2 = startSlot()
      try {
        s2.query.processAllAvailable()
        s2.awaitQuiesce()
        assert(slowIds().contains(heldId),
          s"slow lane must receive the replayed event $heldId; " +
            s"saw ids: ${slowIds()}")
        // at-least-once, not at-most-once: the fast lane may see the
        // replayed batch twice; DISTINCT ids must still be complete
        assert((1L until nextId).forall(slowIds().contains),
          s"missing ids on slow lane: ${slowIds()}")
        assert(spoolBatches().isEmpty,
          "a fully-resolved replayed batch must leave the spool")
      } finally s2.stop()
    } finally { fastSrv.stop(); slowSrv.stop() }
  }
}
