package graft

import graft.config.PipelineSpec
import graft.model.ChangeEvent
import graft.sinks.SinkDispatch
import graft.streaming.SlotRuntime
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.jdk.CollectionConverters._

/** Shared-decode fan-out: ONE streaming query over a slot's stream,
  * multiplexed across N consumer lanes (the reference decodes each WAL
  * message once and hands it to every consumer —
  * `message_handler.ex:214-251`). Covers per-lane filtering + FIFO +
  * exactly-once, live attach/detach, and failure isolation (one dead
  * lane DLQs without touching its peers or the shared query). Each lane
  * delivers to its OWN loopback transport — the assertion surface is
  * what each consumer's wire actually saw.
  */
class SlotRuntimeSpec extends SparkSpec {

  /** Loopback redis recording XADD frames. */
  private final class ScriptedRedis {
    val xadds = new ConcurrentLinkedQueue[String]()
    private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
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
            if (args.head == "XADD") xadds.add(args.mkString("|"))
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

  private def ev(lsn: Long, group: String, value: Double,
      action: String = "insert"): ChangeEvent =
    ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"), action,
      "public", "t0", 16384L, s"pk$group-$lsn", lsn, group.toLong, value,
      "{}", Some(0.5), s"$group:$lsn", group, 100L)

  private def cfgFor(name: String, extra: String = ""): graft.streaming.ConsumerConfig =
    PipelineSpec.parse(
      s"""{"name":"$name"$extra,
         |"destination":{"type":"redis_stream","stream_key":"k"}}"""
        .stripMargin)

  test("N lanes on one slot: each lane filters, orders and acks " +
      "independently off ONE shared micro-batch") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val srvs = Seq.fill(3)(new ScriptedRedis())
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val input = MemoryStream[ChangeEvent]
    val slot = new SlotRuntime(input.toDS().toDF())
    try {
      val h1 = slot.attach(cfgFor("c1", ""","actions":["insert"]"""),
        SinkDispatch.Env(host = "127.0.0.1", port = srvs(0).port),
        metrics, health, "c1")
      val h2 = slot.attach(
        cfgFor("c2", ""","filter_function":"record_value >= 5.0""""),
        SinkDispatch.Env(host = "127.0.0.1", port = srvs(1).port),
        metrics, health, "c2")
      val h3 = slot.attach(cfgFor("c3"),
        SinkDispatch.Env(host = "127.0.0.1", port = srvs(2).port),
        metrics, health, "c3")
      assert(slot.attached == Seq("c1", "c2", "c3"))
      // group 1: two inserts (5.0 then 2.0); group 2: one update (7.0)
      input.addData(ev(8, "1", 5.0), ev(16, "1", 2.0),
        ev(24, "2", 7.0, "update"))
      slot.query.processAllAvailable()
      def on(i: Int) = srvs(i).xadds.asScala.toVector
      // c1 (inserts only): both group-1 events, the update filtered
      assert(on(0).size == 2, on(0).mkString("\n"))
      assert(on(0).forall(_.contains("\"action\":\"insert\"")) ||
        on(0).forall(_.contains("|action|insert|")), on(0))
      // c2 (value >= 5): lsn 8 and the update
      assert(on(1).size == 2)
      assert(on(1).forall(x => x.contains("1:8") || x.contains("2:24")))
      // c3 (everything)
      assert(on(2).size == 3)
      // per-lane per-group FIFO: c1's group-1 lsn 8 precedes lsn 16
      assert(on(0).head.contains("1:8") && on(0).last.contains("1:16"), on(0))
      // every lane's ledger fully drained — acks by identity, per lane
      Seq(h1, h2, h3).foreach { h =>
        assert(h.ledger.outstandingEvents == 0)
        assert(h.ledger.deadLetters().isEmpty)
      }
      // per-lane observability on the SHARED registries
      val exp = metrics.exposition()
      assert(exp.contains(
        """sequin_message_deliver_success_count{consumer_id="c1",consumer_name="c1"} 2"""), exp)
      assert(exp.contains(
        """sequin_message_deliver_success_count{consumer_id="c3",consumer_name="c3"} 3"""))
      // a SECOND batch flows to all lanes through the same shared query
      input.addData(ev(32, "1", 9.0))
      slot.query.processAllAvailable()
      assert(on(0).count(_.contains("1:32")) == 1)
      assert(on(1).count(_.contains("1:32")) == 1)
      assert(on(2).count(_.contains("1:32")) == 1)
    } finally { slot.stop(); srvs.foreach(_.stop()) }
  }

  test("live attach/detach: a lane attached mid-stream starts at the " +
      "slot's current position; a detached lane stops receiving while " +
      "the shared query keeps serving the rest") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val srv1 = new ScriptedRedis()
    val srv2 = new ScriptedRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val input = MemoryStream[ChangeEvent]
    val slot = new SlotRuntime(input.toDS().toDF())
    try {
      val h1 = slot.attach(cfgFor("d1"),
        SinkDispatch.Env(host = "127.0.0.1", port = srv1.port),
        metrics, health, "d1")
      input.addData(ev(8, "1", 1.0))
      slot.query.processAllAvailable()
      // d2 attaches AFTER lsn 8 was consumed: it must not see it
      val h2 = slot.attach(cfgFor("d2"),
        SinkDispatch.Env(host = "127.0.0.1", port = srv2.port),
        metrics, health, "d2")
      input.addData(ev(16, "1", 2.0))
      slot.query.processAllAvailable()
      assert(srv1.xadds.size == 2)
      assert(srv2.xadds.size == 1)
      assert(srv2.xadds.asScala.head.contains("1:16"))
      // duplicate attach refuses
      intercept[IllegalArgumentException](slot.attach(cfgFor("d2"),
        SinkDispatch.Env(host = "127.0.0.1", port = srv2.port),
        metrics, health, "d2"))
      // detach d1: ONLY d1 — the shared query stays up for d2
      h1.stop()
      assert(slot.query.isActive, "detaching a lane must not stop the slot")
      assert(slot.attached == Seq("d2"))
      input.addData(ev(24, "1", 3.0))
      slot.query.processAllAvailable()
      assert(srv1.xadds.size == 2) // unchanged after detach
      assert(srv2.xadds.size == 2)
      assert(h2.ledger.outstandingEvents == 0)
    } finally { slot.stop(); srv1.stop(); srv2.stop() }
  }

  test("RESTART CONTINUITY: a checkpointed slot resumes at committed " +
      "offsets — completed batches never redeliver to ANY lane, and a " +
      "segment landing while the slot is down reaches every lane once") {
    implicit val s = spark
    import s.implicits._
    import graft.sources.{PgOutput, PgStream, WalSpool, WalSpoolProvider}
    import graft.sources.PgOutput._
    import org.apache.spark.sql.functions._
    val srv1 = new ScriptedRedis()
    val srv2 = new ScriptedRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val dir = java.nio.file.Files.createTempDirectory("slot_wal").toString
    val ckpt = java.nio.file.Files.createTempDirectory("slot_ckpt").toString
    val relation = Relation(16384L, "public", "events_src", "d", Seq(
      RelationColumn("event_id", isKey = true, 20L, -1),
      RelationColumn("user_id", isKey = false, 20L, -1),
      RelationColumn("event_type", isKey = false, 25L, -1),
      RelationColumn("value", isKey = false, 701L, -1),
      RelationColumn("props", isKey = false, 3802L, -1)))
    def txn(eventId: Long, seqBase: Long): Seq[PgStream.Frame] = {
      val lsn = (eventId / 7) * 8
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
        checkpointLocation = Some(ckpt))
      slot.attach(cfgFor("r1"),
        SinkDispatch.Env(host = "127.0.0.1", port = srv1.port),
        metrics, health, "r1")
      slot.attach(cfgFor("r2"),
        SinkDispatch.Env(host = "127.0.0.1", port = srv2.port),
        metrics, health, "r2")
      slot
    }
    try {
      WalSpool.writeSegment(dir, WalSpool.segmentName(0),
        PgStream.Frame("slot", 1L, PgOutput.encode(relation)) +:
          (txn(7, 10) ++ txn(14, 20)))
      val s1 = startSlot()
      try {
        s1.query.processAllAvailable()
        assert(srv1.xadds.size == 2 && srv2.xadds.size == 2)
      } finally s1.stop()
      // a segment lands while the slot is DOWN; the restarted slot
      // delivers ONLY it, to BOTH lanes — segment 0 is behind the
      // checkpoint and never replays
      WalSpool.writeSegment(dir, WalSpool.segmentName(1), txn(21, 30))
      val s2 = startSlot()
      try {
        s2.query.processAllAvailable()
        assert(srv1.xadds.size == 3,
          s"lane r1 saw: ${srv1.xadds.asScala.mkString("\n")}")
        assert(srv2.xadds.size == 3)
        assert(srv1.xadds.asScala.toVector.last.contains("\"id\":21"))
      } finally s2.stop()
    } finally { srv1.stop(); srv2.stop() }
  }

  test("BACKFILL ON A SHARED SLOT: one lane's keyset scan interleaves " +
      "with live CDC through the shared query; its fence is per-lane " +
      "(CDC wins on PK conflict for that lane) and siblings see only CDC") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val srv1 = new ScriptedRedis()
    val srv2 = new ScriptedRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val tableDir = java.nio.file.Files.createTempDirectory("slot_bf").toString
    (1L to 6L).map(i => (i, i * 1.0)).toDF("id", "value")
      .write.mode("overwrite").parquet(tableDir)
    def toEnvelope(page: org.apache.spark.sql.DataFrame) =
      page.select(
        lit(0L).as("commit_lsn"), col("id").as("commit_idx"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("commit_ts"),
        col("action"), lit("public").as("table_schema"),
        lit("t0").as("table_name"), lit(16384L).as("table_oid"),
        concat(lit("pk"), col("id")).as("record_pk"),
        col("id").as("record_id"), col("id").as("record_user_id"),
        col("value").as("record_value"), lit("{}").as("record_props"),
        lit(null).cast("double").as("old_value"),
        concat(lit("r:"), col("id")).as("idempotency_key"),
        col("id").cast("string").as("group_id"),
        lit(100L).as("byte_size"))
    val input = MemoryStream[ChangeEvent]
    val slot = new SlotRuntime(input.toDS().toDF())
    try {
      // lane bf carries the backfill; lane live is a plain sibling
      val hBf = slot.attach(cfgFor("bf"),
        SinkDispatch.Env(host = "127.0.0.1", port = srv1.port),
        metrics, health, "bf",
        backfill = Some(graft.streaming.ConsumerRuntime.BackfillSpec(
          table = () => spark.read.parquet(tableDir),
          sortCols = Seq("id"),
          toEnvelope = toEnvelope,
          tableSchema = "public", tableName = "t0",
          pageSize = 2)))
      val hLive = slot.attach(cfgFor("live"),
        SinkDispatch.Env(host = "127.0.0.1", port = srv2.port),
        metrics, health, "live")
      // CDC updates pks 2 and 5 BEFORE the scan reaches them
      def ev2(lsn: Long, id: Long): ChangeEvent =
        ChangeEvent(lsn, 0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          "update", "public", "t0", 16384L, s"pk$id", id, id, id * 10.0,
          "{}", Some(0.5), s"$id:$lsn", id.toString, 100L)
      input.addData(ev2(8, 2), ev2(16, 5))
      slot.query.processAllAvailable()
      assert(srv1.xadds.size == 2 && srv2.xadds.size == 2)
      // drain the scan through the SHARED query
      val bf = hBf.backfill.get
      bf.run()
      assert(bf.isDone)
      // bf lane: reads for 1,3,4,6 (2 and 5 fenced — their CDC updates
      // already delivered), every pk exactly once
      val reads = srv1.xadds.asScala.toVector
        .filter(_.contains("|action|read|"))
      def pkOf(x: String) =
        "\"idempotency_key\":\"r:(\\d+)\"".r.findFirstMatchIn(x)
          .map(_.group(1))
      assert(reads.flatMap(pkOf).sortBy(_.toInt) ==
        Vector("1", "3", "4", "6"), reads.mkString("\n"))
      (1L to 6L).foreach { id =>
        assert(srv1.xadds.asScala.count(_.contains(s""""id":$id,""")) == 1,
          s"pk$id on bf lane")
      }
      // the SIBLING lane never sees backfill reads — pages route only
      // through the owning lane's pipeline
      assert(srv2.xadds.asScala.count(_.contains("|action|read|")) == 0,
        srv2.xadds.asScala.mkString("\n"))
      assert(srv2.xadds.size == 2)
      assert(hBf.ledger.outstandingEvents == 0)
      assert(hLive.ledger.outstandingEvents == 0)
    } finally { slot.stop(); srv1.stop(); srv2.stop() }
  }

  test("failure isolation: a lane on a dead transport DLQs its events " +
      "through its own ledger; sibling lanes and the shared query are " +
      "untouched") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val srv = new ScriptedRedis()
    val tmp = new ServerSocket(0)
    val dead = tmp.getLocalPort
    tmp.close()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val input = MemoryStream[ChangeEvent]
    val slot = new SlotRuntime(input.toDS().toDF())
    try {
      val good = slot.attach(cfgFor("ok"),
        SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
        metrics, health, "ok")
      val doom = slot.attach(PipelineSpec.parse(
        """{"name":"doom","ack_wait_ms":1,"max_retry_count":2,
          |"destination":{"type":"redis_stream","stream_key":"k"}}"""
          .stripMargin),
        SinkDispatch.Env(host = "127.0.0.1", port = dead),
        metrics, health, "doom")
      input.addData(ev(8, "1", 5.0), ev(16, "2", 6.0))
      slot.query.processAllAvailable()
      // the good lane delivered everything
      assert(srv.xadds.size == 2)
      assert(good.ledger.outstandingEvents == 0)
      assert(good.ledger.deadLetters().isEmpty)
      // the doomed lane exhausted its retry budget into ITS DLQ
      assert(doom.ledger.deadLetters().size == 2)
      assert(doom.ledger.outstandingEvents == 0)
      assert(health.health("sink_consumer", "doom").status == "error")
      assert(health.health("sink_consumer", "ok").status == "healthy")
      // the shared query survives for the next batch — and both lanes
      // keep their contracts on it
      assert(slot.query.isActive)
      input.addData(ev(24, "1", 7.0))
      slot.query.processAllAvailable()
      assert(srv.xadds.size == 3)
      assert(doom.ledger.deadLetters().size == 3)
    } finally { slot.stop(); srv.stop() }
  }
}
