package graft

import graft.config.PipelineSpec
import graft.model.ChangeEvent
import graft.sinks.SinkDispatch
import graft.streaming.ConsumerRuntime
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.jdk.CollectionConverters._

/** The assembled runtime end to end: streaming events → pipeline filters
  * → AckDelivery ledger → live loopback transport → acks → metrics +
  * health. One `start()` call runs the whole library.
  */
class ConsumerRuntimeSpec extends SparkSpec {

  /** Loopback redis recording XADD stream keys + lsn-bearing payloads. */
  private final class ScriptedRedis {
    val xadds = new ConcurrentLinkedQueue[String]()
    private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    private val thread = new Thread(() => {
      try {
        while (true) {
          val sock = server.accept()
          val in = sock.getInputStream
          val out = sock.getOutputStream
          def line(): String = {
            val sb = new StringBuilder
            var c = in.read()
            while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
            in.read(); sb.toString
          }
          try {
            while (true) {
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
              if (args.head == "XADD")
                xadds.add(args.mkString("|"))
              out.write("$3\r\n1-1\r\n".getBytes(UTF_8)); out.flush()
            }
          } catch { case _: Exception => sock.close() }
        }
      } catch { case _: Exception => () }
    })
    thread.setDaemon(true)
    thread.start()
    def stop(): Unit = server.close()
  }

  private def ev(lsn: Long, group: String, value: Double,
      action: String = "insert"): ChangeEvent =
    ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"), action,
      "public", "t0", 16384L, s"pk$group-$lsn", lsn, group.toLong, value,
      "{}", Some(0.5), s"$group:$lsn", group, 100L)

  test("END TO END: streaming events through filters, ledger, live " +
      "transport, acks, metrics and health in one runtime") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val srv = new ScriptedRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    try {
      val cfg = PipelineSpec.parse(
        """{"name":"rt","actions":["insert"],
          |"filter_function":"record_value >= 2.0",
          |"destination":{"type":"redis_stream","stream_key":"k"}}"""
          .stripMargin)
      val input = MemoryStream[ChangeEvent]
      val handle = ConsumerRuntime.start(input.toDS().toDF(), cfg,
        SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
        metrics, health, "c-rt")
      try {
        // 2 groups × 2 events pass; one filtered by value, one by action
        input.addData(ev(8, "1", 5.0), ev(16, "1", 5.0),
          ev(8, "2", 5.0), ev(16, "2", 1.0), ev(24, "2", 5.0, "update"))
        handle.query.processAllAvailable()
        assert(srv.xadds.size == 3, srv.xadds.asScala.mkString("\n"))
        // per-group FIFO: group 1's lsn 8 XADD precedes its lsn 16
        val g1 = srv.xadds.asScala.toVector.filter(_.contains("\"1:"))
        assert(g1.size == 2 && g1.head.contains("1:8") &&
          g1.last.contains("1:16"))
        // ledger fully drained — every delivery acked by its identity
        assert(handle.ledger.outstandingEvents == 0)
        assert(handle.ledger.deadLetters().isEmpty)
        // a SECOND micro-batch flows through the same runtime
        input.addData(ev(24, "1", 3.0))
        handle.query.processAllAvailable()
        assert(srv.xadds.size == 4)
        assert(handle.ledger.outstandingEvents == 0)
        // observability moved with the real deliveries
        val exp = metrics.exposition()
        assert(exp.contains("sequin_message_deliver_attempt_count" +
          """{consumer_id="c-rt",consumer_name="rt"} 4"""), exp)
        assert(exp.contains("sequin_message_deliver_success_count" +
          """{consumer_id="c-rt",consumer_name="rt"} 4"""))
        val h = health.health("sink_consumer", "c-rt")
        assert(h.status == "healthy", h)
        assert(h.checks.find(_.slug == "messages_delivered")
          .get.status == "healthy")
      } finally handle.stop()
    } finally srv.stop()
  }

  test("FULL STACK: WAL segments on disk → DSv2 stream → binary pgoutput " +
      "decode → CDC envelope → runtime → live transport → acks") {
    implicit val s = spark
    import s.implicits._
    import graft.sources.{PgOutput, PgStream, WalSpool, WalSpoolProvider}
    import graft.sources.PgOutput._
    import org.apache.spark.sql.functions._
    val srv = new ScriptedRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val dir = java.nio.file.Files.createTempDirectory("rt_wal").toString
    // the events_src relation (BinaryIngestE2E shape)
    val relation = Relation(16384L, "public", "events_src", "d", Seq(
      RelationColumn("event_id", isKey = true, 20L, -1),
      RelationColumn("user_id", isKey = false, 20L, -1),
      RelationColumn("event_type", isKey = false, 25L, -1),
      RelationColumn("value", isKey = false, 701L, -1),
      RelationColumn("props", isKey = false, 3802L, -1)))
    def txn(eventId: Long, userId: Long, eventType: String, value: Double,
        seqBase: Long): Seq[PgStream.Frame] = {
      val lsn = (eventId / 7) * 8
      val cells = Seq(Cell.Text(eventId.toString), Cell.Text(userId.toString),
        Cell.Text(eventType), Cell.Text(java.lang.Double.toString(value)),
        Cell.Text("{}"))
      Seq(
        PgStream.Frame("slot", seqBase,
          PgOutput.encode(Begin(lsn, eventId * 1000, eventId))),
        PgStream.Frame("slot", seqBase + 1,
          PgOutput.encode(Insert(16384L, cells))),
        PgStream.Frame("slot", seqBase + 2,
          PgOutput.encode(Commit(0, lsn, lsn + 8, eventId * 1000))))
    }
    // segment 0: relation + three txns (one 'error' event filters out as
    // a delete under actions=[insert,update])
    WalSpool.writeSegment(dir, WalSpool.segmentName(0),
      PgStream.Frame("slot", 1L, PgOutput.encode(relation)) +:
        (txn(7, 1, "purchase", 5.0, 10) ++ txn(14, 2, "error", 5.0, 20) ++
          txn(21, 1, "click", 3.0, 30)))
    val decoded = PgStream.decodeStateful(
      spark.readStream.format(classOf[WalSpoolProvider].getName)
        .option("path", dir).load().as[PgStream.Frame])
    val typed = PgStream.toRecords(decoded.toDF(), relation)
      .select(col("event_id"),
        timestamp_micros(col("commit_ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val envelope = graft.model.Cdc.fromEvents(typed)
    val cfg = PipelineSpec.parse(
      """{"name":"fs","actions":["insert","update"],
        |"destination":{"type":"redis_stream","stream_key":"k"}}"""
        .stripMargin)
    val handle = ConsumerRuntime.start(envelope, cfg,
      SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
      metrics, health, "c-fs")
    try {
      handle.query.processAllAvailable()
      // 3 decoded txns, the 'error' delete filtered → 2 delivered
      assert(srv.xadds.size == 2, srv.xadds.asScala.mkString("\n"))
      assert(handle.ledger.outstandingEvents == 0)
      // a SECOND segment lands on disk; the stream tails it through the
      // same decode + delivery chain
      WalSpool.writeSegment(dir, WalSpool.segmentName(1),
        txn(28, 3, "view", 9.0, 40))
      handle.query.processAllAvailable()
      assert(srv.xadds.size == 3)
      assert(handle.ledger.outstandingEvents == 0)
      assert(health.health("sink_consumer", "c-fs").status == "healthy")
      val exp = metrics.exposition()
      assert(exp.contains("sequin_message_deliver_success_count" +
        """{consumer_id="c-fs",consumer_name="fs"} 3"""), exp)
    } finally { handle.stop(); srv.stop() }
  }

  test("user transforms apply exactly ONCE through the runtime, and the " +
      "filter verdict is decided on ORIGINAL values — no unacked limbo") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val srv = new ScriptedRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    try {
      // the trap: filter on record_value + transform that CHANGES
      // record_value. value 6 passes (6 < 10) and must deliver as 12
      // (one application, not 24); a naive double-build would re-filter
      // the transformed 12 (> 10), strand the admitted event unacked,
      // and redeliver it forever
      val cfg = PipelineSpec.parse(
        """{"name":"tf","actions":["insert"],
          |"filter_function":"record_value < 10",
          |"transform_functions":{"record_value":"record_value * 2"},
          |"destination":{"type":"redis_stream","stream_key":"k"}}"""
          .stripMargin)
      val input = MemoryStream[ChangeEvent]
      val handle = ConsumerRuntime.start(input.toDS().toDF(), cfg,
        SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
        metrics, health, "c-tf")
      try {
        input.addData(ev(8, "1", 6.0), ev(16, "2", 20.0))
        handle.query.processAllAvailable()
        // value 20 filtered; value 6 delivered exactly once, DOUBLED once
        assert(srv.xadds.size == 1, srv.xadds.asScala.mkString("\n"))
        assert(srv.xadds.asScala.head.contains("\"value\":12.0"),
          srv.xadds.asScala.head)
        assert(handle.ledger.outstandingEvents == 0)
        assert(handle.ledger.deadLetters().isEmpty)
      } finally handle.stop()
    } finally srv.stop()
  }

  test("RESTART CONTINUITY: a checkpointed runtime resumes at committed " +
      "source offsets — completed batches never redeliver") {
    implicit val s = spark
    import s.implicits._
    import graft.sources.{PgOutput, PgStream, WalSpool, WalSpoolProvider}
    import graft.sources.PgOutput._
    import org.apache.spark.sql.functions._
    val srv = new ScriptedRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val dir = java.nio.file.Files.createTempDirectory("rt_wal2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rt_ckpt").toString
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
    val cfg = PipelineSpec.parse(
      """{"name":"ck","destination":{"type":"redis_stream","stream_key":"k"}}""")
    def startRuntime() = {
      val decoded = PgStream.decodeStateful(
        spark.readStream.format(classOf[WalSpoolProvider].getName)
          .option("path", dir).load().as[PgStream.Frame])
      val typed = PgStream.toRecords(decoded.toDF(), relation)
        .select(col("event_id"),
          timestamp_micros(col("commit_ts_us")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      ConsumerRuntime.start(graft.model.Cdc.fromEvents(typed), cfg,
        SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
        metrics, health, "c-ck", checkpointLocation = Some(ckpt))
    }
    try {
      WalSpool.writeSegment(dir, WalSpool.segmentName(0),
        PgStream.Frame("slot", 1L, PgOutput.encode(relation)) +:
          (txn(7, 10) ++ txn(14, 20)))
      val h1 = startRuntime()
      try {
        h1.query.processAllAvailable()
        assert(srv.xadds.size == 2)
      } finally h1.stop()
      // a new segment lands while the runtime is DOWN; the restarted
      // runtime delivers ONLY it — segment 0 is behind the checkpoint
      WalSpool.writeSegment(dir, WalSpool.segmentName(1), txn(21, 30))
      val h2 = startRuntime()
      try {
        h2.query.processAllAvailable()
        assert(srv.xadds.size == 3,
          s"expected exactly one new delivery, saw: " +
            srv.xadds.asScala.mkString("\n"))
        assert(h2.ledger.outstandingEvents == 0)
      } finally h2.stop()
    } finally { srv.stop() }
  }

  test("OPERATOR LOOP: declare via REST, start from the plane, watch the " +
      "deliveries on /metrics and /api/health over HTTP") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val srv = new ScriptedRedis()
    val api = new graft.config.ManagementApi
    val client = java.net.http.HttpClient.newHttpClient()
    def get(path: String, auth: Boolean): (Int, String) = {
      val b = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://127.0.0.1:${api.port()}$path"))
      if (auth) b.header("Authorization", s"Bearer ${api.bootstrapToken}")
      val r = client.send(b.GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    try {
      // declare through the authenticated API
      val post = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${api.port()}/api/sinks"))
        .header("Content-Type", "application/json")
        .header("Authorization", s"Bearer ${api.bootstrapToken}")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          """{"name":"ops","actions":["insert"],
            |"destination":{"type":"redis_stream","stream_key":"k"}}"""
            .stripMargin)).build()
      assert(client.send(post,
        java.net.http.HttpResponse.BodyHandlers.ofString())
        .statusCode() == 200)
      // unknown consumers refuse to start
      intercept[NoSuchElementException](api.startConsumer("ghost",
        spark.emptyDataFrame, SinkDispatch.Env()))
      // start the DECLARED consumer; its runtime reports to the plane
      val input = MemoryStream[ChangeEvent]
      val handle = api.startConsumer("ops", input.toDS().toDF(),
        SinkDispatch.Env(host = "127.0.0.1", port = srv.port))
      try {
        input.addData(ev(8, "1", 5.0), ev(16, "2", 4.0))
        handle.query.processAllAvailable()
        assert(srv.xadds.size == 2)
        // the plane's OWN endpoints show the running consumer
        val (ms, mb) = get("/metrics", auth = false)
        assert(ms == 200 && mb.contains(
          """sequin_message_deliver_success_count{consumer_id="ops",consumer_name="ops"} 2"""),
          mb)
        val (hs, hb) = get("/api/health/sink_consumer/ops", auth = true)
        assert(hs == 200 && hb.contains("\"status\":\"healthy\""), hb)
        // the trace ring surfaces the batch's decisions over real HTTP
        // (the reference's runtime/trace.ex view): received/matched/
        // filtered counts plus the delivery outcome, newest first
        val (ts, tb) = get("/api/sinks/ops/trace", auth = true)
        assert(ts == 200 && tb.contains("\"message\":\"batch processed\"") &&
          tb.contains("\"matched\":\"2\"") &&
          tb.contains("\"received\":\"2\"") &&
          tb.contains("\"message\":\"batch delivered\""), tb)
        assert(get("/api/sinks/ghost/trace", auth = true)._1 == 404)
        // ?limit caps the page
        val (_, tb1) = get("/api/sinks/ops/trace?limit=1", auth = true)
        assert(tb1.split("\"message\"").length == 2, tb1)
      } finally handle.stop()
    } finally { api.stop(); srv.stop() }
  }

  test("BACKFILL INTEGRATION: keyset pages flow as :read events through " +
      "the same pipeline + ledger; a row inserted mid-backfill arrives " +
      "exactly once; CDC wins on PK conflict; per-group order holds") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val srv = new ScriptedRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val tableDir = java.nio.file.Files.createTempDirectory("bf_table").toString
    // the source table snapshot: rows 1..5 (business shape: id + value)
    def writeRows(rows: Seq[(Long, Double)], part: String): Unit =
      rows.toDF("id", "value").write.mode("append")
        .parquet(tableDir)
    writeRows((1L to 5L).map(i => (i, i * 1.0)), "seed")
    // page rows → the CDC envelope: identity MUST match the live
    // stream's (schema.table + pk); reads sort under lsn 0 (before any
    // CDC commit), idempotency key "r:<pk>"
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
    val cfg = PipelineSpec.parse(
      """{"name":"bf","destination":{"type":"redis_stream","stream_key":"k"}}""")
    val input = MemoryStream[ChangeEvent]
    val handle = ConsumerRuntime.start(input.toDS().toDF(), cfg,
      SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
      metrics, health, "c-bf",
      backfill = Some(ConsumerRuntime.BackfillSpec(
        table = () => spark.read.parquet(tableDir),
        sortCols = Seq("id"),
        toEnvelope = toEnvelope,
        tableSchema = "public", tableName = "t0",
        pageSize = 2)))
    val bf = handle.backfill.get
    try {
      def ev2(lsn: Long, id: Long, value: Double,
          action: String = "insert"): ChangeEvent =
        ChangeEvent(lsn, 0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          action, "public", "t0", 16384L, s"pk$id", id, id, value, "{}",
          Some(0.5), s"$id:$lsn", id.toString, 100L)
      // CDC lands BEFORE the scan reaches those rows: an update to an
      // existing row (pk3) and an insert of a brand-new row (pk10)
      input.addData(ev2(8, 3, 33.0, "update"), ev2(16, 10, 100.0))
      handle.query.processAllAvailable()
      assert(srv.xadds.size == 2)
      // page 1 delivers reads for rows 1,2 (no CDC seen for them)
      assert(bf.step())
      assert(srv.xadds.asScala.count(_.contains("|action|read|")) == 2,
        srv.xadds.asScala.mkString("\n"))
      // a row is INSERTED mid-backfill, arriving via CDC; the table also
      // grows (a later page would re-read it)
      writeRows(Seq((6L, 6.0)), "mid")
      input.addData(ev2(24, 6, 6.0))
      handle.query.processAllAvailable()
      // page 2 covers rows 3,4: pk3 is FENCED (CDC update won — the read
      // image is stale), pk4 delivers
      assert(bf.step())
      // page 3 covers rows 5,6: pk6 is FENCED (already delivered via its
      // CDC insert — exactly once), pk5 delivers
      bf.step()
      bf.run() // drain to completion (end-of-table probe)
      assert(bf.isDone)
      val reads = srv.xadds.asScala.toVector
        .filter(_.contains("|action|read|"))
      def pkOf(x: String) =
        "\"idempotency_key\":\"r:(\\d+)\"".r.findFirstMatchIn(x)
          .map(_.group(1))
      assert(reads.flatMap(pkOf).sorted == Vector("1", "2", "4", "5"),
        reads.mkString("\n"))
      // row 6 appears exactly once (its CDC insert; the page re-read was
      // fenced), and row 3's read never shipped (its CDC update did)
      val all = srv.xadds.asScala.toVector
      assert(all.count(_.contains("\"id\":6,")) == 1, all.mkString("\n"))
      assert(all.count(_.contains("\"id\":3,")) == 1)
      assert(handle.ledger.outstandingEvents == 0)
      assert(handle.ledger.deadLetters().isEmpty)
      // CDC wins on PK conflict: row 3's single delivery is the UPDATE
      // image (value 33), not the stale table read
      val pk3 = all.filter(_.contains("\"id\":3,"))
      assert(pk3.head.contains("33.0"), pk3.head)
    } finally { handle.stop(); srv.stop() }
  }

  test("FENCE CAP: a high-churn table during backfill overflows the " +
      "driver-held fence set into the parquet side table — exactly-once " +
      "holds past the cap, and the spool is released with the scan") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val srv = new ScriptedRedis()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val tableDir = java.nio.file.Files.createTempDirectory("bf_cap").toString
    (1L to 12L).map(i => (i, i * 1.0)).toDF("id", "value")
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
    // cap = 3: the 8 churned pks MUST overflow to the parquet side table
    val cfg = PipelineSpec.parse(
      """{"name":"bfc","max_backfill_fence_in_memory":3,
        |"destination":{"type":"redis_stream","stream_key":"k"}}"""
        .stripMargin)
    assert(cfg.maxBackfillFenceInMemory == 3)
    val input = MemoryStream[ChangeEvent]
    val handle = ConsumerRuntime.start(input.toDS().toDF(), cfg,
      SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
      metrics, health, "c-bfc",
      backfill = Some(ConsumerRuntime.BackfillSpec(
        table = () => spark.read.parquet(tableDir),
        sortCols = Seq("id"),
        toEnvelope = toEnvelope,
        tableSchema = "public", tableName = "t0",
        pageSize = 4)))
    val bf = handle.backfill.get
    try {
      def ev2(lsn: Long, id: Long): ChangeEvent =
        ChangeEvent(lsn, 0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          "update", "public", "t0", 16384L, s"pk$id", id, id, id * 10.0,
          "{}", Some(0.5), s"$id:$lsn", id.toString, 100L)
      // HIGH CHURN before the scan reaches those rows: CDC updates for
      // pks 3..10 — 8 identities, far past the cap of 3 (two batches so
      // the overflow also exercises set accumulation across batches)
      input.addData((3L to 6L).map(i => ev2(i * 8, i)): _*)
      handle.query.processAllAvailable()
      input.addData((7L to 10L).map(i => ev2(i * 8, i)): _*)
      handle.query.processAllAvailable()
      assert(srv.xadds.size == 8)
      // the overflow spilled to the parquet fence spool (metric proves
      // the capped path engaged, not the in-memory set)
      val exp = metrics.exposition()
      val spilled = exp.linesIterator
        .find(_.startsWith("graft_backfill_fence_spilled_total"))
        .map(_.split(" ").last.toDouble.toLong)
      assert(spilled.exists(_ >= 4), s"fence spill metric: $spilled")
      // drain the scan: pages re-read pks 1..12; 3..10 must be FENCED
      // (their CDC updates already delivered — exactly-once), 1,2,11,12
      // deliver as reads
      bf.run()
      assert(bf.isDone)
      val reads = srv.xadds.asScala.toVector
        .filter(_.contains("|action|read|"))
      def pkOf(x: String) =
        "\"idempotency_key\":\"r:(\\d+)\"".r.findFirstMatchIn(x)
          .map(_.group(1))
      assert(reads.flatMap(pkOf).sortBy(_.toInt) ==
        Vector("1", "2", "11", "12"), reads.mkString("\n"))
      // every churned pk appears exactly once (the CDC image), and the
      // delivered image is CDC's (value id*10), not the stale read
      val all = srv.xadds.asScala.toVector
      (3L to 10L).foreach { id =>
        val hits = all.filter(_.contains(s""""id":$id,"""))
        assert(hits.size == 1, s"pk$id delivered ${hits.size}x")
        assert(hits.head.contains(s"${id * 10.0}"), hits.head)
      }
      assert(handle.ledger.outstandingEvents == 0)
      // the fence spool is transient: released when the scan completed
      val spoolRoot = new java.io.File("target/graft_fence_spool/c-bfc")
      assert(!spoolRoot.exists() ||
        Option(spoolRoot.listFiles()).forall(_.isEmpty),
        s"fence spool not cleaned: ${Option(spoolRoot.listFiles()).map(_.toSeq)}")
    } finally { handle.stop(); srv.stop() }
  }

  test("VAULT → TRANSPORT: encrypted_headers decrypt only at client " +
      "construction — the live http_push request carries the plaintext " +
      "the catalog never stored") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // loopback webhook recording the Authorization header of every POST
    val seenAuth = new ConcurrentLinkedQueue[String]()
    val http = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    http.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      Option(ex.getRequestHeaders.getFirst("Authorization"))
        .foreach(seenAuth.add)
      ex.getRequestBody.readAllBytes()
      ex.sendResponseHeaders(200, 2L)
      ex.getResponseBody.write("ok".getBytes)
      ex.close()
    })
    http.start()
    val api = new graft.config.ManagementApi(Some(
      java.util.Base64.getEncoder.encodeToString(Array.fill[Byte](32)(5))))
    val client = java.net.http.HttpClient.newHttpClient()
    def post(path: String, body: String): Int =
      client.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${api.port()}$path"))
        .header("Content-Type", "application/json")
        .header("Authorization", s"Bearer ${api.bootstrapToken}")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
    try {
      assert(post("/api/destinations/http_endpoints",
        """{"name":"hooks","url":"http://example.test/sink",
          |"encrypted_headers":[
          |  {"key":"Authorization","value":"Bearer s3cr3t-hook"}]}"""
          .stripMargin) == 200)
      assert(post("/api/sinks",
        """{"name":"vh","actions":["insert"],
          |"destination":{"type":"http_push","http_endpoint":"hooks"}}"""
          .stripMargin) == 200)
      val input = MemoryStream[ChangeEvent]
      val handle = api.startConsumer("vh", input.toDS().toDF(),
        SinkDispatch.Env(
          httpBase = s"http://127.0.0.1:${http.getAddress.getPort}/hook"))
      try {
        input.addData(ev(8, "1", 5.0))
        handle.query.processAllAvailable()
        assert(seenAuth.asScala.toSeq.contains("Bearer s3cr3t-hook"),
          seenAuth.asScala.toSeq)
      } finally handle.stop()
    } finally { api.stop(); http.stop(0) }
  }

  test("dead transport x 500k-event micro-batch: failures spill to the " +
      "parquet retry spool and drain in bounded chunks") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = new ServerSocket(0)
    val dead = tmp.getLocalPort
    tmp.close()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    // max_retry_count=1: the batch dispatch already burned the single
    // attempt, so every spooled chunk resolves straight to the DLQ — the
    // spec exercises the spill/drain shape, not 500k retry waves
    val cfg = PipelineSpec.parse(
      """{"name":"spill","ack_wait_ms":1,"max_retry_count":1,
        |"destination":{"type":"redis_stream","stream_key":"k"}}"""
        .stripMargin)
      .copy(maxFailedCollectPerBatch = 50000)
    val n = 500000
    val input = MemoryStream[ChangeEvent]
    val handle = ConsumerRuntime.start(input.toDS().toDF(), cfg,
      SinkDispatch.Env(host = "127.0.0.1", port = dead),
      metrics, health, "c-spill")
    try {
      input.addData((1 to n).map(i => ev(i.toLong, (i % 64).toString, 5.0)))
      handle.query.processAllAvailable()
      // the spill path engaged (not the one-shot collect) and carried
      // the WHOLE failed batch through the spool
      val exp = metrics.exposition()
      val spilled = exp.linesIterator
        .find(_.startsWith("graft_retry_spool_spilled_total"))
        .map(_.split(" ").last.toDouble.toLong)
      assert(spilled.contains(n.toLong), s"spill metric: $spilled")
      // every event resolved (DLQ'd) — nothing lost between chunks
      assert(handle.ledger.deadLetters().size == n)
      assert(handle.ledger.outstandingEvents == 0)
      // the spool is transient state: cleaned up after the drain
      val spoolRoot = new java.io.File("target/graft_retry_spool/c-spill")
      assert(!spoolRoot.exists() ||
        spoolRoot.listFiles().forall(_ == null),
        s"spool not cleaned: ${Option(spoolRoot.listFiles()).map(_.toSeq)}")
      // the stream survives for the next batch
      assert(handle.query.isActive)
    } finally handle.stop()
  }

  test("dead transport: retries exhaust into the DLQ, the stream keeps " +
      "going, health flips to error") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = new ServerSocket(0)
    val dead = tmp.getLocalPort
    tmp.close()
    val metrics = new graft.config.Metrics.Registry()
    val health = new graft.config.Health.Registry()
    val cfg = PipelineSpec.parse(
      """{"name":"doom","ack_wait_ms":1,"max_retry_count":2,
        |"destination":{"type":"redis_stream","stream_key":"k"}}"""
        .stripMargin)
    val input = MemoryStream[ChangeEvent]
    val handle = ConsumerRuntime.start(input.toDS().toDF(), cfg,
      SinkDispatch.Env(host = "127.0.0.1", port = dead),
      metrics, health, "c-doom")
    try {
      input.addData(ev(8, "1", 5.0), ev(8, "2", 5.0))
      handle.query.processAllAvailable() // terminates: retry → DLQ
      assert(handle.ledger.deadLetters().size == 2)
      assert(handle.ledger.outstandingEvents == 0)
      assert(health.health("sink_consumer", "c-doom").status == "error")
      val exp = metrics.exposition()
      assert(exp.contains("sequin_message_deliver_failure_count"))
      // the stream is still alive for the next batch
      assert(handle.query.isActive)
      // the trace ring recorded the failure AND the DLQ outcome with
      // reasons — the "why is this consumer stuck" view
      val trace = graft.streaming.Trace.recent("c-doom")
      assert(trace.exists(e =>
        e.status == "error" && e.message == "deliveries failed" &&
          e.extra.get("failed").contains("2")), trace)
      assert(trace.exists(e =>
        e.status == "warning" &&
          e.message == "dead-lettered after retry budget" &&
          e.extra.get("count").contains("2")), trace)
    } finally handle.stop()
  }

  test("Trace ring: overwrite-oldest wrap, newest-first reads") {
    val r = new graft.streaming.Trace.Ring(capacity = 4)
    (1 to 6).foreach(i => r.publish(graft.streaming.Trace.Event(
      "info", s"m$i", Map.empty, i.toLong)))
    assert(r.size == 4)
    assert(r.recent(10).map(_.message) == Seq("m6", "m5", "m4", "m3"))
    assert(r.recent(2).map(_.message) == Seq("m6", "m5"))
  }
}
