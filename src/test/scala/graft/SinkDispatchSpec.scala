package graft

import graft.config.PipelineSpec
import graft.sinks.SinkDispatch
import graft.streaming.CdcPipeline
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.io.InputStream
import java.net.{InetAddress, InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The full product path in one spec: a JSON consumer CONFIG (the same
  * document the management API accepts) → PipelineSpec validation →
  * CdcPipeline.build → SinkDispatch → a LIVE loopback transport →
  * ack/nack commands. One config line switches the transport, like the
  * reference's sink_pipeline dispatch table.
  */
class SinkDispatchSpec extends SparkSpec {

  test("config → pipeline → live HTTP delivery → acks; one line switches to redis; bad env and unknown types fail fast") {
    implicit val s = spark
    // --- loopback webhook ---
    val received = new ConcurrentLinkedQueue[String]()
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    http.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        received.add(new String(ex.getRequestBody.readAllBytes(), UTF_8))
        ex.sendResponseHeaders(200, 2)
        ex.getResponseBody.write("{}".getBytes(UTF_8))
        ex.close()
      }
    })
    http.start()
    // --- loopback redis (minimal RESP array parser, replies $3 1-1) ---
    val xadds = new ConcurrentLinkedQueue[String]()
    val redis = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    val redisThread = new Thread(() => {
      try {
        while (true) {
          val sock = redis.accept()
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
              val first = in.read()
              if (first < 0) throw new java.io.EOFException
              val n = line().toInt // after '*'
              val args = (0 until n).map { _ =>
                in.read() // '$'
                val len = line().toInt
                val buf = new Array[Byte](len)
                var off = 0
                while (off < len) off += in.read(buf, off, len - off)
                in.read(); in.read() // CRLF
                new String(buf, UTF_8)
              }
              if (args.head == "XADD") xadds.add(args(1))
              out.write("$3\r\n1-1\r\n".getBytes(UTF_8)); out.flush()
            }
          } catch { case _: Exception => sock.close() }
        }
      } catch { case _: Exception => () }
    })
    redisThread.setDaemon(true)
    redisThread.start()
    try {
      val cdc = graft.model.Cdc.fromEvents(Tables.events(spark, sf())).limit(12)
      def cfgJson(dest: String): String =
        s"""{"name": "e2e", "batch_size": 4, "destination": $dest}"""
      // HTTP push arm
      val cfg1 = PipelineSpec.parse(cfgJson(
        s"""{"type": "http_push", "http_endpoint": "ep1"}"""))
      val out1 = SinkDispatch.deliver(
        CdcPipeline.build(cdc, cfg1), cfg1.sink.get,
        SinkDispatch.Env(httpBase =
          s"http://127.0.0.1:${http.getAddress.getPort}/hook")).collect()
      assert(out1.nonEmpty && out1.forall(_.ok))
      assert(received.asScala.nonEmpty)
      // the SAME pipeline, one config line changed → redis transport
      val cfg2 = PipelineSpec.parse(cfgJson(
        s"""{"type": "redis_stream", "stream_key": "k"}"""))
      val out2 = SinkDispatch.deliver(
        CdcPipeline.build(cdc, cfg2), cfg2.sink.get,
        SinkDispatch.Env(host = "127.0.0.1", port = redis.getLocalPort))
        .collect()
      assert(out2.length == 12 && out2.forall(_.ok))
      assert(xadds.asScala.forall(_.startsWith("sequin.")))
      // ack/nack bridge
      val cmds = SinkDispatch.commands(
        spark.createDataset(out2.toSeq)(
          org.apache.spark.sql.Encoders.product[SinkDispatch.Outcome]))
        .collect()
      assert(cmds.length == 12 && cmds.forall(_.kind == "ack"))
      // missing env fails fast with the sink named
      val e = intercept[IllegalArgumentException](SinkDispatch.deliver(
        CdcPipeline.build(cdc, cfg2), cfg2.sink.get, SinkDispatch.Env()))
      assert(e.getMessage.contains("redis_stream"))
      // unknown sink type refuses
      intercept[IllegalArgumentException](SinkDispatch.deliver(
        CdcPipeline.build(cdc, cfg1),
        graft.streaming.SinkSpec("carrier_pigeon"), SinkDispatch.Env()))
    } finally { http.stop(0); redis.close() }
  }

  test("ROUND-TRIP: a live transport's acks carry the LEDGER identity and clear AckDelivery in-flight — no redelivery, the at-least-once loop closes on success") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.model.ChangeEvent
    import graft.streaming.AckDelivery
    import graft.streaming.AckDelivery.DeliveryCommand
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    // loopback redis: replies to every XADD
    val redis = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    val redisThread = new Thread(() => {
      try {
        while (true) {
          val sock = redis.accept()
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
              (0 until n).foreach { _ =>
                in.read()
                val len = line().toInt
                val buf = new Array[Byte](len)
                var off = 0
                while (off < len) off += in.read(buf, off, len - off)
                in.read(); in.read()
              }
              out.write("$3\r\n1-1\r\n".getBytes(UTF_8)); out.flush()
            }
          } catch { case _: Exception => sock.close() }
        }
      } catch { case _: Exception => () }
    })
    redisThread.setDaemon(true)
    redisThread.start()
    try {
      def ev(lsn: Long, group: String): ChangeEvent =
        ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"),
          "update", "public", "t0", 16384L, s"pk$lsn", lsn, 1L, 1.0, "{}",
          Some(0.5), s"1:$lsn:0", group, 100L)
      // one null group exercises the __pk: fallback — the identity
      // DeliveryCommand.event keys the state machine with
      val events = Seq(ev(8, "g1"), ev(16, "g1"), ev(24, null))
      val cfg = PipelineSpec.parse(
        """{"name":"rt","destination":{"type":"redis_stream","stream_key":"k"}}""")
      val pipeline =
        CdcPipeline.build(spark.createDataset(events).toDF(), cfg)
      val outcomes = SinkDispatch.deliver(pipeline, cfg.sink.get,
        SinkDispatch.Env(host = "127.0.0.1", port = redis.getLocalPort))
        .collect()
      assert(outcomes.length == 3 && outcomes.forall(_.ok))
      val cmds = SinkDispatch.commands(
        spark.createDataset(outcomes.toSeq)(
          org.apache.spark.sql.Encoders.product[SinkDispatch.Outcome]))
        .collect()
      // transport outcomes must ack with the EVENT's ledger identity —
      // idempotency key + AckDelivery group (incl. the __pk: fallback) —
      // not transport-local ids (stream key / synthetic counters)
      assert(cmds.flatMap(_.ack_id).toSet ==
        events.map(_.idempotency_key).toSet)
      assert(cmds.map(_.group_id).toSet == Set("g1", "__pk:pk24"))
      // feed them into the REAL state machine: events enter, transport
      // acks must clear the in-flight entries, so a visibility-expired
      // tick produces NO redelivery and NO dlq
      val in = MemoryStream[DeliveryCommand]
      val q = AckDelivery.run(in.toDS(), ackWaitMs = 1L, maxInflight = 4,
          maxRetry = 3)
        .writeStream.format("memory").queryName("dispatch_rt")
        .outputMode("append").start()
      try {
        in.addData(events.map(DeliveryCommand.event))
        q.processAllAvailable()
        val delivered = spark.table("dispatch_rt").collect()
        assert(delivered.length == 3 &&
          delivered.forall(_.getString(0) == "deliver"))
        in.addData(cmds.toSeq)
        q.processAllAvailable()
        Thread.sleep(5)
        in.addData(DeliveryCommand.tick("g1"),
          DeliveryCommand.tick("__pk:pk24"))
        q.processAllAvailable()
        val kinds = spark.table("dispatch_rt").collect().map(_.getString(0))
        assert(kinds.count(_ == "redeliver") == 0 &&
          kinds.count(_ == "dlq") == 0,
          s"acked deliveries redelivered: ${kinds.mkString(",")}")
      } finally q.stop()
    } finally redis.close()
  }

  test("deliverObserved: real outcomes feed the Prometheus counters and " +
      "the consumer's messages_delivered health check") {
    implicit val s = spark
    // loopback redis replying to every command
    val redis = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    val redisThread = new Thread(() => {
      try {
        while (true) {
          val sock = redis.accept()
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
              (0 until n).foreach { _ =>
                in.read()
                val len = line().toInt
                val buf = new Array[Byte](len)
                var off = 0
                while (off < len) off += in.read(buf, off, len - off)
                in.read(); in.read()
              }
              out.write("$3\r\n1-1\r\n".getBytes(UTF_8)); out.flush()
            }
          } catch { case _: Exception => sock.close() }
        }
      } catch { case _: Exception => () }
    })
    redisThread.setDaemon(true)
    redisThread.start()
    try {
      val metrics = new graft.config.Metrics.Registry()
      val health = new graft.config.Health.Registry()
      val cdc = graft.model.Cdc.fromEvents(Tables.events(spark, sf())).limit(5)
      val cfg = PipelineSpec.parse(
        """{"name":"obs","destination":{"type":"redis_stream","stream_key":"k"}}""")
      def delivered() = health.health("sink_consumer", "c-obs")
        .checks.find(_.slug == "messages_delivered").get
      val ok = SinkDispatch.deliverObserved(
        CdcPipeline.build(cdc, cfg), cfg.sink.get,
        SinkDispatch.Env(host = "127.0.0.1", port = redis.getLocalPort),
        metrics, health, "c-obs", "obs")
      assert(ok.size == 5 && ok.forall(_.ok))
      val exp = metrics.exposition()
      assert(exp.contains("sequin_message_deliver_attempt_count" +
        """{consumer_id="c-obs",consumer_name="obs"} 5"""), exp)
      assert(exp.contains("sequin_message_deliver_success_count" +
        """{consumer_id="c-obs",consumer_name="obs"} 5"""))
      // one observation PER DELIVERY (5 ok outcomes -> count 5), so
      // sum/count reads as true mean per-delivery latency
      assert(exp.contains(
        """sequin_delivery_latency_us_count{consumer_id="c-obs",consumer_name="obs",success="true"} 5"""))
      assert(delivered().status == "healthy")
      // the same consumer against a dead port: failures counted, the
      // health check flips to error with the transport reason
      val tmp = new ServerSocket(0)
      val dead = tmp.getLocalPort
      tmp.close()
      val bad = SinkDispatch.deliverObserved(
        CdcPipeline.build(cdc, cfg), cfg.sink.get,
        SinkDispatch.Env(host = "127.0.0.1", port = dead),
        metrics, health, "c-obs", "obs")
      assert(bad.nonEmpty && bad.forall(!_.ok))
      val exp2 = metrics.exposition()
      assert(exp2.contains("sequin_message_deliver_attempt_count" +
        """{consumer_id="c-obs",consumer_name="obs"} 10"""))
      assert(exp2.contains("sequin_message_deliver_failure_count" +
        """{consumer_id="c-obs",consumer_name="obs"} 5"""))
      assert(delivered().status == "error" &&
        delivered().error.exists(_.contains("deliveries failed")))
      assert(health.health("sink_consumer", "c-obs").status == "error")
    } finally redis.close()
  }

  test("a dead transport's nacks drive AckDelivery to redeliver — the failure loop closes") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.model.ChangeEvent
    import graft.streaming.AckDelivery
    import graft.streaming.AckDelivery.DeliveryCommand
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    // a port with nothing listening: every delivery nacks
    val tmp = new ServerSocket(0)
    val dead = tmp.getLocalPort
    tmp.close()
    def ev(lsn: Long): ChangeEvent =
      ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"),
        "update", "public", "t0", 16384L, s"pk$lsn", lsn, 1L, 1.0, "{}",
        Some(0.5), s"1:$lsn:0", "1", 100L)
    val cfg = PipelineSpec.parse(
      """{"name":"loop","destination":{"type":"redis_stream","stream_key":"k"}}""")
    val events = Seq(ev(8))
    val pipeline = CdcPipeline.build(spark.createDataset(events).toDF(), cfg)
    val outcomes = SinkDispatch.deliver(pipeline, cfg.sink.get,
      SinkDispatch.Env(host = "127.0.0.1", port = dead)).collect()
    assert(outcomes.nonEmpty && outcomes.forall(!_.ok))
    // the event enters the ledger; the transport's nack arrives with the
    // EVENT's identity (ack by idempotency key); a visibility-expired
    // tick then redelivers — at-least-once, not silent loss
    val in = MemoryStream[DeliveryCommand]
    val q = AckDelivery.run(in.toDS(), ackWaitMs = 1L, maxRetry = 3)
      .writeStream.format("memory").queryName("dispatch_loop")
      .outputMode("append").start()
    try {
      in.addData(DeliveryCommand.event(events.head))
      q.processAllAvailable()
      val first = spark.table("dispatch_loop").collect()
      assert(first.length == 1 && first.head.getString(0) == "deliver")
      val ackId = first.head.getString(1)
      in.addData(DeliveryCommand.nack("1", ackId))
      Thread.sleep(5)
      in.addData(DeliveryCommand.tick("1"))
      q.processAllAvailable()
      val kinds = spark.table("dispatch_loop").collect().map(_.getString(0))
      assert(kinds.count(_ == "redeliver") >= 1,
        s"expected a redelivery after the nack, got ${kinds.mkString(",")}")
    } finally q.stop()
  }
}
