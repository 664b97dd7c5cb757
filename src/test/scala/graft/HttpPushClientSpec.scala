package graft

import graft.model.Cdc
import graft.sinks.{HttpPushClient, HttpRetryPolicy, SinkAdapters}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The HTTP push CLIENT driven against a real loopback listener: bodies
  * actually cross a socket, the in-request retry ladder runs against
  * scripted status sequences, and the recorded ladder is checked
  * bit-identical to [[HttpRetryPolicy.resolve]] — the live client and
  * the declarative policy evaluator cannot drift. Zero egress: the
  * server binds 127.0.0.1.
  */
class HttpPushClientSpec extends SparkSpec {

  /** Recording loopback endpoint. Per-path status SCRIPTS: request k to
    * a path answers script(min(k, last)) — e.g. Seq(503, 200) = first
    * request 503, everything after 200.
    */
  private final class RecordingServer(scripts: Map[String, Seq[Int]]) {
    val received = new ConcurrentLinkedQueue[(String, String)]()
    private val counts = scala.collection.concurrent.TrieMap[String, AtomicInteger]()
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        received.add(path -> body)
        val k = counts.getOrElseUpdate(path, new AtomicInteger).getAndIncrement()
        val script = scripts.getOrElse(path, Seq(200))
        val status = script(math.min(k, script.length - 1))
        val resp = "{}".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private def requestsDf(endpoint: String, items: Seq[(String, String)]) = {
    implicit val s = spark
    import s.implicits._
    items.map { case (ack, body) => (ack, "g0", "POST", endpoint, body) }
      .toDF("ack_id", "group_id", "method", "endpoint", "body")
  }

  test("bodies cross the socket; the batched wire arrives in commit order per partition") {
    implicit val s = spark
    val srv = new RecordingServer(Map.empty)
    try {
      val endpoint = s"http://127.0.0.1:${srv.port}/hook"
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(40)
      val wire = SinkAdapters.httpPushBatchedWire(cdc, endpoint,
        batchSize = 5, partitions = 4)
      val results = HttpPushClient.deliver(
        HttpPushClient.batchedRequests(wire),
        HttpRetryPolicy.Policy(), realSleep = false).collect()
      assert(results.nonEmpty && results.forall(_.delivered))
      assert(results.forall(r => r.attempts == 1 && r.final_status == 200))
      // every wire body arrived exactly once, byte-identical
      val sent = wire.select("body").collect().map(_.getString(0)).sorted
      val got = srv.received.asScala.map(_._2).toSeq.sorted
      assert(got == sent.toSeq, "bodies lost or mutated in transit")
      // commit order within each delivery partition: the wire's first_seq
      // is monotone in batch_idx, and deliver() preserves partition order
      val perPart = wire.select("partition", "batch_idx", "first_seq")
        .collect().groupBy(_.getLong(0))
      perPart.values.foreach { rows =>
        val seqs = rows.sortBy(_.getLong(1)).map(_.getLong(2))
        assert(seqs.sameElements(seqs.sorted), "batch order != commit order")
      }
    } finally srv.stop()
  }

  test("transient failures retry with the reference backoff schedule, then succeed") {
    implicit val s = spark
    val srv = new RecordingServer(Map("/flaky" -> Seq(503, 500, 200)))
    try {
      val endpoint = s"http://127.0.0.1:${srv.port}/flaky"
      val policy = HttpRetryPolicy.Policy(maxRetries = 3)
      val out = HttpPushClient.deliver(
        requestsDf(endpoint, Seq("a1" -> """{"data":[1]}""")),
        policy, realSleep = false).collect().head
      assert(out.delivered && out.attempts == 3 && out.final_status == 200)
      assert(out.statuses == Seq(503, 500, 200))
      // slept schedule = backoffMs(0) + backoffMs(1) = 500 + 500
      assert(out.total_backoff_ms == policy.backoffMs(0) + policy.backoffMs(1))
      assert(srv.received.size == 3, "retries must re-POST the body")
    } finally srv.stop()
  }

  test("permanent failures fail fast; exhausted transients fail with the last status") {
    implicit val s = spark
    val srv = new RecordingServer(
      Map("/gone" -> Seq(404), "/down" -> Seq(500)))
    try {
      val base = s"http://127.0.0.1:${srv.port}"
      val policy = HttpRetryPolicy.Policy(maxRetries = 2)
      val gone = HttpPushClient.deliver(
        requestsDf(s"$base/gone", Seq("a1" -> "{}")), policy,
        realSleep = false).collect().head
      assert(!gone.delivered && gone.attempts == 1 && gone.final_status == 404)
      assert(gone.total_backoff_ms == 0L, "permanent failure must not sleep")
      val down = HttpPushClient.deliver(
        requestsDf(s"$base/down", Seq("a2" -> "{}")), policy,
        realSleep = false).collect().head
      assert(!down.delivered && down.attempts == 3 && down.final_status == 500)
      // failed deliveries nack toward redelivery/DLQ; successes ack
      val cmds = HttpPushClient.commands(HttpPushClient.deliver(
          requestsDf(s"$base/gone", Seq("a3" -> "{}")), policy,
          realSleep = false))
        .collect()
      assert(cmds.length == 1 && cmds.head.kind == "nack")
    } finally srv.stop()
  }

  test("a dead endpoint is a transport error (status 0), transient under the policy") {
    implicit val s = spark
    // bind-then-close to get a port with nothing listening
    val tmp = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val deadPort = tmp.getAddress.getPort
    tmp.stop(0)
    val policy = HttpRetryPolicy.Policy(maxRetries = 1)
    val out = HttpPushClient.deliver(
      requestsDf(s"http://127.0.0.1:$deadPort/x", Seq("a1" -> "{}")),
      policy, realSleep = false).collect().head
    assert(!out.delivered && out.statuses.forall(_ == 0))
    assert(out.attempts == 2, "transport errors retry like 5xx")
  }

  test("END TO END: a CDC stream delivers over real HTTP through retries, exactly once per batch") {
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

    // first POST to the hook fails transiently — the ladder must absorb it
    val srv = new RecordingServer(Map("/hook" -> Seq(503, 200)))
    val results = new ConcurrentLinkedQueue[HttpPushClient.PushResult]()
    try {
      val endpoint = s"http://127.0.0.1:${srv.port}/hook"
      val policy = HttpRetryPolicy.Policy(maxRetries = 2)
      val input = MemoryStream[ChangeEvent]
      // the reference's consumer shape end to end: stream → commit-ordered
      // batched wire per micro-batch → LIVE socket delivery with retries
      val query = input.toDS().toDF().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val wire = SinkAdapters.httpPushBatchedWire(batch, endpoint,
            batchSize = 3, partitions = 2)
          HttpPushClient.deliver(HttpPushClient.batchedRequests(wire),
            policy, realSleep = false).collect().foreach(results.add)
        }
        .start()
      try {
        input.addData(ev(8, 0, "1"), ev(8, 1, "2"), ev(16, 0, "1"))
        query.processAllAvailable()
        input.addData(ev(24, 0, "1"), ev(24, 1, "3"))
        query.processAllAvailable()
      } finally query.stop()

      val rs = results.asScala.toSeq
      assert(rs.nonEmpty && rs.forall(_.delivered), "a batch failed delivery")
      // the scripted 503 cost exactly one extra attempt somewhere
      assert(rs.map(_.attempts).sum == rs.size + 1)
      // every event body crossed the socket (dedup on body: the 503 retry
      // legitimately re-POSTs its batch)
      val got = srv.received.asScala.map(_._2).toSet
      val keys = Seq("1:8:0", "2:8:1", "1:16:0", "1:24:0", "3:24:1")
      keys.foreach { k =>
        assert(got.exists(_.contains(s""""idempotency_key":"$k"""")),
          s"event $k never crossed the socket")
      }
    } finally srv.stop()
  }

  test("the live ladder is bit-identical to HttpRetryPolicy.resolve over its own log") {
    implicit val s = spark
    val srv = new RecordingServer(Map(
      "/ok" -> Seq(200), "/flaky" -> Seq(429, 200), "/gone" -> Seq(410),
      "/down" -> Seq(502)))
    try {
      val base = s"http://127.0.0.1:${srv.port}"
      val policy = HttpRetryPolicy.Policy(maxRetries = 2)
      val reqs = Seq("ok", "flaky", "gone", "down").map(p =>
        s"r-$p" -> s"""{"p":"$p"}""")
      val results = Seq("ok", "flaky", "gone", "down").flatMap { p =>
        HttpPushClient.deliver(
          requestsDf(s"$base/$p", Seq(s"r-$p" -> "{}")), policy,
          realSleep = false).collect()
      }
      results.foreach { r =>
        val (ok, n, fin, backoff) = HttpRetryPolicy.resolve(policy, r.statuses)
        assert((ok, n, fin, backoff) ==
          ((r.delivered, r.attempts, r.final_status, r.total_backoff_ms)),
          s"client/evaluator drift on ${r.ack_id}: ${r.statuses}")
      }
      assert(reqs.nonEmpty) // fixture sanity
    } finally srv.stop()
  }
}
