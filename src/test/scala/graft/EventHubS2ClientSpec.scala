package graft

import graft.model.Cdc
import graft.sinks.{EventHubClient, S2Client, SinkAdapters}
import graft.sinks.EventHubClient.{EhRequest, SasCredentials}
import graft.sinks.S2Client.S2Request
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import scala.jdk.CollectionConverters._

/** Event Hub (SAS-token REST data plane) and S2 (Bearer append) clients
  * against loopback endpoints. The Event Hub server VERIFIES each SAS
  * token by recomputing the HMAC-SHA256 from its own URL + the shared
  * key, parsing sr/sig/se/skn out of the header. Zero egress. */
class EventHubS2ClientSpec extends SparkSpec {

  private val creds = SasCredentials("send-policy", "super-secret-key")

  private final class ScriptedEventHub {
    val bodies = new ConcurrentLinkedQueue[String]()
    val sasOk = new ConcurrentLinkedQueue[Boolean]()
    private val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val auth = ex.getRequestHeaders.getFirst("authorization")
        // parse SharedAccessSignature sr=..&sig=..&se=..&skn=..
        val fields = auth.stripPrefix("SharedAccessSignature ")
          .split("&").map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> v
          }.toMap
        val url = s"http://127.0.0.1:$port${ex.getRequestURI.getPath}"
        val sr = java.net.URLEncoder.encode(url, "UTF-8")
        val mac = Mac.getInstance("HmacSHA256")
        mac.init(new SecretKeySpec(creds.key.getBytes(UTF_8), "HmacSHA256"))
        val expect = java.net.URLEncoder.encode(
          java.util.Base64.getEncoder.encodeToString(
            mac.doFinal(s"$sr\n${fields("se")}".getBytes(UTF_8))), "UTF-8")
        val valid = fields("sr") == sr && fields("sig") == expect &&
          fields("skn") == creds.keyName &&
          fields("se").toLong > System.currentTimeMillis() / 1000
        sasOk.add(valid)
        if (valid) bodies.add(body)
        val status = if (valid) 201 else 401
        ex.sendResponseHeaders(status, -1)
        ex.close()
      }
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  test("Event Hub: SAS tokens verify against the shared key; a wrong key is refused with nothing accepted") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedEventHub()
    try {
      val reqs = (1 to 12).map(i =>
        EhRequest(s"m$i", s"g${i % 3}", "hub1", s"g${i % 3}", s"""{"n":$i}"""))
      val out = EventHubClient.deliver(
        spark.createDataset(reqs).repartition(1),
        s"http://127.0.0.1:${srv.port}", creds).collect()
      assert(out.length == 12 && out.forall(_.ok))
      assert(srv.sasOk.asScala.forall(identity), "SAS verification failed")
      val sent = srv.bodies.asScala.mkString
      assert((1 to 12).forall(i => sent.contains(s"""{\\"n\\":$i}""") ||
        sent.contains(s""""n":$i""")))
      // wrong key → 401, batch fails closed, server accepts nothing new
      val before = srv.bodies.size
      val out2 = EventHubClient.deliver(
        spark.createDataset(reqs.take(3)).repartition(1),
        s"http://127.0.0.1:${srv.port}",
        SasCredentials("send-policy", "wrong-key")).collect()
      assert(out2.forall(r => !r.ok && r.err == "publish failed: 401"))
      assert(srv.bodies.size == before)
    } finally srv.stop()
  }

  test("Event Hub END TO END: the wire publishes Body envelopes with partition keys") {
    implicit val s = spark
    val srv = new ScriptedEventHub()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(15)
      val wire = SinkAdapters.eventHubWire(cdc, eventHubName = "hub1")
      val out = EventHubClient.deliver(EventHubClient.requests(wire),
        s"http://127.0.0.1:${srv.port}", creds).collect()
      assert(out.length == 15 && out.forall(_.ok))
      assert(srv.bodies.asScala.mkString.contains("PartitionKey"))
    } finally srv.stop()
  }

  test("S2: Bearer-authorized appends, batch-granular outcomes") {
    implicit val s = spark
    import s.implicits._
    val appended = new ConcurrentLinkedQueue[String]()
    val auths = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        auths.add(ex.getRequestHeaders.getFirst("authorization"))
        appended.add(ex.getRequestURI.getPath + "|" +
          new String(ex.getRequestBody.readAllBytes(), UTF_8))
        ex.sendResponseHeaders(200, -1)
        ex.close()
      }
    })
    server.start()
    try {
      val reqs = (1 to 7).map(i => S2Request(s"a$i", s"g$i", "basin1", "stream1", s"b$i"))
      val out = S2Client.deliver(spark.createDataset(reqs).repartition(1),
        s"http://127.0.0.1:${server.getAddress.getPort}", "s2-token")
        .collect()
      assert(out.length == 7 && out.forall(_.ok))
      assert(auths.asScala.forall(_ == "Bearer s2-token"))
      val sent = appended.asScala.mkString
      assert(sent.contains("/streams/stream1/records") &&
        sent.contains(""""records":["""))
      // the wire end to end
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(10)
      val wire = SinkAdapters.s2Wire(cdc, basin = "b", stream = "stream1")
      val out2 = S2Client.deliver(S2Client.requests(wire),
        s"http://127.0.0.1:${server.getAddress.getPort}", "s2-token")
        .collect()
      assert(out2.length == 10 && out2.forall(_.ok))
    } finally server.stop(0)
  }
}
