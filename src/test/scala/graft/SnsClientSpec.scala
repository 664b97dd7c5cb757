package graft

import graft.model.Cdc
import graft.sinks.{SinkAdapters, SnsClient, SqsClient}
import graft.sinks.SnsClient.SnsRequest
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The SNS client against a loopback PublishBatch endpoint: the QUERY
  * protocol's form fields decoded server-side, signatures re-derived by
  * the shared independent SigV4 verifier (service `sns`), XML response
  * parsed back to per-entry outcomes. Zero egress: 127.0.0.1 only.
  */
class SnsClientSpec extends SparkSpec {

  private val creds = SqsClient.Credentials("AKIDTEST", "sekrit", "us-test-1")

  private final class ScriptedSns(failIds: Set[String] = Set.empty) {
    val entries = new ConcurrentLinkedQueue[Map[String, String]]()
    val sigOk = new ConcurrentLinkedQueue[Boolean]()
    private val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val payload = ex.getRequestBody.readAllBytes()
        val hs = ex.getRequestHeaders
        val amzDate = hs.getFirst("x-amz-date")
        val expected = SigV4TestVerifier.signature(creds.secretKey,
          creds.region, "sns", amzDate, Seq(
            "content-type" -> hs.getFirst("content-type"),
            "host" -> hs.getFirst("host"),
            "x-amz-date" -> amzDate), payload)
        sigOk.add(Option(hs.getFirst("authorization"))
          .exists(_.endsWith(s"Signature=$expected")))
        val form = new String(payload, UTF_8).split("&").map { kv =>
          val Array(k, v) = kv.split("=", 2)
          URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
        }.toMap
        assert(form("Action") == "PublishBatch")
        val n = form.keys.collect {
          case k if k.matches("PublishBatchRequestEntries\\.member\\.\\d+\\.Id") =>
            k.split("\\.")(2).toInt
        }.maxOption.getOrElse(0)
        val ok = new StringBuilder
        val bad = new StringBuilder
        (1 to n).foreach { i =>
          val p = s"PublishBatchRequestEntries.member.$i"
          val entry = form.collect {
            case (k, v) if k.startsWith(p + ".") =>
              k.stripPrefix(p + ".") -> v
          }
          entries.add(entry)
          val id = entry("Id")
          if (failIds(id))
            bad.append(s"<member><Id>$id</Id><Code>InternalFailure</Code></member>")
          else ok.append(s"<member><Id>$id</Id><MessageId>mid-$id</MessageId></member>")
        }
        val resp = ("""<PublishBatchResponse><PublishBatchResult>""" +
          s"<Successful>${ok}</Successful><Failed>${bad}</Failed>" +
          """</PublishBatchResult></PublishBatchResponse>""").getBytes(UTF_8)
        ex.getResponseHeaders.set("content-type", "text/xml")
        ex.sendResponseHeaders(200, resp.length.toLong)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  test("signed Query-protocol PublishBatch: FIFO fields per member, XML outcomes per entry") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedSns(failIds = Set("d2"))
    try {
      val reqs = (1 to 14).map(i => SnsRequest(s"d$i", s"g${i % 2}",
        Some(s"mg${i % 2}"), "arn:aws:sns:topic.fifo", s"""{"n":$i}"""))
      val out = SnsClient.deliver(spark.createDataset(reqs).repartition(1),
          s"http://127.0.0.1:${srv.port}/", creds, fifo = true)
        .collect().map(r => r.ack_id -> r).toMap
      assert(srv.sigOk.asScala.forall(identity), "SigV4 verification failed")
      assert(out.count(_._2.ok) == 13)
      assert(!out("d2").ok && out("d2").err == "InternalFailure")
      val es = srv.entries.asScala.toVector
      assert(es.length == 14)
      assert(es.forall(e => e.contains("MessageGroupId") &&
        e.contains("MessageDeduplicationId") && e.contains("Message")))
    } finally srv.stop()
  }

  test("END TO END: the FIFO sns wire delivers with group + dedup identity") {
    implicit val s = spark
    val srv = new ScriptedSns()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(18)
      val wire = SinkAdapters.snsWire(cdc, "arn:aws:sns:t.fifo", isFifo = true)
      val out = SnsClient.deliver(SnsClient.requests(wire),
        s"http://127.0.0.1:${srv.port}/", creds, fifo = true).collect()
      assert(out.length == 18 && out.forall(_.ok))
      val wireIds = wire.select("message_dedup_id").collect()
        .map(_.getString(0)).toSet
      assert(out.map(_.ack_id).toSet == wireIds)
    } finally srv.stop()
  }

  test("FIFO + missing message_group_id fails the batch with a config " +
      "error instead of publishing an empty group; standard topics send " +
      "no FIFO fields") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedSns()
    try {
      val bad = Seq(SnsRequest("d1", "g1", None, "arn:aws:sns:t.fifo", "{}"))
      val out = SnsClient.deliver(spark.createDataset(bad),
        s"http://127.0.0.1:${srv.port}/", creds, fifo = true).collect()
      assert(out.length == 1 && !out.head.ok &&
        out.head.err.contains("message_group_id"), out.toSeq)
      // nothing reached the wire for the refused batch
      assert(srv.entries.asScala.isEmpty)
      // the SAME request against a STANDARD topic delivers without
      // FIFO-only parameters (the defaults-mismatch regression: deliver
      // and the wire adapter must agree on non-FIFO)
      val out2 = SnsClient.deliver(spark.createDataset(bad),
        s"http://127.0.0.1:${srv.port}/", creds).collect()
      assert(out2.length == 1 && out2.head.ok, out2.toSeq)
      val es = srv.entries.asScala.toVector
      assert(es.nonEmpty && es.forall(e => !e.contains("MessageGroupId") &&
        !e.contains("MessageDeduplicationId")))
    } finally srv.stop()
  }
}
