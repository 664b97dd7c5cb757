package graft

import graft.model.Cdc
import graft.sinks.{SinkAdapters, SqsClient}
import graft.sinks.SqsClient.{Credentials, SqsRequest}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import scala.jdk.CollectionConverters._

/** The SQS client against a loopback SendMessageBatch endpoint whose
  * INDEPENDENT SigV4 verifier re-derives every request's signature from
  * the raw request and the shared secret (its own HMAC chain, not the
  * client's signer) — the signer is checked against the published
  * algorithm. Per-entry Successful/Failed outcomes; the API's 10-entry
  * batch cap enforced. Zero egress: 127.0.0.1 only.
  */
class SqsClientSpec extends SparkSpec {

  private val creds = Credentials("AKIDTEST", "sekrit", "us-test-1")

  // independent SigV4 implementation shared by the AWS-client specs

  private final class ScriptedSqs(failIds: Set[String] = Set.empty) {
    val entries = new ConcurrentLinkedQueue[String]() // raw entry JSON
    val sigOk = new ConcurrentLinkedQueue[Boolean]()
    val batchSizes = new ConcurrentLinkedQueue[Integer]()
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val payload = ex.getRequestBody.readAllBytes()
        val hs = ex.getRequestHeaders
        val amzDate = hs.getFirst("x-amz-date")
        val auth = hs.getFirst("authorization")
        // re-derive the signature INDEPENDENTLY and compare
        val headerSet = Seq(
          "content-type" -> hs.getFirst("content-type"),
          "host" -> hs.getFirst("host"),
          "x-amz-date" -> amzDate,
          "x-amz-target" -> hs.getFirst("x-amz-target"))
        val expected = SigV4TestVerifier.signature(creds.secretKey,
          creds.region, "sqs", amzDate, headerSet, payload)
        sigOk.add(auth != null && auth.endsWith(s"Signature=$expected") &&
          auth.contains(s"Credential=${creds.accessKey}/"))
        val root = mapper.readTree(new String(payload, UTF_8))
        val es = root.get("Entries")
        batchSizes.add(es.size())
        val ok = new StringBuilder
        val bad = new StringBuilder
        es.elements().asScala.foreach { e =>
          entries.add(e.toString)
          val id = e.get("Id").asText()
          if (failIds(id))
            bad.append(s"""{"Id":"$id","Code":"InternalError","SenderFault":false},""")
          else ok.append(s"""{"Id":"$id","MessageId":"m-$id"},""")
        }
        val resp = (s"""{"Successful":[${ok.toString.stripSuffix(",")}],""" +
          s""""Failed":[${bad.toString.stripSuffix(",")}]}""").getBytes(UTF_8)
        ex.getResponseHeaders.set("content-type", "application/x-amz-json-1.0")
        ex.sendResponseHeaders(200, resp.length.toLong)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  test("every request carries a VALID SigV4 signature (independently re-derived); 10-entry batch cap; FIFO fields ride each entry") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedSqs()
    try {
      val reqs = (1 to 23).map(i => SqsRequest(s"d$i", s"g${i % 3}",
        s"mg${i % 3}", "https://sqs.example/q", s"""{"n":$i}"""))
      val out = SqsClient.deliver(spark.createDataset(reqs).repartition(1),
        s"http://127.0.0.1:${srv.port}/", creds).collect()
      assert(out.length == 23 && out.forall(_.ok))
      assert(srv.sigOk.asScala.nonEmpty && srv.sigOk.asScala.forall(identity),
        "a request failed independent SigV4 verification")
      assert(srv.batchSizes.asScala.forall(_ <= 10),
        "SendMessageBatch allows at most 10 entries")
      assert(srv.batchSizes.asScala.map(_.intValue).sum == 23)
      val es = srv.entries.asScala.toVector
      assert(es.forall(e => e.contains("MessageGroupId") &&
        e.contains("MessageDeduplicationId")))
    } finally srv.stop()
  }

  test("a failed entry nacks alone; transport failures fail the batch closed") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedSqs(failIds = Set("d2"))
    try {
      val reqs = Seq(SqsRequest("d1", "g", "mg", "q", "a"),
        SqsRequest("d2", "g", "mg", "q", "b"), SqsRequest("d3", "g", "mg", "q", "c"))
      val out = SqsClient.deliver(spark.createDataset(reqs).repartition(1),
          s"http://127.0.0.1:${srv.port}/", creds)
        .collect().map(r => r.ack_id -> r).toMap
      assert(out("d1").ok && out("d3").ok)
      assert(!out("d2").ok && out("d2").err == "InternalError")
      val cmds = SqsClient.commands(SqsClient.deliver(
          spark.createDataset(reqs).repartition(1),
          s"http://127.0.0.1:${srv.port}/", creds))
        .collect().map(c => c.ack_id.get -> c.kind).toMap
      assert(cmds == Map("d1" -> "ack", "d2" -> "nack", "d3" -> "ack"))
    } finally srv.stop()
    val tmp = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val dead = tmp.getAddress.getPort
    tmp.stop(0)
    val out2 = SqsClient.deliver(
      spark.createDataset(Seq(SqsRequest("a", "g", "mg", "q", "x")))
        .repartition(1), s"http://127.0.0.1:$dead/", creds).collect()
    assert(out2.forall(r => !r.ok && r.err.startsWith("transport error")))
  }

  test("END TO END: the sqs wire delivers with group + dedup identity") {
    implicit val s = spark
    val srv = new ScriptedSqs()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(25)
      val wire = SinkAdapters.sqsWire(cdc, "https://sqs.example/q.fifo")
      val out = SqsClient.deliver(SqsClient.requests(wire),
        s"http://127.0.0.1:${srv.port}/", creds).collect()
      assert(out.length == 25 && out.forall(_.ok))
      val wireIds = wire.select("message_dedup_id").collect()
        .map(_.getString(0)).toSet
      assert(out.map(_.ack_id).toSet == wireIds)
      assert(srv.sigOk.asScala.forall(identity))
    } finally srv.stop()
  }
}
