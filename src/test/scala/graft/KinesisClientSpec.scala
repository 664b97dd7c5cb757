package graft

import graft.model.Cdc
import graft.sinks.{KinesisClient, SinkAdapters, SqsClient}
import graft.sinks.KinesisClient.KinesisRequest
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The Kinesis client against a loopback PutRecords endpoint with the
  * shared independent SigV4 verifier (service `kinesis`): positional
  * per-record outcomes, base64 payloads intact, partition keys as the
  * ordering identity. Zero egress: 127.0.0.1 only.
  */
class KinesisClientSpec extends SparkSpec {

  private val creds = SqsClient.Credentials("AKIDTEST", "sekrit", "us-test-1")

  private final class ScriptedKinesis(failKeys: Set[String] = Set.empty) {
    val records = new ConcurrentLinkedQueue[(String, String)]() // (pk, data)
    val sigOk = new ConcurrentLinkedQueue[Boolean]()
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val payload = ex.getRequestBody.readAllBytes()
        val hs = ex.getRequestHeaders
        val amzDate = hs.getFirst("x-amz-date")
        val expected = SigV4TestVerifier.signature(creds.secretKey,
          creds.region, "kinesis", amzDate, Seq(
            "content-type" -> hs.getFirst("content-type"),
            "host" -> hs.getFirst("host"),
            "x-amz-date" -> amzDate,
            "x-amz-target" -> hs.getFirst("x-amz-target")), payload)
        sigOk.add(Option(hs.getFirst("authorization"))
          .exists(_.endsWith(s"Signature=$expected")))
        val root = mapper.readTree(new String(payload, UTF_8))
        var seq = 49000L
        val out = new StringBuilder
        root.get("Records").elements().asScala.foreach { r =>
          val pk = r.get("PartitionKey").asText()
          val data = r.get("Data").asText()
          records.add(pk -> data)
          if (failKeys(pk))
            out.append("""{"ErrorCode":"ProvisionedThroughputExceededException","ErrorMessage":"slow down"},""")
          else {
            seq += 1
            out.append(s"""{"SequenceNumber":"$seq","ShardId":"shardId-0"},""")
          }
        }
        val resp = (s"""{"FailedRecordCount":${records.asScala.count(r => failKeys(r._1))},""" +
          s""""Records":[${out.toString.stripSuffix(",")}]}""").getBytes(UTF_8)
        ex.getResponseHeaders.set("content-type", "application/x-amz-json-1.1")
        ex.sendResponseHeaders(200, resp.length.toLong)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  test("signed PutRecords with positional per-record outcomes; throttled records nack alone") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedKinesis(failKeys = Set("hot"))
    try {
      val reqs = Seq(
        KinesisRequest("a", "ga", "k1", "arn:stream", "QUJD"),
        KinesisRequest("b", "gb", "hot", "arn:stream", "REVG"),
        KinesisRequest("c", "gc", "k2", "arn:stream", "R0hJ"))
      val out = KinesisClient.deliver(spark.createDataset(reqs).repartition(1),
          s"http://127.0.0.1:${srv.port}/", creds)
        .collect().map(r => r.ack_id -> r).toMap
      assert(srv.sigOk.asScala.forall(identity), "SigV4 verification failed")
      assert(out("a").ok && out("a").sequence_number.nonEmpty)
      assert(out("c").ok)
      assert(!out("b").ok &&
        out("b").err == "ProvisionedThroughputExceededException")
      assert(srv.records.asScala.toVector.map(_._2) ==
        Vector("QUJD", "REVG", "R0hJ"), "base64 payloads must pass through")
      assert(KinesisClient.deliver(spark.createDataset(reqs).repartition(1),
        s"http://127.0.0.1:${srv.port}/", creds)
        .collect().length == 3)
      intercept[IllegalArgumentException](KinesisClient.deliver(
        spark.createDataset(reqs), "http://x/", creds, batchSize = 501))
    } finally srv.stop()
  }

  test("END TO END: the kinesis wire delivers with truncated partition keys") {
    implicit val s = spark
    val srv = new ScriptedKinesis()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(20)
      val wire = SinkAdapters.kinesisWire(cdc, "arn:aws:kinesis:stream/s")
      val out = KinesisClient.deliver(KinesisClient.requests(wire),
        s"http://127.0.0.1:${srv.port}/", creds).collect()
      assert(out.length == 20 && out.forall(_.ok))
      assert(srv.sigOk.asScala.forall(identity))
      val got = srv.records.asScala.toVector
      assert(got.length == 20 && got.forall(_._1.length <= 256))
    } finally srv.stop()
  }
}
