package graft

import graft.model.Cdc
import graft.sinks.{EsBulkClient, SinkAdapters}
import graft.sinks.EsBulkClient.EsRequest
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The Elasticsearch bulk client against a scripted loopback `_bulk`
  * endpoint: NDJSON crosses the socket, the items array maps back onto
  * the batch in request order, delete-of-absent counts as success
  * (client.ex:67-72), a poison item nacks ALONE, and batch-level
  * failures fail closed. Zero egress: 127.0.0.1 only.
  */
class EsBulkClientSpec extends SparkSpec {

  /** Parses each NDJSON action line; scripted per-doc-id failures and
    * per-doc-id 404s (for the delete-absent rule).
    */
  private final class ScriptedEs(failIds: Set[String] = Set.empty,
      missingIds: Set[String] = Set.empty, batchStatus: Int = 200) {
    val bodies = new ConcurrentLinkedQueue[String]()
    private val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        bodies.add(ex.getRequestURI.getPath + "\n" + body)
        val resp =
          if (batchStatus != 200) """{"error":"unavailable"}"""
          else {
            val items = body.split("\n").filter(_.nonEmpty).flatMap { line =>
              val node = mapper.readTree(line)
              if (node.has("index")) {
                val id = node.get("index").get("_id").asText()
                val st = if (failIds(id)) 400 else 201
                val err = if (failIds(id))
                  ""","error":{"type":"mapper_parsing_exception","reason":"poison doc"}"""
                else ""
                Some(s"""{"index":{"_id":"$id","status":$st$err}}""")
              } else if (node.has("delete")) {
                val id = node.get("delete").get("_id").asText()
                val st = if (failIds(id)) 409
                  else if (missingIds(id)) 404 else 200
                Some(s"""{"delete":{"_id":"$id","status":$st}}""")
              } else None // document payload line
            }
            s"""{"errors":false,"items":[${items.mkString(",")}]}"""
          }
        val bytes = resp.getBytes(UTF_8)
        ex.getResponseHeaders.set("content-type", "application/json")
        ex.sendResponseHeaders(batchStatus, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private def idx(id: String): EsRequest = EsRequest(id, s"g-$id", "index",
    s"""{"index":{"_index":"events","_id":"$id"}}\n{"v":1}""")
  private def del(id: String): EsRequest = EsRequest(id, s"g-$id", "delete",
    s"""{"delete":{"_index":"events","_id":"$id"}}""")

  test("per-item results: a poison doc nacks alone; delete-of-absent is success") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedEs(failIds = Set("bad1", "bad2"),
      missingIds = Set("gone"))
    try {
      val reqs = Seq(idx("a"), idx("bad1"), idx("b"),
        del("gone"), del("bad2"), del("c"))
      val out = EsBulkClient.deliver(spark.createDataset(reqs).repartition(1),
          s"http://127.0.0.1:${srv.port}", "events", batchSize = 10)
        .collect().map(r => r.ack_id -> r).toMap
      assert(out("a").ok && out("a").status == 201)
      assert(out("b").ok && out("c").ok)
      assert(out("gone").ok && out("gone").status == 404,
        "delete of an absent doc is success (client.ex:71)")
      assert(!out("bad1").ok && out("bad1").err.contains("poison"))
      assert(!out("bad2").ok && out("bad2").status == 409)
      // one _bulk POST carried all six operations as NDJSON
      val sent = srv.bodies.asScala.toVector
      assert(sent.length == 1 && sent.head.startsWith("/events/_bulk"))
      assert(sent.head.split("\n").count(_.nonEmpty) == 1 + 6 + 3) // path + 6 action + 3 doc lines
      val cmds = EsBulkClient.commands(EsBulkClient.deliver(
          spark.createDataset(reqs).repartition(1),
          s"http://127.0.0.1:${srv.port}", "events"))
        .collect().map(c => c.ack_id.get -> c.kind).toMap
      assert(cmds("a") == "ack" && cmds("gone") == "ack")
      assert(cmds("bad1") == "nack" && cmds("bad2") == "nack")
    } finally srv.stop()
  }

  test("batch-level failures fail the whole batch closed") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedEs(batchStatus = 503)
    try {
      val out = EsBulkClient.deliver(
          spark.createDataset(Seq(idx("a"), idx("b"))).repartition(1),
          s"http://127.0.0.1:${srv.port}", "events")
        .collect()
      assert(out.forall(r => !r.ok && r.status == 503))
    } finally srv.stop()
    // dead endpoint → transport error, status 0
    val tmp = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val dead = tmp.getAddress.getPort
    tmp.stop(0)
    val out2 = EsBulkClient.deliver(
        spark.createDataset(Seq(idx("a"))).repartition(1),
        s"http://127.0.0.1:$dead", "events")
      .collect()
    assert(out2.forall(r => !r.ok && r.status == 0 &&
      r.err.startsWith("transport error")))
  }

  test("END TO END: the esBulkWire delivers upserts and deletes with ledger identity") {
    implicit val s = spark
    val srv = new ScriptedEs()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(30)
      val wire = SinkAdapters.esBulkWire(cdc, index = "events")
      val out = EsBulkClient.deliver(EsBulkClient.requests(wire),
          s"http://127.0.0.1:${srv.port}", "events", batchSize = 10)
        .collect()
      assert(out.length == 30 && out.forall(_.ok))
      // results ack with the LEDGER identity (idempotency key + group)
      // so they land on AckDelivery's in-flight map, not the ES doc id
      val ledger = wire.select("ack_id", "ledger_group_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(out.map(r => (r.ack_id, r.group_id)).toSet == ledger)
      // deletes took the delete path (the cdc stream has 'error' deletes)
      assert(out.exists(_.op == "delete") && out.exists(_.op == "index"))
    } finally srv.stop()
  }
}
