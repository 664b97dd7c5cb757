package graft

import graft.model.Cdc
import graft.sinks.{SinkAdapters, TypesenseClient}
import graft.sinks.TypesenseClient.TsRequest
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The Typesense client against a loopback import/delete endpoint:
  * JSONL emplace with positional per-line outcomes (a rejected doc
  * nacks alone), per-document deletes with ignore_not_found, API key on
  * every request. Zero egress: 127.0.0.1 only.
  */
class TypesenseClientSpec extends SparkSpec {

  private final class ScriptedTypesense(rejectIds: Set[String] = Set.empty) {
    val imported = new ConcurrentLinkedQueue[String]()
    val deleted = new ConcurrentLinkedQueue[String]()
    val apiKeys = new ConcurrentLinkedQueue[String]()
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        apiKeys.add(ex.getRequestHeaders.getFirst("X-TYPESENSE-API-KEY"))
        val path = ex.getRequestURI.getPath
        val resp: (Int, String) =
          if (ex.getRequestMethod == "DELETE") {
            val id = path.split("/").last
            deleted.add(id)
            (200, s"""{"id":"$id"}""")
          } else {
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            val lines = body.split("\n").filter(_.nonEmpty)
            val out = lines.map { line =>
              imported.add(line)
              val id = mapper.readTree(line).get("id").asText()
              if (rejectIds(id))
                """{"success":false,"error":"schema mismatch"}"""
              else """{"success":true}"""
            }
            (200, out.mkString("\n"))
          }
        val bytes = resp._2.getBytes(UTF_8)
        ex.sendResponseHeaders(resp._1, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  test("JSONL emplace with positional outcomes; deletes interleave in wire order") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedTypesense(rejectIds = Set("r2"))
    try {
      val reqs = Seq(
        TsRequest("r1", "g1", "r1", "events", "emplace", Some("""{"id":"r1","v":1}""")),
        TsRequest("r2", "g2", "r2", "events", "emplace", Some("""{"id":"r2","v":2}""")),
        TsRequest("r3", "g3", "r3", "events", "delete", None),
        TsRequest("r4", "g4", "r4", "events", "emplace", Some("""{"id":"r4","v":4}""")))
      val out = TypesenseClient.deliver(
          spark.createDataset(reqs).repartition(1),
          s"http://127.0.0.1:${srv.port}", "ts-key")
        .collect().map(r => r.ack_id -> r).toMap
      assert(out("r1").ok && out("r4").ok)
      assert(!out("r2").ok && out("r2").err.contains("schema mismatch"))
      assert(out("r3").ok && out("r3").op == "delete")
      assert(srv.deleted.asScala.toVector == Vector("r3"))
      assert(srv.imported.asScala.size == 3)
      assert(srv.apiKeys.asScala.forall(_ == "ts-key"))
      val cmds = TypesenseClient.commands(TypesenseClient.deliver(
          spark.createDataset(reqs).repartition(1),
          s"http://127.0.0.1:${srv.port}", "ts-key"))
        .collect().map(c => c.ack_id.get -> c.kind).toMap
      assert(cmds == Map("r1" -> "ack", "r2" -> "nack", "r3" -> "ack",
        "r4" -> "ack"))
    } finally srv.stop()
  }

  test("END TO END: the typesense wire emplaces upserts and deletes deletes") {
    implicit val s = spark
    val srv = new ScriptedTypesense()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(30)
      val wire = SinkAdapters.typesenseWire(cdc)
      val out = TypesenseClient.deliver(TypesenseClient.requests(wire),
        s"http://127.0.0.1:${srv.port}", "ts-key").collect()
      assert(out.length == 30 && out.forall(_.ok))
      assert(out.exists(_.op == "delete") && out.exists(_.op == "emplace"))
      // results ack with the LEDGER identity (idempotency key + group),
      // not the typesense doc id — that's what AckDelivery keys by
      val ledger = wire.select("ack_id", "ledger_group_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(out.map(r => (r.ack_id, r.group_id)).toSet == ledger)
    } finally srv.stop()
  }
}
