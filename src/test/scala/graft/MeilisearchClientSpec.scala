package graft

import graft.model.Cdc
import graft.sinks.{MeilisearchClient, SinkAdapters}
import graft.sinks.MeilisearchClient.MsRequest
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** The Meilisearch client against a loopback task-based server: NDJSON
  * imports and delete-batches answer with taskUids, the client POLLS
  * /tasks/<id> through scripted enqueued→processing→succeeded ladders
  * (or → failed), Bearer auth on every request. Zero egress. */
class MeilisearchClientSpec extends SparkSpec {

  /** Each task walks a scripted status ladder, advancing one step per
    * poll; tasks created for `failIndexes` end failed.
    */
  private final class ScriptedMeili(failIndexes: Set[String] = Set.empty) {
    val docs = new ConcurrentLinkedQueue[String]()
    val deletes = new ConcurrentLinkedQueue[String]()
    val auths = new ConcurrentLinkedQueue[String]()
    private val nextTask = new AtomicLong(700)
    private val taskState =
      new java.util.concurrent.ConcurrentHashMap[Long, (Int, Boolean)]()
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        auths.add(ex.getRequestHeaders.getFirst("authorization"))
        val path = ex.getRequestURI.getPath
        val resp: String =
          if (path.startsWith("/tasks/")) {
            val id = path.stripPrefix("/tasks/").toLong
            val (polls, willFail) = taskState.get(id)
            taskState.put(id, (polls + 1, willFail))
            val status =
              if (polls == 0) "enqueued"
              else if (polls == 1) "processing"
              else if (willFail) "failed"
              else "succeeded"
            s"""{"uid":$id,"status":"$status"}"""
          } else {
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            val index = path.split("/")(2)
            if (path.endsWith("/delete-batch"))
              mapper.readTree(body).elements().asScala
                .foreach(n => deletes.add(n.asText()))
            else body.split("\n").filter(_.nonEmpty).foreach(docs.add)
            val id = nextTask.incrementAndGet()
            taskState.put(id, (0, failIndexes(index)))
            s"""{"taskUid":$id,"status":"enqueued"}"""
          }
        val bytes = resp.getBytes(UTF_8)
        ex.getResponseHeaders.set("content-type", "application/json")
        ex.sendResponseHeaders(if (path.startsWith("/tasks/")) 200 else 202,
          bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  test("imports and delete-batches poll their tasks through to succeeded; a failed task nacks its batch") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedMeili(failIndexes = Set("broken"))
    try {
      val reqs = Seq(
        MsRequest("a", "ga", "a", "events", "import", Some("""{"id":"a"}""")),
        MsRequest("b", "gb", "b", "events", "import", Some("""{"id":"b"}""")),
        MsRequest("c", "gc", "c", "events", "delete", None),
        MsRequest("x", "gx", "x", "broken", "import", Some("""{"id":"x"}""")))
      val out = MeilisearchClient.deliver(
          spark.createDataset(reqs).repartition(1),
          s"http://127.0.0.1:${srv.port}", "meili-key", realSleep = false)
        .collect().map(r => r.ack_id -> r).toMap
      assert(out("a").ok && out("b").ok && out("c").ok)
      assert(out("a").task_uid == out("b").task_uid,
        "one import batch = one task")
      assert(out("c").op == "delete" && out("c").task_uid != out("a").task_uid)
      // the ladder forced enqueued → processing → succeeded = 3 polls
      assert(out("a").polls == 3)
      assert(!out("x").ok && out("x").err.contains("failed"))
      assert(srv.docs.asScala.size == 3)
      assert(srv.deletes.asScala.toVector == Vector("c"))
      assert(srv.auths.asScala.forall(_ == "Bearer meili-key"))
    } finally srv.stop()
  }

  test("END TO END: the meilisearch wire imports upserts and delete-batches deletes") {
    implicit val s = spark
    val srv = new ScriptedMeili()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(24)
      val wire = SinkAdapters.meilisearchWire(cdc, indexName = "events")
      val out = MeilisearchClient.deliver(MeilisearchClient.requests(wire),
        s"http://127.0.0.1:${srv.port}", "meili-key", realSleep = false)
        .collect()
      assert(out.length == 24 && out.forall(_.ok))
      assert(out.exists(_.op == "delete") && out.exists(_.op == "import"))
    } finally srv.stop()
  }
}
