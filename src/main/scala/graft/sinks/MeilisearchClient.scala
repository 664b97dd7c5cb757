package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** The Meilisearch delivery CLIENT — the TASK-BASED HTTP half of the
  * meilisearch sink: writes are asynchronous (`POST /indexes/<i>/
  * documents` with NDJSON → `{"taskUid": N}`), so delivery confirmation
  * means POLLING `GET /tasks/<N>` until the task leaves
  * enqueued/processing — the reference's `wait_for_task` retry loop
  * with capped exponential backoff (`meilisearch/client.ex:22-99`;
  * import `:101-120`, delete-batch `:142-160`, Bearer-key auth).
  *
  * Outcomes are TASK-granular (Meilisearch does not report per-document
  * results): a succeeded task acks its whole batch, a failed task nacks
  * it toward redelivery — matching the reference, which errors the
  * entire import on task failure.
  *
  * `realSleep = false` computes-but-skips the poll backoff (the
  * HttpPushClient spec convention) so specs stay fast while the polling
  * schedule is still exercised.
  */
object MeilisearchClient {

  final case class MsRequest(
      ack_id: String,      // = idempotency key (ledger identity)
      group_id: String,
      doc_id: String,
      index: String,
      op: String,          // import | delete
      document: Option[String])

  final case class MsResult(
      ack_id: String,
      group_id: String,
      index: String,
      op: String,
      ok: Boolean,
      task_uid: Long,
      polls: Int,
      err: String)

  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[MsRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"), col("doc_id"),
        col("index_name"), col("ms_action"), col("document"))
      .as[(String, String, String, String, String, Option[String])]
      .map { case (ackId, groupId, docId, index, action, doc) =>
        MsRequest(ackId, groupId, docId, index,
          if (action == "delete") "delete" else "import", doc)
      }
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def post(url: String, apiKey: String, contentType: String,
      body: String, timeoutMs: Long): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("authorization", s"Bearer $apiKey")
      .header("content-type", contentType)
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build(), HttpResponse.BodyHandlers.ofString())

  /** Poll the task until terminal; returns (succeeded, polls, error). */
  private def waitForTask(baseUrl: String, apiKey: String, taskUid: Long,
      maxPolls: Int, realSleep: Boolean,
      timeoutMs: Long): (Boolean, Int, String) = {
    var polls = 0
    while (polls < maxPolls) {
      val resp = client.send(HttpRequest.newBuilder(
          URI.create(s"$baseUrl/tasks/$taskUid"))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("authorization", s"Bearer $apiKey")
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      polls += 1
      if (resp.statusCode() == 200) {
        val status = Option(mapper.readTree(resp.body()).get("status"))
          .map(_.asText()).getOrElse("")
        status match {
          case "succeeded" => return (true, polls, "")
          case "failed" | "canceled" =>
            return (false, polls, s"task $taskUid $status")
          case _ => // enqueued | processing → back off and retry
            val delay = math.min(200L << (polls - 1), 10000L)
            if (realSleep) Thread.sleep(delay)
        }
      } else {
        val delay = math.min(200L << (polls - 1), 10000L)
        if (realSleep) Thread.sleep(delay)
      }
    }
    (false, polls, s"task $taskUid still pending after $maxPolls polls")
  }

  private def runBatch(baseUrl: String, apiKey: String,
      batch: Seq[MsRequest], maxPolls: Int, realSleep: Boolean,
      timeoutMs: Long): Seq[MsResult] = {
    val op = batch.head.op
    val fail = (msg: String) => batch.map(r =>
      MsResult(r.ack_id, r.group_id, r.index, r.op, ok = false, -1L, 0, msg))
    try {
      val resp =
        if (op == "delete")
          post(s"$baseUrl/indexes/${batch.head.index}/documents/delete-batch",
            apiKey, "application/json",
            batch.map(r => mapper.writeValueAsString(r.doc_id))
              .mkString("[", ",", "]"), timeoutMs)
        else
          post(s"$baseUrl/indexes/${batch.head.index}/documents",
            apiKey, "application/x-ndjson",
            batch.flatMap(_.document).mkString("\n"), timeoutMs)
      if (resp.statusCode() / 100 != 2)
        fail(s"request failed: ${resp.statusCode()}")
      else {
        val uid = Option(mapper.readTree(resp.body()).get("taskUid"))
          .map(_.asLong())
          .getOrElse(return fail("response missing taskUid"))
        val (ok, polls, err) = waitForTask(baseUrl, apiKey, uid, maxPolls,
          realSleep, timeoutMs)
        batch.map(r => MsResult(r.ack_id, r.group_id, r.index, r.op, ok, uid, polls, err))
      }
    } catch { case e: Exception =>
      fail(s"transport error: ${e.getClass.getSimpleName}")
    }
  }

  def deliver(reqs: Dataset[MsRequest], baseUrl: String, apiKey: String,
      batchSize: Int = 50, maxPolls: Int = 6, realSleep: Boolean = true,
      timeoutMs: Long = 15000)(
      implicit spark: SparkSession): Dataset[MsResult] = {
    import spark.implicits._
    reqs.mapPartitions { it =>
      val out = Vector.newBuilder[MsResult]
      val buf = it.buffered
      while (buf.hasNext) {
        val op = buf.head.op
        val chunk = Vector.newBuilder[MsRequest]
        var n = 0
        while (buf.hasNext && buf.head.op == op && n < batchSize) {
          chunk += buf.next(); n += 1
        }
        out ++= runBatch(baseUrl, apiKey, chunk.result(), maxPolls,
          realSleep, timeoutMs)
      }
      out.result().iterator
    }
  }

  def commands(results: Dataset[MsResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
