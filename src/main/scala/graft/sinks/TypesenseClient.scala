package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** The Typesense delivery CLIENT — the HTTP half of the typesense sink:
  * JSONL emplace imports with POSITIONAL per-line outcomes, and
  * per-document deletes with the `ignore_not_found` contract.
  *
  * Reference semantics (`/root/reference/lib/sequin/sinks/typesense/
  * client.ex`): `POST /collections/<c>/documents/import?action=emplace`
  * with the `X-TYPESENSE-API-KEY` header (`:91-115`) — the 200 response
  * body is JSONL, one `{"success": bool}` per submitted line in order
  * (`:111-115`), so a rejected document nacks alone; deletes are
  * `DELETE /collections/<c>/documents/<id>?ignore_not_found=true`
  * (`:161-171`), success 2xx.
  */
object TypesenseClient {

  final case class TsRequest(
      ack_id: String,      // = idempotency key (ledger identity)
      group_id: String,
      doc_id: String,
      collection: String,
      op: String,          // emplace | delete
      document: Option[String])

  final case class TsResult(
      ack_id: String,
      group_id: String,
      collection: String,
      op: String,
      ok: Boolean,
      err: String)

  /** [[SinkAdapters.typesenseWire]] rows → requests. */
  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[TsRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"), col("doc_id"),
        col("collection_name"), col("ts_action"), col("document"))
      .as[(String, String, String, String, String, Option[String])]
      .map { case (ackId, groupId, docId, coll, action, doc) =>
        TsRequest(ackId, groupId, docId, coll,
          if (action == "delete") "delete" else "emplace", doc)
      }
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def importBatch(baseUrl: String, apiKey: String,
      batch: Seq[TsRequest], timeoutMs: Long): Seq[TsResult] = {
    val fail = (msg: String) => batch.map(r =>
      TsResult(r.ack_id, r.group_id, r.collection, r.op, ok = false, msg))
    try {
      val body = batch.flatMap(_.document).mkString("\n")
      val req = HttpRequest.newBuilder(URI.create(
          s"$baseUrl/collections/${batch.head.collection}/documents/import?action=emplace"))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("X-TYPESENSE-API-KEY", apiKey)
        .header("content-type", "text/plain")
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        fail(s"import failed: ${resp.statusCode()}")
      else {
        val lines = resp.body().split("\n").filter(_.nonEmpty)
        if (lines.length != batch.size) fail("malformed import response")
        else batch.zip(lines).map { case (r, line) =>
          val node = mapper.readTree(line)
          val ok = Option(node.get("success")).exists(_.asBoolean(false))
          TsResult(r.ack_id, r.group_id, r.collection, r.op, ok,
            if (ok) "" else Option(node.get("error")).map(_.asText())
              .getOrElse("rejected"))
        }
      }
    } catch { case e: Exception =>
      fail(s"transport error: ${e.getClass.getSimpleName}")
    }
  }

  private def deleteOne(baseUrl: String, apiKey: String, r: TsRequest,
      timeoutMs: Long): TsResult =
    try {
      val req = HttpRequest.newBuilder(URI.create(
          s"$baseUrl/collections/${r.collection}/documents/${r.doc_id}?ignore_not_found=true"))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("X-TYPESENSE-API-KEY", apiKey)
        .DELETE()
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      val ok = resp.statusCode() >= 200 && resp.statusCode() < 300
      TsResult(r.ack_id, r.group_id, r.collection, r.op, ok,
        if (ok) "" else s"delete failed: ${resp.statusCode()}")
    } catch { case e: Exception =>
      TsResult(r.ack_id, r.group_id, r.collection, r.op, ok = false,
        s"transport error: ${e.getClass.getSimpleName}")
    }

  /** Deliver: consecutive emplace runs batch into one JSONL import
    * (positional outcomes), deletes go per-document — preserving wire
    * order within the partition, like the reference pipeline.
    */
  def deliver(reqs: Dataset[TsRequest], baseUrl: String, apiKey: String,
      batchSize: Int = 40, timeoutMs: Long = 15000)(
      implicit spark: SparkSession): Dataset[TsResult] = {
    import spark.implicits._
    reqs.mapPartitions { it =>
      val out = Vector.newBuilder[TsResult]
      val buf = it.buffered
      while (buf.hasNext) {
        if (buf.head.op == "delete")
          out += deleteOne(baseUrl, apiKey, buf.next(), timeoutMs)
        else {
          val chunk = Vector.newBuilder[TsRequest]
          var n = 0
          while (buf.hasNext && buf.head.op != "delete" && n < batchSize) {
            chunk += buf.next(); n += 1
          }
          out ++= importBatch(baseUrl, apiKey, chunk.result(), timeoutMs)
        }
      }
      out.result().iterator
    }
  }

  def commands(results: Dataset[TsResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
