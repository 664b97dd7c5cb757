package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** The Elasticsearch bulk delivery CLIENT — the HTTP half of the
  * elasticsearch sink: `POST /<index>/_bulk` with NDJSON bodies and
  * PER-ITEM result parsing from the bulk response.
  *
  * Reference semantics (`/root/reference/lib/sequin/sinks/
  * elasticsearch/client.ex`): NDJSON to `/{index}/_bulk` with
  * `application/x-ndjson` (`:27-35`); a 200 response's `items` array is
  * mapped per operation — `index` ok on 200/201, `delete` ok on 200 AND
  * 404 (deleting an absent doc is success, `:67-72`), anything else is
  * that ITEM's error with its message (`:77`); non-200 responses and
  * transport errors fail the whole batch (`:38-52`).
  *
  * This is the one transport where per-message outcomes arrive in a
  * BATCH response rather than per-request — the client zips the items
  * array (which Elasticsearch returns in request order) back onto the
  * submitted doc ids, so a single poison document nacks alone instead
  * of failing its whole batch.
  *
  * Scale shape: one pooled HttpClient per executor JVM, batches POSTed
  * sequentially within a partition (wire order), partitions in
  * parallel. Egress: dials only the base URL it is given; the spec
  * runs a 127.0.0.1 listener.
  */
object EsBulkClient {

  final case class EsRequest(
      ack_id: String,   // = idempotency key (ledger identity)
      group_id: String,
      op: String,       // index | delete
      bulk_lines: String)

  final case class EsResult(
      ack_id: String,
      group_id: String,
      op: String,
      ok: Boolean,
      status: Int,
      err: String)

  /** [[SinkAdapters.esBulkWire]] rows → requests (op sniffed from the
    * action line the wire built).
    */
  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[EsRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"), col("bulk_lines"))
      .as[(String, String, String)]
      .map { case (ackId, groupId, lines) =>
        val op = if (lines.startsWith("""{"delete"""")) "delete" else "index"
        EsRequest(ackId, groupId, op, lines)
      }
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** POST one NDJSON batch and map the items array back onto the batch
    * in request order. Returns per-item results, or a uniform failure
    * when the response itself fails (non-200 / transport / malformed).
    */
  private def postBatch(baseUrl: String, index: String,
      batch: Seq[EsRequest], timeoutMs: Long): Seq[EsResult] = {
    val ndjson = batch.map(_.bulk_lines).mkString("", "\n", "\n")
    val fail = (status: Int, msg: String) =>
      batch.map(r => EsResult(r.ack_id, r.group_id, r.op, ok = false, status, msg))
    try {
      val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/$index/_bulk"))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("content-type", "application/x-ndjson")
        .POST(HttpRequest.BodyPublishers.ofString(ndjson))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        fail(resp.statusCode(), s"bulk request failed: ${resp.statusCode()}")
      else {
        val root = mapper.readTree(resp.body())
        val items = root.get("items")
        if (items == null || !items.isArray || items.size() != batch.size)
          fail(0, "malformed bulk response")
        else batch.zipWithIndex.map { case (r, i) =>
          val item = items.get(i)
          val opNode = Option(item.get(r.op)).getOrElse(item.elements().next())
          val status = Option(opNode.get("status")).map(_.asInt()).getOrElse(0)
          val ok = r.op match {
            case "delete" => status == 200 || status == 404
            case _        => status == 200 || status == 201
          }
          val err =
            if (ok) ""
            else Option(opNode.get("error"))
              .flatMap(e => Option(e.get("reason")).map(_.asText()))
              .getOrElse(s"status $status")
          EsResult(r.ack_id, r.group_id, r.op, ok, status, err)
        }
      }
    } catch { case e: Exception =>
      fail(0, s"transport error: ${e.getClass.getSimpleName}")
    }
  }

  def deliver(reqs: Dataset[EsRequest], baseUrl: String, index: String,
      batchSize: Int = 100, timeoutMs: Long = 15000)(
      implicit spark: SparkSession): Dataset[EsResult] = {
    import spark.implicits._
    reqs.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch =>
        postBatch(baseUrl, index, batch.toSeq, timeoutMs))
    }
  }

  def commands(results: Dataset[EsResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
