package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** The Azure Event Hub delivery CLIENT — the REST data plane the
  * reference uses (`/root/reference/lib/sequin/sinks/azure/
  * event_hub.ex`): `POST <namespace>/<hub>/messages` with a JSON array
  * of `{"Body": ...}` envelopes and the servicebus content type
  * (`:34-47,95-104`), authorized by a SHARED ACCESS SIGNATURE — HMAC-
  * SHA256 over `url-encoded-uri + "\n" + expiry` rendered as
  * `SharedAccessSignature sr=...&sig=...&se=...&skn=...`
  * (`:107-120`). Success is 201; outcomes are batch-granular (the REST
  * plane has no per-message results).
  *
  * The spec's loopback namespace VERIFIES every SAS token by
  * recomputing the HMAC from its own URL and the shared key —
  * the token generator is checked against the algorithm.
  */
object EventHubClient {

  final case class SasCredentials(keyName: String, key: String)

  final case class EhRequest(
      ack_id: String,
      group_id: String,
      hub: String,
      partition_key: String,
      body: String)

  final case class EhResult(
      ack_id: String,
      group_id: String,
      hub: String,
      ok: Boolean,
      err: String)

  /** [[SinkAdapters.eventHubWire]] rows → requests. */
  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[EhRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"),
        col("event_hub_name"), col("partition_key"), col("body"))
      .as[(String, String, String, String, String)]
      .map { case (ackId, groupId, hub, pk, body) =>
        EhRequest(ackId, groupId, hub, pk, body)
      }
  }

  private def wwwFormEncode(s: String): String =
    URLEncoder.encode(s, "UTF-8") // '+' for spaces — encode_www_form parity

  /** The SAS token for `url`, valid until `expiryEpochS`
    * (event_hub.ex:107-120, bit for bit).
    */
  def sasToken(url: String, creds: SasCredentials,
      expiryEpochS: Long): String = {
    val sr = wwwFormEncode(url)
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(creds.key.getBytes(UTF_8), "HmacSHA256"))
    val sig = wwwFormEncode(java.util.Base64.getEncoder.encodeToString(
      mac.doFinal(s"$sr\n$expiryEpochS".getBytes(UTF_8))))
    s"SharedAccessSignature sr=$sr&sig=$sig&se=$expiryEpochS&skn=${creds.keyName}"
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def postBatch(endpoint: String, creds: SasCredentials,
      batch: Seq[EhRequest], timeoutMs: Long): Seq[EhResult] = {
    val fail = (msg: String) =>
      batch.map(r => EhResult(r.ack_id, r.group_id, r.hub, ok = false, msg))
    try {
      val url = s"$endpoint/${batch.head.hub}/messages"
      val expiry = System.currentTimeMillis() / 1000 + 3600
      val payload = batch.map(r =>
        s"""{"Body":${mapper.writeValueAsString(r.body)},""" +
          s""""BrokerProperties":{"PartitionKey":${mapper.writeValueAsString(r.partition_key)}}}""")
        .mkString("[", ",", "]")
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("authorization", sasToken(url, creds, expiry))
        .header("content-type", "application/vnd.microsoft.servicebus.json")
        .POST(HttpRequest.BodyPublishers.ofString(payload))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 201)
        batch.map(r => EhResult(r.ack_id, r.group_id, r.hub, ok = true, ""))
      else fail(s"publish failed: ${resp.statusCode()}")
    } catch { case e: Exception =>
      fail(s"transport error: ${e.getClass.getSimpleName}")
    }
  }

  def deliver(reqs: Dataset[EhRequest], endpoint: String,
      creds: SasCredentials, batchSize: Int = 100, timeoutMs: Long = 15000)(
      implicit spark: SparkSession): Dataset[EhResult] = {
    import spark.implicits._
    reqs.mapPartitions { it =>
      val out = Vector.newBuilder[EhResult]
      val buf = it.buffered
      while (buf.hasNext) {
        val hub = buf.head.hub
        val chunk = Vector.newBuilder[EhRequest]
        var n = 0
        while (buf.hasNext && buf.head.hub == hub && n < batchSize) {
          chunk += buf.next(); n += 1
        }
        out ++= postBatch(endpoint, creds, chunk.result(), timeoutMs)
      }
      out.result().iterator
    }
  }

  def commands(results: Dataset[EhResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}

/** The S2 delivery CLIENT — `POST /streams/<s>/records` with
  * `{"records": [{"body": ...}]}` under a Bearer token
  * (`/root/reference/lib/sequin/sinks/s2/client.ex:114-138`), 2xx =
  * the batch appended (batch-granular outcomes, like the reference's
  * `:ok`).
  */
object S2Client {

  final case class S2Request(
      ack_id: String,
      group_id: String,
      basin: String,
      stream: String,
      body: String)

  final case class S2Result(
      ack_id: String,
      group_id: String,
      stream: String,
      ok: Boolean,
      err: String)

  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[S2Request] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"),
        col("basin"), col("stream"), col("body"))
      .as[(String, String, String, String, String)]
      .map { case (ackId, groupId, basin, stream, body) =>
        S2Request(ackId, groupId, basin, stream, body)
      }
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def deliver(reqs: Dataset[S2Request], endpoint: String,
      accessToken: String, batchSize: Int = 100, timeoutMs: Long = 15000)(
      implicit spark: SparkSession): Dataset[S2Result] = {
    import spark.implicits._
    reqs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val fail = (msg: String) =>
          batch.map(r => S2Result(r.ack_id, r.group_id, r.stream, ok = false, msg))
        try {
          val records = batch.map(r =>
            s"""{"body":${mapper.writeValueAsString(r.body)}}""")
            .mkString("[", ",", "]")
          val req = HttpRequest.newBuilder(URI.create(
              s"$endpoint/streams/${batch.head.stream}/records"))
            .timeout(Duration.ofMillis(timeoutMs))
            .header("authorization", s"Bearer $accessToken")
            .header("content-type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(
              s"""{"records":$records}"""))
            .build()
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() / 100 == 2)
            batch.map(r => S2Result(r.ack_id, r.group_id, r.stream, ok = true, ""))
          else fail(s"append failed: ${resp.statusCode()}")
        } catch { case e: Exception =>
          fail(s"transport error: ${e.getClass.getSimpleName}")
        }
      }
    }
  }

  def commands(results: Dataset[S2Result])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
