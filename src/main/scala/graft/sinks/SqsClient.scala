package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 — the public request-signing algorithm every
  * AWS transport rides on (canonical request → string-to-sign → the
  * four-step HMAC-SHA256 key derivation → hex signature). Implemented
  * from the published spec; the SQS spec's loopback server VERIFIES
  * signatures by re-deriving them independently, so the signer is
  * checked against the algorithm, not itself.
  */
object SigV4 {

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  def sha256Hex(data: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(data)
    d.map("%02x".format(_)).mkString
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  /** Canonical request for a POST with no query string; `headers` must
    * already be lowercase-keyed and will be signed in sorted order.
    */
  def canonicalRequest(path: String, headers: Seq[(String, String)],
      payload: Array[Byte]): (String, String) = {
    val sorted = headers.sortBy(_._1)
    val signedHeaders = sorted.map(_._1).mkString(";")
    val canonical = "POST\n" + path + "\n\n" +
      sorted.map { case (k, v) => s"$k:${v.trim}\n" }.mkString +
      "\n" + signedHeaders + "\n" + sha256Hex(payload)
    (canonical, signedHeaders)
  }

  /** The Authorization header value for one request. */
  def authorization(accessKey: String, secretKey: String, region: String,
      service: String, amzDate: String, path: String,
      headers: Seq[(String, String)], payload: Array[Byte]): String = {
    val date = amzDate.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val (canonical, signedHeaders) = canonicalRequest(path, headers, payload)
    val stringToSign = "AWS4-HMAC-SHA256\n" + amzDate + "\n" + scope +
      "\n" + sha256Hex(canonical.getBytes(UTF_8))
    val kSigning = hmac(hmac(hmac(hmac(
      ("AWS4" + secretKey).getBytes(UTF_8), date), region), service),
      "aws4_request")
    val signature = hex(hmac(kSigning, stringToSign))
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }
}

/** The SQS delivery CLIENT — the HTTP half of the sqs sink: signed
  * `SendMessageBatch` calls on the AWS JSON 1.0 protocol
  * (`X-Amz-Target: AmazonSQS.SendMessageBatch`), batches capped at the
  * API's 10-entry limit, per-entry outcomes from the
  * `Successful`/`Failed` arrays (a poisoned entry nacks alone).
  *
  * Reference semantics (`/root/reference/lib/sequin/aws/sqs.ex:83-120`):
  * entries carry Id / MessageBody / MessageGroupId /
  * MessageDeduplicationId — exactly [[SinkAdapters.sqsWire]]'s columns
  * (FIFO ordering unit + exactly-once dedup id ride the entry).
  *
  * Egress: the endpoint is the caller's; the spec's loopback server
  * VERIFIES each request's SigV4 signature by re-deriving it.
  */
object SqsClient {

  final case class SqsRequest(
      ack_id: String,      // ledger identity (idempotency key)
      group_id: String,    // ledger group (acks key AckDelivery by this)
      message_group_id: String, // FIFO ordering unit ON THE WIRE
      queue_url: String,
      body: String)

  final case class SqsResult(
      ack_id: String,
      group_id: String,
      ok: Boolean,
      err: String)

  final case class Credentials(accessKey: String, secretKey: String,
      region: String)

  /** [[SinkAdapters.sqsWire]] rows → requests. */
  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[SqsRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"),
        col("message_group_id"), col("queue_url"), col("body"))
      .as[(String, String, String, String, String)]
      .map { case (ackId, group, msgGroup, queue, body) =>
        SqsRequest(ackId, group, msgGroup, queue, body)
      }
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def jstr(s: String): String = mapper.writeValueAsString(s)

  private def sendBatch(endpoint: String, creds: Credentials,
      batch: Seq[SqsRequest], timeoutMs: Long): Seq[SqsResult] = {
    val fail = (msg: String) =>
      batch.map(r => SqsResult(r.ack_id, r.group_id, ok = false, msg))
    try {
      val entries = batch.map { r =>
        s"""{"Id":${jstr(r.ack_id)},"MessageBody":${jstr(r.body)},""" +
          s""""MessageGroupId":${jstr(r.message_group_id)},""" +
          s""""MessageDeduplicationId":${jstr(r.ack_id)}}"""
      }.mkString("[", ",", "]")
      val payload =
        s"""{"QueueUrl":${jstr(batch.head.queue_url)},"Entries":$entries}"""
          .getBytes(UTF_8)
      val uri = URI.create(endpoint)
      val amzDate = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd'T'HHmmss'Z'")
        .format(java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC))
      val host = uri.getHost + (if (uri.getPort > 0) s":${uri.getPort}" else "")
      val signed = Seq(
        "content-type" -> "application/x-amz-json-1.0",
        "host" -> host,
        "x-amz-date" -> amzDate,
        "x-amz-target" -> "AmazonSQS.SendMessageBatch")
      val auth = SigV4.authorization(creds.accessKey, creds.secretKey,
        creds.region, "sqs", amzDate, "/", signed, payload)
      val req = HttpRequest.newBuilder(uri)
        .timeout(Duration.ofMillis(timeoutMs))
        .header("content-type", "application/x-amz-json-1.0")
        .header("x-amz-date", amzDate)
        .header("x-amz-target", "AmazonSQS.SendMessageBatch")
        .header("authorization", auth)
        .POST(HttpRequest.BodyPublishers.ofByteArray(payload))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        fail(s"sqs request failed: ${resp.statusCode()}")
      else {
        val root = mapper.readTree(resp.body())
        val okIds = Option(root.get("Successful")).toSeq
          .flatMap(_.elements().asScala().map(_.get("Id").asText()))
          .toSet
        val failed = Option(root.get("Failed")).toSeq
          .flatMap(_.elements().asScala().map(n =>
            n.get("Id").asText() ->
              Option(n.get("Code")).map(_.asText()).getOrElse("failed")))
          .toMap
        batch.map { r =>
          if (okIds(r.ack_id)) SqsResult(r.ack_id, r.group_id, ok = true, "")
          else SqsResult(r.ack_id, r.group_id, ok = false,
            failed.getOrElse(r.ack_id, "missing from response"))
        }
      }
    } catch { case e: Exception =>
      fail(s"transport error: ${e.getClass.getSimpleName}")
    }
  }

  // scala.jdk CollectionConverters shim for Jackson's java iterators
  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala(): Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  /** Deliver in ≤10-entry batches (the SendMessageBatch API limit),
    * sequential within a partition, partitions in parallel.
    */
  def deliver(reqs: Dataset[SqsRequest], endpoint: String,
      creds: Credentials, timeoutMs: Long = 15000)(
      implicit spark: SparkSession): Dataset[SqsResult] = {
    import spark.implicits._
    reqs.mapPartitions { it =>
      it.grouped(10).flatMap(batch =>
        sendBatch(endpoint, creds, batch.toSeq, timeoutMs))
    }
  }

  def commands(results: Dataset[SqsResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
