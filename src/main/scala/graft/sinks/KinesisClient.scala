package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** The Kinesis delivery CLIENT — `PutRecords` on the AWS JSON 1.1
  * protocol (`X-Amz-Target: Kinesis_20131202.PutRecords`), signed with
  * the same [[SigV4]] the SQS client uses (service `kinesis`).
  * Per-record outcomes: the response's `Records` array is positional —
  * a `SequenceNumber` acks that record, an `ErrorCode` nacks it alone
  * (the reference surfaces `FailedRecordCount`, `aws/kinesis.ex:31-59`;
  * per-record resolution is the same information at ack granularity).
  *
  * [[SinkAdapters.kinesisWire]] provides (stream_arn, partition_key,
  * base64 data) — the partition key is the FIFO/ordering unit.
  */
object KinesisClient {

  final case class KinesisRequest(
      ack_id: String,
      group_id: String,
      partition_key: String,
      stream_arn: String,
      data_b64: String)

  final case class KinesisResult(
      ack_id: String,
      group_id: String,
      partition_key: String,
      ok: Boolean,
      sequence_number: String,
      err: String)

  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[KinesisRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"),
        col("stream_arn"), col("partition_key"), col("data"))
      .as[(String, String, String, String, String)]
      .map { case (ackId, groupId, arn, pk, data) =>
        KinesisRequest(ackId, groupId, pk, arn, data)
      }
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def jstr(s: String): String = mapper.writeValueAsString(s)

  private def putBatch(endpoint: String, creds: SqsClient.Credentials,
      batch: Seq[KinesisRequest], timeoutMs: Long): Seq[KinesisResult] = {
    val fail = (msg: String) => batch.map(r =>
      KinesisResult(r.ack_id, r.group_id, r.partition_key, ok = false, "", msg))
    try {
      val records = batch.map { r =>
        s"""{"Data":${jstr(r.data_b64)},"PartitionKey":${jstr(r.partition_key)}}"""
      }.mkString("[", ",", "]")
      val payload =
        s"""{"StreamARN":${jstr(batch.head.stream_arn)},"Records":$records}"""
          .getBytes(UTF_8)
      val uri = URI.create(endpoint)
      val amzDate = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd'T'HHmmss'Z'")
        .format(java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC))
      val host = uri.getHost + (if (uri.getPort > 0) s":${uri.getPort}" else "")
      val signed = Seq(
        "content-type" -> "application/x-amz-json-1.1",
        "host" -> host,
        "x-amz-date" -> amzDate,
        "x-amz-target" -> "Kinesis_20131202.PutRecords")
      val auth = SigV4.authorization(creds.accessKey, creds.secretKey,
        creds.region, "kinesis", amzDate, "/", signed, payload)
      val req = HttpRequest.newBuilder(uri)
        .timeout(Duration.ofMillis(timeoutMs))
        .header("content-type", "application/x-amz-json-1.1")
        .header("x-amz-date", amzDate)
        .header("x-amz-target", "Kinesis_20131202.PutRecords")
        .header("authorization", auth)
        .POST(HttpRequest.BodyPublishers.ofByteArray(payload))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        fail(s"kinesis request failed: ${resp.statusCode()}")
      else {
        val root = mapper.readTree(resp.body())
        val items = root.get("Records")
        if (items == null || !items.isArray || items.size() != batch.size)
          fail("malformed PutRecords response")
        else batch.zipWithIndex.map { case (r, i) =>
          val item = items.get(i)
          val seq = Option(item.get("SequenceNumber")).map(_.asText())
          seq match {
            case Some(sn) =>
              KinesisResult(r.ack_id, r.group_id, r.partition_key, ok = true, sn, "")
            case None =>
              KinesisResult(r.ack_id, r.group_id, r.partition_key, ok = false, "",
                Option(item.get("ErrorCode")).map(_.asText())
                  .getOrElse("failed"))
          }
        }
      }
    } catch { case e: Exception =>
      fail(s"transport error: ${e.getClass.getSimpleName}")
    }
  }

  /** PutRecords caps at 500 records per call — the API limit. */
  def deliver(reqs: Dataset[KinesisRequest], endpoint: String,
      creds: SqsClient.Credentials, batchSize: Int = 500,
      timeoutMs: Long = 15000)(
      implicit spark: SparkSession): Dataset[KinesisResult] = {
    require(batchSize >= 1 && batchSize <= 500,
      s"PutRecords allows at most 500 records: $batchSize")
    import spark.implicits._
    reqs.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch =>
        putBatch(endpoint, creds, batch.toSeq, timeoutMs))
    }
  }

  def commands(results: Dataset[KinesisResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
