package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** The SNS delivery CLIENT — `PublishBatch` on the AWS QUERY protocol
  * (form-encoded `Action=PublishBatch` with `PublishBatchRequestEntries
  * .member.N.*` fields, XML response), signed with the same [[SigV4]]
  * (service `sns`). FIFO topics carry MessageGroupId +
  * MessageDeduplicationId per entry (`aws/sns.ex:40-70`;
  * `sns_pipeline.ex:87-98`). Per-entry outcomes from the XML
  * `Successful`/`Failed` member lists; the 10-entry API cap enforced.
  *
  * This is the third wire shape in the AWS family: JSON 1.0 (SQS),
  * JSON 1.1 (Kinesis), Query+XML (SNS) — all riding one signer.
  */
object SnsClient {

  final case class SnsRequest(
      ack_id: String,      // ledger identity (idempotency key)
      group_id: String,    // ledger group (acks key AckDelivery by this)
      message_group_id: Option[String], // FIFO ordering unit ON THE WIRE
      topic_arn: String,
      message: String)

  final case class SnsResult(
      ack_id: String,
      group_id: String,
      ok: Boolean,
      err: String)

  /** [[SinkAdapters.snsWire]] rows → requests (FIFO columns may be
    * null for standard topics — the group falls back to the topic).
    */
  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[SnsRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"),
        col("message_group_id"), col("topic_arn"), col("message"))
      .as[(String, String, Option[String], String, String)]
      .map { case (ackId, group, msgGroup, arn, message) =>
        SnsRequest(ackId, group, msgGroup, arn, message)
      }
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private def enc(s: String): String =
    URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  private def sendBatch(endpoint: String, creds: SqsClient.Credentials,
      fifo: Boolean, batch: Seq[SnsRequest],
      timeoutMs: Long): Seq[SnsResult] = {
    val fail = (msg: String) =>
      batch.map(r => SnsResult(r.ack_id, r.group_id, ok = false, msg))
    // a FIFO publish without a MessageGroupId is an SNS 400 — fail the
    // batch with a config-shaped error instead of shipping an empty
    // group the service rejects
    if (fifo && batch.exists(_.message_group_id.forall(_.isEmpty)))
      fail("fifo publish requires message_group_id (wire adapter derives " +
        "group_id/record_pk for .fifo topics — was the wire built with " +
        "isFifo = false?)")
    else try {
      val fields = Seq(
        "Action" -> "PublishBatch",
        "Version" -> "2010-03-31",
        "TopicArn" -> batch.head.topic_arn) ++
        batch.zipWithIndex.flatMap { case (r, i) =>
          val p = s"PublishBatchRequestEntries.member.${i + 1}"
          Seq(s"$p.Id" -> r.ack_id, s"$p.Message" -> r.message) ++
            (if (fifo) Seq(
              s"$p.MessageGroupId" -> r.message_group_id.get, // guarded above
              s"$p.MessageDeduplicationId" -> r.ack_id)
             else Nil)
        }
      val payload = fields.map { case (k, v) => s"${enc(k)}=${enc(v)}" }
        .mkString("&").getBytes(UTF_8)
      val uri = URI.create(endpoint)
      val amzDate = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd'T'HHmmss'Z'")
        .format(java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC))
      val host = uri.getHost + (if (uri.getPort > 0) s":${uri.getPort}" else "")
      val signed = Seq(
        "content-type" -> "application/x-www-form-urlencoded",
        "host" -> host,
        "x-amz-date" -> amzDate)
      val auth = SigV4.authorization(creds.accessKey, creds.secretKey,
        creds.region, "sns", amzDate, "/", signed, payload)
      val req = HttpRequest.newBuilder(uri)
        .timeout(Duration.ofMillis(timeoutMs))
        .header("content-type", "application/x-www-form-urlencoded")
        .header("x-amz-date", amzDate)
        .header("authorization", auth)
        .POST(HttpRequest.BodyPublishers.ofByteArray(payload))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        fail(s"sns request failed: ${resp.statusCode()}")
      else {
        val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
          .newDocumentBuilder()
          .parse(new java.io.ByteArrayInputStream(resp.body().getBytes(UTF_8)))
        def idsUnder(tag: String): Map[String, String] = {
          val nodes = doc.getElementsByTagName(tag)
          if (nodes.getLength == 0) Map.empty
          else {
            val el = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
            val members = el.getElementsByTagName("member")
            (0 until members.getLength).map { i =>
              val m = members.item(i).asInstanceOf[org.w3c.dom.Element]
              def text(t: String): String = {
                val n = m.getElementsByTagName(t)
                if (n.getLength == 0) "" else n.item(0).getTextContent
              }
              text("Id") -> text("Code")
            }.toMap
          }
        }
        val ok = idsUnder("Successful")
        val bad = idsUnder("Failed")
        batch.map { r =>
          if (ok.contains(r.ack_id))
            SnsResult(r.ack_id, r.group_id, ok = true, "")
          else SnsResult(r.ack_id, r.group_id, ok = false,
            bad.get(r.ack_id).filter(_.nonEmpty)
              .getOrElse("missing from response"))
        }
      }
    } catch { case e: Exception =>
      fail(s"transport error: ${e.getClass.getSimpleName}")
    }
  }

  /** PublishBatch caps at 10 entries — the API limit. */
  def deliver(reqs: Dataset[SnsRequest], endpoint: String,
      creds: SqsClient.Credentials, fifo: Boolean = false,
      timeoutMs: Long = 15000)(
      implicit spark: SparkSession): Dataset[SnsResult] = {
    import spark.implicits._
    reqs.mapPartitions { it =>
      it.grouped(10).flatMap(batch =>
        sendBatch(endpoint, creds, fifo, batch.toSeq, timeoutMs))
    }
  }

  def commands(results: Dataset[SnsResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
