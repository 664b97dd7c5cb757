package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.AckDelivery.DeliveryCommand
import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.{KeyFactory, PrivateKey, Signature}
import java.security.spec.PKCS8EncodedKeySpec
import java.time.Duration
import java.util.Base64

/** The GCP Pub/Sub delivery CLIENT — the full service-account OAuth2
  * flow plus topic publishes, all on public protocols:
  *
  *   1. a SELF-SIGNED RS256 JWT (`{"alg":"RS256"}` header; iss =
  *      client_email, scope = pubsub, aud = token_uri, iat/exp) signed
  *      with the service account's PKCS#8 private key
  *      (`gcp/pubsub.ex:299-331` builds the same claims with JOSE);
  *   2. exchanged at the token endpoint via
  *      `grant_type=urn:ietf:params:oauth:grant-type:jwt-bearer`
  *      (`:339-350`), the access token cached per executor and renewed
  *      before the 55-minute horizon (`@token_expiry_seconds`);
  *   3. `POST v1/projects/<p>/topics/<t>:publish` with base64 data +
  *      attributes + orderingKey per message; the response's
  *      `messageIds` are POSITIONAL — one id per message in order.
  *
  * The spec's loopback endpoints VERIFY the JWT signature with the
  * matching RSA public key (`SHA256withRSA`), reject unauthenticated
  * publishes, and only then mint/honor access tokens — so the signing
  * chain is checked end to end, not assumed.
  */
object PubSubClient {

  final case class Credentials(
      clientEmail: String,
      /** PKCS#8 private key, base64 (no PEM armor). */
      privateKeyB64: String,
      tokenUri: String)

  final case class PubSubRequest(
      ack_id: String,
      group_id: String,
      topic_id: String,
      data_b64: String,
      attributes: Map[String, String],
      ordering_key: String)

  final case class PubSubResult(
      ack_id: String,
      group_id: String,
      topic_id: String,
      ok: Boolean,
      message_id: String,
      err: String)

  def requests(wire: DataFrame)(
      implicit spark: SparkSession): Dataset[PubSubRequest] = {
    import spark.implicits._
    wire.select(col("ack_id"), col("ledger_group_id"), col("topic_id"),
        col("data"), col("attributes"), col("ordering_key"))
      .as[(String, String, String, String, Map[String, String], String)]
      .map { case (ackId, groupId, topic, data, attrs, ordKey) =>
        PubSubRequest(ackId, groupId, topic, data, attrs, ordKey)
      }
  }

  // ---- JWT-bearer auth ---------------------------------------------------

  private def b64url(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  /** The compact RS256 JWT for the token exchange. */
  def signedJwt(creds: Credentials, nowEpochS: Long): String = {
    val header = b64url("""{"alg":"RS256","typ":"JWT"}""".getBytes(UTF_8))
    val claims = b64url(
      (s"""{"iss":"${creds.clientEmail}",""" +
        s""""scope":"https://www.googleapis.com/auth/pubsub",""" +
        s""""aud":"${creds.tokenUri}",""" +
        s""""exp":${nowEpochS + 3600},"iat":$nowEpochS}""").getBytes(UTF_8))
    val signingInput = s"$header.$claims"
    val key: PrivateKey = KeyFactory.getInstance("RSA").generatePrivate(
      new PKCS8EncodedKeySpec(Base64.getDecoder.decode(creds.privateKeyB64)))
    val sig = Signature.getInstance("SHA256withRSA")
    sig.initSign(key)
    sig.update(signingInput.getBytes(UTF_8))
    s"$signingInput.${b64url(sig.sign())}"
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // per-executor token cache, renewed before the 55-minute horizon
  // (the reference's @token_expiry_seconds = 3300)
  @transient private val tokenCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  private def accessToken(creds: Credentials,
      timeoutMs: Long): Either[String, String] = {
    val now = System.currentTimeMillis() / 1000
    // keyed by (account, endpoint): a token minted by one authority is
    // never presented to another
    val cacheKey = s"${creds.clientEmail}|${creds.tokenUri}"
    Option(tokenCache.get(cacheKey))
      .filter(_._2 > now) match {
      case Some((tok, _)) => Right(tok)
      case None =>
        try {
          val jwt = signedJwt(creds, now)
          val body = "grant_type=" + URLEncoder.encode(
            "urn:ietf:params:oauth:grant-type:jwt-bearer", "UTF-8") +
            "&assertion=" + URLEncoder.encode(jwt, "UTF-8")
          val req = HttpRequest.newBuilder(URI.create(creds.tokenUri))
            .timeout(Duration.ofMillis(timeoutMs))
            .header("content-type", "application/x-www-form-urlencoded")
            .POST(HttpRequest.BodyPublishers.ofString(body))
            .build()
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() != 200)
            Left(s"token exchange failed: ${resp.statusCode()}")
          else {
            val root = mapper.readTree(resp.body())
            val tok = Option(root.get("access_token")).map(_.asText())
              .getOrElse(return Left("token response missing access_token"))
            val ttl = Option(root.get("expires_in")).map(_.asLong())
              .getOrElse(3600L)
            tokenCache.put(cacheKey, (tok, now + math.min(ttl, 3300L)))
            Right(tok)
          }
        } catch { case e: Exception =>
          Left(s"token transport error: ${e.getClass.getSimpleName}")
        }
    }
  }

  private def jstr(s: String): String = mapper.writeValueAsString(s)

  private def publishBatch(endpoint: String, project: String,
      creds: Credentials, batch: Seq[PubSubRequest],
      timeoutMs: Long): Seq[PubSubResult] = {
    val fail = (msg: String) => batch.map(r =>
      PubSubResult(r.ack_id, r.group_id, r.topic_id, ok = false, "", msg))
    accessToken(creds, timeoutMs) match {
      case Left(e) => fail(e)
      case Right(token) =>
        try {
          val msgs = batch.map { r =>
            val attrs = r.attributes.toSeq.sortBy(_._1).map {
              case (k, v) => s"${jstr(k)}:${jstr(v)}"
            }.mkString("{", ",", "}")
            s"""{"data":${jstr(r.data_b64)},"attributes":$attrs,""" +
              s""""orderingKey":${jstr(r.ordering_key)}}"""
          }.mkString("[", ",", "]")
          val req = HttpRequest.newBuilder(URI.create(
              s"$endpoint/v1/projects/$project/topics/${batch.head.topic_id}:publish"))
            .timeout(Duration.ofMillis(timeoutMs))
            .header("authorization", s"Bearer $token")
            .header("content-type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(s"""{"messages":$msgs}"""))
            .build()
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() != 200)
            fail(s"publish failed: ${resp.statusCode()}")
          else {
            val ids = mapper.readTree(resp.body()).get("messageIds")
            if (ids == null || ids.size() != batch.size)
              fail("malformed publish response")
            else batch.zipWithIndex.map { case (r, i) =>
              PubSubResult(r.ack_id, r.group_id, r.topic_id, ok = true,
                ids.get(i).asText(), "")
            }
          }
        } catch { case e: Exception =>
          fail(s"transport error: ${e.getClass.getSimpleName}")
        }
    }
  }

  /** Deliver in per-topic runs (the publish API is per topic), ≤1000
    * messages per call (the API cap).
    */
  def deliver(reqs: Dataset[PubSubRequest], endpoint: String,
      project: String, creds: Credentials, batchSize: Int = 500,
      timeoutMs: Long = 15000)(
      implicit spark: SparkSession): Dataset[PubSubResult] = {
    require(batchSize >= 1 && batchSize <= 1000,
      s"publish allows at most 1000 messages: $batchSize")
    import spark.implicits._
    reqs.mapPartitions { it =>
      val out = Vector.newBuilder[PubSubResult]
      val buf = it.buffered
      while (buf.hasNext) {
        val topic = buf.head.topic_id
        val chunk = Vector.newBuilder[PubSubRequest]
        var n = 0
        while (buf.hasNext && buf.head.topic_id == topic && n < batchSize) {
          chunk += buf.next(); n += 1
        }
        out ++= publishBatch(endpoint, project, creds, chunk.result(),
          timeoutMs)
      }
      out.result().iterator
    }
  }

  def commands(results: Dataset[PubSubResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.ok) DeliveryCommand.ack(r.group_id, r.ack_id)
      else DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
