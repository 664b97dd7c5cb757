package graft

import graft.model.Cdc
import graft.sinks.{PubSubClient, SinkAdapters}
import graft.sinks.PubSubClient.{Credentials, PubSubRequest}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.{KeyPairGenerator, Signature}
import java.util.Base64
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The Pub/Sub client against loopback token + publish endpoints: the
  * RS256 service-account JWT is VERIFIED with the matching RSA public
  * key before any token is minted, publishes require the minted Bearer
  * token, messageIds map back positionally, and the token is cached
  * across batches (one exchange, many publishes). Zero egress. */
class PubSubClientSpec extends SparkSpec {

  private val keyPair = {
    val g = KeyPairGenerator.getInstance("RSA")
    g.initialize(2048)
    g.generateKeyPair()
  }

  private def creds(port: Int) = Credentials(
    clientEmail = "svc@test.iam",
    privateKeyB64 = Base64.getEncoder.encodeToString(
      keyPair.getPrivate.getEncoded),
    tokenUri = s"http://127.0.0.1:$port/token")

  private final class ScriptedPubSub {
    val published = new ConcurrentLinkedQueue[(String, String, String)]() // (topic, data, orderingKey)
    val tokenExchanges = new ConcurrentLinkedQueue[Boolean]() // jwt verified?
    val badAuthPublishes = new ConcurrentLinkedQueue[String]()
    @volatile private var minted = ""
    private var nextId = 9000L
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val (status, resp): (Int, String) =
          if (path == "/token") {
            // verify the RS256 JWT with the PUBLIC key before minting
            val assertion = body.split("&").collectFirst {
              case kv if kv.startsWith("assertion=") =>
                URLDecoder.decode(kv.stripPrefix("assertion="), "UTF-8")
            }.getOrElse("")
            val parts = assertion.split("\\.")
            val verified = parts.length == 3 && {
              val sig = Signature.getInstance("SHA256withRSA")
              sig.initVerify(keyPair.getPublic)
              sig.update(s"${parts(0)}.${parts(1)}".getBytes(UTF_8))
              sig.verify(Base64.getUrlDecoder.decode(parts(2))) && {
                val claims = mapper.readTree(
                  Base64.getUrlDecoder.decode(parts(1)))
                claims.get("iss").asText() == "svc@test.iam" &&
                  claims.get("scope").asText().contains("auth/pubsub") &&
                  claims.get("aud").asText().endsWith("/token")
              }
            }
            tokenExchanges.add(verified)
            if (!verified) (401, """{"error":"invalid_grant"}""")
            else {
              minted = s"tok-${System.nanoTime()}"
              (200, s"""{"access_token":"$minted","expires_in":3600,"token_type":"Bearer"}""")
            }
          } else if (path.endsWith(":publish")) {
            val auth = ex.getRequestHeaders.getFirst("authorization")
            if (auth != s"Bearer $minted") {
              badAuthPublishes.add(String.valueOf(auth))
              (401, """{"error":"unauthenticated"}""")
            } else {
              val topic = path.split("/topics/")(1).stripSuffix(":publish")
              val ids = mapper.readTree(body).get("messages").elements()
                .asScala.map { m =>
                  published.add((topic, m.get("data").asText(),
                    m.get("orderingKey").asText()))
                  nextId += 1
                  s""""$nextId""""
                }.mkString(",")
              (200, s"""{"messageIds":[$ids]}""")
            }
          } else (404, "{}")
        val bytes = resp.getBytes(UTF_8)
        ex.getResponseHeaders.set("content-type", "application/json")
        ex.sendResponseHeaders(status, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  test("JWT-bearer flow end to end: RS256 verified with the public key, Bearer-gated publishes, positional messageIds, cached token") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedPubSub()
    try {
      val reqs = (1 to 30).map(i => PubSubRequest(s"t$i", s"g$i", "cdc-topic",
        Base64.getEncoder.encodeToString(s"m$i".getBytes(UTF_8)),
        Map("trace_id" -> s"t$i", "action" -> "insert"), s"ord${i % 5}"))
      val out = PubSubClient.deliver(spark.createDataset(reqs).repartition(1),
        s"http://127.0.0.1:${srv.port}", "proj-1", creds(srv.port),
        batchSize = 10).collect()
      assert(out.length == 30 && out.forall(_.ok))
      assert(out.map(_.message_id).distinct.length == 30)
      // the signature chain was verified, once — the token is CACHED
      // across the three batches
      assert(srv.tokenExchanges.asScala.toVector == Vector(true),
        s"expected one verified exchange, got ${srv.tokenExchanges.asScala}")
      assert(srv.badAuthPublishes.asScala.isEmpty)
      val got = srv.published.asScala.toVector
      assert(got.length == 30 && got.forall(_._1 == "cdc-topic"))
      assert(got.map(_._3).toSet == (0 until 5).map(i => s"ord$i").toSet)
    } finally srv.stop()
  }

  test("an invalid key fails the token exchange; publishes fail closed") {
    implicit val s = spark
    import s.implicits._
    val srv = new ScriptedPubSub()
    try {
      // a DIFFERENT keypair: the server's public key must reject it
      val other = KeyPairGenerator.getInstance("RSA")
      other.initialize(2048)
      val badCreds = creds(srv.port).copy(privateKeyB64 =
        Base64.getEncoder.encodeToString(
          other.generateKeyPair().getPrivate.getEncoded))
      val out = PubSubClient.deliver(
        spark.createDataset(Seq(PubSubRequest("a", "ga", "t", "QQ==", Map.empty, "o")))
          .repartition(1),
        s"http://127.0.0.1:${srv.port}", "proj-1", badCreds).collect()
      assert(out.forall(r => !r.ok && r.err.contains("token exchange failed")))
      assert(srv.tokenExchanges.asScala.toVector.contains(false))
      assert(srv.published.asScala.isEmpty, "nothing may publish unauthenticated")
    } finally srv.stop()
  }

  test("END TO END: the pubsub wire publishes with attributes and bounded ordering keys") {
    implicit val s = spark
    val srv = new ScriptedPubSub()
    try {
      val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(20)
      val wire = SinkAdapters.pubsubWire(cdc)
      val out = PubSubClient.deliver(PubSubClient.requests(wire),
        s"http://127.0.0.1:${srv.port}", "proj-1", creds(srv.port)).collect()
      assert(out.length == 20 && out.forall(_.ok))
      val got = srv.published.asScala.toVector
      assert(got.length == 20 && got.forall(_._3.length <= 1024))
    } finally srv.stop()
  }
}
