package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.model.ChangeEvent
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Loopback HTTP listener for the pull ("Sequin Stream") consumer — the
  * JSON shim the reference serves at
  * `POST /api/sequin_streams/:id_or_name/{receive,ack,nack}`
  * (`lib/sequin_web/controllers/pull_controller.ex:14-110`), bound over
  * [[SequinStreamPull]]'s state machine. JDK-only
  * (`com.sun.net.httpserver`), serving 127.0.0.1 — no egress.
  *
  * Parity mirrored from the controller:
  *   - `receive`: `max_batch_size` (or the deprecated `batch_size`
  *     alias) as int or numeric string, 1..1000 — out-of-range returns
  *     the controller's exact 400 message; `wait_for` long-poll as
  *     milliseconds or a duration string (`'60s'`, `'5m'`, `'1000ms'`,
  *     `Time.parse_duration`), bounded to ≤ 5 minutes. Response:
  *     `{"data": [{"ack_id": ..., "data": <consumer envelope>}]}`
  *     (`pull_json.ex:6-20`), with the envelope in the P1 record/
  *     changes/action/metadata shape [[graft.sinks.SinkAdapters]] uses.
  *   - `ack` / `nack`: top-level `ack_ids` must be a non-empty list of
  *     non-empty strings (the controller additionally requires UUIDs —
  *     this store's ack ids are not UUIDs, so that clause is relaxed);
  *     success responds `{"success": true}`.
  *   - Errors render `{"summary": message}` with the matching status
  *     (`api_fallback_plug.ex:75-77`); unknown consumer → 404, unknown
  *     route/method → 404/405.
  *
  * One listener per consumer (the `consumerName` path segment is
  * validated). `port = 0` binds an ephemeral port; read it back from
  * [[port]].
  */
final class SequinStreamHttp(pull: SequinStreamPull, consumerName: String,
    port: Int = 0) {

  private val server = HttpServer.create(
    new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", new Router)
  // a small pool, NOT the single request thread: a parked long-poll
  // receive must not block a concurrent ack/nack (SequinStreamPull's
  // command lock serializes the state machine; the poll sleeps unlocked)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)
  server.start()

  /** The bound loopback port. */
  def port(): Int = server.getAddress.getPort

  def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }

  private final class Router extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      try route(ex)
      catch {
        case e: IllegalArgumentException => respond(ex, 400, err(e.getMessage))
        case e: Throwable => respond(ex, 500, err(s"internal error: ${e.getMessage}"))
      } finally ex.close()
    }

    private def route(ex: HttpExchange): Unit = {
      val path = ex.getRequestURI.getPath
      path.stripPrefix("/").split("/").toList match {
        case "api" :: "sequin_streams" :: name :: verb :: Nil =>
          if (name != consumerName)
            respond(ex, 404, err(s"Consumer not found: $name"))
          else if (ex.getRequestMethod != "POST")
            respond(ex, 405, err("method not allowed"))
          else {
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            val json = if (body.trim.isEmpty) JObject()
              else JsonMethods.parse(body)
            verb match {
              case "receive" => doReceive(ex, json)
              case "ack"     => doAckNack(ex, json, pull.ack)
              case "nack"    => doAckNack(ex, json, pull.nack)
              case _         => respond(ex, 404, err("not found"))
            }
          }
        case _ => respond(ex, 404, err("not found"))
      }
    }
  }

  private def doReceive(ex: HttpExchange, json: JValue): Unit = {
    val batchSize = parseBatchSize(json) match {
      case Right(n) => n
      case Left(msg) => respond(ex, 400, err(msg)); return
    }
    val waitFor = parseWaitFor(json) match {
      case Right(ms) => ms
      case Left(msg) => respond(ex, 400, err(msg)); return
    }
    val deliveries = pull.receive(batchSize, waitFor)
    respond(ex, 200, JsonMethods.compact(JsonMethods.render(
      JObject("data" -> JArray(deliveries.map(d =>
        JObject("ack_id" -> JString(d.ack_id),
          "data" -> envelope(d.event))).toList)))))
  }

  private def doAckNack(ex: HttpExchange, json: JValue,
      f: Seq[String] => Unit): Unit = {
    json \ "ack_ids" match {
      case JArray(ids) if ids.nonEmpty &&
          ids.forall { case JString(s) => s.nonEmpty; case _ => false } =>
        f(ids.collect { case JString(s) => s })
        respond(ex, 200, """{"success":true}""")
      case _ =>
        respond(ex, 400, err("Invalid ack_ids. Must send a top-level " +
          "`ack_ids` property that is a non-empty list of non-empty strings"))
    }
  }

  /** `parse_batch_size`: `max_batch_size` (or deprecated `batch_size`),
    * int or numeric string, 1..1000; absent → 1.
    */
  private def parseBatchSize(json: JValue): Either[String, Int] = {
    val raw = (json \ "max_batch_size") match {
      case JNothing => json \ "batch_size"
      case v        => v
    }
    val badMsg = "Invalid `max_batch_size`. `max_batch_size` must be an " +
      "integer between 1 and 1000."
    raw match {
      case JNothing => Right(1)
      case JInt(n) if n >= 1 && n <= 1000 => Right(n.toInt)
      case JString(s) =>
        s.toIntOption.filter(n => n >= 1 && n <= 1000).toRight(badMsg)
      case _ => Left(badMsg)
    }
  }

  /** `maybe_wait`: `wait_for` as milliseconds or a duration string
    * (`Time.parse_duration` accepts forms like '60s', '5m', '1000ms').
    */
  private def parseWaitFor(json: JValue): Either[String, Long] = {
    val durationRe = "^(\\d+)(ms|s|m)$".r
    val rangeMsg = "Invalid `wait_for`. Must be between 1 and 300,000 " +
      "milliseconds, or use duration format like '60s', '5m', '1000ms'."
    def bound(ms: Long): Either[String, Long] =
      if (ms >= 1 && ms <= 300000L) Right(ms) else Left(rangeMsg)
    json \ "wait_for" match {
      case JNothing => Right(0L)
      case JInt(n)  => bound(n.toLong)
      case JString(durationRe(n, unit)) =>
        bound(n.toLong * (unit match {
          case "ms" => 1L
          case "s"  => 1000L
          case "m"  => 60000L
        }))
      case JString(_) => Left("Invalid `wait_for`. When using duration " +
        "strings, format must be like '60s', '5m', or '1000ms'.")
      case _ => Left(rangeMsg)
    }
  }

  /** The consumer-message envelope (P1 record/changes/action/metadata —
    * same field set as [[graft.sinks.SinkAdapters]]'s wire envelope).
    */
  private def envelope(e: ChangeEvent): JValue =
    JObject(
      "record" -> JObject(
        "id" -> JLong(e.record_id),
        "user_id" -> JLong(e.record_user_id),
        "value" -> JDouble(e.record_value),
        "props" -> JString(e.record_props)),
      "changes" -> e.old_value.map(JDouble(_)).getOrElse(JNull),
      "action" -> JString(e.action),
      "metadata" -> JObject(
        "table_schema" -> JString(e.table_schema),
        "table_name" -> JString(e.table_name),
        "commit_lsn" -> JLong(e.commit_lsn),
        "commit_idx" -> JLong(e.commit_idx),
        "idempotency_key" -> JString(e.idempotency_key)))

  private def err(msg: String): String =
    JsonMethods.compact(JsonMethods.render(JObject("summary" -> JString(msg))))

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
