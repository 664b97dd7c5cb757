package graft.config

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.streaming.ConsumerConfig
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors
import scala.collection.concurrent.TrieMap

/** The management plane: declarative sink-consumer CRUD plus the
  * config-as-code apply/plan/export trio, served over a REAL loopback
  * HTTP listener — the API surface a reference operator drives with
  * `curl`/CLI (`/root/reference/lib/sequin_web/router.ex:157-195`:
  * `resources("/sinks", SinkConsumerController)`; `POST /config/apply`,
  * `POST /config/plan`, `GET /config/export` →
  * `yaml_controller.ex:18-90`), with the fallback plug's error shapes
  * (`plugs/api_fallback_plug.ex`: 404 `{"summary"}`, 422 `{"summary",
  * "validation_errors", "code"}`).
  *
  * Every write goes through [[PipelineSpec]] validation — the same
  * parse + expression sandbox the YAML front-end uses — so a config the
  * API accepts is exactly a config the pipeline builder will run.
  * JDK-only (`com.sun.net.httpserver`), binds 127.0.0.1, zero egress.
  *
  * The registry is the management plane's in-memory state (the
  * reference keeps these rows in Postgres; persistence here is the
  * caller's concern — `export` gives the canonical YAML to store).
  */
final class ManagementApi(vaultKeyBase64: Option[String] = None) {

  /** Secrets-at-rest vault (reference `vault.ex` + `encrypted/field.ex`):
    * database passwords and `encrypted_headers` values are SEALED the
    * moment they enter the catalog and stay sealed in every at-rest
    * form (the in-memory store, `GET /api/config/export` YAML); they are
    * revealed only at transport/catalog-client construction and for the
    * obfuscated API previews. Pass a base64 32-byte key to share sealed
    * exports across instances; omitted, a per-instance random key still
    * gives at-rest encryption (but exports are only re-openable here).
    */
  private[config] val vault: Vault =
    vaultKeyBase64.map(Vault.fromBase64).getOrElse(Vault.generate())

  /** Seal the values of the endpoint's declared encrypted headers
    * (idempotent — an exported ciphertext re-applies unchanged).
    */
  private def sealEndpoint(
      e: YamlSpec.HttpEndpointSpec): YamlSpec.HttpEndpointSpec =
    e.copy(headers = e.headers.map { case (k, v) =>
      if (e.encryptedHeaderKeys(k)) (k, vault.seal(v)) else (k, v)
    })

  /** Control-plane record of a backfill (the reference's `backfills`
    * table, `consumers/backfill.ex:29-51`): state machine the API
    * drives; EXECUTION is `graft.backfill.Backfill` (q47), which the
    * runtime points at this record's table.
    */
  final case class BackfillRec(id: Int, table: String, state: String,
      rowsProcessedCount: Long = 0L, rowsIngestedCount: Long = 0L)

  private val BackfillStates =
    Set("active", "completed", "cancelled", "failed", "paused")

  // ---- accounts (lib/sequin/accounts/account.ex: id + name + timestamps;
  // every API resource belongs to exactly one account and every API token
  // is bound to one — sink_consumer_controller.ex:16-27 scopes each
  // request to `conn.assigns.account_id`) --------------------------------

  final case class AccountRec(id: String, name: String,
      insertedAt: java.time.Instant)

  private[config] val accounts = TrieMap.empty[String, AccountRec]
  private val accountSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def registerAccount(name: String): AccountRec = {
    require(name.nonEmpty && name.length <= 80,
      "account requires a name of at most 80 characters")
    val rec = AccountRec(s"acct-${accountSeq.incrementAndGet()}", name,
      java.time.Instant.now())
    accounts.put(rec.id, rec)
    rec
  }

  /** The instance's first account — the reference's default "Personal"
    * account (account.ex `maybe_put_name`). The bootstrap token belongs
    * to it, and library-facing methods (consumers(), startConsumer)
    * operate in it.
    */
  val bootstrapAccountId: String = registerAccount("Personal").id

  /** The account the CURRENT request (or library caller) acts as. HTTP
    * requests set it from the verified token's binding; non-HTTP callers
    * default to the bootstrap account.
    */
  private[config] val currentAccount: ThreadLocal[String] =
    ThreadLocal.withInitial(() => bootstrapAccountId)

  /** An account-scoped resource map: every read/write is keyed by
    * (current account, name), so two accounts' resource sets are
    * disjoint BY CONSTRUCTION — a cross-account name lookup simply
    * misses, which the handlers surface as 404 (the reference's
    * discipline: `find_sink_consumer(account_id, ...)` returns NotFound,
    * never Forbidden — resource EXISTENCE is account-private).
    * Mirrors the TrieMap call surface so handler code reads unchanged.
    */
  private[config] final class Scoped[V] {
    private val m = TrieMap.empty[(String, String), V]
    private def acct: String = currentAccount.get()
    def get(name: String): Option[V] = m.get((acct, name))
    def getOrElse(name: String, default: => V): V =
      m.getOrElse((acct, name), default)
    def contains(name: String): Boolean = m.contains((acct, name))
    def put(name: String, v: V): Option[V] = m.put((acct, name), v)
    def putIfAbsent(name: String, v: V): Option[V] =
      m.putIfAbsent((acct, name), v)
    def update(name: String, v: V): Unit = m.update((acct, name), v)
    def remove(name: String): Option[V] = m.remove((acct, name))
    def values: Iterable[V] =
      m.collect { case ((a, _), v) if a == acct => v }
    def keys: Iterable[String] =
      m.keysIterator.collect { case (a, n) if a == acct => n }.toVector
    def apply(name: String): V = m((acct, name))
    /** Lookup bound to an EXPLICIT account — for callers outside an HTTP
      * request context (the tunnel preamble thread) that carry their own
      * verified token binding instead of the request thread-local.
      */
    def getAs(accountId: String, name: String): Option[V] =
      m.get((accountId, name))
    def updateWith(name: String)(f: Option[V] => Option[V]): Option[V] =
      m.updateWith((acct, name))(f)
    def exists(p: ((String, V)) => Boolean): Boolean =
      m.exists { case ((a, n), v) => a == acct && p((n, v)) }
    /** Is `name` a resource of ANY account (tenancy visibility test)? */
    def containsAnywhere(name: String): Boolean =
      m.keysIterator.exists(_._2 == name)
    def isEmpty: Boolean = !m.keysIterator.exists(_._1 == acct)
  }

  private[config] val registry = new Scoped[ConsumerConfig]
  private[config] val backfills = new Scoped[Vector[BackfillRec]]
  private val backfillSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private[config] val endpoints = new Scoped[YamlSpec.HttpEndpointSpec]
  private[config] val retentions = new Scoped[YamlSpec.ChangeRetentionSpec]
  private[config] val replications = new Scoped[ReplicationRec]
  private val replSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private val ReplStatuses = Set("active", "disabled")

  // ---- API tokens (router.ex:24-28 `plug VerifyApiToken`;
  // api_tokens/api_token.ex:11-46: 48 random bytes base64url, stored as
  // a sha256 hash, looked up by hash) ------------------------------------

  /** One bearer token. The raw token is kept only for the obfuscated
    * index render (the catalog-password discipline); verification always
    * goes through the sha256 hash with a constant-time compare.
    */
  final case class ApiTokenRec(id: String, name: String,
      hashed: Array[Byte], token: String, insertedAt: java.time.Instant,
      accountId: String)

  private[config] val apiTokens = TrieMap.empty[String, ApiTokenRec]
  private val tokenSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def sha256(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes(UTF_8))

  /** `gen_token` parity (api_token.ex:40-44): 48 strong-random bytes,
    * base64url without padding (double-click-copyable).
    */
  private def genToken(): String = {
    val b = new Array[Byte](48)
    new java.security.SecureRandom().nextBytes(b)
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
  }

  private def registerToken(name: String, accountId: String): ApiTokenRec = {
    require(name.nonEmpty, "api token requires name")
    // name unique PER ACCOUNT (api_tokens_account_id_name_index)
    require(!apiTokens.values.exists(t =>
      t.name == name && t.accountId == accountId),
      s"api token already exists: $name")
    val t = genToken()
    val rec = ApiTokenRec(s"tok-${tokenSeq.incrementAndGet()}", name,
      sha256(t), t, java.time.Instant.now(), accountId)
    apiTokens.put(rec.id, rec)
    rec
  }

  /** The instance's first token, created at construction so the plane is
    * never unreachable (the reference provisions the first token through
    * the console; a library embedding has no console). Read it once and
    * mint scoped tokens through `POST /api/api_keys`.
    */
  val bootstrapToken: String =
    registerToken("bootstrap", bootstrapAccountId).token

  /** Constant-time bearer verification with the reference's failure
    * taxonomy (plugs/verify_api_token.ex:23-72: missing header, missing
    * Bearer prefix, more than one header, unknown token — each its own
    * message). Responds 401 and returns None on failure; on success
    * returns the verified token's ACCOUNT binding — the reference plug
    * assigns `conn.assigns.account_id` the same way
    * (verify_api_token.ex:24-28), and every resource handler scopes to
    * it.
    */
  private def authenticate(ex: HttpExchange): Option[String] = {
    val hs = Option(ex.getRequestHeaders.get("Authorization"))
      .map(_.size()).getOrElse(0)
    def deny(msg: String): Option[String] = {
      respond(ex, 401, err(msg)); None
    }
    if (hs == 0)
      deny("Please provide a valid API token in the Authorization header.")
    else if (hs > 1)
      deny("Please provide exactly one Authorization header in your request.")
    else {
      val h = ex.getRequestHeaders.getFirst("Authorization")
      if (!h.startsWith("Bearer "))
        deny("Please provide a valid API token in the Authorization " +
          "header. Ensure your Authorization value is prefixed with " +
          "\"Bearer\".")
      else verifyRawToken(h.stripPrefix("Bearer ")) match {
        case some @ Some(_) => some
        case None =>
          deny("The API token you provided is invalid or has expired.")
      }
    }
  }

  /** Constant-time raw-token verification (the non-HTTP entry — the
    * tunnel preamble authenticates with the same bearer tokens the API
    * does). Returns the token's account binding.
    */
  private[config] def verifyRawToken(raw: String): Option[String] = {
    val candidate = sha256(raw)
    // MessageDigest.isEqual is constant-time; scanning all tokens
    // keeps the compare count independent of which token matches
    apiTokens.values.foldLeft(Option.empty[ApiTokenRec]) { (acc, t) =>
      if (java.security.MessageDigest.isEqual(t.hashed, candidate)) Some(t)
      else acc
    }.map(_.accountId)
  }

  /** The plane's health registry — runtime components put events here;
    * `/health` and `/api/health` read it (`lib/sequin/health/health.ex`).
    */
  val health = new Health.Registry()

  /** The plane's Prometheus registry — delivery/streaming feeds write
    * here; `GET /metrics` serves the text exposition
    * (`lib/sequin/metrics/prometheus.ex` + `prometheus_exporter.ex`).
    */
  val metrics = new Metrics.Registry()

  private val pool = Executors.newFixedThreadPool(4)
  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/api/", new Router)
    // /health sits OUTSIDE the authenticated :api pipeline
    // (router.ex:149-154 — load balancers probe it unauthenticated)
    s.createContext("/health", new HealthRouter)
    // /metrics likewise sits outside :api (PlugExporter mount)
    s.createContext("/metrics", new MetricsRouter)
    // the operator console: server-rendered HTML over the same scoped
    // stores (the reference's LiveView surface, sequin_web/live/*).
    // "/" is the LEAST specific context, so /api//health//metrics win
    s.createContext("/", new Console(this))
    s.setExecutor(pool)
    s.start()
    s
  }

  def port(): Int = server.getAddress.getPort
  def stop(): Unit = {
    tunnelServer.foreach(s =>
      try s.server.close() catch { case _: Exception => () })
    server.stop(0)
    pool.shutdownNow()
    ()
  }

  // ---- tunnel plane (tunnel_command.go:22 + vendored cli/chisel/): the
  // reference's hosted control plane reaches operator-local databases
  // through a WebSocket tunnel; this plane's analog is a raw-TCP splice
  // service — the one-line preamble (`GRAFT-TUNNEL <token> <database>`)
  // plays chisel's remote-spec + auth role, then bytes flow verbatim to
  // the NAMED database's host:port. Lazy: no listener until the first
  // `GET /api/tunnel` asks where to connect.
  private final class TunnelServer {
    // same bind address as the HTTP plane: a CLI context whose hostname
    // reaches /api/tunnel can reach the splice listener it resolves (a
    // loopback-only plane stays loopback-only for the tunnel too, and a
    // plane rebound to a routable address carries the tunnel with it)
    val server = new java.net.ServerSocket(0, 16,
      ManagementApi.this.server.getAddress.getAddress)
    private val acceptor = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "graft-tunnel-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
    }, "graft-tunnel-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    private def readLine(in: java.io.InputStream): String = {
      val sb = new StringBuilder(64)
      var c = in.read()
      while (c >= 0 && c != '\n' && sb.length < 4096) {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      sb.toString
    }

    private def handle(sock: java.net.Socket): Unit =
      try {
        sock.setTcpNoDelay(true)
        val in = sock.getInputStream
        val out = sock.getOutputStream
        def fail(reason: String): Unit = {
          out.write(s"ERR $reason\n".getBytes(UTF_8))
          out.flush()
          sock.close()
        }
        readLine(in).split(" ", 3) match {
          case Array("GRAFT-TUNNEL", token, name) =>
            // the verified token BINDS the splice to its account, same as
            // every /api route: the database lookup is scoped by that
            // account, so a valid token for account A can never splice to
            // account B's database — and the miss reads "unknown
            // database" (existence is account-private, never Forbidden)
            verifyRawToken(token) match {
              case None => fail("invalid token")
              case Some(accountId) =>
                databases.getAs(accountId, name) match {
                  case None => fail(s"unknown database: $name")
                  case Some(db) =>
                    val target = new java.net.Socket()
                    val ok =
                      try {
                        target.connect(
                          new java.net.InetSocketAddress(db.hostname, db.port),
                          10000)
                        true
                      } catch { case _: Exception =>
                        fail(s"cannot reach ${db.hostname}:${db.port}")
                        false
                      }
                    if (ok) {
                      target.setTcpNoDelay(true)
                      out.write(
                        s"OK ${db.hostname}:${db.port}\n".getBytes(UTF_8))
                      out.flush()
                      TcpRelay.splice(sock, target)
                    }
                }
            }
          case _ => fail("bad preamble")
        }
      } catch { case _: Exception =>
        try sock.close() catch { case _: Exception => () }
      }
  }

  @volatile private var tunnelServer: Option[TunnelServer] = None

  /** The tunnel listener's port, starting it on first use. */
  def tunnelPort(): Int = synchronized {
    tunnelServer.getOrElse {
      val s = new TunnelServer
      tunnelServer = Some(s)
      s
    }.server.getLocalPort
  }

  /** Snapshot of the declared consumers (name-sorted). */
  def consumers(): Seq[ConsumerConfig] =
    registry.values.toSeq.sortBy(_.name)

  /** Start the DECLARED consumer `name` as a running
    * [[graft.streaming.ConsumerRuntime]] over `events` (a streaming CDC
    * envelope) against `env`'s transport — the operator loop closed: the
    * config the API validated is the config the engine runs, and the
    * running consumer's deliveries surface on THIS plane's `/metrics`
    * and `/api/health` automatically (the runtime is handed the plane's
    * registries).
    */
  def startConsumer(name: String,
      events: org.apache.spark.sql.DataFrame,
      env: graft.sinks.SinkDispatch.Env)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : graft.streaming.ConsumerRuntime.Handle = {
    val cfg = declared(name)
    graft.streaming.ConsumerRuntime.start(events, cfg,
      resolveEnv(cfg, env), metrics, health, consumerId = name)
  }

  /** One SHARED-DECODE slot runtime over `events` — the reference's
    * message_handler fan-out: the slot's stream decodes once per
    * micro-batch and every consumer attached via [[attachConsumer]]
    * consumes the same cached batch through its own lane (filters,
    * transforms, transport, ledger, metrics/health all per consumer).
    * N consumers declared on one database slot belong on one of these,
    * not on N [[startConsumer]] queries (which would each re-run the
    * per-slot stateful pgoutput decode).
    */
  def startSlot(events: org.apache.spark.sql.DataFrame,
      checkpointLocation: Option[String] = None)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : graft.streaming.SlotRuntime =
    new graft.streaming.SlotRuntime(events, checkpointLocation)

  /** Attach the DECLARED consumer `name` as a lane of a running slot.
    * The returned handle's `stop()` detaches only this consumer.
    */
  def attachConsumer(slot: graft.streaming.SlotRuntime, name: String,
      env: graft.sinks.SinkDispatch.Env)
      : graft.streaming.ConsumerRuntime.Handle = {
    val cfg = declared(name)
    slot.attach(cfg, resolveEnv(cfg, env), metrics, health,
      consumerId = name)
  }

  private def declared(name: String): ConsumerConfig =
    registry.getOrElse(name, throw new NoSuchElementException(
      s"Sink consumer not found: $name"))

  /** Decrypt-at-client-construction: a http_push sink referencing a
    * declared endpoint gets that endpoint's headers RESOLVED here —
    * sealed values leave the vault only on their way into the live
    * transport client (encrypted/field.ex discipline).
    */
  private def resolveEnv(cfg: ConsumerConfig,
      env: graft.sinks.SinkDispatch.Env): graft.sinks.SinkDispatch.Env =
    cfg.sink
      .filter(_.sinkType == "http_push")
      .flatMap(_.settings.get("http_endpoint"))
      .flatMap(endpoints.get)
      .fold(env) { ep =>
        env.copy(headers = env.headers ++
          ep.headers.map { case (k, v) => (k, vault.reveal(v)) })
      }

  /** Snapshot of the declared change-retention pipelines (name-sorted). */
  def changeRetentions(): Seq[YamlSpec.ChangeRetentionSpec] =
    retentions.values.toSeq.sortBy(_.name)

  private val mapper = PipelineSpec.mapper

  private final class Router extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      try route(ex)
      catch {
        case e: Throwable =>
          respond(ex, 500, err(s"internal error: ${e.getMessage}"))
      } finally ex.close()
    }

    private def route(ex: HttpExchange): Unit = {
      val path = ex.getRequestURI.getPath.stripSuffix("/")
      val method = ex.getRequestMethod
      // every /api route passes bearer verification (router.ex:24-28);
      // the verified token BINDS the request to its account — all
      // resource access below is scoped to it
      authenticate(ex) match {
        case None => return
        case Some(acct) => currentAccount.set(acct)
      }
      try routeScoped(ex, method, path)
      finally currentAccount.remove()
    }

    private def routeScoped(ex: HttpExchange, method: String,
        path: String): Unit = {
      (method, path) match {
        case ("GET", "/api/accounts")  => doAccountIndex(ex)
        case ("POST", "/api/accounts") => doAccountCreate(ex)
        case ("GET", "/api/health") => doHealthIndex(ex)
        case ("GET", p) if p.startsWith("/api/health/") =>
          p.stripPrefix("/api/health/").split("/", -1).toList match {
            case kind :: id :: Nil => doHealthShow(ex, kind, id)
            case _ => respond(ex, 404, err("route not found"))
          }
        case ("GET", "/api/api_keys")        => doTokenIndex(ex)
        case ("POST", "/api/api_keys")       => doTokenCreate(ex)
        case ("DELETE", p) if p.startsWith("/api/api_keys/") =>
          doTokenDelete(ex, p.stripPrefix("/api/api_keys/"))
        case ("GET", "/api/sinks")           => doIndex(ex)
        case ("POST", "/api/sinks")          => doCreate(ex)
        case ("POST", "/api/config/apply")   => doApply(ex)
        case ("POST", "/api/config/plan")    => doPlan(ex)
        case ("GET", "/api/config/export")   => doExport(ex)
        case ("GET", "/api/destinations/http_endpoints") =>
          doEndpointIndex(ex)
        case ("POST", "/api/destinations/http_endpoints") =>
          doEndpointCreate(ex)
        case (m, p) if p.startsWith("/api/destinations/http_endpoints/") =>
          val name = p.stripPrefix("/api/destinations/http_endpoints/")
          m match {
            case "GET"    => doEndpointShow(ex, name)
            case "DELETE" => doEndpointDelete(ex, name)
            case _        => respond(ex, 405, err("method not allowed"))
          }
        case ("GET", "/api/postgres_replications")  => doReplIndex(ex)
        case ("POST", "/api/postgres_replications") => doReplCreate(ex)
        case (m, p) if p.startsWith("/api/postgres_replications/") =>
          val id = p.stripPrefix("/api/postgres_replications/")
          m match {
            case "GET"    => doReplShow(ex, id)
            case "PUT"    => doReplUpdate(ex, id)
            case "DELETE" => doReplDelete(ex, id)
            case _        => respond(ex, 405, err("method not allowed"))
          }
        case ("GET", "/api/tunnel") =>
          // where the tunnel listener lives (starting it on first ask) —
          // the CLI's tunnel verb resolves this before dialing
          respond(ex, 200, s"""{"port":${tunnelPort()}}""")
        case ("GET", "/api/postgres_databases")  => doDbIndex(ex)
        case ("POST", "/api/postgres_databases") => doDbCreate(ex)
        case (m, p) if p.startsWith("/api/postgres_databases/") =>
          p.stripPrefix("/api/postgres_databases/").split("/", -1).toList match {
            case name :: Nil => m match {
              case "GET"    => doDbShow(ex, name)
              case "PUT"    => doDbUpdate(ex, name)
              case "DELETE" => doDbDelete(ex, name)
              case _        => respond(ex, 405, err("method not allowed"))
            }
            case name :: "test_connection" :: Nil if m == "POST" =>
              doDbTestConnection(ex, name)
            case name :: "refresh_tables" :: Nil if m == "POST" =>
              doDbRefreshTables(ex, name)
            case _ => respond(ex, 404, err("route not found"))
          }
        case (m, p) if p.startsWith("/api/sinks/") =>
          p.stripPrefix("/api/sinks/").split("/", -1).toList match {
            case name :: Nil => m match {
              case "GET"    => doShow(ex, name)
              case "PUT"    => doUpdate(ex, name)
              case "DELETE" => doDelete(ex, name)
              case _        => respond(ex, 405, err("method not allowed"))
            }
            case name :: "trace" :: Nil => m match {
              case "GET" => doTrace(ex, name)
              case _     => respond(ex, 405, err("method not allowed"))
            }
            case name :: "backfills" :: Nil => m match {
              case "GET"  => doBackfillIndex(ex, name)
              case "POST" => doBackfillCreate(ex, name)
              case _      => respond(ex, 405, err("method not allowed"))
            }
            case name :: "backfills" :: id :: Nil => m match {
              case "GET" => doBackfillShow(ex, name, id)
              case "PUT" => doBackfillUpdate(ex, name, id)
              case _     => respond(ex, 405, err("method not allowed"))
            }
            case _ => respond(ex, 404, err("route not found"))
          }
        case _ => respond(ex, 404, err("route not found"))
      }
    }
  }

  // ---- /health + /api/health (router.ex:149-154;
  // health_check_controller.ex; health.ex check JSON) --------------------

  private final class HealthRouter extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        if (ex.getRequestMethod != "GET")
          respond(ex, 405, err("method not allowed"))
        else health.system() match {
          case Right(()) =>
            val o = mapper.createObjectNode()
            o.put("ok", true)
            o.put("rev", "graft")
            respond(ex, 200, o.toString)
          case Left(reason) =>
            val o = mapper.createObjectNode()
            o.put("ok", false)
            o.put("error", s"Error with service: $reason")
            respond(ex, 500, o.toString)
        }
      } catch {
        case e: Throwable =>
          respond(ex, 500, err(s"internal error: ${e.getMessage}"))
      } finally ex.close()
  }

  private final class MetricsRouter extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        if (ex.getRequestMethod != "GET")
          respond(ex, 405, err("method not allowed"))
        else {
          // VM gauges refresh per scrape (SystemMetricsServer cadence
          // analog — pull, not a timer)
          metrics.snapshotSystemMetrics()
          val body = metrics.exposition().getBytes(UTF_8)
          ex.getResponseHeaders.set("content-type",
            "text/plain; version=0.0.4; charset=utf-8")
          ex.sendResponseHeaders(200, body.length.toLong)
          val os = ex.getResponseBody
          try os.write(body) finally os.close()
        }
      } catch {
        case e: Throwable =>
          respond(ex, 500, err(s"internal error: ${e.getMessage}"))
      } finally ex.close()
  }

  private def renderHealth(h: Health.EntityHealth): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("entity_kind", h.entityKind)
    o.put("entity_id", h.entityId)
    o.put("status", h.status)
    val arr = o.putArray("checks")
    h.checks.foreach { c =>
      val co = mapper.createObjectNode()
      co.put("slug", c.slug)
      co.put("status", c.status)
      c.error.foreach(co.put("error", _))
      c.lastHealthyAtMs.foreach(co.put("last_healthy_at", _))
      c.erroringSinceMs.foreach(co.put("erroring_since", _))
      arr.add(co)
    }
    h.lastHealthyAtMs.foreach(o.put("last_healthy_at", _))
    h.erroringSinceMs.foreach(o.put("erroring_since", _))
    o
  }

  /** Does the CURRENT account own the resource a health entity belongs
    * to? Health itself is account-agnostic (runtime components report by
    * entity id); the API boundary applies the tenancy filter, so one
    * account never observes another's consumer/endpoint health — same
    * 404-not-403 discipline as the resource routes. Kinds with no
    * account-scoped catalog (wal_pipeline → retentions) follow their
    * store; anything unmatched stays visible (infra-level entities).
    */
  private[config] def ownsEntity(kind: String, id: String): Boolean = {
    // visible iff the caller owns the matching resource, or NO account
    // claims that id (library-driven entities reported straight into the
    // health registry have no catalog row — hiding them would blind the
    // single-tenant embedding; what tenancy must hide is exactly what
    // ANOTHER tenant owns)
    def visible(owned: Boolean, claimed: Boolean): Boolean =
      owned || !claimed
    kind match {
      case "sink_consumer" =>
        visible(registry.contains(id), registry.containsAnywhere(id))
      case "http_endpoint" =>
        visible(endpoints.contains(id), endpoints.containsAnywhere(id))
      case "wal_pipeline" =>
        visible(retentions.contains(id), retentions.containsAnywhere(id))
      case _ => true
    }
  }

  private def doHealthIndex(ex: HttpExchange): Unit = {
    val out = mapper.createObjectNode()
    val arr = out.putArray("data")
    health.entities().foreach { case (k, i) =>
      if (ownsEntity(k, i)) arr.add(renderHealth(health.health(k, i)))
    }
    respond(ex, 200, out.toString)
  }

  private def doHealthShow(ex: HttpExchange, kind: String,
      id: String): Unit =
    if (!Health.EntityKinds.contains(kind))
      respond(ex, 404, err(s"unknown entity kind: $kind"))
    else if (!ownsEntity(kind, id))
      respond(ex, 404, err(s"$kind not found: $id"))
    else respond(ex, 200, renderHealth(health.health(kind, id)).toString)

  // ---- /api/api_keys (router.ex:162 `resources("/api_keys", ...,
  // only: [:index, :create, :delete])`; api_key_controller.ex) ----------

  private def renderToken(t: ApiTokenRec, showSensitive: Boolean): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("id", t.id)
    o.put("name", t.name)
    o.put("inserted_at", t.insertedAt.toString)
    // full token only in the create response (shown once); the index
    // obfuscates like the catalog passwords
    o.put("token", if (showSensitive) t.token
      else ManagementApi.obfuscate(t.token))
    o
  }

  private def doTokenIndex(ex: HttpExchange): Unit = {
    val out = mapper.createObjectNode()
    val arr = out.putArray("data")
    apiTokens.values.toSeq
      .filter(_.accountId == currentAccount.get()) // own tokens only
      .sortBy(_.id)
      .foreach(t => arr.add(renderToken(t, showSensitive = false)))
    respond(ex, 200, out.toString)
  }

  // ---- /api/accounts (accounts/account.ex; a library embedding has no
  // console signup, so account provisioning lives on the API: creating
  // an account mints its first token — shown once, like api-key create) --

  private def renderAccount(a: AccountRec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("id", a.id)
    o.put("name", a.name)
    o.put("inserted_at", a.insertedAt.toString)
    o
  }

  /** Shows only the CALLER's account — tenancy means other accounts'
    * existence is not observable.
    */
  private def doAccountIndex(ex: HttpExchange): Unit = {
    val out = mapper.createObjectNode()
    val arr = out.putArray("data")
    accounts.get(currentAccount.get()).foreach(a => arr.add(renderAccount(a)))
    respond(ex, 200, out.toString)
  }

  private def doAccountCreate(ex: HttpExchange): Unit =
    try {
      val node = mapper.readTree(ex.getRequestBody)
      val name = Option(node.get("name")).map(_.asText()).filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(
          "account requires name"))
      val acct = registerAccount(name)
      val tok = registerToken("bootstrap", acct.id)
      val o = renderAccount(acct)
      // the new account's first credential, shown exactly once
      o.set[ObjectNode]("api_token", renderToken(tok, showSensitive = true))
      respond(ex, 200, o.toString)
    } catch { case e: Throwable =>
      respond(ex, 422, validationErr(e.getMessage)) }

  private def doTokenCreate(ex: HttpExchange): Unit =
    try {
      val node = mapper.readTree(ex.getRequestBody)
      val name = Option(node.get("name")).map(_.asText()).filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(
          "api token requires name"))
      // minted in the CALLER's account — a token can only ever widen
      // access within its own tenancy
      val rec = registerToken(name, currentAccount.get())
      respond(ex, 200, renderToken(rec, showSensitive = true).toString)
    } catch { case e: Throwable =>
      respond(ex, 422, validationErr(e.getMessage)) }

  private def doTokenDelete(ex: HttpExchange, id: String): Unit = {
    val acct = currentAccount.get()
    apiTokens.get(id).filter(_.accountId == acct) match {
      // a foreign account's token id is indistinguishable from a
      // nonexistent one — 404, never 403 (existence is account-private)
      case None => respond(ex, 404, err(s"API token not found: $id"))
      case Some(_)
          if apiTokens.values.count(_.accountId == acct) == 1 =>
        // refuse deleting the account's FINAL token: with no console to
        // mint a replacement, removing the last credential permanently
        // locks the account out of every authenticated /api route — the
        // same no-unreachable-plane rationale that mints the bootstrap
        // token
        respond(ex, 422, validationErr(
          "cannot delete the last remaining API token: the management " +
            "plane would become permanently unreachable; create a " +
            "replacement token first"))
      case Some(_) =>
        apiTokens.remove(id)
        respond(ex, 200, """{"success":true}""")
    }
  }

  private def doIndex(ex: HttpExchange): Unit = {
    val out = mapper.createObjectNode()
    val arr = out.putArray("data")
    consumers().foreach(c => arr.add(PipelineSpec.renderNode(c)))
    respond(ex, 200, out.toString)
  }

  private def doShow(ex: HttpExchange, name: String): Unit =
    registry.get(name) match {
      case Some(c) => respond(ex, 200, PipelineSpec.renderNode(c).toString)
      case None    => respond(ex, 404, err(s"Sink consumer not found: $name"))
    }

  /** `GET /api/sinks/:name/trace` — the consumer's recent pipeline
    * decisions, newest first (the reference's `runtime/trace.ex` live
    * trace view, ring-buffered instead of PubSub'd; see
    * [[graft.streaming.Trace]]). `?limit=N` caps the page (default 100).
    */
  private def doTrace(ex: HttpExchange, name: String): Unit =
    registry.get(name) match {
      case None => respond(ex, 404, err(s"Sink consumer not found: $name"))
      case Some(_) =>
        val limit = Option(ex.getRequestURI.getQuery)
          .flatMap(_.split("&").collectFirst {
            case kv if kv.startsWith("limit=") =>
              kv.stripPrefix("limit=").toIntOption
          }.flatten)
          .getOrElse(100)
        val out = mapper.createObjectNode()
        val arr = out.putArray("data")
        graft.streaming.Trace.recent(name, limit).foreach { e =>
          val o = arr.addObject()
          o.put("status", e.status)
          o.put("message", e.message)
          val ext = o.putObject("extra")
          e.extra.toSeq.sortBy(_._1).foreach { case (k, v) => ext.put(k, v) }
          o.put("published_at", java.time.Instant
            .ofEpochMilli(e.publishedAtMs).toString)
        }
        respond(ex, 200, out.toString)
    }

  /** The reference resolves `http_endpoint` names against the account's
    * declared endpoints at sink create/update time
    * (`sink_consumer_controller.ex:34-44` passes `http_endpoints` into
    * `Transforms.from_external_sink_consumer`) — an http_push sink
    * referencing an undeclared endpoint is refused.
    */
  private def endpointRef(cfg: ConsumerConfig,
      extra: Set[String] = Set.empty): Option[String] =
    cfg.sink.filter(_.sinkType == "http_push")
      .flatMap(_.settings.get("http_endpoint"))
      .filterNot(n => endpoints.contains(n) || extra.contains(n))

  private def doCreate(ex: HttpExchange): Unit =
    parsedBody(ex).foreach { cfg =>
      endpointRef(cfg) match {
        case Some(missing) =>
          respond(ex, 422, validationErr(s"HTTP endpoint not found: $missing"))
        case None =>
          if (registry.putIfAbsent(cfg.name, cfg).isDefined)
            respond(ex, 422,
              validationErr(s"Sink consumer already exists: ${cfg.name}"))
          else respond(ex, 200, PipelineSpec.renderNode(cfg).toString)
      }
    }

  private def doUpdate(ex: HttpExchange, name: String): Unit =
    if (!registry.contains(name))
      respond(ex, 404, err(s"Sink consumer not found: $name"))
    else parsedBody(ex).foreach { cfg =>
      if (cfg.name != name)
        respond(ex, 422,
          validationErr(s"name is immutable: ${name} != ${cfg.name}"))
      else endpointRef(cfg) match {
        case Some(missing) =>
          respond(ex, 422, validationErr(s"HTTP endpoint not found: $missing"))
        case None =>
          registry.update(name, cfg)
          respond(ex, 200, PipelineSpec.renderNode(cfg).toString)
      }
    }

  private def doDelete(ex: HttpExchange, name: String): Unit =
    registry.remove(name) match {
      case Some(_) =>
        health.removeEntity("sink_consumer", name)
        graft.streaming.Trace.clear(name)
        respond(ex, 200, """{"success":true}""")
      case None    => respond(ex, 404, err(s"Sink consumer not found: $name"))
    }

  /** `POST /config/apply {"yaml": ...}` — parse + validate EVERY
    * resource first (endpoints, then sinks — a sink may reference an
    * endpoint declared in the SAME document), then upsert all
    * (all-or-nothing like the reference's loader: a bad document changes
    * nothing).
    */
  private def doApply(ex: HttpExchange): Unit =
    yamlBody(ex).foreach { yaml =>
      withValidated(ex, yaml) { (eps, rets, cfgs) =>
        eps.foreach(e => endpoints.update(e.name, sealEndpoint(e)))
        rets.foreach(r => retentions.update(r.name, r))
        cfgs.foreach(c => registry.update(c.name, c))
        val out = mapper.createObjectNode()
        val arr = out.putArray("resources")
        def res(kind: String, name: String): Unit = {
          val r = arr.addObject(); r.put("kind", kind); r.put("name", name)
        }
        eps.foreach(e => res("http_endpoint", e.name))
        rets.foreach(r => res("change_retention", r.name))
        cfgs.foreach(c => res("sink_consumer", c.name))
        respond(ex, 200, out.toString)
      }
    }

  /** `POST /config/plan` — the diff of a YAML document against the live
    * registry: create / update / unchanged per declared sink, delete for
    * live sinks the document omits (`yaml_controller.ex:46-76` envelope
    * shape, action per resource).
    */
  private def doPlan(ex: HttpExchange): Unit =
    yamlBody(ex).foreach { yaml =>
      withValidated(ex, yaml) { (eps, rets, cfgs) =>
        val declared = cfgs.map(c => c.name -> c).toMap
        val out = mapper.createObjectNode()
        val arr = out.putArray("changes")
        def change(action: String, name: String,
            kind: String = "sink_consumer"): Unit = {
          val c = arr.addObject()
          c.put("action", action); c.put("name", name); c.put("kind", kind)
        }
        eps.foreach { e =>
          endpoints.get(e.name) match {
            case None                  => change("create", e.name, "http_endpoint")
            case Some(cur) if cur != e => change("update", e.name, "http_endpoint")
            case Some(_)               => change("unchanged", e.name, "http_endpoint")
          }
        }
        rets.foreach { r =>
          retentions.get(r.name) match {
            case None                  => change("create", r.name, "change_retention")
            case Some(cur) if cur != r => change("update", r.name, "change_retention")
            case Some(_)               => change("unchanged", r.name, "change_retention")
          }
        }
        cfgs.foreach { c =>
          registry.get(c.name) match {
            case None                       => change("create", c.name)
            case Some(cur) if cur != c      => change("update", c.name)
            case Some(_)                    => change("unchanged", c.name)
          }
        }
        registry.keys.toSeq.sorted
          .filterNot(declared.contains).foreach(change("delete", _))
        respond(ex, 200, out.toString)
      }
    }

  private def doExport(ex: HttpExchange): Unit = {
    val epYaml =
      if (endpoints.isEmpty) ""
      else "http_endpoints:\n" + endpoints.values.toSeq.sortBy(_.name).map { e =>
        val sb = new StringBuilder(s"""  - name: "${e.name}"""" + "\n")
        e.url.foreach(u => sb.append(s"""    url: "$u"""" + "\n"))
        if (e.local) sb.append("    local: \"true\"\n")
        e.path.foreach(p => sb.append(s"""    path: "$p"""" + "\n"))
        val (enc, plain) = e.headers.partition(h =>
          e.encryptedHeaderKeys(h._1))
        if (plain.nonEmpty) {
          sb.append("    headers:\n")
          plain.foreach { case (k, v) =>
            sb.append(s"""      - key: "$k"""" + "\n")
            sb.append(s"""        value: "$v"""" + "\n")
          }
        }
        // at-rest form: the CIPHERTEXT is what leaves the process —
        // an exported config never contains the secret bytes
        if (enc.nonEmpty) {
          sb.append("    encrypted_headers:\n")
          enc.foreach { case (k, v) =>
            sb.append(s"""      - key: "$k"""" + "\n")
            sb.append(s"""        value: "${vault.seal(v)}"""" + "\n")
          }
        }
        sb.toString
      }.mkString
    val retYaml =
      if (retentions.isEmpty) ""
      else "change_retentions:\n" + changeRetentions().map { r =>
        val sb = new StringBuilder(s"""  - name: "${r.name}"""" + "\n")
        sb.append(s"""    source_database: "${r.sourceDatabase}"""" + "\n")
        sb.append(s"""    source_table_schema: "${r.sourceSchema}"""" + "\n")
        sb.append(s"""    source_table_name: "${r.sourceTable}"""" + "\n")
        sb.append(s"""    destination_database: "${r.destinationDatabase}"""" + "\n")
        sb.append(s"""    destination_table_schema: "${r.destinationSchema}"""" + "\n")
        sb.append(s"""    destination_table_name: "${r.destinationTable}"""" + "\n")
        sb.append("    actions:\n")
        r.actions.foreach(a => sb.append(s"      - $a\n"))
        if (r.filters.nonEmpty) {
          sb.append("    filters:\n")
          r.filters.foreach { fl =>
            sb.append(s"""      - column_name: "${fl.field}"""" + "\n")
            fl.jsonbPath.foreach(p =>
              sb.append(s"""        field_path: "$p"""" + "\n"))
            val op = if (fl.op == "==") "=" else fl.op
            sb.append(s"""        operator: "$op"""" + "\n")
            fl.values.headOption.foreach(v =>
              sb.append(s"""        comparison_value: "$v"""" + "\n"))
            sb.append(s"""        field_type: "${fl.valueType}"""" + "\n")
          }
        }
        sb.toString
      }.mkString
    // a section with zero entries must be OMITTED — a bare `sinks:`
    // header renders as an empty scalar and would not re-parse
    val sinksYaml =
      if (registry.isEmpty) "" else YamlSpec.renderAll(consumers())
    val out = mapper.createObjectNode()
    out.put("yaml", epYaml + retYaml + sinksYaml)
    respond(ex, 200, out.toString)
  }

  // ---- backfill control plane (backfill_controller.ex parity) -----------

  private def renderBackfill(b: BackfillRec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("id", b.id); o.put("table", b.table); o.put("state", b.state)
    o.put("rows_processed_count", b.rowsProcessedCount)
    o.put("rows_ingested_count", b.rowsIngestedCount)
    o
  }

  private def withSink(ex: HttpExchange, name: String)(f: => Unit): Unit =
    if (registry.contains(name)) f
    else respond(ex, 404, err(s"Sink consumer not found: $name"))

  private def doBackfillIndex(ex: HttpExchange, name: String): Unit =
    withSink(ex, name) {
      val out = mapper.createObjectNode()
      val arr = out.putArray("data")
      backfills.getOrElse(name, Vector.empty).foreach(b => arr.add(renderBackfill(b)))
      respond(ex, 200, out.toString)
    }

  private def doBackfillShow(ex: HttpExchange, name: String, id: String): Unit =
    withSink(ex, name) {
      backfills.getOrElse(name, Vector.empty).find(_.id.toString == id) match {
        case Some(b) => respond(ex, 200, renderBackfill(b).toString)
        case None    => respond(ex, 404, err(s"Backfill not found: $id"))
      }
    }

  /** `POST /sinks/{name}/backfills {"table": "schema.table"}` — a new
    * `active` record; a missing table reference is the controller's
    * "Table reference is required" validation error.
    */
  private def doBackfillCreate(ex: HttpExchange, name: String): Unit =
    withSink(ex, name) {
      try {
        val node = mapper.readTree(body(ex))
        val t = node.get("table")
        if (t == null || !t.isTextual || t.asText().isEmpty)
          respond(ex, 422, validationErr("Table reference is required"))
        else {
          val rec = BackfillRec(backfillSeq.incrementAndGet(), t.asText(), "active")
          backfills.updateWith(name) {
            case Some(v) => Some(v :+ rec); case None => Some(Vector(rec))
          }
          respond(ex, 200, renderBackfill(rec).toString)
        }
      } catch { case e: Throwable =>
        respond(ex, 422, validationErr(e.getMessage)) }
    }

  /** `PUT` accepts ONLY `{"state": ...}` — any other field is the
    * reference's "Unknown field: x" refusal
    * (`transforms.ex:1608-1619`).
    */
  private def doBackfillUpdate(ex: HttpExchange, name: String, id: String): Unit =
    withSink(ex, name) {
      try {
        val node = mapper.readTree(body(ex))
        val fields = {
          val it = node.fieldNames(); val b = Vector.newBuilder[String]
          while (it.hasNext) b += it.next(); b.result()
        }
        fields.find(_ != "state") match {
          case Some(unknown) =>
            respond(ex, 422, validationErr(s"Unknown field: $unknown"))
          case None =>
            val st = Option(node.get("state")).map(_.asText())
            if (!st.exists(BackfillStates.contains))
              respond(ex, 422, validationErr(
                s"state must be one of: ${BackfillStates.toSeq.sorted.mkString(", ")}"))
            else {
              var updated: Option[BackfillRec] = None
              backfills.updateWith(name) {
                case Some(v) => Some(v.map { b =>
                  if (b.id.toString == id) {
                    val n = b.copy(state = st.get); updated = Some(n); n
                  } else b
                })
                case None => None
              }
              updated match {
                case Some(b) => respond(ex, 200, renderBackfill(b).toString)
                case None    => respond(ex, 404, err(s"Backfill not found: $id"))
              }
            }
        }
      } catch { case e: Throwable =>
        respond(ex, 422, validationErr(e.getMessage)) }
    }

  // ---- plumbing ---------------------------------------------------------

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  /** Parse + validate a sink-consumer JSON body; responds 422 (the
    * fallback plug's ValidationError shape) and returns None on failure.
    */
  private def parsedBody(ex: HttpExchange): Option[ConsumerConfig] =
    try Some(PipelineSpec.parse(body(ex)))
    catch { case e: Throwable =>
      respond(ex, 422, validationErr(e.getMessage)); None }

  private def yamlBody(ex: HttpExchange): Option[String] =
    try {
      val node = mapper.readTree(body(ex))
      val y = node.get("yaml")
      if (y == null || !y.isTextual) {
        respond(ex, 422, validationErr("body must be {\"yaml\": \"...\"}"))
        None
      } else Some(y.asText())
    } catch { case e: Throwable =>
      respond(ex, 422, validationErr(e.getMessage)); None }

  private def withValidated(ex: HttpExchange, rawYaml: String)(
      f: (Seq[YamlSpec.HttpEndpointSpec], Seq[YamlSpec.ChangeRetentionSpec],
        Seq[ConsumerConfig]) => Unit): Unit =
    try {
      // ${VAR:-default} substitution happens before parse, like the
      // reference loader
      val yaml = YamlSpec.substituteEnv(rawYaml)
      val eps = YamlSpec.parseHttpEndpoints(yaml)
      val rets = YamlSpec.parseChangeRetentions(yaml)
      val cfgs = YamlSpec.parseSinks(yaml)
      val dup = cfgs.groupBy(_.name).collect { case (n, cs) if cs.size > 1 => n }
      val dupE = eps.groupBy(_.name).collect { case (n, es) if es.size > 1 => n }
      val dupR = rets.groupBy(_.name).collect { case (n, rs) if rs.size > 1 => n }
      val docEndpoints = eps.map(_.name).toSet
      val missing = cfgs.flatMap(endpointRef(_, docEndpoints))
      if (dup.nonEmpty)
        respond(ex, 422, validationErr(s"duplicate sink names: ${dup.mkString(", ")}"))
      else if (dupE.nonEmpty)
        respond(ex, 422, validationErr(s"duplicate endpoint names: ${dupE.mkString(", ")}"))
      else if (dupR.nonEmpty)
        respond(ex, 422, validationErr(s"duplicate retention names: ${dupR.mkString(", ")}"))
      else if (missing.nonEmpty)
        respond(ex, 422, validationErr(
          s"HTTP endpoint not found: ${missing.distinct.mkString(", ")}"))
      else f(eps, rets, cfgs)
    } catch { case e: Throwable =>
      respond(ex, 422, validationErr(e.getMessage)) }

  // ---- HTTP endpoint destinations (http_endpoint_controller.ex) ---------

  private def renderEndpoint(e: YamlSpec.HttpEndpointSpec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("name", e.name)
    e.url.foreach(o.put("url", _))
    if (e.local) o.put("local", true)
    e.path.foreach(o.put("path", _))
    val hs = o.putArray("headers")
    e.headers.foreach { case (k, v) =>
      val h = hs.addObject(); h.put("key", k)
      h.put("value",
        if (e.encryptedHeaderKeys(k)) obfuscate(vault.reveal(v)) else v)
    }
    o
  }

  private def parseEndpointJson(node: JsonNode): YamlSpec.HttpEndpointSpec = {
    val name = Option(node.get("name")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException("http_endpoint requires a name"))
    val url = Option(node.get("url")).map(_.asText())
    val local = Option(node.get("local")).exists(_.asBoolean(false))
    if (url.isEmpty && !local)
      throw new IllegalArgumentException(
        s"http_endpoint $name requires url or local: true")
    if (url.nonEmpty && local)
      throw new IllegalArgumentException(
        s"http_endpoint $name: url and local are mutually exclusive")
    def headerList(field: String): Seq[(String, String)] =
      Option(node.get(field)).toSeq.flatMap { hs =>
        (0 until hs.size()).map { i =>
          val h = hs.get(i)
          (h.get("key").asText(), h.get("value").asText())
        }
      }
    val plain = headerList("headers")
    val enc = headerList("encrypted_headers")
    YamlSpec.HttpEndpointSpec(name, url, local,
      Option(node.get("path")).map(_.asText()), plain ++ enc,
      enc.map(_._1).toSet)
  }

  private def doEndpointIndex(ex: HttpExchange): Unit = {
    val out = mapper.createObjectNode()
    val arr = out.putArray("data")
    endpoints.values.toSeq.sortBy(_.name).foreach(e => arr.add(renderEndpoint(e)))
    respond(ex, 200, out.toString)
  }

  private def doEndpointShow(ex: HttpExchange, name: String): Unit =
    endpoints.get(name) match {
      case Some(e) => respond(ex, 200, renderEndpoint(e).toString)
      case None    => respond(ex, 404, err(s"HTTP endpoint not found: $name"))
    }

  private def doEndpointCreate(ex: HttpExchange): Unit =
    try {
      val e = sealEndpoint(parseEndpointJson(mapper.readTree(body(ex))))
      if (endpoints.putIfAbsent(e.name, e).isDefined)
        respond(ex, 422, validationErr(s"HTTP endpoint already exists: ${e.name}"))
      else respond(ex, 200, renderEndpoint(e).toString)
    } catch { case e: Throwable =>
      respond(ex, 422, validationErr(e.getMessage)) }

  /** Deleting an endpoint a live http_push sink still references is
    * refused — the referential integrity the reference gets from its
    * foreign key.
    */
  private def doEndpointDelete(ex: HttpExchange, name: String): Unit = {
    val refs = registry.values.collect {
      case c if c.sink.exists(s => s.sinkType == "http_push" &&
        s.settings.get("http_endpoint").contains(name)) => c.name
    }.toSeq.sorted
    if (refs.nonEmpty)
      respond(ex, 422, validationErr(
        s"HTTP endpoint $name is referenced by: ${refs.mkString(", ")}"))
    else endpoints.remove(name) match {
      case Some(_) => respond(ex, 200, """{"success":true}""")
      case None    => respond(ex, 404, err(s"HTTP endpoint not found: $name"))
    }
  }

  // ---- postgres databases (postgres_database_controller.ex) -------------

  /** Catalog record of a connected database + its replication slot
    * (`postgres_database.ex` changeset fields; the reference keeps these
    * rows in its own Postgres). `tables` is the cached table list that
    * `refresh_tables` re-reads over the wire (`databases.ex:486`).
    */
  final case class DatabaseRec(
      name: String, hostname: String, port: Int, database: String,
      username: String, password: String,
      slotName: String, publicationName: String,
      tables: Vector[TableRec] = Vector.empty)

  /** One catalog table: the projection of `postgres.ex:345-372`'s
    * fetch_tables_with_columns rows this plane stores.
    */
  final case class TableRec(schema: String, name: String, oid: Long,
      columns: Vector[ColumnRec])
  final case class ColumnRec(attnum: Int, name: String, pgType: String,
      isPk: Boolean)

  // account-scoped like every other catalog resource: a database name
  // exists only within its creating account, so the tunnel preamble's
  // token binding is ENFORCED by construction (a foreign account's
  // database name simply misses → "unknown database", existence stays
  // account-private)
  private[config] val databases = new Scoped[DatabaseRec]

  /** The reference's catalog SQL, compacted to the columns we store
    * (`postgres.ex:345-372`): tables + columns + pk flags, partition
    * children excluded.
    */
  private[config] val CatalogTablesSql: String =
    """select n.nspname, c.relname, c.oid, a.attnum, a.attname,
      |  pg_catalog.format_type(a.atttypid, -1),
      |  coalesce(i.indisprimary, false)
      |from pg_class c
      |join pg_namespace n on c.relnamespace = n.oid
      |join pg_attribute a on c.oid = a.attrelid
      |left join pg_index i on c.oid = i.indrelid and a.attnum = any(i.indkey)
      |where c.relkind in ('r', 'p') and a.attnum > 0
      |  and not a.attisdropped
      |  and not exists (select 1 from pg_inherits inh
      |    where inh.inhrelid = c.oid)
      |order by n.nspname, c.relname, a.attnum""".stripMargin

  private def obfuscate(secret: String): String =
    ManagementApi.obfuscate(secret)

  private def parseDbJson(node: JsonNode): DatabaseRec = {
    def req(f: String): String = {
      val v = Option(node.get(f)).map(_.asText()).filter(_.nonEmpty)
      v.getOrElse(throw new IllegalArgumentException(
        s"postgres_database requires $f"))
    }
    DatabaseRec(
      name = req("name"),
      hostname = req("hostname"),
      port = Option(node.get("port")).map(_.asInt()).getOrElse(5432),
      database = req("database"),
      username = req("username"),
      password = vault.seal(req("password")), // sealed at rest
      slotName = req("slot_name"),
      publicationName = req("publication_name"))
  }

  private def renderDb(d: DatabaseRec, showSensitive: Boolean): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("name", d.name)
    o.put("hostname", d.hostname)
    o.put("port", d.port)
    o.put("database", d.database)
    o.put("username", d.username)
    o.put("password", if (showSensitive) vault.reveal(d.password)
      else obfuscate(vault.reveal(d.password)))
    val slots = o.putArray("replication_slots")
    val s = slots.addObject()
    s.put("publication_name", d.publicationName)
    s.put("slot_name", d.slotName)
    s.put("status", "active")
    val ts = o.putArray("tables")
    d.tables.foreach { t =>
      val to = ts.addObject()
      to.put("schema", t.schema)
      to.put("name", t.name)
      to.put("oid", t.oid)
      val cs = to.putArray("columns")
      t.columns.foreach { c =>
        val co = cs.addObject()
        co.put("attnum", c.attnum)
        co.put("name", c.name)
        co.put("type", c.pgType)
        co.put("is_pk", c.isPk)
      }
    }
    o
  }

  private def showSensitive(ex: HttpExchange): Boolean =
    Option(ex.getRequestURI.getQuery).exists(
      _.split("&").contains("show_sensitive=true"))

  private def doDbIndex(ex: HttpExchange): Unit = {
    val out = mapper.createObjectNode()
    val arr = out.putArray("data")
    val sensitive = showSensitive(ex)
    databases.values.toSeq.sortBy(_.name)
      .foreach(d => arr.add(renderDb(d, sensitive)))
    respond(ex, 200, out.toString)
  }

  /** Create tests the connection FIRST, like the reference's
    * `test_db_conn` in the create with-chain
    * (`postgres_database_controller.ex:34-44`): an unreachable database
    * is refused, nothing is stored.
    */
  private def doDbCreate(ex: HttpExchange): Unit =
    try {
      val d = parseDbJson(mapper.readTree(body(ex)))
      graft.sources.CatalogClient.testConnection(d.hostname, d.port,
          d.username, d.database) match {
        case Left(reason) =>
          respond(ex, 422, validationErr(s"cannot connect: $reason"))
        case Right(()) =>
          if (databases.putIfAbsent(d.name, d).isDefined)
            respond(ex, 422,
              validationErr(s"Postgres database already exists: ${d.name}"))
          else respond(ex, 201, renderDb(d, showSensitive = false).toString)
      }
    } catch { case e: Throwable =>
      respond(ex, 422, validationErr(e.getMessage)) }

  private def doDbShow(ex: HttpExchange, name: String): Unit =
    databases.get(name) match {
      case Some(d) => respond(ex, 200, renderDb(d, showSensitive(ex)).toString)
      case None => respond(ex, 404, err(s"Postgres database not found: $name"))
    }

  private def doDbUpdate(ex: HttpExchange, name: String): Unit =
    if (!databases.contains(name))
      respond(ex, 404, err(s"Postgres database not found: $name"))
    else try {
      val d = parseDbJson(mapper.readTree(body(ex)))
      if (d.name != name)
        respond(ex, 422, validationErr(s"name is immutable: $name != ${d.name}"))
      else {
        // keep the cached table list across an update (refresh re-reads)
        val prev = databases(name)
        databases.update(name, d.copy(tables = prev.tables))
        respond(ex, 200, renderDb(databases(name), showSensitive = false).toString)
      }
    } catch { case e: Throwable =>
      respond(ex, 422, validationErr(e.getMessage)) }

  private def doDbDelete(ex: HttpExchange, name: String): Unit = {
    // FK parity (postgres_replication_slots_postgres_database_id_fkey):
    // a database a replication references cannot be deleted
    val refs = replications.values.filter(_.postgresDatabase == name)
      .map(_.id).toVector.sorted
    if (refs.nonEmpty)
      respond(ex, 422, validationErr(
        s"Postgres database '$name' is referenced by postgres_replications: " +
          refs.mkString(", ")))
    else databases.remove(name) match {
      case Some(_) =>
        val o = mapper.createObjectNode()
        o.put("success", true); o.put("id", name)
        respond(ex, 200, o.toString)
      case None => respond(ex, 404, err(s"Postgres database not found: $name"))
    }
  }

  // ---- /api/postgres_replications (router.ex:164;
  // replication/postgres_replication_slot.ex:1-97 — the slot/publication
  // resource that wires a catalog database to the WAL source) ------------

  /** `postgres_replication_slots` row (postgres_replication_slot.ex:33-55):
    * slot + publication on a declared catalog database; `status`
    * active|disabled (disabled ⇒ the health entity reads `paused`);
    * `partition_count` sizes the parallel decode stage. This record is
    * what [[graft.sources.ReplicationClient]] / `WalSpool` take their
    * slot/publication config from.
    */
  final case class ReplicationRec(id: Int, postgresDatabase: String,
      slotName: String, publicationName: String, status: String,
      partitionCount: Int)

  private def renderRepl(r: ReplicationRec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("id", r.id)
    o.put("postgres_database", r.postgresDatabase)
    o.put("slot_name", r.slotName)
    o.put("publication_name", r.publicationName)
    o.put("status", r.status)
    o.put("partition_count", r.partitionCount)
    o
  }

  private def parseReplJson(node: JsonNode,
      existing: Option[ReplicationRec]): ReplicationRec = {
    def opt(f: String): Option[String] =
      Option(node.get(f)).map(_.asText()).filter(_.nonEmpty)
    def req(f: String, prev: Option[String]): String =
      opt(f).orElse(prev).getOrElse(throw new IllegalArgumentException(
        s"postgres_replication requires $f"))
    val db = existing match {
      case Some(r) =>
        // the reference's update_changeset does not cast
        // postgres_database_id — the database link is immutable
        opt("postgres_database").foreach { d =>
          if (d != r.postgresDatabase) throw new IllegalArgumentException(
            s"postgres_database is immutable: $d != ${r.postgresDatabase}")
        }
        r.postgresDatabase
      case None => req("postgres_database", None)
    }
    if (!databases.contains(db))
      throw new IllegalArgumentException(s"Postgres database not found: $db")
    val status = opt("status").orElse(existing.map(_.status))
      .getOrElse("active")
    if (!ReplStatuses.contains(status))
      throw new IllegalArgumentException(s"invalid status: $status")
    val pc = Option(node.get("partition_count")).map(_.asInt())
      .orElse(existing.map(_.partitionCount)).getOrElse(1)
    if (pc < 1) throw new IllegalArgumentException(
      s"partition_count must be >= 1: $pc")
    ReplicationRec(
      existing.map(_.id).getOrElse(replSeq.incrementAndGet()),
      db,
      req("slot_name", existing.map(_.slotName)),
      req("publication_name", existing.map(_.publicationName)),
      status, pc)
  }

  private def doReplIndex(ex: HttpExchange): Unit = {
    val out = mapper.createObjectNode()
    val arr = out.putArray("data")
    replications.values.toVector.sortBy(_.id)
      .foreach(r => arr.add(renderRepl(r)))
    respond(ex, 200, out.toString)
  }

  private def doReplCreate(ex: HttpExchange): Unit =
    try {
      val r = parseReplJson(mapper.readTree(ex.getRequestBody), None)
      // unique_constraint([:slot_name, :postgres_database_id])
      if (replications.values.exists(x =>
          x.slotName == r.slotName && x.postgresDatabase == r.postgresDatabase))
        throw new IllegalArgumentException(
          s"slot '${r.slotName}' already declared on database " +
            s"'${r.postgresDatabase}'")
      replications.put(r.id.toString, r)
      health.setPaused("postgres_replication_slot", r.id.toString,
        r.status == "disabled")
      respond(ex, 200, renderRepl(r).toString)
    } catch { case e: Throwable =>
      respond(ex, 422, validationErr(e.getMessage)) }

  private def doReplShow(ex: HttpExchange, id: String): Unit =
    replications.get(id) match {
      case Some(r) => respond(ex, 200, renderRepl(r).toString)
      case None    =>
        respond(ex, 404, err(s"Postgres replication not found: $id"))
    }

  private def doReplUpdate(ex: HttpExchange, id: String): Unit =
    replications.get(id) match {
      case None =>
        respond(ex, 404, err(s"Postgres replication not found: $id"))
      case Some(prev) =>
        try {
          val r = parseReplJson(mapper.readTree(ex.getRequestBody),
            Some(prev))
          // unique (slot_name, database) holds on UPDATE too
          if (replications.exists { case (k, x) => k != id &&
              x.slotName == r.slotName &&
              x.postgresDatabase == r.postgresDatabase })
            throw new IllegalArgumentException(
              s"slot '${r.slotName}' already declared on database " +
                s"'${r.postgresDatabase}'")
          replications.put(id, r)
          health.setPaused("postgres_replication_slot", id,
            r.status == "disabled")
          respond(ex, 200, renderRepl(r).toString)
        } catch { case e: Throwable =>
          respond(ex, 422, validationErr(e.getMessage)) }
    }

  private def doReplDelete(ex: HttpExchange, id: String): Unit =
    replications.remove(id) match {
      case Some(_) =>
        // a deleted replication must not linger as a phantom (possibly
        // paused/erroring) entity on the health surface
        health.removeEntity("postgres_replication_slot", id)
        val o = mapper.createObjectNode()
        o.put("success", true); o.put("id", id)
        respond(ex, 200, o.toString)
      case None =>
        respond(ex, 404, err(s"Postgres replication not found: $id"))
    }

  /** `POST :id_or_name/test_connection`
    * (`postgres_database_controller.ex:90-106`): live handshake over the
    * wire; failure is 422 with the reason, parity with
    * `format_error_reason`.
    */
  private def doDbTestConnection(ex: HttpExchange, name: String): Unit =
    databases.get(name) match {
      case None => respond(ex, 404, err(s"Postgres database not found: $name"))
      case Some(d) =>
        graft.sources.CatalogClient.testConnection(d.hostname, d.port,
            d.username, d.database) match {
          case Right(()) => respond(ex, 200, """{"success":true}""")
          case Left(reason) =>
            val o = mapper.createObjectNode()
            o.put("success", false)
            o.put("reason", reason)
            respond(ex, 422, o.toString)
        }
    }

  /** `POST :id_or_name/refresh_tables`
    * (`postgres_database_controller.ex:129-144` → `databases.ex:486`
    * update_tables): re-read the catalog over the wire, store the new
    * table list.
    */
  private def doDbRefreshTables(ex: HttpExchange, name: String): Unit =
    databases.get(name) match {
      case None => respond(ex, 404, err(s"Postgres database not found: $name"))
      case Some(d) =>
        graft.sources.CatalogClient.query(d.hostname, d.port, d.username,
            d.database, CatalogTablesSql) match {
          case Left(_) => respond(ex, 422, """{"success":false}""")
          case Right(rs) =>
            val tables = rs.rows
              .collect { case Seq(Some(sch), Some(tbl), Some(oid),
                  Some(attnum), Some(cname), Some(ctype), Some(isPk)) =>
                (sch, tbl, oid.toLong,
                  ColumnRec(attnum.toInt, cname, ctype,
                    isPk == "t" || isPk == "true"))
              }
              .groupBy(r => (r._1, r._2, r._3)).toVector
              .sortBy { case ((sch, tbl, _), _) => (sch, tbl) }
              .map { case ((sch, tbl, oid), cols) =>
                // the pg_index left join multiplies rows for a column in
                // more than one index — the reference collapses with
                // `distinct on (...attnum) order by indisprimary desc`;
                // same effect here: one ColumnRec per attnum, pk if ANY
                // containing index is the primary
                val byAttnum = cols.map(_._4).groupBy(_.attnum).toVector
                  .map { case (_, dups) =>
                    dups.find(_.isPk).getOrElse(dups.head) }
                TableRec(sch, tbl, oid, byAttnum.sortBy(_.attnum).toVector)
              }
            databases.update(name, d.copy(tables = tables))
            respond(ex, 200, """{"success":true}""")
        }
    }

  private def err(msg: String): String = {
    val o = mapper.createObjectNode(); o.put("summary", msg); o.toString
  }

  /** 422 body in the fallback plug's ValidationError shape. */
  private def validationErr(msg: String): String = {
    val o = mapper.createObjectNode()
    o.put("summary", msg)
    o.putObject("validation_errors")
    o.put("code", "validation_error")
    o.toString
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("content-type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

object ManagementApi {
  /** `Sequin.String.obfuscate/1` parity (`string.ex:5-35`): ≤5 chars
    * full stars, 6-9 keep first+last, ≥10 keep first 3 + last.
    */
  def obfuscate(secret: String): String = {
    val len = secret.length
    if (len == 0) ""
    else if (len <= 5) "*" * len
    else if (len <= 9) s"${secret.head}${"*" * (len - 2)}${secret.last}"
    else s"${secret.take(3)}${"*" * (len - 4)}${secret.last}"
  }
}
