package graft

import graft.config.ManagementApi
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite

/** The management plane driven through its real loopback HTTP surface:
  * sink CRUD with the fallback plug's error shapes, every write through
  * the PipelineSpec validation sandbox, and the config-as-code
  * apply/plan/export trio (router.ex: /api/sinks and the config routes).
  */
class ManagementApiSpec extends AnyFunSuite {

  private val client = HttpClient.newHttpClient()

  private def send(port: Int, method: String, path: String,
      body: Option[String] = None)(
      implicit token: String): (Int, String) = {
    val b0 = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
    val b = if (token.isEmpty) b0
      else b0.header("Authorization", s"Bearer $token")
    val req = (method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body.getOrElse("")))
    }).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def cfg(name: String, batch: Int = 5): String =
    s"""{"name":"$name","source":{"include_schemas":["public"]},
       |"batch_size":$batch,
       |"destination":{"type":"kafka","topic":"t"}}""".stripMargin

  test("sink CRUD lifecycle with the fallback plug's error shapes") {
    val api = new ManagementApi
    implicit val token: String = api.bootstrapToken
    try {
      val p = api.port()
      val (cs, cb) = send(p, "POST", "/api/sinks", Some(cfg("orders")))
      assert(cs == 200 && cb.contains("\"name\":\"orders\""))
      // duplicate create → 422 in the ValidationError shape
      val (ds, db) = send(p, "POST", "/api/sinks", Some(cfg("orders")))
      assert(ds == 422 && db.contains("already exists") &&
        db.contains("\"code\":\"validation_error\""))
      val (is, ib) = send(p, "GET", "/api/sinks")
      assert(is == 200 && ib.contains("\"orders\""))
      val (ss, sb) = send(p, "GET", "/api/sinks/orders")
      assert(ss == 200 && sb.contains("\"batch_size\":5"))
      // update through validation; name immutable
      val (us, ub) = send(p, "PUT", "/api/sinks/orders", Some(cfg("orders", 9)))
      assert(us == 200 && ub.contains("\"batch_size\":9"))
      val (ms, mb) = send(p, "PUT", "/api/sinks/orders", Some(cfg("renamed")))
      assert(ms == 422 && mb.contains("immutable"))
      val (xs, xb) = send(p, "DELETE", "/api/sinks/orders")
      assert(xs == 200 && xb.contains("\"success\":true"))
      val (ns, nb) = send(p, "GET", "/api/sinks/orders")
      assert(ns == 404 && nb.contains("not found"))
      assert(send(p, "DELETE", "/api/sinks/orders")._1 == 404)
    } finally api.stop()
  }

  test("writes run the expression sandbox: a clock-reading filter is refused") {
    val api = new ManagementApi
    implicit val token: String = api.bootstrapToken
    try {
      val bad =
        """{"name":"sneaky","source":{"include_schemas":["public"]},
          |"filter_function":"record_value > unix_timestamp()",
          |"destination":{"type":"kafka","topic":"t"}}""".stripMargin
      val (s, b) = send(api.port(), "POST", "/api/sinks", Some(bad))
      assert(s == 422 && b.contains("\"code\":\"validation_error\""))
      assert(api.consumers().isEmpty) // refused config never lands
    } finally api.stop()
  }

  test("backfill control plane: create/list/show and the state-only update contract") {
    val api = new ManagementApi
    implicit val token: String = api.bootstrapToken
    try {
      val p = api.port()
      // backfills hang off an existing sink
      assert(send(p, "POST", "/api/sinks/ghost/backfills",
        Some("""{"table":"public.orders"}"""))._1 == 404)
      send(p, "POST", "/api/sinks", Some(cfg("orders")))
      // table reference required (controller's validation summary)
      val (ms, mb) = send(p, "POST", "/api/sinks/orders/backfills", Some("{}"))
      assert(ms == 422 && mb.contains("Table reference is required"))
      val (cs, cb) = send(p, "POST", "/api/sinks/orders/backfills",
        Some("""{"table":"public.orders"}"""))
      assert(cs == 200 && cb.contains("\"state\":\"active\""))
      val id = "\"id\":(\\d+)".r.findFirstMatchIn(cb).get.group(1)
      val (is, ib) = send(p, "GET", "/api/sinks/orders/backfills")
      assert(is == 200 && ib.contains("\"data\"") && ib.contains(s"\"id\":$id"))
      // update accepts ONLY state; unknown fields are refused by name
      val (us, ub) = send(p, "PUT", s"/api/sinks/orders/backfills/$id",
        Some("""{"rows_processed_count":99}"""))
      assert(us == 422 && ub.contains("Unknown field: rows_processed_count"))
      assert(send(p, "PUT", s"/api/sinks/orders/backfills/$id",
        Some("""{"state":"bogus"}"""))._1 == 422)
      val (ps, pb) = send(p, "PUT", s"/api/sinks/orders/backfills/$id",
        Some("""{"state":"cancelled"}"""))
      assert(ps == 200 && pb.contains("\"state\":\"cancelled\""))
      val (ss, sb) = send(p, "GET", s"/api/sinks/orders/backfills/$id")
      assert(ss == 200 && sb.contains("\"state\":\"cancelled\""))
      assert(send(p, "GET", "/api/sinks/orders/backfills/999")._1 == 404)
    } finally api.stop()
  }

  test("http endpoints: CRUD, sink referential integrity, and same-document " +
      "declaration in apply") {
    val api = new ManagementApi
    implicit val token: String = api.bootstrapToken
    try {
      val p = api.port()
      // an http_push sink referencing an undeclared endpoint is refused
      def pushSink(name: String) =
        s"""{"name":"$name","source":{"include_schemas":["public"]},
           |"destination":{"type":"http_push","http_endpoint":"hooks"}}""".stripMargin
      val (rs, rb) = send(p, "POST", "/api/sinks", Some(pushSink("web")))
      assert(rs == 422 && rb.contains("HTTP endpoint not found: hooks"))
      // declare it, then the sink lands
      val ep = """{"name":"hooks","url":"https://example.test/hook",
                 |"headers":[{"key":"X-T","value":"1"}]}""".stripMargin
      assert(send(p, "POST", "/api/destinations/http_endpoints", Some(ep))._1 == 200)
      assert(send(p, "POST", "/api/destinations/http_endpoints", Some(ep))._1 == 422)
      assert(send(p, "POST", "/api/sinks", Some(pushSink("web")))._1 == 200)
      // url XOR local validated
      assert(send(p, "POST", "/api/destinations/http_endpoints",
        Some("""{"name":"bad"}"""))._1 == 422)
      // deleting a referenced endpoint is refused; unreferenced deletes
      val (ds, db) = send(p, "DELETE", "/api/destinations/http_endpoints/hooks")
      assert(ds == 422 && db.contains("referenced by: web"))
      send(p, "DELETE", "/api/sinks/web")
      assert(send(p, "DELETE", "/api/destinations/http_endpoints/hooks")._1 == 200)
      // apply: a sink may reference an endpoint declared in the SAME doc;
      // endpoints land in resources and survive the export round-trip
      val yaml =
        """http_endpoints:
          |  - name: "hooks2"
          |    url: "https://example.test/h2"
          |sinks:
          |  - name: "web2"
          |    source:
          |      include_schemas:
          |        - "public"
          |    destination:
          |      type: "webhook"
          |      http_endpoint: "hooks2"
          |""".stripMargin
      val body = s"""{"yaml": ${com.fasterxml.jackson.databind.node
        .JsonNodeFactory.instance.textNode(yaml).toString}}"""
      val (as_, ab) = send(p, "POST", "/api/config/apply", Some(body))
      assert(as_ == 200 && ab.contains("http_endpoint") && ab.contains("web2"))
      val (es, eb) = send(p, "GET", "/api/config/export")
      assert(es == 200)
      val api2 = new ManagementApi
      try {
        assert(send(api2.port(), "POST", "/api/config/apply", Some(eb))(api2.bootstrapToken)._1 == 200)
        assert(api2.consumers() == api.consumers())
        assert(send(api2.port(), "GET",
          "/api/destinations/http_endpoints/hooks2")(api2.bootstrapToken)
          ._1 == 200)
      } finally api2.stop()
    } finally api.stop()
  }

  test("account-scoped multi-tenancy: two tokens see DISJOINT resource " +
      "sets over real HTTP; cross-account access is 404, never 403") {
    val api = new ManagementApi
    val tokenA = api.bootstrapToken
    try {
      val p = api.port()
      // account A declares resources
      assert(send(p, "POST", "/api/sinks", Some(cfg("orders", 5)))(tokenA)._1 == 200)
      assert(send(p, "POST", "/api/sinks", Some(cfg("audit", 5)))(tokenA)._1 == 200)
      assert(send(p, "POST", "/api/destinations/http_endpoints",
        Some("""{"name":"hooks","url":"https://a.test/h"}"""))(tokenA)._1 == 200)
      // provision account B over the API: its first token is minted with
      // the account and shown once
      val (bs, bb) = send(p, "POST", "/api/accounts",
        Some("""{"name":"TeamB"}"""))(tokenA)
      assert(bs == 200 && bb.contains("\"name\":\"TeamB\""), bb)
      val tokenB = "\"token\":\"([^\"]+)\"".r.findFirstMatchIn(bb).get.group(1)
      assert(tokenB != tokenA)
      // B sees NONE of A's resources — list empty, direct access 404
      val (ls, lb) = send(p, "GET", "/api/sinks")(tokenB)
      assert(ls == 200 && !lb.contains("orders") && !lb.contains("audit"))
      assert(send(p, "GET", "/api/sinks/orders")(tokenB)._1 == 404)
      assert(send(p, "DELETE", "/api/sinks/orders")(tokenB)._1 == 404)
      assert(send(p, "PUT", "/api/sinks/orders",
        Some(cfg("orders", 9)))(tokenB)._1 == 404)
      assert(send(p, "GET",
        "/api/destinations/http_endpoints/hooks")(tokenB)._1 == 404)
      // names are PER-ACCOUNT: B can own its own "orders" without
      // colliding with A's, and each account sees its own record
      assert(send(p, "POST", "/api/sinks", Some(cfg("orders", 7)))(tokenB)._1 == 200)
      assert(send(p, "GET", "/api/sinks/orders")(tokenB)
        ._2.contains("\"batch_size\":7"))
      assert(send(p, "GET", "/api/sinks/orders")(tokenA)
        ._2.contains("\"batch_size\":5"))
      // config export is tenant-scoped
      val (_, exA) = send(p, "GET", "/api/config/export")(tokenA)
      val (_, exB) = send(p, "GET", "/api/config/export")(tokenB)
      assert(exA.contains("audit") && !exB.contains("audit"))
      // api_keys: each account lists only its own; a foreign token id
      // reads as nonexistent; the per-account last-token guard holds
      val (_, kA) = send(p, "GET", "/api/api_keys")(tokenA)
      val (_, kB) = send(p, "GET", "/api/api_keys")(tokenB)
      val idA = "\"id\":\"(tok-[0-9]+)\"".r.findFirstMatchIn(kA).get.group(1)
      val idB = "\"id\":\"(tok-[0-9]+)\"".r.findFirstMatchIn(kB).get.group(1)
      assert(idA != idB && !kB.contains(idA) && !kA.contains(idB))
      assert(send(p, "DELETE", s"/api/api_keys/$idA")(tokenB)._1 == 404)
      val (gs, gb) = send(p, "DELETE", s"/api/api_keys/$idB")(tokenB)
      assert(gs == 422 && gb.contains("last remaining"), gb)
      // accounts index shows only the caller's tenancy
      val (_, accB) = send(p, "GET", "/api/accounts")(tokenB)
      assert(accB.contains("TeamB") && !accB.contains("Personal"))
      // health is tenancy-filtered at the API boundary: A's consumer
      // entity is invisible to B (404), visible to A
      assert(send(p, "GET", "/api/health/sink_consumer/audit")(tokenA)._1 == 200)
      assert(send(p, "GET", "/api/health/sink_consumer/audit")(tokenB)._1 == 404)
    } finally api.stop()
  }

  test("encrypted credentials at rest: the catalog and the exported YAML " +
      "carry ciphertext only; a shared-key instance re-opens the export") {
    val key = java.util.Base64.getEncoder
      .encodeToString(Array.fill[Byte](32)(42))
    val api = new ManagementApi(Some(key))
    implicit val token: String = api.bootstrapToken
    try {
      val p = api.port()
      val ep =
        """{"name":"hooks","url":"http://example.test/sink",
          |"encrypted_headers":[
          |  {"key":"Authorization","value":"Bearer s3cr3t-hook-token"},
          |  {"key":"X-Plain","value":"not-sealed"}],
          |"headers":[{"key":"X-Env","value":"prod"}]}""".stripMargin
      assert(send(p, "POST", "/api/destinations/http_endpoints",
        Some(ep))._1 == 200)
      // the API index shows an obfuscated PREVIEW of the plaintext, never
      // the secret and never raw ciphertext
      val (_, ib) = send(p, "GET", "/api/destinations/http_endpoints")
      assert(!ib.contains("s3cr3t-hook-token") && !ib.contains("vault:v1:"),
        ib)
      assert(ib.contains("\"X-Env\"") && ib.contains("\"prod\"")) // plain ok
      // the exported YAML — the at-rest persisted form — has the secret
      // ONLY as a vault envelope
      val (es, eb) = send(p, "GET", "/api/config/export")
      assert(es == 200 && !eb.contains("s3cr3t-hook-token"), eb)
      assert(eb.contains("encrypted_headers") && eb.contains("vault:v1:"),
        eb)
      assert(eb.contains("not-sealed") == false, eb) // both enc headers sealed
      assert(eb.contains("prod")) // plain header exported as-is
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val yaml = om.readTree(eb).get("yaml").asText()
      // a SECOND instance with the SAME key re-applies the export and can
      // reveal the secret for its transport clients
      val api2 = new ManagementApi(Some(key))
      try {
        val p2 = api2.port()
        val (as_, _) = send(p2, "POST", "/api/config/apply",
          Some(om.createObjectNode()
            .put("yaml", yaml).toString))(api2.bootstrapToken)
        assert(as_ == 200)
        // its export still carries ciphertext (idempotent sealing), and
        // the same envelope opens to the same plaintext
        val (_, eb2) = send(p2, "GET", "/api/config/export")(
          api2.bootstrapToken)
        assert(!eb2.contains("s3cr3t-hook-token") &&
          eb2.contains("vault:v1:"))
        // a THIRD instance with a DIFFERENT key cannot open it
        val api3 = new ManagementApi(None)
        try {
          val (as3, _) = send(api3.port(), "POST", "/api/config/apply",
            Some(om.createObjectNode()
              .put("yaml", yaml).toString))(api3.bootstrapToken)
          assert(as3 == 200) // applies (ciphertext stored as-is)...
          val (_, i3) = send(api3.port(), "GET",
            "/api/destinations/http_endpoints")(api3.bootstrapToken)
          // ...but the preview cannot reveal it: the render surfaces the
          // key-mismatch failure as a 500, never silent garbage
          assert(i3.contains("internal error") ||
            !i3.contains("s3cr3t-hook-token"), i3)
        } finally api3.stop()
      } finally api2.stop()
    } finally api.stop()
  }

  test("change retentions + env substitution: documented shape parses, " +
      "applies, round-trips; missing env var is an error") {
    val api = new ManagementApi
    implicit val token: String = api.bootstrapToken
    try {
      val p = api.port()
      val yaml =
        """change_retentions:
          |  - name: "${RETENTION_NAME:-audit-retention}"
          |    source_database: "source-db"
          |    source_table_schema: "public"
          |    source_table_name: "users"
          |    destination_database: "dest-db"
          |    destination_table_schema: "audit"
          |    destination_table_name: "user_events"
          |    actions:
          |      - insert
          |      - update
          |    filters:
          |      - column_name: "status"
          |        operator: "="
          |        comparison_value: "active"
          |      - column_name: "metadata"
          |        field_path: "type.name"
          |        operator: "="
          |        comparison_value: "premium"
          |        field_type: "string"
          |""".stripMargin
      def wrap(y: String) = s"""{"yaml": ${com.fasterxml.jackson.databind
        .node.JsonNodeFactory.instance.textNode(y).toString}}"""
      val (as_, ab) = send(p, "POST", "/api/config/apply", Some(wrap(yaml)))
      assert(as_ == 200, s"body=[$ab]")
      assert(ab.contains(""""kind":"change_retention","name":"audit-retention""""))
      val ret = api.changeRetentions().head
      assert(ret.sourceTable == "users" && ret.actions == Seq("insert", "update"))
      assert(ret.filters.map(_.op) == Seq("==", "=="))
      assert(ret.filters(1).jsonbPath.contains("type.name"))
      // export → apply into a fresh instance reproduces the spec exactly
      val (es, eb) = send(p, "GET", "/api/config/export")
      assert(es == 200)
      val api2 = new ManagementApi
      try {
        val (r2s, r2b) = send(api2.port(), "POST", "/api/config/apply",
          Some(eb))(api2.bootstrapToken)
        assert(r2s == 200, s"export=[$eb] body=[$r2b]")
        assert(api2.changeRetentions() == api.changeRetentions())
      } finally api2.stop()
      // a referenced-but-undefined env var without default is refused
      val bad = yaml.replace("${RETENTION_NAME:-audit-retention}",
        "${GRAFT_SURELY_UNSET_VAR}")
      val (bs, bb) = send(p, "POST", "/api/config/apply", Some(wrap(bad)))
      assert(bs == 422 && bb.contains("undefined environment variable"))
    } finally api.stop()
  }

  test("config apply/plan/export round-trips through a second instance") {
    val api = new ManagementApi
    implicit val token: String = api.bootstrapToken
    try {
      val p = api.port()
      def yamlDoc(sinks: String*): String = {
        val y = "sinks:\n" + sinks.mkString
        s"""{"yaml": ${com.fasterxml.jackson.databind.node.JsonNodeFactory
          .instance.textNode(y).toString}}"""
      }
      def sink(name: String, batch: Int) =
        s"""  - name: "$name"
           |    source:
           |      include_schemas:
           |        - "public"
           |    batch_size: $batch
           |    destination:
           |      type: "kafka"
           |      topic: "t"
           |""".stripMargin
      // plan against an empty registry: all creates, nothing applied yet
      val (ps, pb) = send(p, "POST", "/api/config/plan",
        Some(yamlDoc(sink("a", 1), sink("b", 2))))
      assert(ps == 200 &&
        pb.contains(""""action":"create","name":"a"""") &&
        pb.contains(""""action":"create","name":"b""""))
      assert(api.consumers().isEmpty)
      val (as_, ab) = send(p, "POST", "/api/config/apply",
        Some(yamlDoc(sink("a", 1), sink("b", 2))))
      assert(as_ == 200 && ab.contains("\"resources\""))
      assert(api.consumers().map(_.name) == Seq("a", "b"))
      // re-plan: a modified → update, b omitted → delete
      val (p2s, p2b) = send(p, "POST", "/api/config/plan",
        Some(yamlDoc(sink("a", 7))))
      assert(p2s == 200 &&
        p2b.contains(""""action":"update","name":"a"""") &&
        p2b.contains(""""action":"delete","name":"b""""))
      // an invalid document changes NOTHING (all-or-nothing apply)
      val badYaml = yamlDoc(sink("a", 7),
        "  - name: \"z\"\n    actions:\n      - bogus\n")
      assert(send(p, "POST", "/api/config/apply", Some(badYaml))._1 == 422)
      assert(api.consumers().find(_.name == "a").get.batchSize.contains(1))
      // export → apply into a FRESH instance → identical registry
      val (es, eb) = send(p, "GET", "/api/config/export")
      assert(es == 200)
      val api2 = new ManagementApi
      try {
        val (rs, _) = send(api2.port(), "POST", "/api/config/apply",
          Some(eb))(api2.bootstrapToken)
        assert(rs == 200)
        assert(api2.consumers() == api.consumers())
      } finally api2.stop()
    } finally api.stop()
  }

  test("API authentication: bearer verification on every /api route, " +
      "401 taxonomy, token lifecycle with obfuscated index") {
    val api = new ManagementApi
    implicit val token: String = api.bootstrapToken
    try {
      val p = api.port()
      // no Authorization header → 401 (verify_api_token.ex:38-47)
      val (n1, nb) = send(p, "GET", "/api/sinks")("")
      assert(n1 == 401 && nb.contains("Authorization header"))
      // Authorization without the Bearer prefix → its own 401 message
      val raw = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$p/api/sinks"))
        .header("Authorization", "Token abc").GET().build()
      val rawResp = client.send(raw, HttpResponse.BodyHandlers.ofString())
      assert(rawResp.statusCode() == 401 &&
        rawResp.body().contains("Bearer"))
      // unknown token → 401 invalid/expired
      val (w1, wb) = send(p, "GET", "/api/sinks")("not-a-real-token")
      assert(w1 == 401 && wb.contains("invalid or has expired"))
      // writes are fenced too, and a refused write never lands
      assert(send(p, "POST", "/api/sinks", Some(cfg("x")))("")._1 == 401)
      assert(api.consumers().isEmpty)
      // the bootstrap token opens every route
      assert(send(p, "GET", "/api/sinks")._1 == 200)
      // mint a scoped token: full value shown ONCE in the create response
      val (cs, cb) = send(p, "POST", "/api/api_keys",
        Some("""{"name":"ci"}"""))
      assert(cs == 200 && cb.contains("\"name\":\"ci\""))
      val tok2 = "\"token\":\"([^\"]+)\"".r.findFirstMatchIn(cb).get.group(1)
      assert(tok2.length > 40) // 48 bytes base64url
      assert(send(p, "GET", "/api/sinks")(tok2)._1 == 200)
      // the index obfuscates every token (catalog-password discipline)
      val (is, ib) = send(p, "GET", "/api/api_keys")
      assert(is == 200 && ib.contains("\"bootstrap\"") &&
        ib.contains("\"ci\"") && !ib.contains(tok2) &&
        !ib.contains(api.bootstrapToken))
      // names are unique; empty names refused
      assert(send(p, "POST", "/api/api_keys",
        Some("""{"name":"ci"}"""))._1 == 422)
      assert(send(p, "POST", "/api/api_keys", Some("{}"))._1 == 422)
      // delete revokes immediately
      val id = "\"id\":\"(tok-[0-9]+)\"".r.findFirstMatchIn(cb).get.group(1)
      assert(send(p, "DELETE", s"/api/api_keys/$id")._1 == 200)
      assert(send(p, "GET", "/api/sinks")(tok2)._1 == 401)
      assert(send(p, "DELETE", s"/api/api_keys/$id")._1 == 404)
      // the LAST remaining token cannot be deleted — the plane must
      // never become permanently unreachable (422, not 200)
      val (bi, bb) = send(p, "GET", "/api/api_keys")
      assert(bi == 200)
      val bootId = "\"id\":\"(tok-[0-9]+)\"".r.findFirstMatchIn(bb).get.group(1)
      val (ls, lb) = send(p, "DELETE", s"/api/api_keys/$bootId")
      assert(ls == 422 && lb.contains("last remaining API token"), lb)
      assert(send(p, "GET", "/api/sinks")._1 == 200) // still reachable
    } finally api.stop()
  }

  test("health surface: unauthenticated /health probe, per-entity check " +
      "laddering, paused precedence, degraded states over HTTP") {
    val api = new ManagementApi
    implicit val token: String = api.bootstrapToken
    try {
      val p = api.port()
      def probe(): (Int, String) = {
        val r = client.send(HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:$p/health")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      }
      // LB probe: no auth, ok with no entities (health_check_controller)
      val (p0, b0) = probe()
      assert(p0 == 200 && b0.contains("\"ok\":true"))
      // a fully-healthy replication slot
      Seq("reachable", "replication_configuration",
        "replication_connected", "replication_messages")
        .foreach(s =>
          api.health.putEvent("postgres_replication_slot", "db1", s,
            "success"))
      val (hs, hb) = send(p, "GET",
        "/api/health/postgres_replication_slot/db1")
      assert(hs == 200 && hb.contains("\"status\":\"healthy\""),
        s"body=$hb")
      // degrade the FIRST rung: dependents ladder to initializing even
      // though their own events are healthy (health.ex:366-375), the
      // entity errors, and the system probe 500s naming the entity
      api.health.putEvent("postgres_replication_slot", "db1",
        "reachable", "fail", Some("connection refused"))
      val (ds, db) = send(p, "GET",
        "/api/health/postgres_replication_slot/db1")
      assert(ds == 200 && db.contains("\"entity_id\":\"db1\""))
      assert(db.contains("\"status\":\"error\""))
      assert(db.contains(
        "\"slug\":\"replication_connected\",\"status\":\"initializing\""),
        s"laddering lost: $db")
      assert(db.contains("connection refused"))
      val (p1, b1) = probe()
      assert(p1 == 500 && b1.contains("\"ok\":false") && b1.contains("db1"))
      // sink consumer: config healthy, filtered/pending default `waiting`,
      // ingestion `initializing` → aggregated initializing; paused wins
      api.health.putEvent("sink_consumer", "orders",
        "sink_configuration", "success")
      val (ss, sb) = send(p, "GET", "/api/health/sink_consumer/orders")
      assert(ss == 200 && sb.contains("\"status\":\"initializing\""))
      assert(sb.contains(
        "\"slug\":\"messages_filtered\",\"status\":\"waiting\""))
      api.health.setPaused("sink_consumer", "orders", isPaused = true)
      val (_, pb) = send(p, "GET", "/api/health/sink_consumer/orders")
      assert(pb.contains("\"status\":\"paused\""))
      // the check index requires auth and lists every entity
      assert(send(p, "GET", "/api/health")("")._1 == 401)
      val (is, ib) = send(p, "GET", "/api/health")
      assert(is == 200 && ib.contains("db1") && ib.contains("orders"))
      assert(send(p, "GET", "/api/health/not_a_kind/x")._1 == 404)
    } finally api.stop()
  }

  test("infra system probes: checkpoint/spool/transport checks feed the " +
      "system entity; a scripted failure flips /health to 500 naming " +
      "the probe") {
    val api = new ManagementApi
    implicit val token: String = api.bootstrapToken
    try {
      val p = api.port()
      def probe(): (Int, String) = {
        val r = client.send(HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:$p/health")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      }
      val good = java.nio.file.Files.createTempDirectory("probe_ok")
      // all three probes exercised against live infra: the checkpoint
      // volume (write+delete), the spool volume (list), the transport
      // (TCP connect to the plane's own listener)
      api.health.runSystemProbes(
        checkpointDir = Some(good.toString),
        spoolDir = Some(good.toString),
        transport = Some(("127.0.0.1", p)))
      assert(probe()._1 == 200)
      val (hs, hb) = send(p, "GET", "/api/health/system/system")
      assert(hs == 200 && hb.contains("\"status\":\"healthy\""), hb)
      assert(hb.contains("checkpoint_dir_writable") &&
        hb.contains("spool_dir_readable") &&
        hb.contains("transport_reachable"))
      // scripted failure: the spool volume vanishes
      api.health.runSystemProbes(
        spoolDir = Some("/nonexistent/graft_spool"))
      val (fs, fb) = probe()
      assert(fs == 500, s"$fs $fb")
      assert(fb.contains("system") && fb.contains("spool_dir_readable"), fb)
      // and a dead transport is its own named failure
      val tmp = new java.net.ServerSocket(0)
      val dead = tmp.getLocalPort
      tmp.close()
      api.health.runSystemProbes(
        spoolDir = Some(good.toString), // recovers
        transport = Some(("127.0.0.1", dead)))
      val (ts, tb) = probe()
      assert(ts == 500 && tb.contains("transport_reachable"), tb)
    } finally api.stop()
  }

  test("/metrics: Prometheus text exposition with the reference's metric " +
      "names; counters and histograms move when deliveries are recorded") {
    val api = new ManagementApi
    try {
      val p = api.port()
      def scrape(): (Int, String, String) = {
        val r = client.send(HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:$p/metrics")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body(),
          r.headers().firstValue("content-type").orElse(""))
      }
      val (s0, b0, ct) = scrape()
      assert(s0 == 200 && ct.startsWith("text/plain; version=0.0.4"))
      // no consumer series yet — but VM gauges (SystemMetricsServer
      // analog) refresh on every scrape and are always present
      assert(!b0.contains("sequin_"), b0.take(200))
      val heap = b0.linesIterator
        .find(_.startsWith("graft_jvm_heap_used_bytes"))
        .getOrElse("<missing>").split(' ').last.toDouble
      assert(heap > 0, s"heap gauge: $heap")
      assert(b0.contains("graft_jvm_threads"), "thread gauge missing")
      // a delivery batch: 3 attempts, 2 ok, 1 failed, 4096 bytes
      import graft.sinks.SinkDispatch.Outcome
      api.metrics.recordOutcomes("c1", "orders",
        Seq(Outcome("a", "g", ok = true, ""),
          Outcome("b", "g", ok = true, ""),
          Outcome("c", "g", ok = false, "timeout")), bytes = 4096L)
      api.metrics.observeDeliveryLatencyUs("c1", "orders",
        success = true, 2500.0)
      api.metrics.observeDeliveryLatencyUs("c1", "orders",
        success = true, 150000.0)
      api.metrics.setIngestionLatencyUs("slot1", "main", 820.5)
      val (_, b1, _) = scrape()
      val lines = b1.linesIterator.toVector
      def series(prefix: String): String =
        lines.find(_.startsWith(prefix)).getOrElse(s"<missing $prefix>")
      // reference metric names with reference label sets
      assert(series("sequin_message_deliver_attempt_count") ==
        """sequin_message_deliver_attempt_count{consumer_id="c1",consumer_name="orders"} 3""")
      assert(series("sequin_message_deliver_success_count").endsWith(" 2"))
      assert(series("sequin_message_deliver_failure_count").endsWith(" 1"))
      assert(series("sequin_bytes_delivered_total").endsWith(" 4096"))
      assert(series("sequin_ingestion_latency_us").endsWith(" 820.5"))
      assert(lines.contains("# TYPE sequin_delivery_latency_us histogram"))
      // cumulative buckets: 2500us ≤ 1e4, 150000us ≤ 1e6
      def bucket(le: String): String = lines.find(l =>
        l.startsWith("sequin_delivery_latency_us_bucket") &&
          l.contains(s"""le="$le"""")).getOrElse(s"<missing le=$le>")
      assert(bucket("1000").endsWith(" 0"))
      assert(bucket("10000").endsWith(" 1"))
      assert(bucket("1000000").endsWith(" 2"))
      assert(bucket("+Inf").endsWith(" 2"))
      assert(series("sequin_delivery_latency_us_sum").endsWith(" 152500"))
      assert(series("sequin_delivery_latency_us_count").endsWith(" 2"))
      // counters accumulate across batches
      api.metrics.recordOutcomes("c1", "orders",
        Seq(Outcome("d", "g", ok = true, "")))
      val (_, b2, _) = scrape()
      assert(b2.linesIterator.exists(_ ==
        """sequin_message_deliver_attempt_count{consumer_id="c1",consumer_name="orders"} 4"""))
    } finally api.stop()
  }

  /** Scripted loopback Postgres catalog server: protocol-v3 startup
    * handshake + simple-query replies for the pg_catalog table listing —
    * what CatalogClient dials for test_connection / refresh_tables.
    */
  private final class ScriptedPgCatalog(
      rows: Seq[(String, String, Long, Int, String, String, Boolean)]) {
    import java.io.{DataInputStream, DataOutputStream}
    import java.net.{InetAddress, ServerSocket}
    import java.nio.ByteBuffer
    import java.nio.charset.StandardCharsets.UTF_8
    val receivedSql = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var sawReplicationParam = false
    private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    @volatile private var running = true

    private def typed(t: Char, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(1 + 4 + body.length)
      b.put(t.toByte).putInt(4 + body.length).put(body)
      b.array()
    }
    private def cstr(s: String): Array[Byte] =
      s.getBytes(UTF_8) ++ Array[Byte](0)
    private def rowDescription(names: Seq[String]): Array[Byte] = {
      val fields = names.flatMap { n =>
        val meta = ByteBuffer.allocate(18)
          .putInt(0).putShort(0).putInt(25).putShort(-1).putInt(-1).putShort(0)
        cstr(n) ++ meta.array()
      }
      val b = ByteBuffer.allocate(2 + fields.length)
      b.putShort(names.length.toShort).put(fields.toArray)
      typed('T', b.array())
    }
    private def dataRow(vs: Seq[String]): Array[Byte] = {
      val cells = vs.flatMap { v =>
        val bytes = v.getBytes(UTF_8)
        ByteBuffer.allocate(4).putInt(bytes.length).array() ++ bytes
      }
      val b = ByteBuffer.allocate(2 + cells.length)
      b.putShort(vs.length.toShort).put(cells.toArray)
      typed('D', b.array())
    }

    private val thread = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val in = new DataInputStream(sock.getInputStream)
          val out = new DataOutputStream(sock.getOutputStream)
          val len = in.readInt()
          val body = new Array[Byte](len - 4); in.readFully(body)
          if (new String(body.drop(4), UTF_8).contains("replication"))
            sawReplicationParam = true
          out.write(typed('R', ByteBuffer.allocate(4).putInt(0).array()))
          out.write(typed('Z', Array('I'.toByte)))
          out.flush()
          try {
            while (true) {
              val t = in.readByte().toChar
              val qlen = in.readInt()
              val qbody = new Array[Byte](qlen - 4); in.readFully(qbody)
              if (t == 'Q') {
                val sql = new String(qbody.dropRight(1), UTF_8)
                receivedSql.add(sql)
                if (sql.contains("pg_class")) {
                  out.write(rowDescription(Seq("nspname", "relname", "oid",
                    "attnum", "attname", "format_type", "indisprimary")))
                  rows.foreach { case (sch, tbl, oid, att, cn, ct, pk) =>
                    out.write(dataRow(Seq(sch, tbl, oid.toString,
                      att.toString, cn, ct, if (pk) "t" else "f")))
                  }
                }
                out.write(typed('C', cstr("SELECT")))
                out.write(typed('Z', Array('I'.toByte)))
                out.flush()
              }
            }
          } catch { case _: Exception => () } // client hung up
          sock.close()
        } catch { case _: Exception => () }
      }
    })
    thread.setDaemon(true)
    thread.start()
    def stop(): Unit = { running = false; server.close() }
  }

  test("postgres_replications: slot/publication CRUD tied to a catalog " +
      "database, FK delete fence, disabled status pauses health") {
    val pg = new ScriptedPgCatalog(Seq(
      ("public", "orders", 16385L, 1, "id", "bigint", true)))
    val api = new ManagementApi
    implicit val token: String = api.bootstrapToken
    try {
      val p = api.port()
      // a replication must reference a DECLARED catalog database
      val (os, ob) = send(p, "POST", "/api/postgres_replications",
        Some("""{"postgres_database":"ghost","slot_name":"s1",
               |"publication_name":"p1"}""".stripMargin))
      assert(os == 422 && ob.contains("Postgres database not found"))
      assert(send(p, "POST", "/api/postgres_databases",
        Some(s"""{"name":"appdb","hostname":"127.0.0.1","port":${pg.port},
                 |"database":"app","username":"u","password":"pw",
                 |"slot_name":"sequin_slot","publication_name":"sequin_pub"}"""
          .stripMargin))._1 == 201)
      // required fields enforced
      assert(send(p, "POST", "/api/postgres_replications",
        Some("""{"postgres_database":"appdb","slot_name":"s1"}"""))._1 == 422)
      val (cs, cb) = send(p, "POST", "/api/postgres_replications",
        Some("""{"postgres_database":"appdb","slot_name":"s1",
               |"publication_name":"p1","partition_count":4}""".stripMargin))
      assert(cs == 200 && cb.contains("\"slot_name\":\"s1\"") &&
        cb.contains("\"status\":\"active\"") &&
        cb.contains("\"partition_count\":4"), cb)
      val id = "\"id\":(\\d+)".r.findFirstMatchIn(cb).get.group(1)
      // unique (slot_name, database)
      assert(send(p, "POST", "/api/postgres_replications",
        Some("""{"postgres_database":"appdb","slot_name":"s1",
               |"publication_name":"p2"}""".stripMargin))._1 == 422)
      val (is, ib) = send(p, "GET", "/api/postgres_replications")
      assert(is == 200 && ib.contains("\"data\"") && ib.contains("\"s1\""))
      assert(send(p, "GET", s"/api/postgres_replications/$id")._1 == 200)
      // the database link is immutable on update (update_changeset does
      // not cast postgres_database_id)
      assert(send(p, "PUT", s"/api/postgres_replications/$id",
        Some("""{"postgres_database":"other","slot_name":"s1",
               |"publication_name":"p1"}""".stripMargin))._1 == 422)
      // disabling pauses the slot's health entity (health.ex:215-217)
      val (us, ub) = send(p, "PUT", s"/api/postgres_replications/$id",
        Some("""{"status":"disabled"}"""))
      assert(us == 200 && ub.contains("\"status\":\"disabled\""), ub)
      val (_, hb) = send(p, "GET",
        s"/api/health/postgres_replication_slot/$id")
      assert(hb.contains("\"status\":\"paused\""))
      // unique (slot_name, database) holds on UPDATE too: a second
      // replication cannot be renamed onto s1
      val (c2s, c2b) = send(p, "POST", "/api/postgres_replications",
        Some("""{"postgres_database":"appdb","slot_name":"s9",
               |"publication_name":"p9"}""".stripMargin))
      assert(c2s == 200)
      val id2 = "\"id\":(\\d+)".r.findFirstMatchIn(c2b).get.group(1)
      assert(send(p, "PUT", s"/api/postgres_replications/$id2",
        Some("""{"slot_name":"s1"}"""))._1 == 422)
      assert(send(p, "DELETE", s"/api/postgres_replications/$id2")._1 == 200)
      // FK fence: the referenced database refuses deletion until the
      // replication goes first
      val (ds, db2) = send(p, "DELETE", "/api/postgres_databases/appdb")
      assert(ds == 422 && db2.contains("referenced by"), db2)
      assert(send(p, "DELETE", s"/api/postgres_replications/$id")._1 == 200)
      assert(send(p, "DELETE", s"/api/postgres_replications/$id")._1 == 404)
      assert(send(p, "DELETE", "/api/postgres_databases/appdb")._1 == 200)
      // the deleted (paused) replication is NOT a phantom health entity
      val (hs2, hb2) = send(p, "GET", "/api/health")
      assert(hs2 == 200 &&
        !hb2.contains(s"\"entity_id\":\"$id\""), hb2)
    } finally { api.stop(); pg.stop() }
  }

  test("postgres_databases catalog plane: CRUD + test_connection + refresh_tables over real sockets") {
    val pg = new ScriptedPgCatalog(Seq(
      ("public", "orders", 16385L, 1, "id", "bigint", true),
      ("public", "orders", 16385L, 2, "total", "numeric", false),
      ("public", "users", 16386L, 1, "user_id", "bigint", true)))
    val api = new ManagementApi
    implicit val token: String = api.bootstrapToken
    try {
      val p = api.port()
      def db(name: String, port: Int): String =
        s"""{"name":"$name","hostname":"127.0.0.1","port":$port,
           |"database":"app","username":"app_user","password":"secretcode",
           |"slot_name":"sequin_slot","publication_name":"sequin_pub"}""".stripMargin
      // create TESTS the connection first: a dead port is refused, 422
      val tmp = new java.net.ServerSocket(0)
      val dead = tmp.getLocalPort
      tmp.close()
      val (fs, fb) = send(p, "POST", "/api/postgres_databases",
        Some(db("broken", dead)))
      assert(fs == 422 && fb.contains("cannot connect"))
      assert(send(p, "GET", "/api/postgres_databases/broken")._1 == 404)
      // live create: plain-session handshake (NO replication param), 201
      val (cs, cb) = send(p, "POST", "/api/postgres_databases",
        Some(db("appdb", pg.port)))
      assert(cs == 201 && cb.contains("\"name\":\"appdb\""))
      assert(!pg.sawReplicationParam,
        "management-plane sessions must not request replication mode")
      // password obfuscated by default (Sequin.String.obfuscate parity:
      // 'secretcode' → 'sec******e'), revealed with show_sensitive
      assert(cb.contains("\"password\":\"sec******e\""))
      val (_, showB) = send(p, "GET",
        "/api/postgres_databases/appdb?show_sensitive=true")
      assert(showB.contains("\"password\":\"secretcode\""))
      // duplicate create refused
      assert(send(p, "POST", "/api/postgres_databases",
        Some(db("appdb", pg.port)))._1 == 422)
      // test_connection round-trips the live handshake
      val (ts, tb) = send(p, "POST",
        "/api/postgres_databases/appdb/test_connection", Some(""))
      assert(ts == 200 && tb.contains("\"success\":true"))
      // refresh_tables issues the reference's catalog SQL over the wire
      // and stores the grouped table list
      val (rs, rb) = send(p, "POST",
        "/api/postgres_databases/appdb/refresh_tables", Some(""))
      assert(rs == 200 && rb.contains("\"success\":true"))
      assert(pg.receivedSql.toArray.exists(
        _.toString.contains("pg_class")))
      val (_, sb) = send(p, "GET", "/api/postgres_databases/appdb")
      assert(sb.contains("\"name\":\"orders\"") &&
        sb.contains("\"oid\":16385") &&
        sb.contains("\"name\":\"users\""))
      assert(sb.contains("\"is_pk\":true") && sb.contains("\"is_pk\":false"))
      // update keeps the cached tables; name immutable
      val (us, ub) = send(p, "PUT", "/api/postgres_databases/appdb",
        Some(db("appdb", pg.port)))
      assert(us == 200 && ub.contains("\"name\":\"orders\""))
      assert(send(p, "PUT", "/api/postgres_databases/appdb",
        Some(db("renamed", pg.port)))._1 == 422)
      // index lists it; delete removes it
      val (is, ib) = send(p, "GET", "/api/postgres_databases")
      assert(is == 200 && ib.contains("\"appdb\""))
      assert(send(p, "DELETE", "/api/postgres_databases/appdb")._1 == 200)
      assert(send(p, "DELETE", "/api/postgres_databases/appdb")._1 == 404)
      // test_connection after the PG server dies: 422 with a reason
      pg.stop()
      val (c2, _) = send(p, "POST", "/api/postgres_databases",
        Some(db("late", pg.port)))
      assert(c2 == 422)
    } finally { api.stop(); pg.stop() }
  }

  test("obfuscate matches Sequin.String.obfuscate band for band") {
    // bands: ≤5 full stars, 6-9 first+last, ≥10 first3+last (string.ex:5-35)
    assert(ManagementApi.obfuscate("12345") == "*****")
    assert(ManagementApi.obfuscate("password") == "p******d")
    assert(ManagementApi.obfuscate("secretcode") == "sec******e")
    assert(ManagementApi.obfuscate("") == "")
  }
}
