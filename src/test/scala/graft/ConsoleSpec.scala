package graft.config
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite

/** The operator console driven over its real loopback HTTP surface —
  * login/session flow, the scoped index/show pages, the pause/delete
  * actions, tenancy isolation, and output escaping (the reference's
  * LiveView surface under `sequin_web/live/`, re-expressed
  * server-rendered;
  * see [[graft.config.Console]]).
  */
class ConsoleSpec extends AnyFunSuite {

  private val client = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NEVER).build()

  private def req(port: Int, method: String, path: String,
      body: Option[String] = None, cookie: Option[String] = None,
      bearer: Option[String] = None,
      form: Boolean = false): HttpResponse[String] = {
    var b = HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port$path"))
    cookie.foreach(c => b = b.header("Cookie", s"graft_console=$c"))
    bearer.foreach(t => b = b.header("Authorization", s"Bearer $t"))
    if (form) b = b.header("Content-Type",
      "application/x-www-form-urlencoded")
    val built = (method match {
      case "GET" => b.GET()
      case m => b.method(m,
        HttpRequest.BodyPublishers.ofString(body.getOrElse("")))
    }).build()
    client.send(built, HttpResponse.BodyHandlers.ofString())
  }

  private def sinkJson(name: String): String =
    s"""{"name":"$name","source":{"include_schemas":["public"]},
       |"batch_size":5,
       |"filter_function":"record_value > 10",
       |"destination":{"type":"kafka","topic":"t"}}""".stripMargin

  test("login flow: unauthenticated pages bounce to /login; a bad " +
      "token is refused; a good one sets the session cookie") {
    val api = new ManagementApi
    try {
      val p = api.port()
      val bounced = req(p, "GET", "/sinks")
      assert(bounced.statusCode() == 302 &&
        bounced.headers().firstValue("Location").get == "/login")
      assert(req(p, "GET", "/login").statusCode() == 200)
      val bad = req(p, "POST", "/login",
        Some("token=nope"), form = true)
      assert(bad.statusCode() == 401 &&
        bad.body().contains("invalid"))
      val good = req(p, "POST", "/login",
        Some(s"token=${api.bootstrapToken}"), form = true)
      assert(good.statusCode() == 302)
      val setCookie = good.headers().firstValue("Set-Cookie").get
      assert(setCookie.contains(s"graft_console=${api.bootstrapToken}") &&
        setCookie.contains("HttpOnly"))
      // "/" routes to /setup while the account is empty (home_live.ex)
      val home = req(p, "GET", "/", cookie = Some(api.bootstrapToken))
      assert(home.statusCode() == 302 &&
        home.headers().firstValue("Location").get == "/setup")
    } finally api.stop()
  }

  test("sinks index + show render the store, health, metrics, and " +
      "trace; escaping holds for operator-controlled text") {
    val api = new ManagementApi
    val tok = api.bootstrapToken
    try {
      val p = api.port()
      assert(req(p, "POST", "/api/sinks", Some(sinkJson("orders")),
        bearer = Some(tok)).statusCode() == 200)
      api.health.putEvent("sink_consumer", "orders",
        "messages_delivered", "success")
      api.metrics.recordOutcomes("orders", "orders",
        (1 to 10).map(i => graft.sinks.SinkDispatch.Outcome(
          s"a$i", "g", ok = true, "")), bytes = 512L)
      graft.streaming.Trace.info("orders",
        "<script>alert(1)</script> delivered", "batch" -> "7")

      val idx = req(p, "GET", "/sinks", cookie = Some(tok))
      assert(idx.statusCode() == 200)
      assert(idx.body().contains("orders") &&
        idx.body().contains("kafka") &&
        idx.body().contains("active"))
      // 10 delivered messages: processed count + a live sparkline
      assert(idx.body().contains(">10</td>"))
      assert(idx.body().contains("<svg"))

      val show = req(p, "GET", "/sinks/orders", cookie = Some(tok))
      assert(show.statusCode() == 200)
      val b = show.body()
      assert(b.contains("messages_delivered") && b.contains("healthy"))
      assert(b.contains("record_value &gt; 10")) // the filter function
      assert(b.contains("batch=7"))
      // trace message is escaped, never raw
      assert(b.contains("&lt;script&gt;") && !b.contains("<script>alert"))

      assert(req(p, "GET", "/sinks/ghost",
        cookie = Some(tok)).statusCode() == 404)
    } finally api.stop()
  }

  test("pause and delete actions write through to the same store the " +
      "JSON API reads") {
    val api = new ManagementApi
    val tok = api.bootstrapToken
    try {
      val p = api.port()
      req(p, "POST", "/api/sinks", Some(sinkJson("orders")),
        bearer = Some(tok))
      val paused = req(p, "POST", "/sinks/orders/status",
        Some("status=paused"), cookie = Some(tok), form = true)
      assert(paused.statusCode() == 302)
      val viaApi = req(p, "GET", "/api/sinks/orders", bearer = Some(tok))
      assert(viaApi.body().contains("\"status\":\"paused\""))
      assert(req(p, "POST", "/sinks/orders/status",
        Some("status=nonsense"), cookie = Some(tok),
        form = true).statusCode() == 422)
      val del = req(p, "POST", "/sinks/orders/delete",
        cookie = Some(tok), form = true)
      assert(del.statusCode() == 302)
      assert(req(p, "GET", "/api/sinks/orders",
        bearer = Some(tok)).statusCode() == 404)
    } finally api.stop()
  }

  test("tenancy: a second account's session sees none of the first " +
      "account's resources") {
    val api = new ManagementApi
    val tok = api.bootstrapToken
    try {
      val p = api.port()
      req(p, "POST", "/api/sinks", Some(sinkJson("orders")),
        bearer = Some(tok))
      val acct = req(p, "POST", "/api/accounts",
        Some("""{"name":"acme"}"""), bearer = Some(tok)).body()
      val tok2 = """"token":"([^"]+)"""".r
        .findFirstMatchIn(acct).get.group(1)
      val idx2 = req(p, "GET", "/sinks", cookie = Some(tok2))
      assert(idx2.statusCode() == 200 && !idx2.body().contains("orders"))
      assert(req(p, "GET", "/sinks/orders",
        cookie = Some(tok2)).statusCode() == 404)
      val settings2 = req(p, "GET", "/settings", cookie = Some(tok2))
      assert(settings2.body().contains("acme") &&
        !settings2.body().contains(tok)) // raw foreign token never shown
    } finally api.stop()
  }

  test("databases, change-retention, functions, cli, and settings " +
      "pages render from the scoped stores") {
    val api = new ManagementApi
    val tok = api.bootstrapToken
    try {
      val p = api.port()
      // seed the catalog store directly (the HTTP create path — which
      // live-tests the connection — is ManagementApiSpec's subject;
      // the console only READS this store)
      api.databases.put("appdb", api.DatabaseRec("appdb", "db.internal",
        5432, "app", "svc", "hunter22", "graft_slot", "graft_pub",
        tables = Vector(api.TableRec("public", "orders", 16385L,
          Vector(api.ColumnRec(1, "id", "bigint", isPk = true),
            api.ColumnRec(2, "note", "text", isPk = false))))))
      req(p, "POST", "/api/sinks", Some(sinkJson("orders")),
        bearer = Some(tok))

      val dbs = req(p, "GET", "/databases", cookie = Some(tok))
      assert(dbs.statusCode() == 200 &&
        dbs.body().contains("appdb") &&
        dbs.body().contains("db.internal:5432/app") &&
        dbs.body().contains("graft_slot"))
      val dbShow = req(p, "GET", "/databases/appdb", cookie = Some(tok))
      assert(dbShow.statusCode() == 200 &&
        dbShow.body().contains("svc") &&
        !dbShow.body().contains("hunter22")) // password stays obfuscated

      val wal = req(p, "GET", "/wal_pipelines", cookie = Some(tok))
      assert(wal.statusCode() == 200)

      val fns = req(p, "GET", "/functions", cookie = Some(tok))
      assert(fns.statusCode() == 200 &&
        fns.body().contains("record_value &gt; 10") &&
        fns.body().contains("orders"))

      assert(req(p, "GET", "/cli",
        cookie = Some(tok)).body().contains("graft config apply"))
      val st = req(p, "GET", "/settings", cookie = Some(tok))
      assert(st.statusCode() == 200 && st.body().contains("Personal") &&
        !st.body().contains(tok)) // tokens render obfuscated only
    } finally api.stop()
  }

  test("metrics: counterSum and the smoothed throughput timeseries " +
      "back the console sparkline") {
    val reg = new graft.config.Metrics.Registry
    reg.recordOutcomes("c1", "c1",
      (1 to 30).map(i => graft.sinks.SinkDispatch.Outcome(
        s"a$i", "g", ok = i % 3 != 0, "")), bytes = 100L)
    assert(reg.counterSum("sequin_message_deliver_attempt_count",
      "consumer_name" -> "c1") == 30L)
    assert(reg.counterSum("sequin_message_deliver_success_count",
      "consumer_name" -> "c1") == 20L)
    assert(reg.counterSum("sequin_message_deliver_success_count",
      "consumer_name" -> "ghost") == 0L)
    val now = System.currentTimeMillis() / 1000L
    val ts = reg.throughputTimeseries("c1", windows = 60,
      smoothing = 5, nowSec = now)
    assert(ts.size == 60)
    // 20 successes land in the newest bucket; the trailing-mean window
    // spreads them at 20/5 per second
    assert(math.abs(ts.last - 4.0) < 1e-9)
    assert(ts.take(50).forall(_ == 0.0))
    // unknown consumer: flat zero series, never a throw
    assert(reg.throughputTimeseries("ghost").forall(_ == 0.0))
  }
}
