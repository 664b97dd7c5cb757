package graft.config

import com.sun.net.httpserver.{HttpExchange, HttpHandler}
import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8

/** The operator console: the reference's LiveView surface
  * (`/root/reference/lib/sequin_web/live/` — `home_live.ex`,
  * `sink_consumers/{index,show}.ex`, `databases/{index,show}.ex`,
  * `wal_pipelines/index.ex`, `functions/index.ex`, `cli_live.ex`,
  * `setup_live.ex`, `user_settings_live.ex`, `user_login_live.ex`),
  * re-expressed as SERVER-RENDERED HTML over the management plane's own
  * scoped stores — no client framework, no websocket: LiveView's 1 s
  * health/metric push becomes a 2 s `<meta http-equiv="refresh">`, and
  * every read goes through exactly the account scoping the JSON API
  * uses (`Scoped` + `ownsEntity` + the same bearer tokens, carried in a
  * cookie the login form sets).
  *
  * What each page mirrors:
  *   - `/` — home_live.ex:8-16: straight to /sinks (or /setup while the
  *     account has no databases AND no sinks);
  *   - `/sinks` — sink_consumers/index.ex:142-195 `encode_consumer`:
  *     name, type, status, health rollup, active-backfill badge, and
  *     the smoothed messages-processed throughput sparkline
  *     (`@timeseries_window_count 60`, `@smoothing_window 5`);
  *   - `/sinks/<name>` — sink_consumers/show.ex: config panel, health
  *     checks, processed count/throughput, backfills, trace tail, plus
  *     the pause/resume/disable and delete actions;
  *   - `/databases` (+ show) — databases/index.ex:79-92
  *     `encode_database`: host, port, sink/pipeline counts, slot
  *     health, paused flag; show adds the table catalog;
  *   - `/wal_pipelines` — wal_pipelines/index.ex (change-retention
  *     pipelines: source table → destination event table);
  *   - `/functions` — functions/index.ex: every named filter/transform/
  *     iterate/routing function on the account's sinks;
  *   - `/cli` — cli_live.ex: the CLI quickstart;
  *   - `/settings` — user_settings_live + settings/: account row + the
  *     obfuscated API-token list (api_key_controller's preview shape);
  *   - `/login` — user_login_live.ex, reduced to its self-hosted core:
  *     a bearer token IS the credential (the plane mints them; there is
  *     no password store in a library embedding).
  */
final class Console(api: ManagementApi) extends HttpHandler {

  private val CookieName = "graft_console"

  // ---- entry -----------------------------------------------------------

  override def handle(ex: HttpExchange): Unit =
    try {
      val method = ex.getRequestMethod
      val path = ex.getRequestURI.getPath.stripSuffix("/") match {
        case "" => "/"
        case p  => p
      }
      (method, path) match {
        case ("GET", "/login")  => renderLogin(ex, None)
        case ("POST", "/login") => doLogin(ex)
        case ("POST", "/logout") =>
          respondHtml(ex, 302, "", Seq(
            "Set-Cookie" -> s"$CookieName=; Max-Age=0; Path=/",
            "Location" -> "/login"))
        case _ =>
          cookieToken(ex).flatMap(api.verifyRawToken) match {
            case None =>
              respondHtml(ex, 302, "", Seq("Location" -> "/login"))
            case Some(accountId) =>
              api.currentAccount.set(accountId)
              routeScoped(ex, method, path)
          }
      }
    } catch {
      case e: Throwable =>
        try respondHtml(ex, 500,
          page("Error", s"<p class=err>internal error: ${esc(
            String.valueOf(e.getMessage))}</p>"))
        catch { case _: Exception => () }
    } finally ex.close()

  private def routeScoped(ex: HttpExchange, method: String,
      path: String): Unit = (method, path) match {
    case ("GET", "/") =>
      val dest =
        if (api.registry.isEmpty && api.databases.isEmpty) "/setup"
        else "/sinks"
      respondHtml(ex, 302, "", Seq("Location" -> dest))
    case ("GET", "/setup")         => renderSetup(ex)
    case ("GET", "/sinks")         => renderSinks(ex)
    case ("GET", "/databases")     => renderDatabases(ex)
    case ("GET", "/wal_pipelines") => renderWalPipelines(ex)
    case ("GET", "/functions")     => renderFunctions(ex)
    case ("GET", "/cli")           => renderCli(ex)
    case ("GET", "/settings")      => renderSettings(ex)
    case ("GET", p) if p.startsWith("/sinks/") =>
      renderSinkShow(ex, decode(p.stripPrefix("/sinks/")))
    case ("GET", p) if p.startsWith("/databases/") =>
      renderDatabaseShow(ex, decode(p.stripPrefix("/databases/")))
    case ("POST", p) if p.startsWith("/sinks/") &&
        p.endsWith("/status") =>
      doSinkStatus(ex,
        decode(p.stripPrefix("/sinks/").stripSuffix("/status")))
    case ("POST", p) if p.startsWith("/sinks/") &&
        p.endsWith("/delete") =>
      doSinkDelete(ex,
        decode(p.stripPrefix("/sinks/").stripSuffix("/delete")))
    case _ =>
      respondHtml(ex, 404, page("Not found",
        "<p class=err>page not found</p>"))
  }

  // ---- auth ------------------------------------------------------------

  private def cookieToken(ex: HttpExchange): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Cookie")).flatMap { h =>
      h.split(";").iterator.map(_.trim).collectFirst {
        case c if c.startsWith(CookieName + "=") =>
          c.stripPrefix(CookieName + "=")
      }
    }

  private def doLogin(ex: HttpExchange): Unit = {
    val form = parseForm(ex)
    form.get("token").filter(_.nonEmpty)
      .flatMap(t => api.verifyRawToken(t).map(_ => t)) match {
      case Some(tok) =>
        // HttpOnly: the console has no scripts that need it; SameSite
        // keeps the cookie off cross-site form posts
        respondHtml(ex, 302, "", Seq(
          "Set-Cookie" ->
            s"$CookieName=$tok; HttpOnly; SameSite=Strict; Path=/",
          "Location" -> "/"))
      case None =>
        renderLogin(ex, Some("The API token you provided is invalid."))
    }
  }

  private def renderLogin(ex: HttpExchange, error: Option[String]): Unit =
    respondHtml(ex, if (error.isDefined) 401 else 200, page("Log in",
      s"""<h1>Log in</h1>
         |${error.map(e => s"<p class=err>${esc(e)}</p>").getOrElse("")}
         |<form method=post action=/login>
         |  <label>API token
         |    <input type=password name=token autofocus></label>
         |  <button type=submit>Log in</button>
         |</form>
         |<p class=dim>Use the plane's bootstrap token or any token
         |minted through <code>POST /api/api_keys</code>.</p>
         |""".stripMargin, nav = false))

  // ---- pages -----------------------------------------------------------

  private def renderSetup(ex: HttpExchange): Unit =
    respondHtml(ex, 200, page("Setup",
      """<h1>Get started</h1>
        |<p>This account has no databases or sinks yet.</p>
        |<ol>
        |<li>Declare a database and sink in YAML and apply it:
        |<pre>graft config apply -f graft.yaml</pre></li>
        |<li>Or drive the JSON API directly:
        |<pre>curl -H "Authorization: Bearer $TOKEN" \
        |  -d '{"name":"orders",...}' http://127.0.0.1:PORT/api/sinks</pre>
        |</li>
        |<li>Watch it here — this console refreshes itself.</li>
        |</ol>""".stripMargin))

  private def renderSinks(ex: HttpExchange): Unit = {
    val rows = api.registry.keys.toSeq.sorted.flatMap(name =>
      api.registry.get(name).map(name -> _)).map { case (name, cfg) =>
      val h = api.health.health("sink_consumer", name)
      val backfilling = api.backfills.getOrElse(name, Vector.empty)
        .exists(_.state == "active")
      val processed = api.metrics.counterSum(
        "sequin_message_deliver_success_count", "consumer_name" -> name)
      val series = api.metrics.throughputTimeseries(consumerIdOf(name))
      s"""<tr>
         |<td><a href="/sinks/${urlenc(name)}">${esc(name)}</a></td>
         |<td>${esc(cfg.sink.map(_.sinkType).getOrElse("none"))}</td>
         |<td>${statusBadge(cfg.status)}</td>
         |<td>${healthBadge(h.status)}</td>
         |<td>${if (backfilling) "<span class=badge>backfilling</span>"
             else ""}</td>
         |<td class=num>$processed</td>
         |<td>${sparkline(series)}</td>
         |</tr>""".stripMargin
    }
    val body =
      if (rows.isEmpty)
        """<h1>Sinks</h1><p class=dim>No sinks yet —
          |see <a href=/setup>setup</a>.</p>""".stripMargin
      else
        s"""<h1>Sinks</h1>
           |<table>
           |<tr><th>name</th><th>type</th><th>status</th><th>health</th>
           |<th></th><th>processed</th><th>throughput (60s)</th></tr>
           |${rows.mkString("\n")}
           |</table>""".stripMargin
    respondHtml(ex, 200, page("Sinks", body, refresh = true))
  }

  private def renderSinkShow(ex: HttpExchange, name: String): Unit =
    api.registry.get(name) match {
      case None =>
        respondHtml(ex, 404, page("Not found",
          s"<p class=err>Sink consumer not found: ${esc(name)}</p>"))
      case Some(cfg) =>
        val h = api.health.health("sink_consumer", name)
        val cid = consumerIdOf(name)
        val attempts = api.metrics.counterSum(
          "sequin_message_deliver_attempt_count", "consumer_name" -> name)
        val successes = api.metrics.counterSum(
          "sequin_message_deliver_success_count", "consumer_name" -> name)
        val failures = api.metrics.counterSum(
          "sequin_message_deliver_failure_count", "consumer_name" -> name)
        val bytes = api.metrics.counterSum(
          "sequin_bytes_delivered_total", "consumer_name" -> name)
        val series = api.metrics.throughputTimeseries(cid)
        val rate = if (series.isEmpty) 0.0 else series.last
        val checks = h.checks.map { c =>
          s"""<tr><td>${esc(c.slug)}</td><td>${healthBadge(c.status)}</td>
             |<td>${esc(c.error.getOrElse(""))}</td>
             |<td class=dim>${c.lastHealthyAtMs.map(tsOf).getOrElse("")}
             |</td></tr>""".stripMargin
        }
        val bfs = api.backfills.getOrElse(name, Vector.empty).map { b =>
          s"""<tr><td>${b.id}</td><td>${esc(b.table)}</td>
             |<td>${statusBadge(b.state)}</td>
             |<td class=num>${b.rowsProcessedCount}</td>
             |<td class=num>${b.rowsIngestedCount}</td></tr>""".stripMargin
        }
        val trace = graft.streaming.Trace.recent(name, 50).map { e =>
          val extra = e.extra.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${esc(k)}=${esc(v)}" }.mkString(" ")
          s"""<tr><td class=dim>${tsOf(e.publishedAtMs)}</td>
             |<td>${statusBadge(e.status)}</td>
             |<td>${esc(e.message)}</td>
             |<td class=dim>$extra</td></tr>""".stripMargin
        }
        val sinkKind = cfg.sink.map(_.sinkType).getOrElse("none")
        val sinkSettings = cfg.sink.toSeq.flatMap(_.settings.toSeq)
          .sortBy(_._1).map { case (k, v) =>
            // catalog-password discipline: setting values that look
            // secret render obfuscated (api preview shape)
            val shown =
              if (Seq("password", "secret", "key", "token")
                .exists(k.toLowerCase.contains)) obfuscate(v)
              else v
            s"<tr><td>${esc(k)}</td><td>${esc(shown)}</td></tr>"
          }
        val fns = namedFunctions(name, cfg).map { case (fn, kind, expr) =>
          s"""<tr><td>${esc(fn)}</td><td>${esc(kind)}</td>
             |<td><code>${esc(expr)}</code></td></tr>""".stripMargin
        }
        val body =
          s"""<h1>${esc(name)} ${statusBadge(cfg.status)}
             |${healthBadge(h.status)}</h1>
             |<form method=post class=inline
             |  action="/sinks/${urlenc(name)}/status">
             |  <input type=hidden name=status
             |    value="${if (cfg.status == "active") "paused"
                 else "active"}">
             |  <button>${if (cfg.status == "active") "Pause"
                 else "Resume"}</button>
             |</form>
             |<form method=post class=inline
             |  action="/sinks/${urlenc(name)}/status">
             |  <input type=hidden name=status value=disabled>
             |  <button>Disable</button>
             |</form>
             |<form method=post class=inline
             |  action="/sinks/${urlenc(name)}/delete">
             |  <button class=danger>Delete</button>
             |</form>
             |<h2>Metrics</h2>
             |<table><tr><th>processed</th><th>attempts</th>
             |<th>failures</th><th>bytes</th><th>rate</th>
             |<th>throughput (60s)</th></tr>
             |<tr><td class=num>$successes</td><td class=num>$attempts</td>
             |<td class=num>$failures</td><td class=num>$bytes</td>
             |<td class=num>${"%.1f".format(rate)}/s</td>
             |<td>${sparkline(series)}</td></tr></table>
             |<h2>Configuration</h2>
             |<table>
             |<tr><td>destination</td><td>${esc(sinkKind)}</td></tr>
             |${sinkSettings.mkString("\n")}
             |<tr><td>batch size</td>
             |<td class=num>${cfg.effectiveBatchSize}</td></tr>
             |<tr><td>ack wait</td><td class=num>${cfg.ackWaitMs} ms</td></tr>
             |<tr><td>max ack pending</td>
             |<td class=num>${cfg.maxAckPending}</td></tr>
             |<tr><td>max retries</td>
             |<td class=num>${cfg.maxRetryCount}</td></tr>
             |<tr><td>grouping</td><td>${cfg.messageGrouping}</td></tr>
             |<tr><td>timestamp format</td>
             |<td>${esc(cfg.timestampFormat)}</td></tr>
             |<tr><td>actions</td>
             |<td>${esc(cfg.actions.mkString(", "))}</td></tr>
             |<tr><td>column filters</td>
             |<td class=num>${cfg.filters.size}</td></tr>
             |<tr><td>low latency</td><td>${cfg.lowLatency}${
                 if (cfg.lowLatency) s" (${cfg.lowLatencyShards} shards)"
                 else ""}</td></tr>
             |</table>
             |${if (fns.nonEmpty)
                 s"""<h2>Functions</h2><table>
                    |<tr><th>name</th><th>kind</th><th>expression</th></tr>
                    |${fns.mkString("\n")}</table>""".stripMargin
               else ""}
             |<h2>Health checks</h2>
             |<table><tr><th>check</th><th>status</th><th>error</th>
             |<th>last healthy</th></tr>
             |${checks.mkString("\n")}</table>
             |${if (bfs.nonEmpty)
                 s"""<h2>Backfills</h2><table>
                    |<tr><th>id</th><th>table</th><th>state</th>
                    |<th>processed</th><th>ingested</th></tr>
                    |${bfs.mkString("\n")}</table>""".stripMargin
               else ""}
             |<h2>Trace</h2>
             |${if (trace.isEmpty) "<p class=dim>no trace events</p>"
               else s"""<table><tr><th>at</th><th>status</th>
                  |<th>message</th><th>extra</th></tr>
                  |${trace.mkString("\n")}</table>""".stripMargin}
             |""".stripMargin
        respondHtml(ex, 200, page(name, body, refresh = true))
    }

  private def renderDatabases(ex: HttpExchange): Unit = {
    val rows = api.databases.keys.toSeq.sorted.flatMap(name =>
      api.databases.get(name).map(name -> _)).map { case (name, db) =>
      val repls = api.replications.values
        .filter(_.postgresDatabase == name).toSeq
      val paused = repls.nonEmpty && repls.forall(_.status == "disabled")
      val slotHealth = repls.headOption.map(r =>
        api.health.health("postgres_replication_slot", r.id.toString))
      s"""<tr>
         |<td><a href="/databases/${urlenc(name)}">${esc(name)}</a></td>
         |<td>${esc(db.hostname)}:${db.port}/${esc(db.database)}</td>
         |<td>${esc(db.slotName)}</td>
         |<td>${esc(db.publicationName)}</td>
         |<td class=num>${db.tables.size}</td>
         |<td class=num>${repls.size}</td>
         |<td>${slotHealth.map(h => healthBadge(h.status))
             .getOrElse("<span class=dim>no slot</span>")}</td>
         |<td>${if (paused) "<span class=badge>paused</span>" else ""}</td>
         |</tr>""".stripMargin
    }
    val body =
      if (rows.isEmpty)
        """<h1>Databases</h1><p class=dim>No databases declared —
          |see <a href=/setup>setup</a>.</p>""".stripMargin
      else
        s"""<h1>Databases</h1>
           |<table><tr><th>name</th><th>address</th><th>slot</th>
           |<th>publication</th><th>tables</th><th>replications</th>
           |<th>health</th><th></th></tr>
           |${rows.mkString("\n")}</table>""".stripMargin
    respondHtml(ex, 200, page("Databases", body, refresh = true))
  }

  private def renderDatabaseShow(ex: HttpExchange, name: String): Unit =
    api.databases.get(name) match {
      case None =>
        respondHtml(ex, 404, page("Not found",
          s"<p class=err>Database not found: ${esc(name)}</p>"))
      case Some(db) =>
        val tables = db.tables.sortBy(t => (t.schema, t.name)).map { t =>
          val cols = t.columns.map { c =>
            esc(c.name) + (if (c.isPk) " <span class=badge>pk</span>"
              else "")
          }.mkString(", ")
          s"""<tr><td>${esc(t.schema)}.${esc(t.name)}</td>
             |<td class=num>${t.oid}</td><td>$cols</td></tr>""".stripMargin
        }
        val body =
          s"""<h1>${esc(name)}</h1>
             |<table>
             |<tr><td>address</td>
             |<td>${esc(db.hostname)}:${db.port}/${esc(db.database)}
             |</td></tr>
             |<tr><td>user</td><td>${esc(db.username)}</td></tr>
             |<tr><td>password</td><td>${obfuscate(db.password)}</td></tr>
             |<tr><td>slot</td><td>${esc(db.slotName)}</td></tr>
             |<tr><td>publication</td>
             |<td>${esc(db.publicationName)}</td></tr>
             |</table>
             |<h2>Tables</h2>
             |${if (tables.isEmpty)
                 """<p class=dim>catalog not refreshed — run
                   |<code>POST /api/postgres_databases/&lt;name&gt;/
                   |refresh_tables</code></p>""".stripMargin
               else s"""<table><tr><th>table</th><th>oid</th>
                  |<th>columns</th></tr>
                  |${tables.mkString("\n")}</table>""".stripMargin}
             |""".stripMargin
        respondHtml(ex, 200, page(name, body, refresh = true))
    }

  private def renderWalPipelines(ex: HttpExchange): Unit = {
    val rows = api.retentions.keys.toSeq.sorted.flatMap(name =>
      api.retentions.get(name).map(name -> _)).map { case (name, r) =>
      val h = api.health.health("wal_pipeline", name)
      s"""<tr><td>${esc(name)}</td>
         |<td>${esc(r.sourceDatabase)}.${esc(r.sourceSchema)}.${esc(
             r.sourceTable)}</td>
         |<td>${esc(r.destinationDatabase)}.${esc(
             r.destinationSchema)}.${esc(r.destinationTable)}</td>
         |<td>${esc(r.actions.mkString(", "))}</td>
         |<td class=num>${r.filters.size}</td>
         |<td>${healthBadge(h.status)}</td></tr>""".stripMargin
    }
    val body =
      if (rows.isEmpty)
        """<h1>Change retention</h1>
          |<p class=dim>No WAL pipelines declared.</p>""".stripMargin
      else
        s"""<h1>Change retention</h1>
           |<table><tr><th>name</th><th>source</th><th>destination</th>
           |<th>actions</th><th>filters</th><th>health</th></tr>
           |${rows.mkString("\n")}</table>""".stripMargin
    respondHtml(ex, 200, page("Change retention", body, refresh = true))
  }

  private def renderFunctions(ex: HttpExchange): Unit = {
    val rows = api.registry.keys.toSeq.sorted.flatMap { name =>
      api.registry.get(name).toSeq
        .flatMap(cfg => namedFunctions(name, cfg)).map {
        case (fn, kind, expr) =>
          s"""<tr><td>${esc(fn)}</td><td>${esc(kind)}</td>
             |<td><code>${esc(expr)}</code></td>
             |<td><a href="/sinks/${urlenc(name)}">${esc(name)}</a>
             |</td></tr>""".stripMargin
      }
    }
    val body =
      if (rows.isEmpty)
        """<h1>Functions</h1>
          |<p class=dim>No functions declared on any sink.</p>""".stripMargin
      else
        s"""<h1>Functions</h1>
           |<table><tr><th>name</th><th>kind</th><th>expression</th>
           |<th>sink</th></tr>
           |${rows.mkString("\n")}</table>""".stripMargin
    respondHtml(ex, 200, page("Functions", body))
  }

  private def renderCli(ex: HttpExchange): Unit =
    respondHtml(ex, 200, page("CLI",
      """<h1>CLI</h1>
        |<p>The <code>graft</code> CLI drives this plane:</p>
        |<pre>graft context add default --hostname 127.0.0.1:PORT \
        |  --token $TOKEN
        |graft config apply -f graft.yaml   # declare resources
        |graft config export                # canonical YAML back out
        |graft consumer ls                  # sinks + status
        |graft stream tail &lt;sink&gt;            # live messages
        |graft tunnel --ports 5432:mydb     # splice to a database</pre>
        |<p class=dim>Every verb speaks the same JSON API this console
        |reads; nothing here is console-only.</p>""".stripMargin))

  private def renderSettings(ex: HttpExchange): Unit = {
    val acct = api.accounts.get(api.currentAccount.get())
    val toks = api.apiTokens.values.toSeq
      .filter(_.accountId == api.currentAccount.get())
      .sortBy(_.id).map { t =>
        s"""<tr><td>${esc(t.id)}</td><td>${esc(t.name)}</td>
           |<td><code>${obfuscate(t.token)}</code></td>
           |<td class=dim>${esc(t.insertedAt.toString)}</td>
           |</tr>""".stripMargin
      }
    val body =
      s"""<h1>Settings</h1>
         |<h2>Account</h2>
         |<table>
         |<tr><td>id</td><td>${esc(acct.map(_.id).getOrElse(""))}</td></tr>
         |<tr><td>name</td>
         |<td>${esc(acct.map(_.name).getOrElse(""))}</td></tr>
         |<tr><td>created</td><td class=dim>${esc(
             acct.map(_.insertedAt.toString).getOrElse(""))}</td></tr>
         |</table>
         |<h2>API tokens</h2>
         |<table><tr><th>id</th><th>name</th><th>token</th>
         |<th>created</th></tr>
         |${toks.mkString("\n")}</table>
         |<p class=dim>Mint and revoke through
         |<code>/api/api_keys</code>; raw values show once at mint.</p>
         |<form method=post action=/logout><button>Log out</button></form>
         |""".stripMargin
    respondHtml(ex, 200, page("Settings", body))
  }

  // ---- actions ---------------------------------------------------------

  private def doSinkStatus(ex: HttpExchange, name: String): Unit =
    api.registry.get(name) match {
      case None =>
        respondHtml(ex, 404, page("Not found",
          s"<p class=err>Sink consumer not found: ${esc(name)}</p>"))
      case Some(cfg) =>
        val status = parseForm(ex).getOrElse("status", "")
        if (!Set("active", "paused", "disabled")(status))
          respondHtml(ex, 422, page("Invalid",
            s"<p class=err>invalid status: ${esc(status)}</p>"))
        else {
          api.registry.update(name, cfg.copy(status = status))
          api.health.setPaused("sink_consumer", name, status != "active")
          respondHtml(ex, 302, "",
            Seq("Location" -> s"/sinks/${urlenc(name)}"))
        }
    }

  private def doSinkDelete(ex: HttpExchange, name: String): Unit =
    api.registry.remove(name) match {
      case None =>
        respondHtml(ex, 404, page("Not found",
          s"<p class=err>Sink consumer not found: ${esc(name)}</p>"))
      case Some(_) =>
        api.health.removeEntity("sink_consumer", name)
        graft.streaming.Trace.clear(name)
        respondHtml(ex, 302, "", Seq("Location" -> "/sinks"))
    }

  // ---- render helpers --------------------------------------------------

  /** The runtime labels outcomes by consumer id = name here (SlotRuntime
    * attaches with consumerId = name); the series is keyed the same way.
    */
  private def consumerIdOf(name: String): String = name

  private def namedFunctions(sink: String,
      cfg: graft.streaming.ConsumerConfig)
      : Seq[(String, String, String)] =
    cfg.filterFunction.map(e => ("filter", "filter", e)).toSeq ++
      cfg.transformFunctions.map { case (n, e) => (n, "transform", e) } ++
      cfg.iterateFunctions.map { case (n, it) =>
        (n, "iterate",
          s"${it.init} |> ${it.varName} -> ${it.step} (x${it.n})")
      } ++
      cfg.routingFunction.toSeq.sortBy(_._1).map { case (k, e) =>
        (s"route:$k", "routing", e)
      }

  private def statusBadge(s: String): String = {
    val cls = s match {
      case "active" | "completed" => "ok"
      case "info"                 => "dim2"
      case "paused" | "cancelled" | "warning" => "warn"
      case _                      => "err2"
    }
    s"<span class=\"badge $cls\">${esc(s)}</span>"
  }

  private def healthBadge(s: String): String = {
    val cls = s match {
      case "healthy"                           => "ok"
      case "error"                             => "err2"
      case "warn" | "notice" | "paused"        => "warn"
      case _ /* initializing | waiting */      => "dim2"
    }
    s"<span class=\"badge $cls\">${esc(s)}</span>"
  }

  /** Inline-SVG sparkline of the smoothed 60 s throughput series — the
    * console's stand-in for the reference's chart component.
    */
  private def sparkline(values: Vector[Double]): String =
    if (values.isEmpty || values.forall(_ == 0.0))
      "<span class=dim>idle</span>"
    else {
      val w = 120.0
      val h = 24.0
      val max = math.max(values.max, 1e-9)
      val pts = values.zipWithIndex.map { case (v, i) =>
        val x = i * w / math.max(values.size - 1, 1)
        val y = h - 2 - (v / max) * (h - 4)
        f"$x%.1f,$y%.1f"
      }.mkString(" ")
      s"""<svg width=${w.toInt} height=${h.toInt} class=spark
         |viewBox="0 0 ${w.toInt} ${h.toInt}"><polyline points="$pts"
         |fill="none" stroke="currentColor" stroke-width="1.5"/>
         |</svg>""".stripMargin.replace("\n", " ")
    }

  private def tsOf(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  // the catalog-password preview shape the JSON API uses
  // (api obfuscation: <=5 chars all-stars, <=9 first+last, else 3+last)
  private def obfuscate(s: String): String =
    if (s == null) "" else ManagementApi.obfuscate(s)

  private def decode(s: String): String = URLDecoder.decode(s, UTF_8)

  private def urlenc(s: String): String =
    java.net.URLEncoder.encode(s, UTF_8).replace("+", "%20")

  private def parseForm(ex: HttpExchange): Map[String, String] = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    body.split("&").iterator.filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(decode(k) -> decode(v))
        case Array(k)    => Some(decode(k) -> "")
        case _           => None
      }
    }.toMap
  }

  private def esc(s: String): String =
    if (s == null) ""
    else s.flatMap {
      case '<'  => "&lt;"
      case '>'  => "&gt;"
      case '&'  => "&amp;"
      case '"'  => "&quot;"
      case '\'' => "&#39;"
      case c    => c.toString
    }

  private val Nav = Seq(
    "/sinks" -> "Sinks", "/databases" -> "Databases",
    "/wal_pipelines" -> "Change retention", "/functions" -> "Functions",
    "/cli" -> "CLI", "/settings" -> "Settings")

  private def page(title: String, body: String,
      refresh: Boolean = false, nav: Boolean = true): String = {
    val navHtml =
      if (!nav) ""
      else Nav.map { case (href, label) =>
        s"<a href=$href>${esc(label)}</a>"
      }.mkString("<nav>", " ", "</nav>")
    s"""<!doctype html>
       |<html><head><meta charset=utf-8>
       |${if (refresh) "<meta http-equiv=refresh content=2>" else ""}
       |<title>${esc(title)} | graft</title>
       |<style>
       |body{font:14px/1.5 system-ui,sans-serif;margin:1.5rem;
       |  max-width:72rem}
       |table{border-collapse:collapse;margin:.5rem 0}
       |td,th{border:1px solid #ccc;padding:.25rem .6rem;
       |  text-align:left;vertical-align:top}
       |th{background:#f4f4f4}
       |.num{text-align:right;font-variant-numeric:tabular-nums}
       |.badge{border-radius:.6rem;padding:0 .5rem;font-size:12px;
       |  background:#eee}
       |.badge.ok{background:#d7f5dd}.badge.err2{background:#fbd5d5}
       |.badge.warn{background:#fdeec9}.badge.dim2{background:#eee}
       |.err{color:#b00}
       |.dim{color:#777}
       |.spark{color:#3366cc;vertical-align:middle}
       |nav a{margin-right:1rem}
       |form.inline{display:inline;margin-right:.5rem}
       |button.danger{color:#b00}
       |pre{background:#f4f4f4;padding:.5rem}
       |</style></head><body>
       |$navHtml
       |$body
       |</body></html>""".stripMargin
  }

  private def respondHtml(ex: HttpExchange, code: Int, body: String,
      headers: Seq[(String, String)] = Nil): Unit = {
    val bytes = body.getBytes(UTF_8)
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    ex.getResponseHeaders.add("Content-Type", "text/html; charset=utf-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) {
      val os = ex.getResponseBody
      os.write(bytes)
      os.close()
    }
  }
}
