package graft.cli

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The operator CLI — `plan` / `apply` / `export` / `interpolate` plus
  * context management, driving the ManagementApi's config plane over
  * HTTP (the reference's Go CLI: `/root/reference/cli/cli/
  * config_command.go` command set, `cli/context/context.go` context
  * files under `~/.sequin/contexts/<name>.json`, and
  * `cli/config/config.go`'s env-var substitution over YAML values).
  *
  * Pure JVM + the JDK HttpClient — no framework; every action is one
  * request against the same validated endpoints the REST plane serves
  * (`POST /api/config/plan|apply`, `GET /api/config/export`), so CLI
  * and API can never disagree about what a document means.
  *
  * Testable by construction: [[run]] takes the home dir, output sinks,
  * env and stdin explicitly; `main` binds them to the real process.
  */
object GraftCli {

  final case class Context(name: String, hostname: String, port: Int,
      token: String, default: Boolean, tls: Boolean = false)

  // ---- context store (JSON files under <home>/contexts) -----------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def ctxDir(home: Path): Path = home.resolve("contexts")

  private def writeContext(home: Path, c: Context): Unit = {
    Files.createDirectories(ctxDir(home))
    val o = mapper.createObjectNode()
    o.put("name", c.name); o.put("hostname", c.hostname)
    o.put("port", c.port); o.put("api_token", c.token)
    o.put("default", c.default); o.put("tls", c.tls)
    Files.write(ctxDir(home).resolve(c.name + ".json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
        .getBytes(UTF_8))
    ()
  }

  private def readContext(home: Path, name: String): Option[Context] = {
    val f = ctxDir(home).resolve(name + ".json")
    if (!Files.exists(f)) None
    else {
      val n = mapper.readTree(new String(Files.readAllBytes(f), UTF_8))
      Some(Context(n.get("name").asText(), n.get("hostname").asText(),
        n.get("port").asInt(), n.get("api_token").asText(),
        Option(n.get("default")).exists(_.asBoolean()),
        Option(n.get("tls")).exists(_.asBoolean())))
    }
  }

  private def listContexts(home: Path): Seq[Context] =
    if (!Files.exists(ctxDir(home))) Seq.empty
    else Files.list(ctxDir(home)).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".json"))
      .flatMap(f => readContext(home,
        f.getFileName.toString.stripSuffix(".json")))
      .sortBy(_.name)

  private def resolveContext(home: Path, named: Option[String]): Either[String, Context] =
    named match {
      case Some(n) => readContext(home, n).toRight(s"unknown context: $n")
      case None =>
        val all = listContexts(home)
        all.find(_.default).orElse(all.headOption)
          .toRight("no context configured — run: graft context add " +
            "<name> --hostname <h> --port <p> --token <t>")
    }

  // ---- env interpolation (config.go applyEnvSubst semantics) ------------

  /** Substitute `${VAR}`, `${VAR:-default}` and bare `$VAR` with values
    * from `env` — the reference CLI's envsubst pass (unset without a
    * default expands to the empty string, like a8m/envsubst's
    * non-strict mode).
    */
  private[cli] def interpolate(yaml: String, env: Map[String, String]): String = {
    val braced = """\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\}""".r
    val bare = """\$([A-Za-z_][A-Za-z0-9_]*)""".r
    val pass1 = braced.replaceAllIn(yaml, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.getOrElse(m.group(1), Option(m.group(2)).getOrElse(""))))
    bare.replaceAllIn(pass1, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.getOrElse(m.group(1), "")))
  }

  // ---- HTTP ----------------------------------------------------------------

  private lazy val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  private def request(ctx: Context, method: String, path: String,
      body: Option[String]): (Int, String) = {
    val scheme = if (ctx.tls) "https" else "http"
    val b = HttpRequest.newBuilder(
        URI.create(s"$scheme://${ctx.hostname}:${ctx.port}$path"))
      // a hung plane must not hang the operator's terminal
      .timeout(java.time.Duration.ofSeconds(30))
      .header("Authorization", s"Bearer ${ctx.token}")
      .header("Content-Type", "application/json")
    val req = body match {
      case Some(j) => b.method(method, HttpRequest.BodyPublishers.ofString(j))
      case None    => b.method(method, HttpRequest.BodyPublishers.noBody())
    }
    val r = http.send(req.build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def yamlEnvelope(yaml: String): String = {
    val o = mapper.createObjectNode()
    o.put("yaml", yaml)
    o.toString
  }

  // ---- commands ----------------------------------------------------------

  /** Run the CLI. Returns the process exit code. `stdin` feeds the
    * apply confirmation prompt.
    */
  def run(args: Seq[String], home: Path, out: String => Unit,
      err: String => Unit, env: Map[String, String],
      stdin: () => String = () => ""): Int = {

    def flag(name: String): Boolean = args.contains(s"--$name")
    def opt(name: String): Option[String] = {
      val i = args.indexOf(s"--$name")
      if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
    }
    def positional(after: Int): Seq[String] = {
      // positionals = args minus flags and their values
      val flagsWithValue = Set("--hostname", "--port", "--token",
        "--context", "--output", "--limit", "--ports")
      val acc = Seq.newBuilder[String]
      var i = 0
      while (i < args.length) {
        val a = args(i)
        if (flagsWithValue(a)) i += 2
        else { if (!a.startsWith("--")) acc += a; i += 1 }
      }
      acc.result().drop(after)
    }

    def readYaml(fileArg: Option[String]): Either[String, String] = {
      val path = Paths.get(fileArg.getOrElse("sequin.yaml"))
      if (!Files.exists(path)) Left(s"no such file: $path")
      else Right(interpolate(
        new String(Files.readAllBytes(path), UTF_8), env))
    }

    def withCtx(f: Context => Int): Int =
      resolveContext(home, opt("context")) match {
        case Left(e)  => err(e); 1
        case Right(c) => f(c)
      }

    def planRequest(ctx: Context, yaml: String): Either[String, Seq[(String, String, String)]] = {
      val (code, body) = request(ctx, "POST", "/api/config/plan",
        Some(yamlEnvelope(yaml)))
      if (code != 200) Left(s"plan failed ($code): $body")
      else Right(mapper.readTree(body).get("changes").elements().asScala
        .map(c => (c.get("action").asText(), c.get("kind").asText(),
          c.get("name").asText())).toSeq)
    }

    def printPlan(changes: Seq[(String, String, String)]): Int = {
      changes.foreach { case (action, kind, name) =>
        val mark = action match {
          case "create" => "+"
          case "update" => "~"
          case "delete" => "-"
          case _        => " "
        }
        out(f"$mark $action%-9s $kind%-16s $name")
      }
      val n = changes.count(_._1 != "unchanged")
      out(s"\nPlan: ${changes.count(_._1 == "create")} to create, " +
        s"${changes.count(_._1 == "update")} to update, " +
        s"${changes.count(_._1 == "delete")} to delete.")
      n
    }

    args.toList match {
      // ---- context management ----
      case "context" :: "add" :: name :: _ =>
        (opt("hostname"), opt("port").flatMap(_.toIntOption), opt("token")) match {
          case (Some(h), Some(p), Some(t)) =>
            val makeDefault = flag("set-default") || listContexts(home).isEmpty
            writeContext(home, Context(name, h, p, t, makeDefault,
              tls = flag("tls")))
            out(s"context '$name' saved" +
              (if (makeDefault) " (default)" else ""))
            0
          case _ =>
            err("usage: context add <name> --hostname <h> --port <p> --token <t> [--set-default]")
            1
        }
      case "context" :: "ls" :: _ =>
        listContexts(home).foreach(c => out(
          s"${if (c.default) "*" else " "} ${c.name}  ${c.hostname}:${c.port}"))
        0
      case "context" :: "rm" :: name :: _ =>
        val f = ctxDir(home).resolve(name + ".json")
        if (Files.deleteIfExists(f)) { out(s"context '$name' removed"); 0 }
        else { err(s"unknown context: $name"); 1 }
      case "context" :: "select" :: name :: _ =>
        readContext(home, name) match {
          case None => err(s"unknown context: $name"); 1
          case Some(_) =>
            listContexts(home).foreach(c =>
              writeContext(home, c.copy(default = c.name == name)))
            out(s"context '$name' is now default")
            0
        }

      // ---- config plane ----
      case "config" :: "plan" :: _ =>
        readYaml(positional(2).headOption) match {
          case Left(e) => err(e); 1
          case Right(yaml) => withCtx { ctx =>
            planRequest(ctx, yaml) match {
              case Left(e)        => err(e); 1
              case Right(changes) => printPlan(changes); 0
            }
          }
        }

      case "config" :: "apply" :: _ =>
        readYaml(positional(2).headOption) match {
          case Left(e) => err(e); 1
          case Right(yaml) => withCtx { ctx =>
            planRequest(ctx, yaml) match {
              case Left(e) => err(e); 1
              case Right(changes) =>
                val n = printPlan(changes)
                if (n == 0) { out("No changes detected, exiting."); 0 }
                else if (!flag("auto-approve") && {
                  // PRINT the prompt before blocking on stdin — a bare
                  // read looks like a hang to the operator
                  out("Apply these changes? Only 'yes' applies: ")
                  stdin().trim != "yes"
                }) {
                  out("Apply cancelled."); 1
                } else {
                  val (code, body) = request(ctx, "POST",
                    "/api/config/apply", Some(yamlEnvelope(yaml)))
                  if (code != 200) { err(s"apply failed ($code): $body"); 1 }
                  else {
                    val res = mapper.readTree(body).get("resources")
                    out(s"Applied ${res.size()} resources.")
                    0
                  }
                }
            }
          }
        }

      case "config" :: "export" :: _ => withCtx { ctx =>
        val (code, body) = request(ctx, "GET", "/api/config/export", None)
        if (code != 200) { err(s"export failed ($code): $body"); 1 }
        else {
          val yaml = mapper.readTree(body).get("yaml").asText()
          opt("output") match {
            case Some(p) =>
              Files.write(Paths.get(p), yaml.getBytes(UTF_8))
              out(s"exported to $p")
            case None => out(yaml)
          }
          0
        }
      }

      case "config" :: "interpolate" :: _ =>
        readYaml(positional(2).headOption) match {
          case Left(e) => err(e); 1
          case Right(yaml) =>
            opt("output") match {
              case Some(p) =>
                Files.write(Paths.get(p), yaml.getBytes(UTF_8))
                out(s"interpolated to $p")
              case None => out(yaml)
            }
            0
        }

      // ---- observability / sink CRUD (read side) ----
      case "sinks" :: "ls" :: _ => withCtx { ctx =>
        val (code, body) = request(ctx, "GET", "/api/sinks", None)
        if (code != 200) { err(s"ls failed ($code): $body"); 1 }
        else {
          mapper.readTree(body).get("data").elements().asScala.foreach { c =>
            val sinkType = Option(c.get("destination"))
              .flatMap(d => Option(d.get("type")).map(_.asText()))
              .getOrElse("-")
            val actions = Option(c.get("actions"))
              .map(_.elements().asScala.map(_.asText()).mkString(","))
              .getOrElse("")
            out(f"${c.get("name").asText()}%-24s $sinkType%-14s $actions")
          }
          0
        }
      }
      case "sinks" :: "show" :: name :: _ => withCtx { ctx =>
        val (code, body) = request(ctx, "GET", s"/api/sinks/$name", None)
        if (code != 200) { err(s"show failed ($code): $body"); 1 }
        else { out(body); 0 }
      }
      case "sinks" :: "rm" :: name :: _ => withCtx { ctx =>
        val (code, body) = request(ctx, "DELETE", s"/api/sinks/$name", None)
        if (code != 200) { err(s"rm failed ($code): $body"); 1 }
        else { out(s"sink '$name' removed"); 0 }
      }

      // ---- consumer lifecycle (the reference CLI's consumer pause /
      // resume: status is updated through the sink-consumer PUT, the
      // same surface the reference's update controller exposes) ----
      case "sinks" :: ("pause" | "resume") :: _ if args.length >= 3 =>
        val target = args(1) match {
          case "pause" => "paused"
          case _       => "active"
        }
        val name = args(2)
        withCtx { ctx =>
          val (gc, gbody) = request(ctx, "GET", s"/api/sinks/$name", None)
          if (gc != 200) { err(s"${args(1)} failed ($gc): $gbody"); 1 }
          else {
            val node = mapper.readTree(gbody)
              .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            node.put("status", target)
            val (uc, ubody) = request(ctx, "PUT", s"/api/sinks/$name",
              Some(node.toString))
            if (uc != 200) { err(s"${args(1)} failed ($uc): $ubody"); 1 }
            else { out(s"sink '$name' is now $target"); 0 }
          }
        }

      // ---- backfill lifecycle (reference CLI backfill verbs over the
      // backfill_controller.ex-parity routes) ----
      case "backfill" :: "create" :: name :: table :: _ => withCtx { ctx =>
        val body = mapper.createObjectNode()
        body.put("table", table)
        val (code, rbody) = request(ctx, "POST",
          s"/api/sinks/$name/backfills", Some(body.toString))
        if (code != 200 && code != 201) {
          err(s"backfill create failed ($code): $rbody"); 1
        } else {
          val b = mapper.readTree(rbody)
          out(s"backfill ${b.get("id").asText()} on '$table' " +
            s"(${b.get("state").asText()})")
          0
        }
      }
      case "backfill" :: "ls" :: name :: _ => withCtx { ctx =>
        val (code, body) = request(ctx, "GET",
          s"/api/sinks/$name/backfills", None)
        if (code != 200) { err(s"backfill ls failed ($code): $body"); 1 }
        else {
          mapper.readTree(body).get("data").elements().asScala.foreach { b =>
            out(s"${b.get("id").asText()}  ${b.get("table").asText()}  " +
              s"${b.get("state").asText()}")
          }
          0
        }
      }
      case "backfill" :: "cancel" :: name :: id :: _ => withCtx { ctx =>
        val body = mapper.createObjectNode()
        body.put("state", "cancelled")
        val (code, rbody) = request(ctx, "PUT",
          s"/api/sinks/$name/backfills/$id", Some(body.toString))
        if (code != 200) { err(s"backfill cancel failed ($code): $rbody"); 1 }
        else { out(s"backfill $id cancelled"); 0 }
      }
      case "trace" :: name :: _ => withCtx { ctx =>
        val limit = opt("limit").getOrElse("100")
        val (code, body) = request(ctx, "GET",
          s"/api/sinks/$name/trace?limit=$limit", None)
        if (code != 200) { err(s"trace failed ($code): $body"); 1 }
        else {
          mapper.readTree(body).get("data").elements().asScala.foreach { e =>
            val extra = Option(e.get("extra")).map(x =>
              x.fields().asScala.map(f =>
                s"${f.getKey}=${f.getValue.asText()}").mkString(" "))
              .getOrElse("")
            out(s"${e.get("status").asText()}  " +
              s"${e.get("message").asText()}  $extra")
          }
          0
        }
      }
      case "health" :: kind :: id :: _ => withCtx { ctx =>
        val (code, body) = request(ctx, "GET", s"/api/health/$kind/$id", None)
        if (code != 200) { err(s"health failed ($code): $body"); 1 }
        else {
          val h = mapper.readTree(body)
          out(s"${h.get("status").asText()}")
          Option(h.get("checks")).foreach(_.elements().asScala.foreach(c =>
            out(s"  ${c.get("slug").asText()}: ${c.get("status").asText()}")))
          0
        }
      }

      // ---- tunnel (tunnel_command.go:22 — forward local ports to named
      // databases through the control plane; the plane side is a raw-TCP
      // splice service resolved via GET /api/tunnel) ----
      case "tunnel" :: _ => withCtx { ctx =>
        val mappings = opt("ports").toSeq
          .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
          .map(_.split(":", 2))
        if (mappings.isEmpty ||
            mappings.exists(p => p.length != 2 || p(0).toIntOption.isEmpty)) {
          err("usage: tunnel --ports <local-port>:<database>" +
            "[,<local-port>:<database>]")
          1
        } else {
          val (code, body) = request(ctx, "GET", "/api/tunnel", None)
          if (code != 200) { err(s"tunnel resolve failed ($code): $body"); 1 }
          else {
            // the resolve response contract is {"port": n}; a plane that
            // answers 200 without it must surface as the err path, not a
            // stack trace from a null JsonNode
            val tportOpt =
              try Option(mapper.readTree(body).get("port")).map(_.asInt())
              catch { case _: Exception => None }
            if (tportOpt.isEmpty) {
              err(s"tunnel resolve failed: no port in response: $body")
              1
            } else {
            val tport = tportOpt.get
            // bind listeners one at a time; a duplicate or in-use local
            // port closes everything already opened and exits through the
            // err path instead of leaking half the mappings
            val opened =
              scala.collection.mutable.ArrayBuffer.empty[java.net.ServerSocket]
            var bindErr: Option[String] = None
            mappings.iterator.takeWhile(_ => bindErr.isEmpty)
                .foreach { case Array(lp, name) =>
              val ss =
                try new java.net.ServerSocket(lp.toInt, 16,
                  java.net.InetAddress.getLoopbackAddress)
                catch { case e: Exception =>
                  bindErr = Some(
                    s"cannot listen on 127.0.0.1:$lp: ${e.getMessage}")
                  null
                }
              if (ss != null) {
              opened += ss
              val acceptor = new Thread(() => {
                try while (true) {
                  val local = ss.accept()
                  val t = new Thread(() => {
                    try {
                      local.setTcpNoDelay(true)
                      val remote = new java.net.Socket(ctx.hostname, tport)
                      remote.setTcpNoDelay(true)
                      val rout = remote.getOutputStream
                      rout.write(
                        s"GRAFT-TUNNEL ${ctx.token} $name\n".getBytes("UTF-8"))
                      rout.flush()
                      val rin = remote.getInputStream
                      val reply = new StringBuilder(64)
                      var c = rin.read()
                      while (c >= 0 && c != '\n') { reply.append(c.toChar); c = rin.read() }
                      if (reply.startsWith("OK "))
                        graft.config.TcpRelay.splice(local, remote)
                      else {
                        err(s"tunnel to '$name' refused: ${reply.toString.trim}")
                        local.close(); remote.close()
                      }
                    } catch { case _: Exception =>
                      try local.close() catch { case _: Exception => () }
                    }
                  }, s"graft-tunnel-local-$name")
                  t.setDaemon(true)
                  t.start()
                } catch { case _: Exception => () }
              }, s"graft-tunnel-accept-${ss.getLocalPort}")
              acceptor.setDaemon(true)
              acceptor.start()
              out(s"tunneling 127.0.0.1:${ss.getLocalPort} -> $name " +
                s"(via ${ctx.hostname}:$tport)")
              }
            }
            bindErr match {
              case Some(msg) =>
                opened.foreach(s =>
                  try s.close() catch { case _: Exception => () })
                err(msg)
                1
              case None =>
                out("press enter to stop")
                stdin() // block until the operator ends the session
                opened.foreach(s =>
                  try s.close() catch { case _: Exception => () })
                0
            }
            }
          }
        }
      }

      case _ =>
        err("""usage: graft <command>
              |  context add <name> --hostname <h> --port <p> --token <t> [--set-default] [--tls]
              |  context ls | rm <name> | select <name>
              |  config plan [file] [--context <name>]
              |  config apply [file] [--auto-approve] [--context <name>]
              |  config export [--output <path>] [--context <name>]
              |  config interpolate [file] [--output <path>]
              |  sinks ls | show <name> | rm <name> | pause <name> | resume <name>
              |  backfill create <sink> <schema.table> | ls <sink> | cancel <sink> <id>
              |  trace <name> [--limit <n>]
              |  health <kind> <id>
              |  tunnel --ports <local-port>:<database>[,...] [--context <name>]""".stripMargin)
        1
    }
  }

  def main(args: Array[String]): Unit = {
    val home = sys.env.get("GRAFT_CLI_HOME").map(Paths.get(_))
      .getOrElse(Paths.get(sys.props("user.home"), ".graft"))
    val code = run(args.toSeq, home, println, System.err.println, sys.env,
      () => Option(scala.io.StdIn.readLine()).getOrElse(""))
    if (code != 0) sys.exit(code)
  }
}
