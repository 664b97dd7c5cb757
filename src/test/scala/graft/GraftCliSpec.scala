package graft

import graft.cli.GraftCli
import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer

/** The operator CLI against a LIVE management plane over loopback HTTP:
  * context files, env interpolation, and the plan → apply → export
  * round trip (exported YAML re-applies as all-unchanged and re-exports
  * byte-identically — the reference CLI's config workflow).
  */
class GraftCliSpec extends SparkSpec {

  private def runCli(home: java.nio.file.Path, env: Map[String, String],
      stdin: String = "")(args: String*): (Int, Seq[String], Seq[String]) = {
    val out = ArrayBuffer.empty[String]
    val err = ArrayBuffer.empty[String]
    val code = GraftCli.run(args.toSeq, home, out += _, err += _, env,
      () => stdin)
    (code, out.toSeq, err.toSeq)
  }

  test("context store: add/ls/select/rm with a default marker") {
    val home = Files.createTempDirectory("graft_cli")
    val (c1, o1, _) = runCli(home, Map.empty)("context", "add", "dev",
      "--hostname", "127.0.0.1", "--port", "7000", "--token", "t1")
    assert(c1 == 0 && o1.head.contains("(default)")) // first context = default
    runCli(home, Map.empty)("context", "add", "prod",
      "--hostname", "10.0.0.2", "--port", "7376", "--token", "t2")
    val (_, ls, _) = runCli(home, Map.empty)("context", "ls")
    assert(ls == Seq("* dev  127.0.0.1:7000", "  prod  10.0.0.2:7376"))
    val (cs, _, _) = runCli(home, Map.empty)("context", "select", "prod")
    assert(cs == 0)
    val (_, ls2, _) = runCli(home, Map.empty)("context", "ls")
    assert(ls2.head == "  dev  127.0.0.1:7000" &&
      ls2.last == "* prod  10.0.0.2:7376")
    assert(runCli(home, Map.empty)("context", "rm", "dev")._1 == 0)
    assert(runCli(home, Map.empty)("context", "rm", "dev")._1 == 1)
    assert(runCli(home, Map.empty)("context", "select", "ghost")._1 == 1)
  }

  test("interpolate: ${VAR}, ${VAR:-default} and bare $VAR over YAML values") {
    val env = Map("DB_HOST" -> "db.internal", "TOKEN" -> "s3cr3t")
    val y = "url: \"http://${DB_HOST}:${DB_PORT:-5432}/x\"\n" +
      "key: \"$TOKEN\"\nmissing: \"${NOPE}\""
    val home = Files.createTempDirectory("graft_cli")
    val f = home.resolve("in.yaml")
    Files.write(f, y.getBytes("UTF-8"))
    val (code, out, _) = runCli(home, env)("config", "interpolate",
      f.toString)
    assert(code == 0)
    val text = out.mkString("\n")
    assert(text.contains("http://db.internal:5432/x"))
    assert(text.contains("key: \"s3cr3t\""))
    assert(text.contains("missing: \"\"")) // unset w/o default -> empty
  }

  test("plan → apply → export round trip over a live plane: exported " +
      "YAML re-applies as all-unchanged and re-exports byte-stable") {
    val api = new graft.config.ManagementApi
    val home = Files.createTempDirectory("graft_cli")
    try {
      runCli(home, Map.empty)("context", "add", "local",
        "--hostname", "127.0.0.1", "--port", api.port().toString,
        "--token", api.bootstrapToken)
      val yaml =
        """sinks:
          |  - name: "orders-sink"
          |    destination:
          |      type: "redis_stream"
          |      host: "${REDIS_HOST:-localhost}"
          |      port: "6379"
          |      stream_key: "orders"
          |    actions:
          |      - insert
          |      - update
          |  - name: "audit-sink"
          |    destination:
          |      type: "kafka"
          |      brokers: "broker:9092"
          |      topic: "audit"
          |""".stripMargin
      val f = home.resolve("sequin.yaml")
      Files.write(f, yaml.getBytes("UTF-8"))
      // PLAN: both sinks are creates
      val (pc, pout, _) = runCli(home, Map.empty)("config", "plan", f.toString)
      assert(pc == 0, pout)
      assert(pout.count(_.startsWith("+ create")) == 2, pout)
      assert(pout.exists(_.contains("2 to create, 0 to update, 0 to delete")))
      // APPLY without approval: cancelled, nothing lands
      val (ac0, aout0, _) = runCli(home, Map.empty, stdin = "no")(
        "config", "apply", f.toString)
      assert(ac0 == 1 && aout0.exists(_.contains("Apply cancelled")))
      assert(api.consumers().isEmpty)
      // APPLY --auto-approve: both land (env interpolated on the way)
      val (ac, aout, _) = runCli(home, Map.empty)(
        "config", "apply", f.toString, "--auto-approve")
      assert(ac == 0 && aout.exists(_.contains("Applied 2 resources")), aout)
      assert(api.consumers().map(_.name).sorted == Seq("audit-sink", "orders-sink"))
      assert(api.consumers().find(_.name == "orders-sink").get
        .sink.get.settings("host") == "localhost") // default interpolated
      // re-PLAN the same document: all unchanged
      val (_, pout2, _) = runCli(home, Map.empty)("config", "plan", f.toString)
      assert(pout2.exists(_.contains("0 to create, 0 to update, 0 to delete")),
        pout2)
      // EXPORT → re-APPLY → EXPORT: byte-stable (the canonical form is a
      // fixed point of apply∘export)
      val exp1 = home.resolve("export1.yaml")
      assert(runCli(home, Map.empty)("config", "export",
        "--output", exp1.toString)._1 == 0)
      val (ac2, aout2, _) = runCli(home, Map.empty)(
        "config", "apply", exp1.toString, "--auto-approve")
      assert(ac2 == 0 && aout2.exists(_.contains("No changes detected")),
        aout2)
      val exp2 = home.resolve("export2.yaml")
      assert(runCli(home, Map.empty)("config", "export",
        "--output", exp2.toString)._1 == 0)
      assert(java.util.Arrays.equals(Files.readAllBytes(exp1),
        Files.readAllBytes(exp2)), "export not byte-stable")
      // observability reads over the same plane
      val (lc, lout, _) = runCli(home, Map.empty)("sinks", "ls")
      assert(lc == 0 && lout.size == 2 &&
        lout.head.startsWith("audit-sink") &&
        lout.head.contains("kafka"), lout)
      val (sc, sout, _) = runCli(home, Map.empty)("sinks", "show",
        "orders-sink")
      assert(sc == 0 && sout.head.contains("\"orders-sink\""))
      val (hc, hout, _) = runCli(home, Map.empty)("health",
        "sink_consumer", "orders-sink")
      assert(hc == 0 && hout.nonEmpty, hout)
      assert(runCli(home, Map.empty)("sinks", "show", "ghost")._1 == 1)
      // rm deletes from the live registry
      assert(runCli(home, Map.empty)("sinks", "rm", "audit-sink")._1 == 0)
      assert(api.consumers().map(_.name) == Seq("orders-sink"))
      // auth is real: a bad token is a 401 at the plane
      runCli(home, Map.empty)("context", "add", "bad",
        "--hostname", "127.0.0.1", "--port", api.port().toString,
        "--token", "wrong")
      val (bc, _, berr) = runCli(home, Map.empty)("config", "plan",
        f.toString, "--context", "bad")
      assert(bc == 1 && berr.exists(_.contains("401")), berr)
    } finally api.stop()
  }

  test("config plan with a missing file / no context fails cleanly") {
    val home = Files.createTempDirectory("graft_cli")
    val (c1, _, e1) = runCli(home, Map.empty)("config", "plan", "/nope.yaml")
    assert(c1 == 1 && e1.exists(_.contains("no such file")))
    val f = home.resolve("x.yaml")
    Files.write(f, "sinks: []".getBytes)
    val (c2, _, e2) = runCli(home, Map.empty)("config", "plan", f.toString)
    assert(c2 == 1 && e2.exists(_.contains("no context configured")))
    val (c3, _, _) = runCli(home, Map.empty)("bogus")
    assert(c3 == 1)
  }

  test("lifecycle verbs: sinks pause/resume toggle status through the " +
      "sink PUT surface; backfill create/ls/cancel drive the control " +
      "plane (reference CLI consumer + backfill verbs)") {
    val api = new graft.config.ManagementApi
    val home = Files.createTempDirectory("graft_cli")
    try {
      runCli(home, Map.empty)("context", "add", "local",
        "--hostname", "127.0.0.1", "--port", api.port().toString,
        "--token", api.bootstrapToken)
      val yaml =
        """sinks:
          |  - name: "orders-sink"
          |    destination:
          |      type: "redis_stream"
          |      host: "localhost"
          |      port: "6379"
          |      stream_key: "orders"
          |""".stripMargin
      val f = home.resolve("sequin.yaml")
      Files.write(f, yaml.getBytes("UTF-8"))
      assert(runCli(home, Map.empty)(
        "config", "apply", f.toString, "--auto-approve")._1 == 0)
      assert(api.consumers().head.status == "active")
      // pause -> status lands on the control plane
      val (pc, pout, _) = runCli(home, Map.empty)(
        "sinks", "pause", "orders-sink")
      assert(pc == 0 && pout.exists(_.contains("now paused")), pout)
      assert(api.consumers().head.status == "paused")
      // resume -> back to active
      val (rc, rout, _) = runCli(home, Map.empty)(
        "sinks", "resume", "orders-sink")
      assert(rc == 0 && rout.exists(_.contains("now active")), rout)
      assert(api.consumers().head.status == "active")
      // unknown sink fails cleanly
      assert(runCli(home, Map.empty)("sinks", "pause", "ghost")._1 == 1)
      // backfill create / ls / cancel
      val (bc, bout, _) = runCli(home, Map.empty)(
        "backfill", "create", "orders-sink", "public.orders")
      assert(bc == 0 && bout.exists(o =>
        o.contains("public.orders") && o.contains("active")), bout)
      runCli(home, Map.empty)(
        "backfill", "create", "orders-sink", "public.items")
      val (lc, lout, _) = runCli(home, Map.empty)(
        "backfill", "ls", "orders-sink")
      assert(lc == 0 && lout.size == 2, lout)
      assert(lout.exists(l => l.contains("public.orders") &&
        l.contains("active")))
      val id = lout.find(_.contains("public.orders")).get.split("\\s+").head
      val (cc, cout, _) = runCli(home, Map.empty)(
        "backfill", "cancel", "orders-sink", id)
      assert(cc == 0, cout)
      val (_, lout2, _) = runCli(home, Map.empty)(
        "backfill", "ls", "orders-sink")
      assert(lout2.exists(l => l.contains("public.orders") &&
        l.contains("cancelled")), lout2)
      assert(lout2.exists(l => l.contains("public.items") &&
        l.contains("active")), lout2)
    } finally api.stop()
  }
}
