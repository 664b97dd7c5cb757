package graft

import graft.cli.GraftCli
import graft.config.ManagementApi
import java.io.{DataInputStream, DataOutputStream}
import java.net.{HttpURLConnection, InetAddress, ServerSocket, Socket, URI}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.CountDownLatch

/** The tunnel verb end to end over real loopback sockets: `graft tunnel
  * --ports <local>:<database>` forwards a local port through the
  * management plane's raw-TCP splice service to the NAMED database —
  * the rebuild's analog of the reference's chisel-backed `sequin
  * tunnel` (cli/tunnel_command.go:22). Proven by running the REAL
  * Postgres startup handshake (CatalogClient.testConnection) through
  * the tunnel chain: CLI local port → plane tunnel listener → target.
  */
class TunnelSpec extends SparkSpec {

  /** Minimal protocol-v3 Postgres front door: answers any startup with
    * AuthenticationOk + ReadyForQuery, then echoes nothing — exactly
    * what testConnection needs; multiple sequential sessions supported.
    */
  private final class FakePg {
    val sessions = new java.util.concurrent.atomic.AtomicInteger(0)
    private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    private val thread = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        val t = new Thread(() => {
          try {
            val in = new DataInputStream(sock.getInputStream)
            val out = new DataOutputStream(sock.getOutputStream)
            val len = in.readInt()
            val rest = new Array[Byte](len - 4)
            in.readFully(rest) // protocol version + params
            sessions.incrementAndGet()
            // AuthenticationOk
            out.write('R'.toByte)
            out.writeInt(8)
            out.writeInt(0)
            // ReadyForQuery (idle)
            out.write('Z'.toByte)
            out.writeInt(5)
            out.write('I'.toByte)
            out.flush()
            // hold the session open until the peer hangs up
            while (in.read() >= 0) ()
          } catch { case _: Exception => () }
          finally { try sock.close() catch { case _: Exception => () } }
        })
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
    })
    thread.setDaemon(true)
    thread.start()
    def stop(): Unit = server.close()
  }

  private def post(port: Int, path: String, token: String,
      body: String): Int = {
    val c = URI.create(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("POST")
    c.setRequestProperty("Authorization", s"Bearer $token")
    c.setDoOutput(true)
    c.getOutputStream.write(body.getBytes(UTF_8))
    val code = c.getResponseCode
    c.disconnect()
    code
  }

  test("tunnel verb: local port forwards through the plane to the named database (real PG handshake), bad names and tokens refused") {
    val pg = new FakePg
    val api = new ManagementApi
    val home = Files.createTempDirectory("graft_tunnel")
    try {
      // declare the database on the plane (testConnection runs against
      // the fake PG directly — session 1)
      assert(post(api.port(), "/api/postgres_databases", api.bootstrapToken,
        s"""{"name":"tundb","hostname":"127.0.0.1","port":${pg.port},
           |"database":"app","username":"u","password":"pw",
           |"slot_name":"s","publication_name":"p"}""".stripMargin) == 201)
      assert(pg.sessions.get() == 1)
      // CLI context pointing at the plane
      assert(GraftCli.run(Seq("context", "add", "t", "--hostname",
        "127.0.0.1", "--port", api.port().toString, "--token",
        api.bootstrapToken), home, _ => (), _ => (), Map.empty) == 0)
      // run the tunnel verb on its own thread; stdin blocks on a latch
      val stop = new CountDownLatch(1)
      val outSafe = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val errSafe = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      @volatile var exit = -1
      val cli = new Thread(() => {
        exit = GraftCli.run(Seq("tunnel", "--ports", "0:tundb"), home,
          outSafe.add(_), errSafe.add(_), Map.empty,
          () => { stop.await(); "" })
      })
      cli.setDaemon(true)
      cli.start()
      // wait for the listener line, parse the ephemeral local port
      val deadline = System.nanoTime() + 30000L * 1000000L
      def tunnelLine: Option[String] = {
        val it = outSafe.iterator()
        var found: Option[String] = None
        while (it.hasNext && found.isEmpty) {
          val l = it.next()
          if (l.startsWith("tunneling ")) found = Some(l)
        }
        found
      }
      while (tunnelLine.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(5)
      val line = tunnelLine.getOrElse(fail(s"no tunnel line: $outSafe $errSafe"))
      val localPort = line.stripPrefix("tunneling 127.0.0.1:")
        .takeWhile(_.isDigit).toInt
      // the REAL handshake through the whole chain: CLI local port →
      // plane splice → fake PG
      val r = graft.sources.CatalogClient.testConnection(
        "127.0.0.1", localPort, "u", "app", timeoutMs = 15000)
      assert(r == Right(()), s"handshake through tunnel failed: $r")
      assert(pg.sessions.get() == 2) // startup actually REACHED the target
      // refusals: unknown database / bad token, straight at the plane
      def preamble(msg: String): String = {
        val s = new Socket("127.0.0.1", api.tunnelPort())
        try {
          s.getOutputStream.write(s"$msg\n".getBytes(UTF_8))
          s.getOutputStream.flush()
          val in = s.getInputStream
          val sb = new StringBuilder
          var c = in.read()
          while (c >= 0 && c != '\n') { sb.append(c.toChar); c = in.read() }
          sb.toString
        } finally s.close()
      }
      assert(preamble(s"GRAFT-TUNNEL ${api.bootstrapToken} ghost")
        .startsWith("ERR unknown database"))
      assert(preamble("GRAFT-TUNNEL wrong-token tundb")
        .startsWith("ERR invalid token"))
      assert(preamble("HELLO").startsWith("ERR bad preamble"))
      // the token BINDS the splice to its account: a valid token minted
      // for another account cannot reach this account's database, and the
      // miss is indistinguishable from a nonexistent name (never 403)
      val tokenB = {
        val c = URI.create(s"http://127.0.0.1:${api.port()}/api/accounts")
          .toURL.openConnection().asInstanceOf[HttpURLConnection]
        c.setRequestMethod("POST")
        c.setRequestProperty("Authorization", s"Bearer ${api.bootstrapToken}")
        c.setDoOutput(true)
        c.getOutputStream.write("""{"name":"TeamB"}""".getBytes(UTF_8))
        assert(c.getResponseCode == 200)
        val body = new String(c.getInputStream.readAllBytes(), UTF_8)
        c.disconnect()
        "\"token\":\"([^\"]+)\"".r.findFirstMatchIn(body).get.group(1)
      }
      assert(preamble(s"GRAFT-TUNNEL $tokenB tundb")
        .startsWith("ERR unknown database"))
      // ...while the owning account's token still splices (session 3)
      assert(preamble(s"GRAFT-TUNNEL ${api.bootstrapToken} tundb")
        .startsWith("OK "))
      // clean shutdown: release stdin, the verb closes listeners, exit 0
      stop.countDown()
      cli.join(15000L)
      assert(exit == 0, s"tunnel verb exit: $exit err=$errSafe")
    } finally { api.stop(); pg.stop() }
  }

  test("tunnel verb failure taxonomy: in-use local port closes already-opened listeners and exits 1; a portless resolve response is an error, not a stack trace") {
    val pg = new FakePg
    val api = new ManagementApi
    val home = Files.createTempDirectory("graft_tunnel_err")
    try {
      assert(post(api.port(), "/api/postgres_databases", api.bootstrapToken,
        s"""{"name":"tundb","hostname":"127.0.0.1","port":${pg.port},
           |"database":"app","username":"u","password":"pw",
           |"slot_name":"s","publication_name":"p"}""".stripMargin) == 201)
      assert(GraftCli.run(Seq("context", "add", "t", "--hostname",
        "127.0.0.1", "--port", api.port().toString, "--token",
        api.bootstrapToken), home, _ => (), _ => (), Map.empty) == 0)
      // occupy a port, then map it SECOND so the first mapping binds
      // successfully and must be cleaned up on the second's BindException
      val taken = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
      val outQ = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val errQ = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val code = GraftCli.run(
        Seq("tunnel", "--ports", s"0:tundb,${taken.getLocalPort}:tundb"),
        home, outQ.add(_), errQ.add(_), Map.empty,
        () => fail("stdin must not be reached on a bind failure"))
      assert(code == 1, s"expected exit 1, got $code (err=$errQ)")
      assert(errQ.peek() != null && errQ.peek().contains("cannot listen"),
        s"bind error not surfaced: $errQ")
      // the successfully-bound first listener was closed: its port is
      // free to bind again
      val it = outQ.iterator()
      var firstPort = -1
      while (it.hasNext && firstPort < 0) {
        val l = it.next()
        if (l.startsWith("tunneling 127.0.0.1:"))
          firstPort = l.stripPrefix("tunneling 127.0.0.1:")
            .takeWhile(_.isDigit).toInt
      }
      assert(firstPort > 0, s"no tunneling line before the failure: $outQ")
      val rebind = new ServerSocket(firstPort, 1,
        InetAddress.getLoopbackAddress)
      rebind.close()
      taken.close()
      // a plane answering 200 without a port field: err path, exit 1
      val bare = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      bare.createContext("/api/tunnel", ex => {
        val b = "{}".getBytes(UTF_8)
        ex.sendResponseHeaders(200, b.length.toLong)
        ex.getResponseBody.write(b)
        ex.getResponseBody.close()
      })
      bare.start()
      try {
        assert(GraftCli.run(Seq("context", "add", "bare", "--hostname",
          "127.0.0.1", "--port", bare.getAddress.getPort.toString,
          "--token", "tkn"), home, _ => (), _ => (), Map.empty) == 0)
        val errs2 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val code2 = GraftCli.run(
          Seq("tunnel", "--ports", "0:tundb", "--context", "bare"),
          home, _ => (), errs2.add(_), Map.empty,
          () => fail("stdin must not be reached on a bad resolve"))
        assert(code2 == 1)
        assert(errs2.peek() != null &&
          errs2.peek().contains("no port in response"), s"got: $errs2")
      } finally bare.stop(0)
    } finally { api.stop(); pg.stop() }
  }
}
