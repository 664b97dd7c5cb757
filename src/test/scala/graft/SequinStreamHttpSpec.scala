package graft

import graft.model.ChangeEvent
import graft.streaming.{SequinStreamHttp, SequinStreamPull}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp

/** JVM-singleton clock (see [[PullClock]]) for the HTTP suite. */
object HttpPullClock {
  @volatile var now: Long = 0L
  def get(): Long = now
}

/** The S11 pull API driven through a REAL loopback HTTP surface
  * (`com.sun.net.httpserver` on 127.0.0.1): the receive/ack/nack verbs,
  * batch-size and ack_ids validation with the controller's 400 messages,
  * wait_for duration parsing, visibility-timeout redelivery and the DLQ
  * path — pull_controller.ex:14-110 parity at the wire level.
  */
class SequinStreamHttpSpec extends SparkSpec {
  import graft.{HttpPullClock => Clock}

  private def ev(lsn: Long, group: String): ChangeEvent =
    ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"), "update",
      "public", "t0", 16384L, s"pk$lsn", lsn, group.toLong, 1.0, "{}",
      None, s"$group:$lsn", group, 100L)

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def ackIds(receiveBody: String): Seq[String] =
    "\"ack_id\":\"([^\"]+)\"".r.findAllMatchIn(receiveBody)
      .map(_.group(1)).toSeq

  test("receive -> ack -> redeliver -> DLQ over the real HTTP surface") {
    implicit val s = spark
    Clock.now = 0L
    // maxRetry=3: initial hand-out (1) + post-nack redelivery (2) +
    // visibility-timeout redelivery (3), then the next expiry dead-letters
    val pull = new SequinStreamPull(ackWaitMs = 1000L, maxRetry = 3,
      nowMs = HttpPullClock.get)
    val http = new SequinStreamHttp(pull, "orders_stream")
    try {
      val port = http.port()
      pull.ingest(Seq(ev(8, "1"), ev(16, "1"), ev(8, "2")))

      // receive: FIFO heads of both groups, envelope shape intact
      val (st1, b1) = post(port, "/api/sequin_streams/orders_stream/receive",
        """{"max_batch_size": 10}""")
      assert(st1 == 200)
      val ids1 = ackIds(b1)
      assert(ids1.size == 2)
      assert(b1.contains("\"record\"") && b1.contains("\"metadata\"") &&
        b1.contains("\"commit_lsn\":8") && b1.contains("\"action\":\"update\""))
      // in-flight messages are withheld on the next receive
      val (_, empty) = post(port, "/api/sequin_streams/orders_stream/receive",
        """{"max_batch_size": 10}""")
      assert(ackIds(empty).isEmpty)

      // ack both heads over HTTP → group 1's next message is deliverable
      val (st2, ok) = post(port, "/api/sequin_streams/orders_stream/ack",
        s"""{"ack_ids": ["${ids1.mkString("\",\"")}"]}""")
      assert(st2 == 200 && ok == """{"success":true}""")
      val (_, b2) = post(port, "/api/sequin_streams/orders_stream/receive",
        """{"batch_size": 10}""") // deprecated alias accepted
      assert(b2.contains("\"commit_lsn\":16"))

      // nack → immediate redelivery
      val (st3, _) = post(port, "/api/sequin_streams/orders_stream/nack",
        s"""{"ack_ids": ["${ackIds(b2).head}"]}""")
      assert(st3 == 200)
      val (_, b3) = post(port, "/api/sequin_streams/orders_stream/receive",
        "{}") // absent max_batch_size defaults to 1
      assert(ackIds(b3).size == 1 && b3.contains("\"commit_lsn\":16"))

      // visibility timeout expires → redelivered once, then the retry
      // cap dead-letters it (receive returns empty, DLQ holds it)
      Clock.now = 2000L
      val (_, b4) = post(port, "/api/sequin_streams/orders_stream/receive",
        """{"max_batch_size": 1}""")
      assert(ackIds(b4).size == 1)
      Clock.now = 4000L
      val (_, b5) = post(port, "/api/sequin_streams/orders_stream/receive",
        """{"max_batch_size": 1}""")
      assert(ackIds(b5).isEmpty)
      assert(pull.deadLetters().map(_.event.commit_lsn) == Seq(16L))
    } finally { http.stop(); pull.stop() }
  }

  test("controller validation parity: batch bounds, ack_ids, wait_for, routing") {
    implicit val s = spark
    Clock.now = 0L
    val pull = new SequinStreamPull(ackWaitMs = 60000L,
      nowMs = HttpPullClock.get)
    val http = new SequinStreamHttp(pull, "c1")
    try {
      val port = http.port()
      // max_batch_size out of range → the controller's 400 message
      val (s1, e1) = post(port, "/api/sequin_streams/c1/receive",
        """{"max_batch_size": 1001}""")
      assert(s1 == 400 && e1.contains(
        "`max_batch_size` must be an integer between 1 and 1000"))
      // numeric strings are accepted (maybe_parse_int)
      val (s2, _) = post(port, "/api/sequin_streams/c1/receive",
        """{"max_batch_size": "5"}""")
      assert(s2 == 200)
      // ack_ids must be a non-empty list of non-empty strings
      for (bad <- Seq("""{}""", """{"ack_ids": []}""",
          """{"ack_ids": [""]}""", """{"ack_ids": "x"}""")) {
        val (st, body) = post(port, "/api/sequin_streams/c1/ack", bad)
        assert(st == 400 && body.contains("ack_ids"), bad)
      }
      // wait_for: duration strings parse; malformed ones 400; bounded 5m
      val (s3, _) = post(port, "/api/sequin_streams/c1/receive",
        """{"wait_for": "100ms"}""")
      assert(s3 == 200)
      val (s4, e4) = post(port, "/api/sequin_streams/c1/receive",
        """{"wait_for": "10h"}""")
      assert(s4 == 400 && e4.contains("duration"))
      val (s5, _) = post(port, "/api/sequin_streams/c1/receive",
        """{"wait_for": 600000}""")
      assert(s5 == 400)
      // unknown consumer name → 404; unknown route → 404; GET → 405
      assert(post(port, "/api/sequin_streams/nope/receive", "{}")._1 == 404)
      assert(post(port, "/api/other", "{}")._1 == 404)
      val req = HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$port/api/sequin_streams/c1/receive"))
        .GET().build()
      assert(client.send(req,
        HttpResponse.BodyHandlers.ofString()).statusCode() == 405)
    } finally { http.stop(); pull.stop() }
  }

  test("a parked HTTP long-poll does not block a concurrent HTTP nack — and returns its redelivery") {
    implicit val s = spark
    Clock.now = 0L
    val pull = new SequinStreamPull(ackWaitMs = 60000L, maxRetry = 5,
      nowMs = HttpPullClock.get)
    val http = new SequinStreamHttp(pull, "c3")
    try {
      val port = http.port()
      pull.ingest(Seq(ev(8, "1")))
      // hand the only message out: nothing else is deliverable
      val (_, b1) = post(port, "/api/sequin_streams/c3/receive",
        """{"max_batch_size": 1}""")
      val id = ackIds(b1).head

      // park a long-poll (empty store), then nack the in-flight message
      // OVER HTTP from another thread: with a single-threaded server the
      // nack would queue behind the park and the poll would time out —
      // here the nack interleaves between poll attempts and the parked
      // receive returns the redelivered message well before its deadline.
      // The park (30s) is deliberately far above the nack bound (15s) so
      // scheduler starvation on a loaded box cannot blur the two
      // outcomes: a QUEUED nack takes >= the park, a concurrent one
      // stays well under the bound.
      @volatile var polled: Seq[String] = Nil
      val poller = new Thread(() => {
        val (_, body) = post(port, "/api/sequin_streams/c3/receive",
          """{"wait_for": "30s", "max_batch_size": 1}""")
        polled = ackIds(body)
      })
      poller.start()
      Thread.sleep(300) // let the poll park first
      val t0 = System.nanoTime()
      val (st, ok) = post(port, s"""/api/sequin_streams/c3/nack""",
        s"""{"ack_ids": ["$id"]}""")
      val nackMs = (System.nanoTime() - t0) / 1000000L
      assert(st == 200 && ok == """{"success":true}""")
      assert(nackMs < 15000, s"nack blocked behind the long-poll: ${nackMs}ms")
      poller.join(30000)
      assert(!poller.isAlive, "long-poll never returned")
      assert(polled.size == 1, "redelivered message did not reach the poll")
    } finally { http.stop(); pull.stop() }
  }

  test("long-poll over HTTP returns once messages arrive") {
    implicit val s = spark
    Clock.now = 0L
    val pull = new SequinStreamPull(ackWaitMs = 60000L,
      nowMs = HttpPullClock.get)
    val http = new SequinStreamHttp(pull, "c2")
    try {
      val port = http.port()
      val t0 = System.nanoTime()
      val (_, empty) = post(port, "/api/sequin_streams/c2/receive",
        """{"wait_for": 300}""")
      assert(ackIds(empty).isEmpty)
      assert((System.nanoTime() - t0) / 1000000L >= 300)

      // a producer lands events while a long-poll is parked: the poll
      // must return them before its deadline
      val producer = new Thread(() => {
        Thread.sleep(200); pull.ingest(Seq(ev(8, "1")))
      })
      producer.start()
      val (_, got) = post(port, "/api/sequin_streams/c2/receive",
        """{"wait_for": "5s", "max_batch_size": 1}""")
      producer.join()
      assert(ackIds(got).size == 1)
    } finally { http.stop(); pull.stop() }
  }
}
