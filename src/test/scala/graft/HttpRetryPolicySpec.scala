package graft

import graft.model.ChangeEvent
import graft.sinks.HttpRetryPolicy
import graft.sinks.HttpRetryPolicy.Policy
import graft.streaming.AckDelivery
import graft.streaming.AckDelivery.{Delivery, DeliveryCommand}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The reference webhook pipeline's retry contract, egress-free: the
  * in-request transient ladder (policy arithmetic vs
  * `Sequin.Time.exponential_backoff` + Req `:transient` semantics) and
  * the composition with consumer-level redelivery — a permanently flaky
  * endpoint walks a wire log through nack → redeliver → DLQ.
  */
class HttpRetryPolicySpec extends SparkSpec {

  private val policy = Policy()

  test("backoff curve matches the reference arithmetic (capped doubling from base)") {
    // exponential_backoff(500, n, 5000): 500, 500, 1000, 2000, then the
    // cap (max_count = trunc(log2(10) + 1) = 4, so count 4 jumps to max —
    // the reference curve has no 4000 step)
    assert((0 to 6).map(policy.backoffMs) ==
      Seq(500L, 500L, 1000L, 2000L, 5000L, 5000L, 5000L))
    // jitter multiplies below the cap only (reference: rand in [0.85, 1.15))
    val jittered = Policy(jitter = _ * 1.15)
    assert(jittered.backoffMs(2) == 1150L)
    assert(jittered.backoffMs(6) == 5000L)
  }

  test("status classes: 2xx success; transport/408/429/5xx transient; else permanent") {
    assert(Seq(200, 204, 299).forall(policy.isSuccess))
    assert(Seq(-1, 0, 408, 429, 500, 502, 503, 504).forall(policy.isTransient))
    assert(Seq(400, 401, 404, 410, 422).forall(s =>
      !policy.isSuccess(s) && !policy.isTransient(s)))
  }

  test("resolve: the in-request ladder stops at success, permanence, or exhaustion") {
    // clean success: one attempt, no backoff
    assert(HttpRetryPolicy.resolve(policy, Seq(200)) == ((true, 1, 200, 0L)))
    // transient then success: retried once after base backoff
    assert(HttpRetryPolicy.resolve(policy, Seq(503, 200)) == ((true, 2, 200, 500L)))
    // transient exhaustion at max_retries=1: two attempts total, failed
    assert(HttpRetryPolicy.resolve(policy, Seq(503, 503)) == ((false, 2, 503, 500L)))
    // permanent status never retries in-request
    assert(HttpRetryPolicy.resolve(policy, Seq(404, 200)) == ((false, 1, 404, 0L)))
    // statuses after the resolution point are never consumed
    assert(HttpRetryPolicy.resolve(policy, Seq(200, 503)) == ((true, 1, 200, 0L)))
    // multi-retry schedule matches Req's 0-based retry_count: the k-th
    // retry sleeps backoffMs(k-1) -> 500 + 500 + 1000 = 2000 total
    val p3 = Policy(maxRetries = 3)
    assert(HttpRetryPolicy.resolve(p3, Seq(503, 503, 503, 200)) ==
      ((true, 4, 200, 2000L)))
    assert(HttpRetryPolicy.resolve(p3, Seq(503, 503, 503, 503)) ==
      ((false, 4, 503, 2000L)))
    // TRUNCATED log: the policy would allow a retry, but no follow-up
    // attempt was recorded — the backoff for that never-made retry must
    // not be reported as slept
    assert(HttpRetryPolicy.resolve(policy, Seq(503)) == ((false, 1, 503, 0L)))
    assert(HttpRetryPolicy.resolve(p3, Seq(503, 503)) == ((false, 2, 503, 500L)))
  }

  test("evaluate resolves a wire log per ack_id") {
    implicit val s = spark
    import s.implicits._
    val log = Seq(
      ("a1", "g1", 0, 503), ("a1", "g1", 1, 200),   // transient, recovered
      ("a2", "g1", 0, 200),                          // clean
      ("a3", "g2", 0, 503), ("a3", "g2", 1, 502),   // transient, exhausted
      ("a4", "g2", 0, 404)                           // permanent
    ).toDF("ack_id", "group_id", "attempt_idx", "status")
    val out = HttpRetryPolicy.evaluate(log, policy)
      .collect().map(r => r.getAs[String]("ack_id") ->
        ((r.getAs[Boolean]("delivered"), r.getAs[Int]("attempts"),
          r.getAs[Int]("final_status"), r.getAs[Long]("total_backoff_ms"))))
      .toMap
    assert(out("a1") == ((true, 2, 200, 500L)))
    assert(out("a2") == ((true, 1, 200, 0L)))
    assert(out("a3") == ((false, 2, 502, 500L)))
    assert(out("a4") == ((false, 1, 404, 0L)))
  }

  private def ev(lsn: Long, group: String): ChangeEvent =
    ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"), "update",
      "public", "t0", 16384L, s"pk$lsn", lsn, group.toLong, 1.0, "{}",
      None, s"$group:$lsn", group, 100L)

  test("a permanently flaky endpoint rides nack -> redeliver -> DLQ end to end") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DeliveryCommand]
    val q = AckDelivery.run(in.toDS(), ackWaitMs = 60000L, maxRetry = 3)
      .writeStream.format("memory").queryName("http_dlq")
      .outputMode("append").start()
    try {
      in.addData(DeliveryCommand.event(ev(8, "5")))
      q.processAllAvailable()

      // every delivery attempt hits an endpoint that 503s through the
      // in-request ladder; the failed outcome nacks, AckDelivery
      // redelivers, until deliver_count reaches maxRetry and it DLQs
      var rounds = 0
      def undone(): Seq[Delivery] = spark.table("http_dlq").as[Delivery]
        .collect().toSeq
      while (!undone().exists(_.kind == "dlq") && rounds < 5) {
        val attempt = undone().filter(d => d.kind != "dlq").last
        val wire = Seq(
          (attempt.ack_id, "5", 0, 503), (attempt.ack_id, "5", 1, 503))
          .toDF("ack_id", "group_id", "attempt_idx", "status")
        val cmds = HttpRetryPolicy.toCommands(
          HttpRetryPolicy.evaluate(wire, policy)).collect()
        assert(cmds.forall(_.kind == "nack"))
        in.addData(cmds.toSeq: _*)
        q.processAllAvailable()
        rounds += 1
      }

      val out = spark.table("http_dlq").as[Delivery].collect()
        .map(d => (d.kind, d.deliver_count))
      // attempt 1 delivered, nack-redelivered at 2 and 3, then DLQ'd at
      // the retry cap — the reference's deliver_count/max_retry ladder
      assert(out.toSeq == Seq(
        ("deliver", 1), ("redeliver", 2), ("redeliver", 3), ("dlq", 3)))
    } finally q.stop()
  }
}
