package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.streaming.AckDelivery.DeliveryCommand
import org.apache.spark.sql.functions._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** The webhook delivery CLIENT — the socket half of the HTTP push sink
  * (`/root/reference/lib/sequin/runtime/http_push_pipeline.ex:115-160`:
  * Req.post with `receive_timeout`, success = 2xx, transient statuses
  * retried in-request with exponential backoff, exhaustion/permanent
  * failure nacks the batch toward the redelivery/DLQ ladder).
  *
  * [[SinkAdapters.httpPushWire]] / `httpPushBatchedWire` assemble WHAT to
  * send (commit-ordered bodies); [[HttpRetryPolicy]] decides HOW failures
  * resolve; this object actually performs the POSTs. The separation is
  * deliberate: the wire and the policy are oracle-checkable DataFrames,
  * while the socket I/O lives in one `mapPartitions` stage at the very
  * edge of the plan — the same boundary the reference draws between
  * pipeline and transport.
  *
  * Scale shape: requests execute sequentially WITHIN a partition (the
  * wire's per-partition commit order is the delivery-order contract, R3's
  * group hash keeps a group's requests in one partition) and in parallel
  * ACROSS partitions — at 1000 executors that is 1000 concurrent
  * connection lanes, the analog of the reference's per-consumer pipeline
  * concurrency. One `HttpClient` per executor JVM (thread-safe, pooled,
  * keep-alive) — no per-row connection setup.
  *
  * Egress note: nothing here knows about hosts; production points it at
  * real endpoints, the test suite at a 127.0.0.1 listener (zero-egress
  * sandbox). `realSleep = false` computes-but-skips the backoff sleeps so
  * specs stay fast while still asserting the slept schedule.
  *
  * The recorded attempt ladder is BY CONSTRUCTION consistent with
  * [[HttpRetryPolicy.resolve]]: feeding a result's `statuses` back
  * through `resolve` reproduces (delivered, attempts, final_status,
  * total_backoff_ms) exactly — spec-gated, so the live client and the
  * declarative policy evaluator can never drift apart.
  */
object HttpPushClient {

  /** One delivery request: `ack_id` keys the delivery (redelivery/DLQ
    * state), `group_id` its FIFO group, `body` the wire payload.
    */
  final case class PushRequest(
      ack_id: String,
      group_id: String,
      method: String,
      endpoint: String,
      body: String)

  /** One delivery result: the full observed attempt ladder plus its
    * resolution under the policy.
    */
  final case class PushResult(
      ack_id: String,
      group_id: String,
      endpoint: String,
      statuses: Seq[Int],
      delivered: Boolean,
      attempts: Int,
      final_status: Int,
      total_backoff_ms: Long)

  /** Normalize [[SinkAdapters.httpPushBatchedWire]] rows into requests:
    * the (partition, batch_idx) pair is the delivery key, the partition
    * the FIFO group — matching the reference's per-batch ack granularity.
    */
  def batchedRequests(wire: DataFrame): DataFrame =
    wire.select(
      concat_ws("-", col("partition"), col("batch_idx")).as("ack_id"),
      col("partition").cast("string").as("group_id"),
      col("method"), col("endpoint"), col("body"))

  // one pooled client per executor JVM; HttpClient is thread-safe and
  // reuses connections across tasks (keep-alive), so a long-running
  // executor holds its endpoint connections open like the reference's
  // Finch/Req pools
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10))
      .build()

  /** POST one request; transport errors (refused / reset / timeout)
    * report status 0 — [[HttpRetryPolicy.Policy.isTransient]]'s encoding.
    */
  private def postOnce(r: PushRequest, timeoutMs: Long,
      headers: Seq[(String, String)]): Int =
    try {
      val b = HttpRequest.newBuilder(URI.create(r.endpoint))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("content-type", "application/json")
      headers.foreach { case (k, v) => b.header(k, v) }
      val req = b.method(r.method,
        HttpRequest.BodyPublishers.ofString(r.body)).build()
      client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode()
    } catch { case _: Exception => 0 }

  /** Run the LIVE in-request ladder for one request: attempt, classify,
    * sleep-and-retry transients while retries remain. Mirrors
    * [[HttpRetryPolicy.resolve]] step for step — `resolve(statuses)`
    * over the returned ladder reproduces this function's resolution.
    */
  private def deliverOne(r: PushRequest, policy: HttpRetryPolicy.Policy,
      realSleep: Boolean, headers: Seq[(String, String)]): PushResult = {
    var statuses = Vector.empty[Int]
    var backoff = 0L
    var attempt = 0
    var resolved: Option[(Boolean, Int)] = None
    while (resolved.isEmpty) {
      val s = postOnce(r, policy.receiveTimeoutMs, headers)
      statuses :+= s
      if (policy.isSuccess(s)) resolved = Some((true, s))
      else if (!policy.isTransient(s) || attempt >= policy.maxRetries)
        resolved = Some((false, s))
      else {
        val sleepMs = policy.backoffMs(attempt)
        backoff += sleepMs
        if (realSleep) Thread.sleep(sleepMs)
        attempt += 1
      }
    }
    val (ok, fin) = resolved.get
    PushResult(r.ack_id, r.group_id, r.endpoint, statuses, ok,
      statuses.length, fin, backoff)
  }

  /** Deliver every request, preserving per-partition order. Input
    * columns: `ack_id`, `group_id`, `method`, `endpoint`, `body`
    * ([[batchedRequests]] adapts the batched wire). Returns one
    * [[PushResult]] per request; bridge failures onward with
    * [[commands]] (ack/nack) and [[SinkAdapters.dlqWire]].
    */
  def deliver(requests: DataFrame, policy: HttpRetryPolicy.Policy,
      realSleep: Boolean = true,
      headers: Seq[(String, String)] = Nil)(
      implicit spark: SparkSession): Dataset[PushResult] = {
    import spark.implicits._
    requests
      .select("ack_id", "group_id", "method", "endpoint", "body")
      .as[PushRequest]
      .mapPartitions { it =>
        it.map(deliverOne(_, policy, realSleep, headers))
      }
  }

  /** Results → delivery state machine commands: delivered acks, failed
    * nacks (AckDelivery owns visibility/deliver_count/DLQ from there) —
    * the same bridge [[HttpRetryPolicy.toCommands]] provides for
    * log-evaluated outcomes.
    */
  def commands(results: Dataset[PushResult])(
      implicit spark: SparkSession): Dataset[DeliveryCommand] = {
    import spark.implicits._
    results.map { r =>
      if (r.delivered)
        DeliveryCommand.ack(r.group_id, r.ack_id)
      else
        DeliveryCommand.nack(r.group_id, r.ack_id)
    }
  }
}
