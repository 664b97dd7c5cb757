package graft.sinks

import graft.streaming.AckDelivery.DeliveryCommand
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTTP delivery retry/backoff policy — the reference webhook pipeline's
  * failure-handling contract as pure configuration + a deterministic
  * evaluator, testable with zero egress.
  *
  * Reference semantics
  * (`/root/reference/lib/sequin/runtime/http_push_pipeline.ex:163-171`):
  * each push runs with `receive_timeout = consumer.ack_wait_ms`, retries
  * TRANSIENT failures in-request at most `max_retries = 1` time with
  * `exponential_backoff(500ms, retry_count, 5s)` between attempts, and
  * treats 2xx as delivered (`:343-369` `ensure_status`). A push that is
  * still failing after the in-request retries surfaces as a failed batch,
  * and the message re-enters consumer-level redelivery — visibility
  * timeout, deliver_count, dead-letter — which here is
  * [[graft.streaming.AckDelivery]]. The backoff curve itself is
  * `Sequin.Time.exponential_backoff/3` (`time.ex:101-111`): capped
  * doubling from `base`, ×[0.85, 1.15) jitter below the cap.
  *
  * Two layers, cleanly split exactly like the reference:
  *  - IN-REQUEST (this object): transport-level, short horizon, bounded
  *    by `maxRetries` — resolves a status sequence to delivered/failed
  *    plus the backoff schedule actually slept.
  *  - ACROSS DELIVERIES (AckDelivery): failed requests nack their
  *    ack_id; redelivery counting and DLQ live in the delivery state
  *    machine, NOT here.
  *
  * The evaluator consumes a "wire log" — one row per (ack_id,
  * attempt_idx, status) as a real endpoint would have answered — so specs
  * drive flaky endpoints deterministically; production swaps the log for
  * a real client with identical policy arithmetic.
  */
object HttpRetryPolicy {

  /** `status <= 0` encodes a transport error (connect refused / reset /
    * timeout) — no HTTP status existed.
    */
  final case class Policy(
      receiveTimeoutMs: Long = 30000L,
      maxRetries: Int = 1,
      backoffBaseMs: Long = 500L,
      backoffMaxMs: Long = 5000L,
      jitter: Double => Double = identity) {

    def isSuccess(status: Int): Boolean = status >= 200 && status <= 299

    /** Req's `:transient` class: transport errors, timeout-ish and
      * throttle statuses, 5xx server errors.
      */
    def isTransient(status: Int): Boolean =
      status <= 0 || status == 408 || status == 429 ||
        status == 500 || status == 502 || status == 503 || status == 504

    /** `Sequin.Time.exponential_backoff(base, count, max)` with the
      * jitter factored out (reference multiplies by a random in
      * [0.85, 1.15); default here is jitter-free so every engine computes
      * the same schedule — pass `jitter` to reintroduce it).
      */
    def backoffMs(count: Int): Long = {
      val maxCount = (math.log(backoffMaxMs.toDouble / backoffBaseMs) /
        math.log(2.0) + 1).toLong
      if (count >= maxCount) backoffMaxMs
      else {
        val raw =
          if (count <= 1) backoffBaseMs.toDouble
          else backoffBaseMs * math.pow(2.0, count - 1)
        jitter(raw).toLong
      }
    }
  }

  /** Outcome of one delivery's in-request attempt ladder. */
  final case class Outcome(
      ack_id: String,
      group_id: String,
      delivered: Boolean,
      attempts: Int,
      final_status: Int,
      total_backoff_ms: Long)

  /** Resolve one request's observed status sequence under the policy:
    * walk attempts in order; a success stops the ladder; a transient
    * failure sleeps `backoffMs(retryCount)` and retries while retries
    * remain; a non-transient failure (or retry exhaustion) fails the
    * request. Statuses beyond the resolution point are ignored (the
    * request would never have been made).
    */
  def resolve(policy: Policy, statuses: Seq[Int]): (Boolean, Int, Int, Long) = {
    require(statuses.nonEmpty, "wire log must contain at least one attempt")
    var attempt = 0
    var backoff = 0L
    while (attempt < statuses.length) {
      val s = statuses(attempt)
      if (policy.isSuccess(s)) return (true, attempt + 1, s, backoff)
      if (!policy.isTransient(s) || attempt >= policy.maxRetries)
        return (false, attempt + 1, s, backoff)
      // a retry only SLEPT if its follow-up attempt is actually in the
      // log — a truncated log (policy allows a retry that was never
      // made) must not report backoff that never happened
      if (attempt + 1 >= statuses.length)
        return (false, attempt + 1, s, backoff)
      // Req passes the 0-BASED retry count to retry_delay, so the k-th
      // retry sleeps backoffMs(k-1): 500, 500, 1000, 2000... — the same
      // schedule the reference produces
      backoff += policy.backoffMs(attempt)
      attempt += 1
    }
    val last = statuses.last
    (false, statuses.length, last, backoff)
  }

  /** Evaluate a wire log under the policy — one [[Outcome]] per ack_id.
    *
    * `wireLog` columns: `ack_id`, `group_id`, `attempt_idx` (0-based,
    * in-request attempt order), `status`. Grouping is a single hash
    * aggregation on ack_id (the delivery key — the same key the sink
    * batches by, so at scale this co-partitions with delivery state and
    * the per-group collect_list is bounded by `maxRetries + 1` rows).
    */
  def evaluate(wireLog: DataFrame, policy: Policy)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    wireLog
      .groupBy("ack_id", "group_id")
      .agg(sort_array(collect_list(struct(col("attempt_idx"), col("status"))))
        .as("tries"))
      .as[(String, String, Seq[(Int, Int)])]
      .map { case (ackId, groupId, tries) =>
        val (ok, n, fin, backoff) = resolve(policy, tries.map(_._2))
        Outcome(ackId, groupId, ok, n, fin, backoff)
      }
      .toDF()
  }

  /** Bridge evaluated outcomes into the delivery state machine: delivered
    * requests ack, failed requests nack (immediate redeliverability —
    * the visibility/deliver_count/DLQ ladder is AckDelivery's job).
    */
  def toCommands(outcomes: DataFrame)(
      implicit spark: SparkSession): org.apache.spark.sql.Dataset[DeliveryCommand] = {
    import spark.implicits._
    outcomes.select("ack_id", "group_id", "delivered")
      .as[(String, String, Boolean)]
      .map { case (ackId, groupId, ok) =>
        if (ok) DeliveryCommand.ack(groupId, ackId)
        else DeliveryCommand.nack(groupId, ackId)
      }
  }
}
