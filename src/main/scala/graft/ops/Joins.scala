package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's four specialized joins (J1-J4), Spark-first.
  *
  * Scale notes: enrichment dimensions (customers, parts, config tables) are
  * small relative to the event stream, so J1 defaults to a broadcast hash
  * join — zero shuffle of the 100 TB fact side. The anti-joins (J3/J4, F7)
  * shuffle only the key columns after Catalyst prunes, and AQE converts them
  * to broadcast when the right side is small.
  */
object Joins {

  /** J1 — enrichment lookup join: attach dimension attributes to each event
    * by PK equality; missing match → NULLs
    * (`/root/reference/lib/sequin/consumers/consumers.ex:1656-1740`,
    * invoked per delivery batch in `sink_pipeline.ex:263-268`).
    *
    * The reference runs `WHERE id = ANY($pks)` against the source DB per
    * batch and hash-merges results; declaratively that is a left-outer
    * equi-join, and for small dims we force broadcast so the fact side never
    * shuffles.
    */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: Column, dimKey: Column,
      broadcastDim: Boolean = true): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    events.join(d, eventKey === dimKey, "left_outer")
  }

  /** J3 — backfill fencing: drop backfill rows whose PK appeared on the live
    * CDC stream during the batch window (CDC wins; stale-read fence)
    * (`/root/reference/lib/sequin/runtime/message_handler.ex:66-94`).
    */
  def backfillFence(backfill: DataFrame, cdcSeen: DataFrame, keys: Seq[String]): DataFrame =
    backfill.join(cdcSeen.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** F7/W6 (batch form) — delivered-message skip: drop messages whose
    * `(commit_lsn, commit_idx)` is already in the delivered ledger
    * (`/root/reference/lib/sequin/runtime/sink_pipeline.ex:244-247`,
    * `message_ledgers.ex:60-100`).
    */
  def rejectDelivered(batch: DataFrame, ledger: DataFrame): DataFrame =
    batch.join(ledger.select("commit_lsn", "commit_idx").distinct(),
      Seq("commit_lsn", "commit_idx"), "left_anti")

  /** J4 — ledger audit: keys present in the undelivered cursor set but
    * missing from the sink table = lost messages
    * (`/root/reference/lib/sequin/runtime/message_consistency_check_worker.ex`).
    */
  def auditLost(expected: DataFrame, sink: DataFrame, keys: Seq[String]): DataFrame =
    expected.join(sink.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
