package graft.streaming

import graft.model.ChangeEvent
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-group FIFO delivery with exactly-once semantics — the streaming
  * state machine behind the reference's slot message store
  * (`/root/reference/lib/sequin/runtime/slot_message_store_state.ex:432-478`
  * deliverable_messages; W2/W6 in SURVEY.md §2.7).
  *
  * Keyed by `group_id` via `flatMapGroupsWithState`:
  *   - events within a micro-batch are emitted in strict
  *     `(commit_lsn, commit_idx)` order per group;
  *   - the state stores the last delivered cursor; any event at or below
  *     it (redelivery, replayed batch, duplicate) is dropped — the
  *     idempotency ledger (`message_ledgers.ex:60-100`) as keyed state;
  *   - state survives micro-batches through the state store (RocksDB/HDFS
  *     backed in production), so exactly-once holds across restarts from
  *     the checkpoint.
  *
  * Scale: state is two longs per group; Spark hash-partitions groups
  * across executors — the same `partition_by` sharding as the reference's
  * Broadway pipeline (`sink_pipeline.ex:156-163`) with durability for free.
  */
object GroupFifo {

  final case class Cursor(lsn: Long, idx: Long)

  /** Emits deliverable events per group in order, dropping anything not
    * strictly after the last delivered cursor.
    */
  def deliver(events: Dataset[ChangeEvent])(implicit spark: SparkSession): Dataset[ChangeEvent] = {
    import spark.implicits._
    events
      .groupByKey(e => Option(e.group_id).getOrElse(s"__pk:${e.record_pk}"))
      .flatMapGroupsWithState[Cursor, ChangeEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[ChangeEvent], state: GroupState[Cursor]) =>
          val last = state.getOption.getOrElse(Cursor(Long.MinValue, Long.MinValue))
          // drop stale replays BEFORE materializing — a replayed flood
          // costs no memory; what remains (genuinely new events for this
          // group in ONE micro-batch) is bounded by source admission
          // control (maxOffsetsPerTrigger / maxFilesPerTrigger), the same
          // knob that bounds the reference's per-group buffers
          val fresh = it.filter(e =>
            e.commit_lsn > last.lsn ||
              (e.commit_lsn == last.lsn && e.commit_idx > last.idx)).toArray
          // in-batch duplicates (at-least-once sources can replay within
          // one batch) must deliver once: sort then dedup by cursor
          val deliverable = fresh.sortBy(e => (e.commit_lsn, e.commit_idx))
            .distinctBy(e => (e.commit_lsn, e.commit_idx))
          deliverable.lastOption.foreach(e =>
            state.update(Cursor(e.commit_lsn, e.commit_idx)))
          deliverable.iterator
      }
  }

  /** Batch-mode rendition of the same semantics (for oracle checks/tests):
    * drop duplicates by (delivery group, cursor) — equivalent to one
    * micro-batch against empty state. Fully declarative (hash-partitioned
    * dedup, no per-group materialization), so a group that floods a batch
    * costs a shuffle partition, not executor memory; delivery order is
    * the consumer's sort, as in the streaming path.
    */
  def deliverBatch(events: Dataset[ChangeEvent])(implicit spark: SparkSession): Dataset[ChangeEvent] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    events.toDF()
      .withColumn("__gk", coalesce(col("group_id"),
        concat(lit("__pk:"), col("record_pk"))))
      .dropDuplicates("__gk", "commit_lsn", "commit_idx")
      .drop("__gk")
      .as[ChangeEvent]
  }
}
