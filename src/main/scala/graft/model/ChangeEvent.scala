package graft.model

import java.sql.Timestamp

/** Typed CDC envelope (the streaming `Dataset[ChangeEvent]` element).
  *
  * Mirrors the reference's consumer-facing message
  * (`/root/reference/lib/sequin/consumers/consumer_event.ex:27-56` +
  * `consumer_event_data.ex:19-58`), flattened: the record payload is the
  * (id, userId, value, props-JSON) quad of the synthetic corpus; a real
  * deployment pins a table schema and swaps in its own payload fields, or
  * keeps `record_props` as the full JSON document for schema-flexible
  * tables.
  *
  * Field names are snake_case so `Dataset[ChangeEvent].toDF()` produces
  * exactly the column names of the untyped envelope
  * ([[Cdc.fromEvents]]) — one operator library serves both.
  *
  * Identity and ordering: `(commit_lsn, commit_idx)` is the total event
  * order (slot_producer.ex:136-142); `idempotency_key` =
  * base64("lsn:idx") (processor.ex:176); `group_id` is the per-entity
  * delivery-ordering key (consumers.ex:730-791), null ⇒ ungrouped.
  */
final case class ChangeEvent(
    commit_lsn: Long,
    commit_idx: Long,
    commit_ts: Timestamp,
    action: String,
    table_schema: String,
    table_name: String,
    table_oid: Long,
    record_pk: String,
    record_id: Long,
    record_user_id: Long,
    record_value: Double,
    record_props: String,
    old_value: Option[Double],
    idempotency_key: String,
    group_id: String,
    byte_size: Long)
