package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projections / transforms P1-P10 over the CDC envelope.
  *
  * All are narrow (no shuffle) column expressions that stay inside
  * whole-stage codegen — the per-row cost that dominates the reference's
  * per-message Elixir hot path compiles to generated Java here.
  */
object Transforms {

  /** P5 — change diff: for updates, the old-image entries whose value
    * differs from the new image; inserts/deletes → NULL; update without an
    * old tuple → empty map, not null
    * (`/root/reference/lib/sequin/consumers/consumers.ex:661-676`).
    *
    * On a map-typed envelope this is
    * `map_filter(old, (k,v) -> new[k] IS DISTINCT FROM v)`; on the flat test
    * envelope the single tracked field is `old_value` vs `record_value`.
    */
  def changesDiff(df: DataFrame): DataFrame =
    df.withColumn("changed_value",
      when(col("action") === "update" &&
        !(col("old_value") <=> col("record_value")), col("old_value")))

  /** Map-typed variant of P5 for real (map<string,any>) records. */
  def changesDiffMap(newRecord: Column, oldRecord: Column): Column =
    map_filter(oldRecord, (k, v) => !(element_at(newRecord, k) <=> v))

  /** P8 — TOAST resolution: unchanged-toast sentinel cells take the value
    * from the old image (`/root/reference/lib/sequin/runtime/
    * message_handler.ex:309-361`). Intra-row `map_zip_with`, no shuffle.
    */
  def toastResolve(newRecord: Column, oldRecord: Column, sentinel: String = "unchanged_toast"): Column =
    map_zip_with(newRecord, oldRecord, (_, n, o) => coalesce(nullif(n, lit(sentinel)), o))

  /** Composite-PK stringification (§7.5 known-hard): every pk value is
    * stringified and ordered by attnum — the column order the Relation
    * message declares — matching the reference's `record_pks`
    * (`/root/reference/lib/sequin/runtime/slot_producer/processor.ex:256-259`,
    * `consumer_event.ex:94-109`). `pkString` is the joined form the
    * redis-string router keys on (`routing/consumers/redis_string.ex`).
    */
  def recordPks(pkCols: Seq[Column]): Column =
    array(pkCols.map(_.cast("string")): _*)

  def pkString(pkCols: Seq[Column]): Column =
    concat_ws("-", pkCols.map(_.cast("string")): _*)

  /** P3 — dot-path extraction from the JSON payload
    * (`/root/reference/lib/sequin/consumers/path_function.ex:25-72`).
    * Missing paths → NULL via `get_json_object` semantics.
    */
  def pathExtract(jsonCol: Column, path: String): Column =
    get_json_object(jsonCol, "$." + path)

  /** P9 — per-consumer timestamp rendering: ISO-8601 or unix microseconds
    * (`sink_consumer.ex:99`, `sink_pipeline.ex:194`).
    */
  def formatTimestamp(ts: Column, format: String): Column = format match {
    case "iso8601"          => date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    case "unix_microsecond" => unix_micros(ts)
    case other              => throw new IllegalArgumentException(s"unknown ts format $other")
  }

  /** P10 — group id: configured group columns (or pks) joined with ":";
    * empty → NULL → ungrouped parallel delivery
    * (`/root/reference/lib/sequin/consumers/consumers.ex:730-791`).
    */
  def groupId(groupCols: Seq[Column]): Column =
    nullif(concat_ws(":", groupCols: _*), lit(""))

  /** P4b — nested-record mutation, the `put_in`/jsonb_set analog of the
    * reference's MiniElixir transform functions (which may rewrite fields
    * anywhere inside the record — `/root/reference/lib/sequin/transforms/
    * message.ex:26-41`, `minielixir.ex:109-155`): set or add a field
    * INSIDE a struct-typed record column by dot path. Pure `withField` —
    * narrow, codegen'd, no JSON re-serialization round trip.
    */
  def recordSet(record: Column, path: String, value: Column): Column =
    record.withField(path, value)

  /** The `pop_in` analog: drop a nested field from a struct-typed record. */
  def recordDrop(record: Column, path: String): Column =
    record.dropFields(path)

  /** Idempotency key: base64("lsn:idx")
    * (`/root/reference/lib/sequin/runtime/slot_producer/processor.ex:176`).
    */
  def idempotencyKey(lsn: Column, idx: Column): Column =
    base64(concat(lsn.cast("string"), lit(":"), idx.cast("string")).cast("binary"))
}
