package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture event envelope.
  *
  * The reference engine's unit of data is a change message carrying
  * `(action, commit_lsn, commit_idx, commit_ts, table identity, record,
  * old record, pks, idempotency key, group id)` — see
  * `/root/reference/lib/sequin/runtime/message.ex:27-46` and
  * `/root/reference/lib/sequin/consumers/consumer_event.ex:27-56`.
  *
  * For deterministic, oracle-checkable testing we synthesize that envelope
  * from the driver-generated `events` parquet table. The mapping is pure
  * column arithmetic — [[Cdc.fromEvents]] (Spark) and [[Cdc.duckCte]]
  * (DuckDB SQL) MUST stay in lockstep; every CDC query's oracle is written
  * over the `cdc` CTE.
  *
  * Envelope columns (flat scalars so the driver's parquet-vs-DuckDB hash
  * compare is representation-stable):
  *   - `commit_lsn`/`commit_idx`: total event order; ~7 changes per txn,
  *     lsn strides by 8 like a byte-offset WAL position.
  *   - `action`: insert | update | delete (derived from event_type).
  *   - `table_schema`/`table_name`/`table_oid`: source table identity;
  *     1 in 10 users write to the `audit` schema (exercises scoping).
  *   - `record_pk`: stringified primary key (reference stringifies all pks,
  *     consumer_event.ex:94-109); `group_id` = pk of the business row.
  *   - `record_id`/`record_user_id`/`record_value`/`record_props`: the row
  *     image ("record" map flattened); `old_value`: prior image for updates
  *     (NULL otherwise, mirroring replica-identity-default semantics).
  *   - `idempotency_key`: base64("lsn:idx") — processor.ex:176.
  *   - `byte_size`: payload size proxy for batching/shedding ops.
  */
object Cdc {

  /** Spark-side CDC envelope. Keep in lockstep with [[duckCte]]. */
  def fromEvents(events: DataFrame): DataFrame = {
    // integer division (`div`), NOT Column `/`: the latter is a DOUBLE
    // divide whose 53-bit mantissa would corrupt ids past 2^53
    val lsn = expr("event_id div 7") * lit(8)
    val idx = pmod(col("event_id"), lit(7)).cast("bigint")
    events.select(
      lsn.as("commit_lsn"),
      idx.as("commit_idx"),
      col("ts").as("commit_ts"),
      when(col("event_type") === "signup", "insert")
        .when(col("event_type") === "error", "delete")
        .otherwise("update").as("action"),
      when(pmod(col("user_id"), lit(10)) === 0, "audit").otherwise("public")
        .as("table_schema"),
      concat(lit("t"), pmod(col("user_id"), lit(5))).as("table_name"),
      (lit(16384) + pmod(col("user_id"), lit(5))).cast("bigint").as("table_oid"),
      col("event_id").cast("string").as("record_pk"),
      col("event_id").as("record_id"),
      col("user_id").as("record_user_id"),
      col("value").as("record_value"),
      col("props").as("record_props"),
      when(col("event_type").isin("purchase", "click", "view"),
        col("value") - lit(1.0)).as("old_value"),
      base64(concat(lsn.cast("string"), lit(":"), idx.cast("string")).cast("binary"))
        .as("idempotency_key"),
      col("user_id").cast("string").as("group_id"),
      (length(col("props")) + lit(64)).cast("bigint").as("byte_size"))
  }

  /** DuckDB CTE defining the same envelope; prefix for every CDC oracle. */
  val duckCte: String =
    """WITH cdc AS (
      |  SELECT
      |    (event_id // 7) * 8 AS commit_lsn,
      |    event_id % 7 AS commit_idx,
      |    ts AS commit_ts,
      |    CASE WHEN event_type = 'signup' THEN 'insert'
      |         WHEN event_type = 'error' THEN 'delete'
      |         ELSE 'update' END AS action,
      |    CASE WHEN user_id % 10 = 0 THEN 'audit' ELSE 'public' END AS table_schema,
      |    't' || CAST(user_id % 5 AS VARCHAR) AS table_name,
      |    16384 + user_id % 5 AS table_oid,
      |    CAST(event_id AS VARCHAR) AS record_pk,
      |    event_id AS record_id,
      |    user_id AS record_user_id,
      |    value AS record_value,
      |    props AS record_props,
      |    CASE WHEN event_type IN ('purchase','click','view')
      |         THEN value - 1.0 END AS old_value,
      |    to_base64(CAST(CAST((event_id // 7) * 8 AS VARCHAR) || ':' ||
      |                   CAST(event_id % 7 AS VARCHAR) AS BLOB)) AS idempotency_key,
      |    CAST(user_id AS VARCHAR) AS group_id,
      |    length(props) + 64 AS byte_size
      |  FROM events
      |)
      |""".stripMargin
}
