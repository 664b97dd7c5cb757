package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Computed output routing R1-R3.
  *
  * The reference routes each message to a sink-specific destination via a
  * pure function of `(action, record, changes, metadata)`
  * (`/root/reference/lib/sequin/runtime/routing/consumers/` per-sink modules). Pure
  * column expressions here — codegen'd, no UDFs.
  */
object Routing {

  /** R1 (Kafka) — `topic = "sequin.<schema>.<table>"`, message key = group id
    * (`/root/reference/lib/sequin/runtime/routing/consumers/kafka.ex:28-35`).
    */
  def kafka(df: DataFrame, prefix: String = "sequin"): DataFrame =
    df.withColumn("topic",
        concat_ws(".", lit(prefix), col("table_schema"), col("table_name")))
      .withColumn("message_key", coalesce(col("group_id"), col("record_pk")))

  /** R1 (Redis stream) — key `sequin:<table>:<pks>`. */
  def redisKey(df: DataFrame): DataFrame =
    df.withColumn("redis_key",
      concat_ws(":", lit("sequin"), col("table_name"), col("record_pk")))

  /** R1 (Elasticsearch) — doc id from table + pk; delete action maps to a
    * delete op, everything else upserts
    * (`/root/reference/lib/sequin/runtime/routing/consumers/elasticsearch.ex`).
    */
  def elasticsearch(df: DataFrame): DataFrame =
    df.withColumn("es_doc_id", concat_ws("-", col("table_name"), col("record_pk")))
      .withColumn("es_op",
        when(col("action") === "delete", "delete").otherwise("index"))

  /** R3/Q33 — partition assignment by group hash
    * (`/root/reference/lib/sequin/runtime/sink_pipeline.ex:156-163`).
    * `pmod(hash(group_id), n)` matches Spark's own HashPartitioning, so a
    * later `repartition(n, col("group_id"))` reuses the same distribution.
    */
  def partitionBy(df: DataFrame, n: Int): DataFrame =
    df.withColumn("partition", pmod(hash(col("group_id")), lit(n)))

  /** Destination-too-long guard in the reference's shape
    * (`Sequin.String.truncate_with_hash`, used for Kinesis partition keys
    * ≤256B and Pub/Sub ordering keys ≤1024B): keep short values verbatim,
    * else truncate and suffix a short content hash so distinct long keys
    * stay distinct.
    */
  def truncateWithHash(c: Column, maxLen: Int): Column =
    when(length(c) <= maxLen, c)
      .otherwise(concat(substring(c, 1, maxLen - 9), lit(":"),
        substring(md5(c.cast("binary")), 1, 8)))

  /** R1 (Redis stream) — `stream_key = "sequin.<schema>.<table>"`
    * (`/root/reference/lib/sequin/runtime/routing/consumers/redis_stream.ex:23-25`).
    */
  def redisStream(df: DataFrame, prefix: String = "sequin"): DataFrame =
    df.withColumn("stream_key",
      concat_ws(".", lit(prefix), col("table_schema"), col("table_name")))

  /** R1 (GCP Pub/Sub) — `topic_id = "sequin.<schema>.<table>"`, ordering
    * key = delivery group (≤1024B)
    * (`routing/consumers/gcp_pubsub.ex:26-30`, `gcp_pubsub_pipeline.ex:97`).
    */
  def gcpPubsub(df: DataFrame, prefix: String = "sequin"): DataFrame =
    df.withColumn("topic_id",
        concat_ws(".", lit(prefix), col("table_schema"), col("table_name")))
      .withColumn("ordering_key",
        truncateWithHash(coalesce(col("group_id"), col("record_pk")), 1024))

  /** R1 (NATS) — `subject = "sequin.<db>.<schema>.<table>.<action>"`,
    * `Nats-Msg-Id` header = idempotency key
    * (`routing/consumers/nats.ex:25-30`).
    */
  def nats(df: DataFrame, databaseName: String = "postgres"): DataFrame =
    df.withColumn("subject",
        concat_ws(".", lit("sequin"), lit(databaseName), col("table_schema"),
          col("table_name"), col("action")))
      .withColumn("nats_msg_id", col("idempotency_key"))

  /** R1 (RabbitMQ) — routing key mirrors the NATS subject; message id =
    * idempotency key (`routing/consumers/rabbitmq.ex:30-38`).
    */
  def rabbitmq(df: DataFrame, databaseName: String = "postgres"): DataFrame =
    df.withColumn("routing_key",
        concat_ws(".", lit("sequin"), lit(databaseName), col("table_schema"),
          col("table_name"), col("action")))
      .withColumn("message_id", col("idempotency_key"))

  /** R1 (Typesense) — collection per table; delete action maps to a
    * delete, everything else emplace-indexes
    * (`routing/consumers/typesense.ex:25-36`).
    */
  def typesense(df: DataFrame, prefix: String = "sequin"): DataFrame =
    df.withColumn("collection_name",
        concat_ws(".", lit(prefix), col("table_schema"), col("table_name")))
      .withColumn("ts_action",
        when(col("action") === "delete", "delete").otherwise("index"))

  /** R1 (Meilisearch) — static index, per-action index/delete
    * (`routing/consumers/meilisearch.ex:24-32`).
    */
  def meilisearch(df: DataFrame): DataFrame =
    df.withColumn("ms_action",
      when(col("action") === "delete", "delete").otherwise("index"))

  /** R1 (Elasticsearch, full form) — `index_name =
    * "sequin.<db>.<schema>.<table>"` (`routing/consumers/elasticsearch.ex:20`).
    */
  def esIndexName(df: DataFrame, databaseName: String = "postgres"): DataFrame =
    df.withColumn("index_name",
      concat_ws(".", lit("sequin"), lit(databaseName), col("table_schema"),
        col("table_name")))

  /** R2 — per-sink allowed routing-override keys, mirroring each router
    * module's `allowed_keys` changeset
    * (`/root/reference/lib/sequin/runtime/routing/consumers/&#42;.ex`).
    */
  val allowedRouteKeys: Map[String, Set[String]] = Map(
    "kafka" -> Set("topic", "message_key"),
    "redis_stream" -> Set("stream_key"),
    "redis_string" -> Set("key", "action", "expire_ms"),
    "elasticsearch" -> Set("index_name"),
    "gcp_pubsub" -> Set("topic_id"),
    "nats" -> Set("subject", "headers"),
    "rabbitmq" -> Set("exchange", "headers", "routing_key", "message_id"),
    "typesense" -> Set("action", "collection_name"),
    "meilisearch" -> Set("action", "index_name", "filter", "function", "context"),
    "http_push" -> Set("method", "endpoint_path", "headers"),
    "sqs" -> Set("queue_url"),
    "sns" -> Set("topic_arn"),
    "kinesis" -> Set("stream_arn"),
    "s2" -> Set("basin", "stream"),
    "azure_event_hub" -> Set("event_hub_name"))

  /** Some reference routing keys collide with CDC ENVELOPE columns — the
    * per-sink "action" key is the sink OP (index vs delete), not the CDC
    * action. Overrides for those keys target the router's own column so
    * the envelope is never clobbered.
    */
  private val routeKeyColumn: Map[(String, String), String] = Map(
    ("typesense", "action") -> "ts_action",
    ("meilisearch", "action") -> "ms_action",
    ("redis_string", "action") -> "redis_op",
    ("redis_string", "key") -> "redis_key")

  /** The DataFrame column a routing key writes for a sink type. */
  def targetColumn(sinkType: String, key: String): String =
    routeKeyColumn.getOrElse((sinkType, key), key)

  /** R2 — user routing function: expression-valued overrides merged over
    * the default router's columns. User values win where non-null; a null
    * override falls back to the default (the reference drops nil params
    * before the merge, `routing.ex:103-151` + `helpers.ex`
    * `validate_no_extra_keys` / `empty_values: []`). Keys outside the
    * sink's allowed set are rejected at PLAN time, mirroring the
    * changeset's unknown-field error — a misconfigured route never ships.
    */
  def withOverrides(df: DataFrame, sinkType: String,
      overrides: Map[String, Column]): DataFrame = {
    val allowed = allowedRouteKeys.getOrElse(sinkType,
      throw new IllegalArgumentException(s"unknown sink type: $sinkType"))
    val extra = overrides.keySet.diff(allowed)
    require(extra.isEmpty,
      s"unknown routing keys for $sinkType: ${extra.toSeq.sorted.mkString(", ")} " +
        s"(allowed: ${allowed.toSeq.sorted.mkString(", ")})")
    overrides.foldLeft(df) { case (acc, (key, c)) =>
      val k = targetColumn(sinkType, key)
      if (acc.columns.contains(k)) acc.withColumn(k, coalesce(c, col(k)))
      else acc.withColumn(k, c)
    }
  }
}
