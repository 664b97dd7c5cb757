package graft.sinks

import graft.ops.Routing
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Wire-format adapters for the reference's sink catalog (SURVEY §2.2,
  * config schemas `/root/reference/lib/sequin/consumers/` `*_sink.ex`,
  * delivery pipelines `/root/reference/lib/sequin/runtime/` `*_pipeline.ex`).
  *
  * Each adapter turns the routed CDC envelope into the exact column shape
  * the transport client writes — `(topic, key, value)` for Kafka,
  * `(key, value, op, ttl)` for Redis strings, bulk-action JSON lines for
  * Elasticsearch, `(queue, group id, dedup id, body)` for SQS FIFO — so the
  * network client in `foreachBatch` is a dumb byte mover. In this
  * zero-egress environment the transports are exercised via
  * [[writeWireLog]] (append-only parquet of the wire rows); swapping in a
  * real client touches no query code.
  */
object SinkAdapters {

  /** Per-sink default delivery batch sizes (sink_consumer.ex:332-345). */
  val defaultBatchSizes: Map[String, Int] = Map(
    "kafka" -> 200, "kinesis" -> 100, "redis_stream" -> 50,
    "sqs" -> 10, "sns" -> 10, "s2" -> 10, "azure_event_hub" -> 10,
    "redis_string" -> 10).withDefaultValue(1)

  /** JSON envelope (P1 default shape: record/changes/action/metadata). */
  private def envelope: org.apache.spark.sql.Column =
    to_json(struct(
      struct(col("record_id").as("id"), col("record_user_id").as("user_id"),
        col("record_value").as("value"), col("record_props").as("props"))
        .as("record"),
      col("old_value").as("changes"),
      col("action"),
      struct(col("table_schema"), col("table_name"), col("commit_lsn"),
        col("commit_idx"), col("idempotency_key")).as("metadata")))

  /** Kafka wire rows: `writeStream.format("kafka")` needs exactly
    * (topic, key, value) (kafka_pipeline.ex:1-134).
    */
  def kafkaWire(routed: DataFrame): DataFrame =
    routed.select(col("topic"), col("message_key").as("key"),
      envelope.as("value"))

  /** Redis string wire: SET key→envelope with TTL, DEL on delete action
    * (redis_string_sink.ex:117; routing `redis_string.ex`).
    */
  def redisStringWire(df: DataFrame, ttlSeconds: Option[Long] = None): DataFrame =
    Routing.redisKey(df).select(
      col("redis_key").as("key"),
      when(col("action") === "delete", lit(null)).otherwise(envelope).as("value"),
      when(col("action") === "delete", "DEL").otherwise("SET").as("op"),
      lit(ttlSeconds.map(Long.box).orNull).cast("bigint").as("ttl"))

  /** Elasticsearch bulk-API lines: action metadata line + document line;
    * upsert on insert/update/read, delete on delete
    * (routing/consumers/elasticsearch.ex).
    */
  def esBulkWire(df: DataFrame, index: String): DataFrame =
    Routing.elasticsearch(df).select(
      col("es_doc_id"),
      when(col("es_op") === "delete",
        concat(lit(s"""{"delete":{"_index":"$index","_id":""""),
          col("es_doc_id"), lit("\"}}")))
        .otherwise(concat(
          lit(s"""{"index":{"_index":"$index","_id":""""),
          col("es_doc_id"), lit("\"}}\n"), envelope)).as("bulk_lines"))

  /** SQS FIFO wire: MessageGroupId = delivery group (ordering unit),
    * MessageDeduplicationId = idempotency key (exactly-once)
    * (sqs_sink.ex:188).
    */
  def sqsWire(df: DataFrame, queueUrl: String): DataFrame =
    df.select(
      lit(queueUrl).as("queue_url"),
      coalesce(col("group_id"), col("record_pk")).as("message_group_id"),
      col("idempotency_key").as("message_dedup_id"),
      envelope.as("body"))

  /** Local wire log — the transport stand-in: append the wire rows as
    * parquet so tests/bench observe exactly what a client would send.
    */
  def writeWireLog(wire: DataFrame, path: String): Unit =
    wire.write.mode(SaveMode.Append).parquet(path)
}
