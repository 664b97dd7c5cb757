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
    "redis_string" -> 10, "gcp_pubsub" -> 1).withDefaultValue(1)

  /** Delivery-ledger identity, carried on every wire row so the
    * transport's per-delivery result can ack the EXACT
    * [[graft.streaming.AckDelivery]] entry it delivered: `ack_id` is the
    * event's idempotency key (what `Delivery.ack_id` is) and
    * `ledger_group_id` is the group id with the same `__pk:` fallback
    * `DeliveryCommand.event` uses to key the state machine. Without
    * these, acks would be keyed by transport-local identity (stream key,
    * topic, doc id) that the ledger has never heard of — the delivery
    * would succeed but stay in flight forever and redeliver.
    */
  private def ledgerIdentity: Seq[org.apache.spark.sql.Column] = Seq(
    col("idempotency_key").as("ack_id"),
    coalesce(col("group_id"), concat(lit("__pk:"), col("record_pk")))
      .as("ledger_group_id"))

  private def recordStruct: org.apache.spark.sql.Column =
    struct(col("record_id").as("id"), col("record_user_id").as("user_id"),
      col("record_value").as("value"), col("record_props").as("props"))

  private def metadataStruct: org.apache.spark.sql.Column =
    struct(col("table_schema"), col("table_name"), col("commit_lsn"),
      col("commit_idx"), col("idempotency_key"))

  /** JSON envelope (P1 default shape: record/changes/action/metadata). */
  private def envelope: org.apache.spark.sql.Column =
    to_json(struct(
      recordStruct.as("record"),
      col("old_value").as("changes"),
      col("action"),
      metadataStruct.as("metadata")))

  /** Legacy `:record_only` body — just the row image
    * (transforms/message.ex:20-22).
    */
  private def recordOnlyBody: org.apache.spark.sql.Column =
    to_json(recordStruct)

  /** Spark's `base64` can emit MIME-chunked output (CRLF every 76 chars);
    * transport payloads (Kinesis Data, Pub/Sub data) need the unchunked
    * RFC 4648 form.
    */
  private def base64Unchunked(c: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column =
    translate(base64(c), "\r\n", "")

  /** Kafka wire rows: `writeStream.format("kafka")` needs exactly
    * (topic, key, value) (kafka_pipeline.ex:1-134).
    */
  def kafkaWire(routed: DataFrame): DataFrame =
    routed.select(ledgerIdentity ++ Seq(col("topic"),
      col("message_key").as("key"), envelope.as("value")): _*)

  /** Redis string wire: SET key→envelope with TTL, DEL on delete action
    * (redis_string_sink.ex:117; routing `redis_string.ex`).
    */
  def redisStringWire(df: DataFrame, ttlSeconds: Option[Long] = None): DataFrame =
    Routing.redisKey(df).select(ledgerIdentity :+
      col("redis_key").as("key") :+
      when(col("action") === "delete", lit(null)).otherwise(envelope).as("value") :+
      when(col("action") === "delete", "DEL").otherwise("SET").as("op") :+
      lit(ttlSeconds.map(Long.box).orNull).cast("bigint").as("ttl"): _*)

  /** Elasticsearch bulk-API lines: action metadata line + document line;
    * upsert on insert/update/read, delete on delete
    * (routing/consumers/elasticsearch.ex).
    */
  def esBulkWire(df: DataFrame, index: String): DataFrame =
    Routing.elasticsearch(df).select(ledgerIdentity :+
      col("es_doc_id") :+
      when(col("es_op") === "delete",
        concat(lit(s"""{"delete":{"_index":"$index","_id":""""),
          col("es_doc_id"), lit("\"}}")))
        .otherwise(concat(
          lit(s"""{"index":{"_index":"$index","_id":""""),
          col("es_doc_id"), lit("\"}}\n"), envelope)).as("bulk_lines"): _*)

  /** SQS FIFO wire: MessageGroupId = delivery group (ordering unit),
    * MessageDeduplicationId = idempotency key (exactly-once)
    * (sqs_sink.ex:188).
    */
  def sqsWire(df: DataFrame, queueUrl: String): DataFrame =
    df.select(ledgerIdentity ++ Seq(
      lit(queueUrl).as("queue_url"),
      coalesce(col("group_id"), col("record_pk")).as("message_group_id"),
      col("idempotency_key").as("message_dedup_id"),
      envelope.as("body")): _*)

  /** Redis stream wire: `XADD <stream_key> * field value ...` — the
    * transformed message map flattened to field/value pairs, non-string
    * values JSON-encoded (sinks/redis/client.ex:119-136; stream key
    * routing `routing/consumers/redis_stream.ex:23-25`).
    */
  def redisStreamWire(df: DataFrame): DataFrame =
    Routing.redisStream(df).select(ledgerIdentity ++ Seq(
      col("stream_key"),
      lit("*").as("entry_id"), // server-assigned
      map(
        lit("record"), to_json(recordStruct),
        lit("changes"), coalesce(col("old_value").cast("string"), lit("null")),
        lit("action"), col("action"),
        lit("metadata"), to_json(metadataStruct)).as("fields")): _*)

  /** SNS wire: publish-batch entries; FIFO topics add group + dedup ids
    * (sns_pipeline.ex:87-98, routing `routing/consumers/sns.ex`).
    */
  def snsWire(df: DataFrame, topicArn: String, isFifo: Boolean = false): DataFrame =
    df.select(ledgerIdentity :+
      lit(topicArn).as("topic_arn") :+
      (if (isFifo) coalesce(col("group_id"), col("record_pk"))
       else lit(null).cast("string")).as("message_group_id") :+
      (if (isFifo) col("idempotency_key")
       else lit(null).cast("string")).as("message_dedup_id") :+
      envelope.as("message"): _*)

  /** Kinesis wire: PutRecords entries — base64 Data + partition key from
    * the delivery group, truncated to the 256B limit
    * (kinesis_pipeline.ex:78-83).
    */
  def kinesisWire(df: DataFrame, streamArn: String): DataFrame =
    df.select(ledgerIdentity ++ Seq(
      lit(streamArn).as("stream_arn"),
      Routing.truncateWithHash(
        coalesce(col("group_id"), col("record_pk")), 256).as("partition_key"),
      base64Unchunked(envelope.cast("binary")).as("data")): _*)

  /** S2 wire: append records to a basin/stream (s2_sink.ex; routing
    * `routing/consumers/s2.ex`).
    */
  def s2Wire(df: DataFrame, basin: String, stream: String): DataFrame =
    df.select(ledgerIdentity ++ Seq(lit(basin).as("basin"),
      lit(stream).as("stream"), envelope.as("body")): _*)

  /** GCP Pub/Sub wire: base64 data + attributes + ordering key
    * (gcp_pubsub_pipeline.ex:86-99).
    */
  def pubsubWire(df: DataFrame): DataFrame =
    Routing.gcpPubsub(df).select(ledgerIdentity :+
      col("topic_id") :+
      base64Unchunked(envelope.cast("binary")).as("data") :+
      map(
        lit("trace_id"), col("idempotency_key"),
        lit("type"), lit("event"),
        lit("table_name"), col("table_name"),
        lit("action"), col("action")).as("attributes") :+
      col("ordering_key"): _*)

  /** NATS wire: subject + `Nats-Msg-Id` header + payload
    * (routing/consumers/nats.ex:25-30, nats_pipeline.ex).
    */
  def natsWire(df: DataFrame, databaseName: String = "postgres"): DataFrame =
    Routing.nats(df, databaseName).select(ledgerIdentity ++ Seq(
      col("subject"),
      map(lit("Nats-Msg-Id"), col("nats_msg_id")).as("headers"),
      envelope.as("payload")): _*)

  /** RabbitMQ wire: exchange + routing key + message id + payload
    * (routing/consumers/rabbitmq.ex:30-38, rabbitmq_pipeline.ex).
    */
  def rabbitmqWire(df: DataFrame, exchange: String,
      databaseName: String = "postgres"): DataFrame =
    Routing.rabbitmq(df, databaseName).select(ledgerIdentity ++ Seq(
      lit(exchange).as("exchange"),
      col("routing_key"),
      col("message_id"),
      envelope.as("payload")): _*)

  /** Azure Event Hub wire: hub name + partition key + body
    * (azure_event_hub_pipeline.ex; routing `routing/consumers/
    * azure_event_hub.ex`).
    */
  def eventHubWire(df: DataFrame, eventHubName: String): DataFrame =
    df.select(ledgerIdentity ++ Seq(
      lit(eventHubName).as("event_hub_name"),
      coalesce(col("group_id"), col("record_pk")).as("partition_key"),
      envelope.as("body")): _*)

  /** Typesense wire: per-collection JSONL emplace-import lines; deletes
    * carry the doc id only (sinks/typesense/client.ex:89-100,161-170;
    * routing `routing/consumers/typesense.ex:25-36`).
    */
  def typesenseWire(df: DataFrame): DataFrame =
    Routing.typesense(df).select(ledgerIdentity ++ Seq(
      col("collection_name"),
      col("ts_action"),
      col("record_pk").as("doc_id"),
      when(col("ts_action") === "delete", lit(null))
        .otherwise(to_json(struct(col("record_pk").as("id"),
          col("record_id"), col("record_user_id"), col("record_value"),
          col("record_props")))).as("document")): _*)

  /** Meilisearch wire: add-or-replace documents / delete by primary key
    * (meilisearch_sink.ex; routing `routing/consumers/meilisearch.ex:24-32`).
    */
  def meilisearchWire(df: DataFrame, indexName: String): DataFrame =
    Routing.meilisearch(df).select(ledgerIdentity ++ Seq(
      lit(indexName).as("index_name"),
      col("ms_action"),
      col("record_pk").as("doc_id"),
      when(col("ms_action") === "delete", lit(null))
        .otherwise(to_json(struct(col("record_pk").as("id"),
          col("record_id"), col("record_user_id"), col("record_value"),
          col("record_props")))).as("document")): _*)

  /** HTTP webhook push wire, batched form: requests of ≤ batchSize
    * messages with body `{"data": [env, ...]}` in commit order
    * (http_push_pipeline.ex:136-143 batched arm).
    *
    * Batches are assembled per delivery partition (R3's stable group
    * hash) so assembly is N parallel windows, never a global sort — at
    * 100 TB each partition windows independently, matching the
    * reference's per-pipeline batchers.
    */
  def httpPushBatchedWire(df: DataFrame, endpoint: String,
      batchSize: Int = 10, partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = df.withColumn("partition",
      pmod(graft.functions.Hashing.portableHash(
        coalesce(col("group_id"), col("record_pk"))), lit(partitions)))
    val w = Window.partitionBy("partition").orderBy("commit_lsn", "commit_idx")
    part
      .withColumn("batch_idx",
        floor((row_number().over(w) - 1) / batchSize).cast("bigint"))
      .groupBy("partition", "batch_idx")
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        // batch boundaries: lsn is a multiple of 8 and idx < 8, so
        // lsn + idx is a strict total order (Cdc envelope invariant)
        min(col("commit_lsn") + col("commit_idx")).as("first_seq"),
        max(col("commit_lsn") + col("commit_idx")).as("last_seq"),
        // commit-ordered member array: sort (lsn, idx, env) structs, then
        // project the envelope strings back out
        array_sort(collect_list(struct(col("commit_lsn"), col("commit_idx"),
          envelope.as("env")))).as("members"),
        // per-member ledger identity: one batch POST acks each member
        // event individually in AckDelivery (the reference's per-batch
        // ack granularity expands to per-message ledger entries)
        array_sort(collect_list(struct(col("commit_lsn"), col("commit_idx"),
          col("idempotency_key").as("ack_id"),
          coalesce(col("group_id"), concat(lit("__pk:"), col("record_pk")))
            .as("ledger_group_id")))).as("member_ids0"))
      .select(
        lit("POST").as("method"),
        lit(endpoint).as("endpoint"),
        col("partition"), col("batch_idx"), col("n"),
        col("first_seq"), col("last_seq"),
        transform(col("member_ids0"), m =>
          struct(m.getField("ack_id").as("ack_id"),
            m.getField("ledger_group_id").as("ledger_group_id")))
          .as("member_ids"),
        concat(lit("""{"data":["""),
          array_join(transform(col("members"), m => m.getField("env")), ","),
          lit("]}")).as("body"))
  }

  /** HTTP webhook push wire, unbatched: one request per message; body is
    * the envelope, or the bare record under the legacy `:record_only`
    * transform (http_push_pipeline.ex:136-139; transforms/message.ex:20).
    */
  def httpPushWire(df: DataFrame, endpoint: String,
      legacyRecordOnly: Boolean = false): DataFrame =
    df.select(
      lit("POST").as("method"),
      lit(endpoint).as("endpoint"),
      (if (legacyRecordOnly) recordOnlyBody else envelope).as("body"))

  /** HTTP push, SQS-buffered variant (`via_sqs: true`) — the reference
    * splits delivery in two hops: the pipeline enqueues each event to an
    * SQS main queue as `{"data": <base64(encoded event)>}`
    * (http_push_pipeline.ex:255-297; the reference binary-encodes with
    * `term_to_binary` — here the portable JSON envelope is what gets
    * encoded), and a separate consumer drains the queue and POSTs each
    * decoded event to the endpoint with the `x-sequin-via: sqs` marker
    * header (http_push_sqs_pipeline.ex:153-160,295). The reference ids
    * each SQS message with uuid4; the deterministic idempotency key
    * rides along instead (its own FIFO-dedup TODO), so replays stay
    * dedupable and the wire is oracle-stable.
    */
  def httpPushSqsEnqueueWire(df: DataFrame, queueUrl: String): DataFrame =
    df.select(
      lit(queueUrl).as("queue_url"),
      col("idempotency_key").as("message_id"),
      concat(lit("{\"data\":\""), base64(envelope.cast("binary")), lit("\"}"))
        .as("message_body"))

  /** The drain half of [[httpPushSqsEnqueueWire]]: SQS rows → one POST
    * per decoded event, marked `x-sequin-via: sqs`. Round-trip invariant
    * (spec-checked): drain(enqueue(df)) carries exactly
    * [[httpPushWire]](df)'s bodies.
    */
  def httpPushSqsDeliverWire(sqsRows: DataFrame, endpoint: String): DataFrame =
    sqsRows.select(
      lit("POST").as("method"),
      lit(endpoint).as("endpoint"),
      lit("sqs").as("x_sequin_via"),
      col("message_id"),
      unbase64(get_json_object(col("message_body"), "$.data"))
        .cast("string").as("body"))

  /** Dead-letter wire: deliveries that exhausted max_retry_count
    * (`AckDelivery` emits them with `kind = "dlq"`;
    * consumer_event.ex:167-185 persists the same way) become transport
    * rows carrying the full envelope plus the delivery post-mortem
    * (attempt count, ack id), ready for [[WireSink.toTransport]]-style
    * delivery to a DLQ destination.
    */
  def dlqWire(deliveries: DataFrame, dest: String = "dlq"): DataFrame =
    deliveries.filter(col("kind") === "dlq").select(
      lit("dlq").as("sink_type"),
      lit(dest).as("dest"),
      coalesce(col("event.group_id"), col("event.record_pk")).as("key"),
      to_json(struct(
        col("event.commit_lsn"), col("event.commit_idx"),
        col("event.action"), col("event.table_schema"),
        col("event.table_name"), col("event.record_pk"),
        col("deliver_count"), col("ack_id"))).as("body"))

  /** Local wire log — the transport stand-in: append the wire rows as
    * parquet so tests/bench observe exactly what a client would send.
    */
  def writeWireLog(wire: DataFrame, path: String): Unit =
    wire.write.mode(SaveMode.Append).parquet(path)
}
