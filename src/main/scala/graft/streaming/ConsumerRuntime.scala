package graft.streaming

import graft.model.ChangeEvent
import graft.sinks.SinkDispatch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** The assembled consumer runtime — every layer of this library wired
  * into ONE streaming query, the Spark rendition of the reference's
  * per-consumer supervision tree (`/root/reference/lib/sequin/runtime/
  * supervisor.ex` + `sink_pipeline.ex`: slot stream → filters/transforms
  * → slot message store (FIFO/visibility/retry) → sink transport →
  * ack/nack → health + metrics):
  *
  *   1. the EVENT SOURCE is any streaming CDC-envelope DataFrame
  *      ([[graft.sources.WalSpool]]'s DSv2 stream in production, a
  *      MemoryStream in specs);
  *   2. each micro-batch runs [[CdcPipeline.build]] (scope/action/
  *      column filters, sandboxed expressions, diff, routing, grouping)
  *      — filtered-out events never enter the ledger (the reference
  *      filters before the SlotMessageStore too);
  *   3. survivors are ADMITTED into a [[SequinStreamPull]] ledger
  *      (AckDelivery: per-group FIFO, visibility timeout, retry budget,
  *      DLQ, max_ack_pending admission). Admission is the backpressure
  *      point: under `pause_on_full` the micro-batch does not complete
  *      until capacity frees, which throttles the SOURCE trigger — the
  *      Spark analog of the reference pausing the replication socket;
  *   4. deliverable messages dispatch through the sink's LIVE transport
  *      ([[SinkDispatch.deliverObserved]] — outcomes feed Prometheus
  *      counters + the consumer's health entity), and every outcome
  *      acks/nacks the ledger by its carried identity;
  *   5. rounds repeat within the batch until the ledger has nothing
  *      deliverable: a healthy transport drains each group in FIFO
  *      order; a dead one retries nacked messages up to `max_retry`
  *      then dead-letters — the batch always terminates.
  *
  * Driver-path bounds: the per-batch collect is the `foreachBatch`
  * consumption point, sized by the SOURCE's trigger admission
  * (`maxSegmentsPerBatch` / `maxOffsetsPerTrigger` — the contract every
  * structured-streaming sink shares); the ledger's driver buffer is
  * ≤ max_ack_pending by construction.
  */
object ConsumerRuntime {

  /** A running consumer: the streaming query plus its ledger (exposed
    * for `receive`-style inspection, DLQ reads, and clean shutdown).
    */
  final class Handle private[ConsumerRuntime] (
      val query: StreamingQuery,
      val ledger: SequinStreamPull) {
    def stop(): Unit = { query.stop(); ledger.stop() }
  }

  private val EventCols = Seq("commit_lsn", "commit_idx", "commit_ts",
    "action", "table_schema", "table_name", "table_oid", "record_pk",
    "record_id", "record_user_id", "record_value", "record_props",
    "old_value", "idempotency_key", "group_id", "byte_size")

  /** Start the full chain over `events` (a STREAMING CDC-envelope
    * DataFrame). `consumerId`/`cfg.name` label the metrics series and
    * the health entity.
    */
  def start(events: DataFrame, cfg: ConsumerConfig, env: SinkDispatch.Env,
      metrics: graft.config.Metrics.Registry,
      health: graft.config.Health.Registry,
      consumerId: String,
      enrichment: Option[(DataFrame, String, String)] = None,
      checkpointLocation: Option[String] = None,
      nowMs: () => Long = () => System.currentTimeMillis())(
      implicit spark: SparkSession): Handle = {
    import spark.implicits._
    val sink = cfg.sink.getOrElse(throw new IllegalArgumentException(
      s"consumer '${cfg.name}' has no sink destination"))
    // delivery tuning comes off the CONSUMER record
    // (sink_consumer.ex:86-90) — the same config the management API
    // validates is the config the runtime runs
    val ledger = new SequinStreamPull(ackWaitMs = cfg.ackWaitMs,
      maxRetry = cfg.maxRetryCount, maxAckPending = cfg.maxAckPending,
      fullPolicy = cfg.loadSheddingPolicy, nowMs = nowMs)
    // the config reached this point through PipelineSpec validation —
    // report the sink_configuration check (the reference's
    // check_sink_configuration_worker writes the same event)
    health.putEvent("sink_consumer", consumerId, "sink_configuration",
      "success")
    val batchCap = math.min(1000,
      cfg.batchSize.getOrElse(graft.sinks.SinkAdapters
        .defaultBatchSizes(sink.sinkType)) max 1)
    // with a checkpoint, a restart resumes at the source's committed
    // offsets: completed batches never replay (their events were acked
    // and the sink is external), an interrupted batch replays whole —
    // at-least-once, the reference's delivery contract
    val writer0 = events.writeStream.outputMode("append")
    val writer = checkpointLocation
      .fold(writer0)(p => writer0.option("checkpointLocation", p))
    val query = writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // 2. filters first — a filtered event is DONE, it must not
        //    head-of-line-block its group in the ledger. The ledger
        //    stores the ORIGINAL event columns (joined back by
        //    idempotency key) with only the BUILT group id grafted on:
        //    the dispatch round re-runs the pipeline on pristine inputs,
        //    so user transforms apply exactly ONCE and the filter
        //    verdict cannot flip between admission and dispatch (a
        //    transformed value fed back through the filter could strand
        //    an admitted event unacked forever).
        val built = CdcPipeline.build(batch, cfg, enrichment)
          .select(col("idempotency_key"),
            col("group_id").as("__built_group"))
          .dropDuplicates("idempotency_key")
        val survivors = batch.dropDuplicates("idempotency_key")
          .drop("group_id")
          .join(built, "idempotency_key")
          .withColumnRenamed("__built_group", "group_id")
          .select(EventCols.head, EventCols.tail: _*)
          .as[ChangeEvent].collect().toSeq // dedup'd: an in-batch replay
          // of the same idempotency key must not fan the join out
        health.putEvent("sink_consumer", consumerId, "messages_filtered",
          "success")
        if (survivors.nonEmpty)
          health.putEvent("sink_consumer", consumerId, "messages_ingested",
            "success")
        // 3. admit (pause policy loops = source backpressure) and
        // 4./5. dispatch rounds until nothing is deliverable
        var rest = survivors
        var spin = 0
        while (rest.nonEmpty || spin == 0) {
          val n = ledger.ingest(rest)
          rest = rest.drop(n)
          var round = ledger.receive(maxBatchSize = batchCap)
          while (round.nonEmpty) {
            val df = spark.createDataset(round.map(_.event)).toDF()
            val outcomes = SinkDispatch.deliverObserved(
              CdcPipeline.build(df, cfg, enrichment), sink, env, metrics, health,
              consumerId, cfg.name)
            val ok = outcomes.filter(_.ok).map(_.ack_id)
            val bad = outcomes.filterNot(_.ok).map(_.ack_id)
            if (ok.nonEmpty) ledger.ack(ok)
            if (bad.nonEmpty) ledger.nack(bad)
            health.putEvent("sink_consumer", consumerId,
              "messages_pending_delivery", "success")
            round = ledger.receive(maxBatchSize = batchCap)
          }
          spin += 1
          // a full ledger with nothing deliverable (all in retry wait):
          // yield briefly before re-offering, so a dead transport under
          // pause policy stalls politely instead of hot-looping
          if (rest.nonEmpty) Thread.sleep(5)
        }
      }
      .start()
    new Handle(query, ledger)
  }
}
