package graft.streaming

import graft.ops._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative consumer-pipeline builder — the Spark rendition of the
  * reference's sink-consumer dataflow (`SURVEY.md` §3.1):
  *
  * {{{
  * source filter → action filter → column filters → payload guard
  *   → enrichment join → change diff → routing → group id → dedup-ready
  * }}}
  *
  * Every stage is a pure `DataFrame => DataFrame` over the CDC envelope, so
  * ONE definition serves both the batch (oracle-checked) and the
  * Structured Streaming path — the same plan compiles to a streaming plan
  * when the input is a streaming DataFrame. Stages are narrow except the
  * enrichment join (broadcast, no fact shuffle), exactly like the
  * reference's per-message hot path
  * (`/root/reference/lib/sequin/runtime/sink_pipeline.ex:185-299`).
  */
/** Validated sink destination (transforms.ex:201-320 `to_external` per
  * sink struct — one case per supported transport, carrying exactly the
  * fields its wire adapter needs).
  */
final case class SinkSpec(
    sinkType: String,
    settings: Map[String, String] = Map.empty)

/** One bounded iteration transform: apply `step` to `init` exactly `n`
  * times, `varName` being the loop variable inside `step` (see
  * [[graft.ops.Iterate]] — unrolled at plan-build time, so `n` is a
  * config literal, never a runtime value).
  */
final case class IterateSpec(
    init: String,
    step: String,
    varName: String,
    n: Int)

final case class ConsumerConfig(
    name: String,
    // lifecycle status (sink_consumer.ex:91 — active | disabled |
    // paused): control-plane state the API/CLI toggle; `paused` keeps
    // the consumer's position and buffers, `disabled` stops it entirely
    status: String = "active",
    scope: SourceScope = SourceScope(),
    actions: Seq[String] = Seq("insert", "update", "delete"),
    filters: Seq[ColumnFilter] = Nil,
    maxPayloadBytes: Long = 5L * 1024 * 1024,
    internalSchemas: Seq[String] = Nil,
    messageGrouping: Boolean = true,
    timestampFormat: String = "iso8601",
    // delivery tuning (sink_consumer.ex:86-90, 320-345)
    groupColumns: Seq[String] = Nil,
    // per-table group-column overrides, keyed "schema.table" (the
    // sequin.yaml `tables: [{name, group_column_names}]` block)
    tableGroupColumns: Map[String, Seq[String]] = Map.empty,
    batchSize: Option[Int] = None,
    ackWaitMs: Long = 30000L,
    maxAckPending: Int = 10000,
    maxRetryCount: Int = 3,
    // consistency-check worker cadence + staleness window (the
    // reference's MessageConsistencyCheckWorker runs every minute with a
    // 2-minute window; message_consistency_check_worker.ex:25-43)
    consistencyCheckIntervalMs: Long = 60000L,
    consistencyStalenessMs: Long = 2 * 60 * 1000L,
    // ceiling on failed deliveries pulled to the driver in one piece: a
    // dead transport failing a whole micro-batch spills to a parquet
    // retry spool drained in chunks of this size (the reference spills
    // failing groups to a table — slot_message_store_state.ex:687-716)
    maxFailedCollectPerBatch: Int = 50000,
    // ceiling on the DRIVER-held backfill fence set (delivered pks of
    // the backfilled table recorded while a scan is active): past this
    // the set spills to a parquet fence side table and the page
    // anti-join consults both — exactly-once intact, driver residency
    // bounded no matter how hot the table churns during the scan
    maxBackfillFenceInMemory: Int = 100000,
    legacyTransform: String = "none", // none | record_only
    loadSheddingPolicy: String = "pause_on_full", // | discard_on_full
    // opt-in LOW-LATENCY tail ([[ConsumerRuntime.startLowLatencyTail]]):
    // a driver-side spool tail that decodes incrementally and delivers
    // each tiny segment as ONE local Spark action — no micro-batch
    // trigger, no state-store commit, no offset-log write on the
    // per-event path. Trades micro-batch throughput for delivery
    // latency; the right deployment for steady LOW-RATE consumers
    // (alerting, audit mirrors), never for backfill catch-up
    lowLatency: Boolean = false,
    // sharded low-latency dispatch (`low_latency_shards`): K concurrent
    // ordered connections per segment, group-hash-pinned — raises the
    // tail's sustainable rate ~Kx while keeping the plan shuffle-free
    // (see [[ConsumerRuntime.startLowLatencyTail]]'s `shards`). 1 = the
    // single-connection tail; only read when lowLatency is set
    lowLatencyShards: Int = 1,
    // user functions as config — the reference persists MiniElixir
    // filter/transform/routing snippets on the consumer
    // (consumers.ex:1242-1278, transforms/message.ex:26-41,
    // routing.ex:103-151); here they are validated Spark SQL expression
    // strings (§7.4: "re-scope MiniElixir as a validated expression
    // surface"), checked for syntax + determinism at parse time
    filterFunction: Option[String] = None,
    transformFunctions: Seq[(String, String)] = Nil,
    // bounded loop-shaped transforms: name -> (init, step, var, n),
    // unrolled at plan-build time by [[graft.ops.Iterate]]
    iterateFunctions: Seq[(String, IterateSpec)] = Nil,
    routingFunction: Map[String, String] = Map.empty,
    sink: Option[SinkSpec] = None) {
  /** Effective batch size: explicit, else the sink type's default. */
  def effectiveBatchSize: Int = batchSize.getOrElse(
    graft.sinks.SinkAdapters.defaultBatchSizes(
      sink.map(_.sinkType).getOrElse("")))
}

object CdcPipeline {

  /** Build the consumer pipeline plan over a (batch or streaming) CDC
    * envelope DataFrame. `enrichment`: optional (dimension, eventKeyCol,
    * dimKeyCol) lookup join.
    */
  def build(events: DataFrame, cfg: ConsumerConfig,
      enrichment: Option[(DataFrame, String, String)] = None): DataFrame = {
    var df = events
    if (cfg.internalSchemas.nonEmpty)
      df = Filters.rejectInternalSchemas(df, cfg.internalSchemas)
    df = Filters.sourceScope(df, cfg.scope)
    df = Filters.actionFilter(df, cfg.actions)
    if (cfg.filters.nonEmpty) df = Filters.columnFilters(df, cfg.filters)
    // F4 — user filter function (a validated boolean expression; nil
    // filter ⇒ true, non-boolean rejected at analysis)
    cfg.filterFunction.foreach(e => df = df.filter(expr(e)))
    df = Filters.payloadSizeGuard(df, cfg.maxPayloadBytes)
    df = enrichment match {
      case Some((dim, eventKey, dimKey)) =>
        Joins.enrich(df, dim, df(eventKey), dim(dimKey))
      case None => df
    }
    df = Transforms.changesDiff(df)
    df = Routing.kafka(df, prefix = cfg.name)
    if (!cfg.messageGrouping)
      df = df.withColumn("group_id", lit(null).cast("string"))
    else if (cfg.tableGroupColumns.nonEmpty) {
      // per-table overrides first (yaml `tables:` block), then the
      // global group_columns, then the pk-derived group
      val tbl = concat_ws(".", col("table_schema"), col("table_name"))
      val overridden = cfg.tableGroupColumns.foldLeft(
        if (cfg.groupColumns.nonEmpty)
          Transforms.groupId(cfg.groupColumns.map(df(_)))
        else col("group_id")) { case (acc, (t, cols)) =>
        when(tbl === t, Transforms.groupId(cols.map(df(_)))).otherwise(acc)
      }
      df = df.withColumn("group_id", overridden)
    } else if (cfg.groupColumns.nonEmpty)
      // custom group columns override the pk-derived group
      // (sink_consumer group_column_attnums; consumers.ex:730-791)
      df = df.withColumn("group_id",
        Transforms.groupId(cfg.groupColumns.map(df(_))))
    // P4 — user transform functions: computed output columns (applied
    // after routing/grouping so they may reference both). A dotted name
    // rooted at a struct column ("record.user.tier") mutates INSIDE the
    // struct instead — the put_in analog (Transforms.recordSet); the root
    // segment passed reserved-name validation at config load.
    cfg.transformFunctions.foreach { case (name, e) =>
      df = name.split("\\.", 2) match {
        case Array(root, path) =>
          df.withColumn(root, Transforms.recordSet(col(root), path, expr(e)))
        case _ => df.withColumn(name, expr(e))
      }
    }
    // P4b — bounded iteration transforms: the unroll happens here, at
    // plan build, so the executed plan contains only an ordinary nested
    // expression (codegen'd, no runtime loop)
    cfg.iterateFunctions.foreach { case (name, it) =>
      df = df.withColumn(name,
        Iterate.unroll(it.init, it.step, it.varName, it.n))
    }
    // R2 — user routing function: overrides merged over the default
    // router through the per-sink allowed-key validation. The sink's OWN
    // default router runs first so a null override falls back to a real
    // default for every sink type, not just kafka. Consumer-configured
    // destination settings only FILL columns the default router does not
    // define — when the router derived a value (e.g. redis_stream's
    // sequin.<schema>.<table> stream_key), the configured setting is NOT
    // consulted. That matches the reference's actual behavior: with a
    // routing function present, routing.ex never calls route_consumer, so
    // static sink config loses to router-derived defaults there too.
    if (cfg.routingFunction.nonEmpty) {
      val sinkType = cfg.sink.map(_.sinkType).getOrElse("kafka")
      df = sinkType match {
        case "redis_stream"  => Routing.redisStream(df)
        case "gcp_pubsub"    => Routing.gcpPubsub(df)
        case "nats"          => Routing.nats(df)
        case "rabbitmq"      => Routing.rabbitmq(df)
        case "elasticsearch" => Routing.esIndexName(df)
        case "typesense"     => Routing.typesense(df)
        case "meilisearch"   => Routing.meilisearch(df)
        case _               => df // kafka routed above; static sinks below
      }
      cfg.sink.foreach(s => s.settings.foreach { case (k, v) =>
        val colName = Routing.targetColumn(sinkType, k)
        if (Routing.allowedRouteKeys(sinkType).contains(k) &&
            !df.columns.contains(colName))
          df = df.withColumn(colName, lit(v))
      })
      df = Routing.withOverrides(df, sinkType,
        cfg.routingFunction.map { case (k, e) => k -> expr(e) })
    }
    if (cfg.loadSheddingPolicy == "discard_on_full")
      df = Filters.shedOverflow(df, cfg.maxAckPending, cfg.loadSheddingPolicy)
    df
  }

  /** W6 streaming dedup: exactly-once by idempotency key within an
    * event-time watermark — `dropDuplicatesWithinWatermark` keeps key state
    * only for the watermark horizon, so state is bounded at 100 TB/day
    * stream rates (vs unbounded `dropDuplicates`). The reference's ledger
    * trim (`message_ledgers.ex` trimmed by flush watermark) is exactly this
    * state-expiry contract.
    */
  def withStreamingDedup(df: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    df.withWatermark("commit_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("idempotency_key")

  /** A4 streaming form of q36: per-hour, per-action delivery metrics over
    * EVENT time. The watermark bounds aggregation state and finalizes
    * each window exactly once (append mode) when event time passes
    * `window end + delay`; events arriving later than the watermark are
    * dropped — the streaming analogue of the reference's metrics
    * aggregation, with state expiry for free.
    */
  def windowedMetrics(df: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    df.withWatermark("commit_ts", watermarkDelay)
      .groupBy(window(col("commit_ts"), "1 hour"), col("action"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("record_value") * 100).cast("bigint")).as("sum_cents"))
      .select(unix_micros(col("window.start")).as("hour_us"), col("action"),
        col("n"), col("sum_cents"))
}
