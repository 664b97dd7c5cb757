package graft.config

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import graft.ops.{ColumnFilter, SourceScope}
import graft.streaming.{ConsumerConfig, IterateSpec, SinkSpec}
import scala.jdk.CollectionConverters._

/** Configuration-as-code: JSON pipeline spec → validated [[ConsumerConfig]]
  * — the Spark rendition of the reference's `sequin.yaml` →
  * `Transforms.from_external` → Ecto-changeset pipeline
  * (`/root/reference/lib/sequin/transforms/transforms.ex`, SURVEY §3.3).
  *
  * Shape:
  * {{{
  * { "name": "orders-consumer",
  *   "source": { "include_schemas": ["public"],
  *               "exclude_table_oids": [16387] },
  *   "actions": ["insert", "update"],
  *   "filters": [ { "field": "record_value", "op": ">",
  *                  "values": ["50"], "value_type": "number" } ],
  *   "message_grouping": true,
  *   "timestamp_format": "iso8601",
  *   "max_payload_bytes": 5242880 }
  * }}}
  *
  * Validation mirrors the reference's changesets: include xor exclude
  * (source.ex:13-53, via SourceScope's requires), known actions only
  * (sink_consumer.ex:109), known filter ops/value types
  * (column_filter.ex:196-296). Jackson ships on the Spark classpath; YAML
  * specs are a `yq`-style pre-conversion away (no YAML parser in the
  * zero-dependency build).
  */
object PipelineSpec {

  private[config] val mapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  private val ValidActions = Set("insert", "update", "delete")
  private val ValidOps = Set("==", "!=", ">", "<", ">=", "<=", "in", "not_in",
    "is_null", "not_null")
  private val ValidValueTypes = Set("string", "cistring", "number", "boolean",
    "datetime", "null")
  private val ValidTsFormats = Set("iso8601", "unix_microsecond")
  private val ValidLegacyTransforms = Set("none", "record_only")
  private val ValidShedPolicies = Set("pause_on_full", "discard_on_full")

  /** Functions banned from user expressions — the sandbox analogue of the
    * MiniElixir validator's denied constructs (`validator.ex:222-306`
    * bans `String.to_atom`, `__info__`, module escape hatches). Here the
    * threats are nondeterminism (breaks replay/exactly-once and the
    * oracle) and JVM escape (`reflect`), so those are what the deny-list
    * carries.
    */
  private[config] val DeniedExprFunctions = Set(
    "rand", "randn", "random", "uuid", "shuffle",
    "monotonically_increasing_id", "input_file_name", "spark_partition_id",
    "current_timestamp", "now", "current_date", "curdate", "localtimestamp",
    "current_timezone", "session_user", "current_user", "user",
    "unix_timestamp", "reflect", "java_method")

  /** Functions denied only in their ZERO-ARG form (where they read the
    * clock); with arguments they are pure and stay allowed.
    */
  private[config] val DeniedNoArgForms = Set("unix_timestamp")

  /** Names Spark resolves as LITERAL functions when written as bare
    * single-part attributes (no parens): `current_timestamp` parses as an
    * `UnresolvedAttribute`, yet the analyzer's literal-function resolution
    * binds it to the clock/session — so the `UnresolvedFunction` walk in
    * [[validateExpr]] never sees it. These must be checked on the
    * ATTRIBUTE side too (Spark's `LiteralFunctionResolution` set).
    */
  private[config] val DeniedLiteralAttributes = Set(
    "current_date", "current_timestamp", "localtimestamp",
    "current_user", "session_user", "user", "grouping__id")

  /** Parse-time validation of a user expression string: must be valid
    * Spark SQL syntax, must not contain a subquery (which would smuggle an
    * un-walked inner plan past the deny-list), and must not call a denied
    * function. Returns the expression unchanged (the pipeline builder
    * compiles it with `expr`).
    */
  private[config] def validateExpr(what: String, s: String): String = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.PlanExpression
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    val parsed =
      try CatalystSqlParser.parseExpression(s)
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"$what is not a valid SQL expression: ${e.getMessage}")
      }
    // Expression.collect does NOT descend into a subquery's inner plan,
    // so `(SELECT rand())` would otherwise slip through — the MiniElixir
    // surface has no subqueries either, so reject them outright
    if (parsed.exists(_.isInstanceOf[PlanExpression[_]]))
      throw new IllegalArgumentException(
        s"$what contains a subquery (not allowed in user expressions)")
    val denied = parsed.collect {
      case f: UnresolvedFunction
          if DeniedExprFunctions(f.nameParts.last.toLowerCase) &&
            (!DeniedNoArgForms(f.nameParts.last.toLowerCase) ||
              f.arguments.isEmpty) =>
        f.nameParts.last.toLowerCase
      // parenless literal-function forms (`commit_ts < current_timestamp`)
      // reach the analyzer as single-part attributes — same clock reads,
      // different node type
      case a: UnresolvedAttribute
          if a.nameParts.lengthCompare(1) == 0 &&
            DeniedLiteralAttributes(a.nameParts.head.toLowerCase) =>
        a.nameParts.head.toLowerCase
    }
    if (denied.nonEmpty)
      throw new IllegalArgumentException(
        s"$what calls denied function(s): ${denied.distinct.sorted.mkString(", ")} " +
          "(user expressions must be deterministic and sandbox-safe)")
    s
  }

  /** Column names a transform function must NOT write: the CDC envelope
    * and delivery columns (overwriting `commit_lsn`/`group_id`/… would
    * silently corrupt FIFO ordering, dedup, and routing downstream) plus
    * every router target column (those belong to the routing layer, which
    * has its own override path with per-sink key validation). Mirrors the
    * unknown-routing-key rejection: the collision fails at config load,
    * never mid-stream.
    */
  private[config] val ReservedTransformNames: Set[String] = {
    val envelope = Set("commit_lsn", "commit_idx", "commit_ts", "action",
      "table_schema", "table_name", "table_oid", "record_pk",
      "idempotency_key", "group_id", "byte_size")
    val routerColumns = graft.ops.Routing.allowedRouteKeys.flatMap {
      case (sinkType, keys) =>
        keys.map(k => graft.ops.Routing.targetColumn(sinkType, k))
    }.toSet
    // default-router columns not reachable via an override key
    val derived = Set("message_key", "partition", "ordering_key",
      "nats_msg_id", "es_doc_id", "es_op")
    envelope ++ routerColumns ++ derived
  }

  /** Per-sink-type required destination fields (the subset of each
    * `*_sink.ex` changeset's `validate_required` that shapes the wire —
    * credentials/hosts are deployment config, not routing semantics).
    */
  private[config] val SinkRequiredFields: Map[String, Seq[String]] = Map(
    "kafka" -> Seq("topic"),
    "sqs" -> Seq("queue_url"),
    "sns" -> Seq("topic_arn"),
    "kinesis" -> Seq("stream_arn"),
    "s2" -> Seq("basin", "stream"),
    "gcp_pubsub" -> Seq("topic_id"),
    "nats" -> Seq("subject"),
    "rabbitmq" -> Seq("exchange"),
    "azure_event_hub" -> Seq("event_hub_name"),
    "redis_stream" -> Seq("stream_key"),
    "redis_string" -> Nil,
    "elasticsearch" -> Seq("index_name"),
    "typesense" -> Seq("collection_name"),
    "meilisearch" -> Seq("index_name"),
    "http_push" -> Seq("http_endpoint"),
    "sequin_stream" -> Nil)

  def parse(json: String): ConsumerConfig = parseNode(mapper.readTree(json))

  /** Node-level parse — shared by the JSON entry point above and the YAML
    * front-end ([[YamlSpec]]), so both formats hit identical validation.
    */
  private[config] def parseNode(root: JsonNode): ConsumerConfig = {
    val name = require(root, "name").asText()

    val scope = Option(root.get("source")).map { s =>
      SourceScope(
        includeSchemas = strings(s, "include_schemas"),
        excludeSchemas = strings(s, "exclude_schemas"),
        includeTableOids = longs(s, "include_table_oids"),
        excludeTableOids = longs(s, "exclude_table_oids"))
    }.getOrElse(SourceScope())

    val actions = strings(root, "actions").getOrElse(ValidActions.toSeq.sorted)
    val badActions = actions.filterNot(ValidActions)
    if (badActions.nonEmpty)
      throw new IllegalArgumentException(s"unknown actions: $badActions")

    val filters = Option(root.get("filters")).map(_.elements().asScala.map { f =>
      val op = require(f, "op").asText()
      if (!ValidOps(op)) throw new IllegalArgumentException(s"unknown op: $op")
      val vt = Option(f.get("value_type")).map(_.asText()).getOrElse("string")
      if (!ValidValueTypes(vt))
        throw new IllegalArgumentException(s"unknown value_type: $vt")
      ColumnFilter(
        field = require(f, "field").asText(),
        op = op,
        values = strings(f, "values").getOrElse(Nil),
        valueType = vt,
        jsonbPath = Option(f.get("jsonb_path")).map(_.asText()))
    }.toSeq).getOrElse(Nil)

    val tsFormat = Option(root.get("timestamp_format")).map(_.asText())
      .getOrElse("iso8601")
    if (!ValidTsFormats(tsFormat))
      throw new IllegalArgumentException(s"unknown timestamp_format: $tsFormat")

    val legacy = Option(root.get("legacy_transform")).map(_.asText())
      .getOrElse("none")
    if (!ValidLegacyTransforms(legacy))
      throw new IllegalArgumentException(s"unknown legacy_transform: $legacy")

    val shedPolicy = Option(root.get("load_shedding_policy")).map(_.asText())
      .getOrElse("pause_on_full")
    if (!ValidShedPolicies(shedPolicy))
      throw new IllegalArgumentException(
        "load_shedding_policy must be one of: 'pause_on_full', 'discard_on_full'")

    val status = Option(root.get("status")).map(_.asText())
      .getOrElse("active")
    if (!Set("active", "disabled", "paused")(status))
      throw new IllegalArgumentException(
        "status must be one of: 'active', 'disabled', 'paused'")

    val sink = Option(root.get("destination")).map(parseSink)

    // user functions as config (F4/P4/R2): validated expression strings
    val filterFn = Option(root.get("filter_function")).map(n =>
      validateExpr("filter_function", n.asText()))
    def exprObject(field: String): Seq[(String, String)] =
      Option(root.get(field)).map { n =>
        if (!n.isObject)
          throw new IllegalArgumentException(
            s"$field must be an object of name -> expression")
        n.fields().asScala.map { e =>
          e.getKey -> validateExpr(s"$field.${e.getKey}", e.getValue.asText())
        }.toSeq
      }.getOrElse(Nil)
    val transformFns = exprObject("transform_functions")
    // dotted names mutate INSIDE a struct column (record.user.tier) — the
    // reserved check applies to the ROOT segment, so envelope/router
    // columns stay immutable whether targeted whole or by nested path
    transformFns.map(_._1).foreach { n =>
      if (n.isEmpty || n.split("\\.", -1).exists(_.isEmpty))
        throw new IllegalArgumentException(
          s"transform_functions: invalid field path '$n'")
    }
    val reservedTransforms = transformFns.map(_._1)
      .filter(n => ReservedTransformNames(n.split("\\.", 2)(0).toLowerCase))
    if (reservedTransforms.nonEmpty)
      throw new IllegalArgumentException(
        "transform_functions may not overwrite envelope/router columns: " +
          reservedTransforms.distinct.sorted.mkString(", "))
    val routingFn = exprObject("routing_function").toMap
    if (routingFn.nonEmpty) {
      // unknown-key rejection against the sink's allowed set at PARSE time
      // (Routing.withOverrides re-checks at plan time)
      val sinkType = sink.map(_.sinkType).getOrElse("kafka")
      val allowed = graft.ops.Routing.allowedRouteKeys.getOrElse(sinkType,
        throw new IllegalArgumentException(
          s"sink '$sinkType' does not support routing functions"))
      val extra = routingFn.keySet.diff(allowed)
      if (extra.nonEmpty)
        throw new IllegalArgumentException(
          s"routing_function keys not allowed for $sinkType: " +
            extra.toSeq.sorted.mkString(", "))
    }

    val batchSize = Option(root.get("batch_size")).map(_.asInt())
    batchSize.foreach { b =>
      if (b < 1 || b > 1000)
        throw new IllegalArgumentException(
          s"batch_size must be between 1 and 1000, got $b")
    }

    // bounded iteration transforms (the loop-shaped MiniElixir slice):
    // each entry unrolls at plan-build time, so `iterations` is the ONLY
    // loop form — validated here against the same deny-list as every
    // other user expression, and capped so unbounded recursion is
    // unrepresentable (Iterate.MaxIterations)
    val iterateFns = Option(root.get("iterate_functions")).map { n =>
      if (!n.isObject)
        throw new IllegalArgumentException(
          "iterate_functions must be an object of name -> {init, step, var, iterations}")
      n.fields().asScala.map { e =>
        val o = e.getValue
        val what = s"iterate_functions.${e.getKey}"
        val init = validateExpr(s"$what.init", require(o, "init").asText())
        val step = validateExpr(s"$what.step", require(o, "step").asText())
        val v = require(o, "var").asText()
        val itNode = require(o, "iterations")
        if (!itNode.isIntegralNumber)
          throw new IllegalArgumentException(
            s"$what.iterations must be an integer literal (no expressions, " +
              "no unbounded forms)")
        val its = itNode.asInt()
        if (its < 0 || its > graft.ops.Iterate.MaxIterations)
          throw new IllegalArgumentException(
            s"$what.iterations must be in [0, ${graft.ops.Iterate.MaxIterations}], got $its")
        if (!v.matches("[A-Za-z_][A-Za-z0-9_]*"))
          throw new IllegalArgumentException(
            s"$what.var must be a bare identifier, got '$v'")
        e.getKey -> IterateSpec(init, step, v, its)
      }.toSeq
    }.getOrElse(Nil)
    iterateFns.map(_._1).foreach { n =>
      if (ReservedTransformNames(n.toLowerCase))
        throw new IllegalArgumentException(
          s"iterate_functions may not overwrite envelope/router columns: $n")
    }

    ConsumerConfig(
      name = name,
      status = status,
      scope = scope,
      actions = actions,
      filters = filters,
      maxPayloadBytes = Option(root.get("max_payload_bytes")).map(_.asLong())
        .getOrElse(5L * 1024 * 1024),
      messageGrouping = Option(root.get("message_grouping"))
        .forall(_.asBoolean()),
      lowLatency = Option(root.get("low_latency"))
        .exists(_.asBoolean()),
      lowLatencyShards = Option(root.get("low_latency_shards"))
        .map(_.asInt()).getOrElse(1),
      timestampFormat = tsFormat,
      groupColumns = strings(root, "group_columns").getOrElse(Nil),
      tableGroupColumns = Option(root.get("tables")).map(
        _.elements().asScala.map { t =>
          require(t, "name").asText() ->
            strings(t, "group_column_names").getOrElse(Nil)
        }.toMap).getOrElse(Map.empty),
      batchSize = batchSize,
      ackWaitMs = Option(root.get("ack_wait_ms")).map(_.asLong())
        .getOrElse(30000L),
      maxAckPending = Option(root.get("max_ack_pending")).map(_.asInt())
        .getOrElse(10000),
      maxRetryCount = Option(root.get("max_retry_count")).map(_.asInt())
        .getOrElse(3),
      maxBackfillFenceInMemory =
        Option(root.get("max_backfill_fence_in_memory")).map(_.asInt())
          .getOrElse(100000),
      legacyTransform = legacy,
      loadSheddingPolicy = shedPolicy,
      filterFunction = filterFn,
      transformFunctions = transformFns,
      iterateFunctions = iterateFns,
      routingFunction = routingFn,
      sink = sink)
  }

  /** Destination block → validated [[SinkSpec]]: known type + that type's
    * required fields present and non-empty (the `*_sink.ex` changesets).
    */
  private def parseSink(node: JsonNode): SinkSpec = {
    val sinkType = require(node, "type").asText()
    val required = SinkRequiredFields.getOrElse(sinkType,
      throw new IllegalArgumentException(s"unknown sink type: $sinkType"))
    val settings = node.fields().asScala
      .filter(_.getKey != "type")
      .map(e => e.getKey -> e.getValue.asText()).toMap
    val missing = required.filterNot(f => settings.get(f).exists(_.nonEmpty))
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"sink '$sinkType' missing required fields: ${missing.mkString(", ")}")
    SinkSpec(sinkType, settings)
  }

  /** Config → canonical JSON spec (the reference's `to_external`
    * direction, transforms.ex:163-199): `parse(render(cfg)) == cfg` is
    * spec-tested, so configs survive export/import round trips.
    */
  def render(cfg: ConsumerConfig): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(renderNode(cfg))

  /** Node-level render — [[YamlSpec.render]] reuses this tree. */
  private[config] def renderNode(cfg: ConsumerConfig): com.fasterxml.jackson.databind.node.ObjectNode = {
    val root = mapper.createObjectNode()
    root.put("name", cfg.name)
    root.put("status", cfg.status)
    val src = root.putObject("source")
    cfg.scope.includeSchemas.foreach(v =>
      { val a = src.putArray("include_schemas"); v.foreach(a.add) })
    cfg.scope.excludeSchemas.foreach(v =>
      { val a = src.putArray("exclude_schemas"); v.foreach(a.add) })
    cfg.scope.includeTableOids.foreach(v =>
      { val a = src.putArray("include_table_oids"); v.foreach(a.add) })
    cfg.scope.excludeTableOids.foreach(v =>
      { val a = src.putArray("exclude_table_oids"); v.foreach(a.add) })
    val acts = root.putArray("actions"); cfg.actions.foreach(acts.add)
    if (cfg.filters.nonEmpty) {
      val fs = root.putArray("filters")
      cfg.filters.foreach { f =>
        val o = fs.addObject()
        o.put("field", f.field); o.put("op", f.op)
        val vs = o.putArray("values"); f.values.foreach(vs.add)
        o.put("value_type", f.valueType)
        f.jsonbPath.foreach(o.put("jsonb_path", _))
      }
    }
    root.put("message_grouping", cfg.messageGrouping)
    if (cfg.lowLatency) root.put("low_latency", true)
    if (cfg.lowLatencyShards != 1)
      root.put("low_latency_shards", cfg.lowLatencyShards)
    root.put("timestamp_format", cfg.timestampFormat)
    root.put("max_payload_bytes", cfg.maxPayloadBytes)
    if (cfg.groupColumns.nonEmpty) {
      val g = root.putArray("group_columns"); cfg.groupColumns.foreach(g.add)
    }
    if (cfg.tableGroupColumns.nonEmpty) {
      val ts = root.putArray("tables")
      cfg.tableGroupColumns.toSeq.sortBy(_._1).foreach { case (t, cols) =>
        val o = ts.addObject()
        o.put("name", t)
        val a = o.putArray("group_column_names"); cols.foreach(a.add)
      }
    }
    cfg.batchSize.foreach(root.put("batch_size", _))
    root.put("ack_wait_ms", cfg.ackWaitMs)
    root.put("max_ack_pending", cfg.maxAckPending)
    root.put("max_retry_count", cfg.maxRetryCount)
    root.put("max_backfill_fence_in_memory", cfg.maxBackfillFenceInMemory)
    root.put("legacy_transform", cfg.legacyTransform)
    root.put("load_shedding_policy", cfg.loadSheddingPolicy)
    cfg.filterFunction.foreach(root.put("filter_function", _))
    if (cfg.transformFunctions.nonEmpty) {
      val t = root.putObject("transform_functions")
      cfg.transformFunctions.foreach { case (k, v) => t.put(k, v) }
    }
    if (cfg.iterateFunctions.nonEmpty) {
      val t = root.putObject("iterate_functions")
      cfg.iterateFunctions.foreach { case (k, it) =>
        val o = t.putObject(k)
        o.put("init", it.init)
        o.put("step", it.step)
        o.put("var", it.varName)
        o.put("iterations", it.n)
      }
    }
    if (cfg.routingFunction.nonEmpty) {
      val r = root.putObject("routing_function")
      cfg.routingFunction.toSeq.sortBy(_._1).foreach { case (k, v) => r.put(k, v) }
    }
    cfg.sink.foreach { s =>
      val d = root.putObject("destination")
      d.put("type", s.sinkType)
      s.settings.toSeq.sortBy(_._1).foreach { case (k, v) => d.put(k, v) }
    }
    root
  }

  private def require(n: JsonNode, field: String): JsonNode =
    Option(n.get(field)).getOrElse(
      throw new IllegalArgumentException(s"missing required field: $field"))

  private def strings(n: JsonNode, field: String): Option[Seq[String]] =
    Option(n.get(field)).map(_.elements().asScala.map(_.asText()).toSeq)

  private def longs(n: JsonNode, field: String): Option[Seq[Long]] =
    Option(n.get(field)).map(_.elements().asScala.map(_.asLong()).toSeq)
}
