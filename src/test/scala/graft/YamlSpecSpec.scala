package graft

import graft.config.{PipelineSpec, YamlSpec}
import graft.model.Cdc
import org.apache.spark.sql.functions._

/** sequin.yaml front-end: YAML-subset parse → the SAME validated
  * ConsumerConfig the JSON spec produces, to_external render round-trip,
  * and the per-table group-column override in the pipeline.
  */
class YamlSpecSpec extends SparkSpec {

  private val oids = Map("public.orders" -> 16388L, "public.users" -> 16390L,
    "audit.log" -> 16400L)

  test("parses the reference-documented sinks document shape") {
    val yaml =
      """# infrastructure-as-code config (sequin-yaml.mdx shape)
        |sinks:
        |  - name: "orders-consumer"
        |    database: "my-database"     # deployment ref, ignored
        |    source:
        |      include_schemas:
        |        - "public"
        |      exclude_tables:
        |        - "public.users"
        |    actions:
        |      - insert
        |      - update
        |    message_grouping: true
        |    tables:
        |      - name: "public.orders"
        |        group_column_names:
        |          - "account_id"
        |    batch_size: 10
        |    filters:
        |      - field: "record_value"
        |        op: ">"
        |        values:
        |          - "50"
        |        value_type: "number"
        |    destination:
        |      type: "webhook"           # to_external spelling of http_push
        |      http_endpoint: "my-endpoint"
        |""".stripMargin
    val cfg = YamlSpec.parse(yaml, oids)
    assert(cfg.name == "orders-consumer")
    assert(cfg.scope.includeSchemas.contains(Seq("public")))
    assert(cfg.scope.excludeTableOids.contains(Seq(16390L)))
    assert(cfg.actions == Seq("insert", "update"))
    assert(cfg.tableGroupColumns == Map("public.orders" -> Seq("account_id")))
    assert(cfg.batchSize.contains(10))
    assert(cfg.filters.head.op == ">")
    assert(cfg.filters.head.valueType == "number")
    assert(cfg.sink.get.sinkType == "http_push")
    assert(cfg.sink.get.settings("http_endpoint") == "my-endpoint")
  }

  test("YAML and JSON specs produce identical configs (validation parity)") {
    val yaml =
      """name: "parity"
        |source:
        |  include_schemas:
        |  - "public"
        |actions:
        |- insert
        |group_columns:
        |- "record_user_id"
        |destination:
        |  type: "kafka"
        |  topic: "t"
        |""".stripMargin
    val json =
      """{"name":"parity","source":{"include_schemas":["public"]},
        |"actions":["insert"],"group_columns":["record_user_id"],
        |"destination":{"type":"kafka","topic":"t"}}""".stripMargin
    assert(YamlSpec.parse(yaml) == PipelineSpec.parse(json))
  }

  test("user-function blocks parse identically from YAML and JSON, same validation") {
    val yaml =
      """name: "fns"
        |filter_function: "record_value > 50"
        |transform_functions:
        |  value_eur: "round(record_value * 0.92, 2)"
        |routing_function:
        |  topic: "concat('cdc.', table_name)"
        |destination:
        |  type: "kafka"
        |  topic: "t"
        |""".stripMargin
    val json =
      """{"name":"fns","filter_function":"record_value > 50",
        |"transform_functions":{"value_eur":"round(record_value * 0.92, 2)"},
        |"routing_function":{"topic":"concat('cdc.', table_name)"},
        |"destination":{"type":"kafka","topic":"t"}}""".stripMargin
    assert(YamlSpec.parse(yaml) == PipelineSpec.parse(json))
    // the YAML path hits the SAME expression sandbox
    assertThrows[IllegalArgumentException](YamlSpec.parse(
      """name: "bad"
        |filter_function: "rand() > 0.5"
        |""".stripMargin))
  }

  test("render is to_external: parseSinks(render(cfg)) round-trips exactly") {
    val cfgs = Seq(
      PipelineSpec.parse("""{"name":"min"}"""),
      PipelineSpec.parse(
        """{"name": "full \"quoted\" name",
          | "source": {"include_schemas": ["public"], "exclude_table_oids": [16387]},
          | "actions": ["insert", "update"],
          | "filters": [{"field": "record_value", "op": ">", "values": ["50"],
          |              "value_type": "number", "jsonb_path": "k.x"}],
          | "message_grouping": false,
          | "timestamp_format": "unix_microsecond",
          | "group_columns": ["record_user_id"],
          | "tables": [{"name": "public.orders",
          |             "group_column_names": ["account_id", "region"]}],
          | "batch_size": 25,
          | "legacy_transform": "record_only",
          | "load_shedding_policy": "discard_on_full",
          | "destination": {"type": "http_push", "http_endpoint": "ep"}}""".stripMargin))
    cfgs.foreach { cfg =>
      val yaml = YamlSpec.render(cfg)
      assert(YamlSpec.parseSinks(yaml) == Seq(cfg), s"round-trip failed:\n$yaml")
    }
    // multi-sink documents round-trip too
    assert(YamlSpec.parseSinks(YamlSpec.renderAll(cfgs)) == cfgs)
  }

  test("YAML specs hit the same changeset validation as JSON") {
    def bad(yaml: String): Unit =
      assertThrows[IllegalArgumentException](YamlSpec.parse(yaml, oids))
    bad("""actions:
          |- insert
          |""".stripMargin)                       // missing name
    bad("""name: "x"
          |actions:
          |- truncate
          |""".stripMargin)                       // unknown action
    bad("""name: "x"
          |destination:
          |  type: "kafka"
          |""".stripMargin)                       // kafka needs topic
    bad("""name: "x"
          |source:
          |  include_tables:
          |  - "public.nope"
          |""".stripMargin)                       // unresolvable table name
    bad("""name: "x"
          |batch_size: 5000
          |""".stripMargin)                       // batch_size cap
  }

  test("unsupported YAML features raise instead of mis-parsing") {
    assertThrows[IllegalArgumentException](
      YamlSpec.parse("name: \"x\"\nsql: |-\n  select 1\n"))
    assertThrows[IllegalArgumentException](
      YamlSpec.parse("name: \"x\"\nactions: [insert]\n"))
    assertThrows[IllegalArgumentException](
      YamlSpec.parse("name: \"x\"\n\tbad: true\n"))
  }

  test("comments, quoting and plain-scalar typing") {
    val yaml =
      """name: "a # not-a-comment"   # this one is
        |max_payload_bytes: 1024
        |message_grouping: false
        |ack_wait_ms: 12000
        |""".stripMargin
    val cfg = YamlSpec.parse(yaml)
    assert(cfg.name == "a # not-a-comment")
    assert(cfg.maxPayloadBytes == 1024L)
    assert(!cfg.messageGrouping)
    assert(cfg.ackWaitMs == 12000L)
  }

  test("per-table group_column_names override the delivery group in the pipeline") {
    val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(200)
    val someTable = cdc.select("table_schema", "table_name").head()
    val tbl = s"${someTable.getString(0)}.${someTable.getString(1)}"
    val cfg = graft.streaming.ConsumerConfig(name = "g",
      groupColumns = Seq("record_user_id"),
      tableGroupColumns = Map(tbl -> Seq("record_id")))
    val out = graft.streaming.CdcPipeline.build(cdc, cfg)
      .select(col("group_id"), col("record_id"), col("record_user_id"),
        concat_ws(".", col("table_schema"), col("table_name")).as("t"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      if (r.getAs[String]("t") == tbl)          // override table → record_id
        assert(r.getString(0) == r.getAs[Long]("record_id").toString)
      else                                      // others → global group_columns
        assert(r.getString(0) == r.getAs[Long]("record_user_id").toString)
    }
    assert(out.exists(_.getAs[String]("t") == tbl))
    assert(out.exists(_.getAs[String]("t") != tbl))
  }

  test("ChangeRetentionSpec.scope applies table, action and column filters") {
    import spark.implicits._
    val yaml =
      """change_retentions:
        |  - name: "r"
        |    source_database: "d"
        |    source_table_schema: "public"
        |    source_table_name: "t0"
        |    destination_database: "d2"
        |    destination_table_schema: "a"
        |    destination_table_name: "e"
        |    actions:
        |      - insert
        |    filters:
        |      - column_name: "record_value"
        |        operator: ">"
        |        comparison_value: "5"
        |        field_type: "number"
        |""".stripMargin
    val spec = YamlSpec.parseChangeRetentions(yaml).head
    val df = Seq(
      ("public", "t0", "insert", 10.0, 1L),
      ("public", "t0", "insert", 3.0, 2L),  // fails the value filter
      ("public", "t0", "update", 10.0, 3L), // fails the action filter
      ("public", "t1", "insert", 10.0, 4L)) // wrong source table
      .toDF("table_schema", "table_name", "action", "record_value", "record_id")
    val out = spec.scope(df).select("record_id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L))
  }
}
