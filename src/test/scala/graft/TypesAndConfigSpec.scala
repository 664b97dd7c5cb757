package graft

import graft.backfill.{Backfill, PageSizeOptimizer}
import graft.config.PipelineSpec
import graft.model.Cdc
import graft.multimodal.Multimodal
import graft.sinks.SinkAdapters
import graft.types.ValueCaster
import org.apache.spark.sql.functions._

/** Specs for ValueCaster/ArrayLexer, backfill AIMD loop, pipeline config
  * parsing, sink wire adapters, and multimodal plumbing.
  */
class TypesAndConfigSpec extends SparkSpec {

  // ---- ValueCaster -----------------------------------------------------

  test("ValueCaster: scalar casts match the reference rules") {
    assert(ValueCaster.cast("bool", "t") == true)
    assert(ValueCaster.cast("bool", "f") == false)
    assert(ValueCaster.cast("int8", "42") == 42L)
    assert(ValueCaster.cast("float8", "1.5") == 1.5)
    assert(ValueCaster.cast("numeric", "123.456") ==
      new java.math.BigDecimal("123.456"))
    assert(ValueCaster.cast("money", "$1,234.50") ==
      new java.math.BigDecimal("1234.50"))
    assert(ValueCaster.cast("uuid", "a-b-c") == "a-b-c") // stays string
    assert(ValueCaster.cast("some_exotic_type", "raw") == "raw") // fallback
    assert(ValueCaster.cast("int8", null) == null)
    assert(ValueCaster.cast("text", "unchanged_toast") ==
      ValueCaster.UnchangedToast)
  }

  test("ValueCaster: timestamps and dates") {
    assert(ValueCaster.cast("timestamp", "2024-01-02 03:04:05.123456") ==
      java.time.LocalDateTime.parse("2024-01-02T03:04:05.123456"))
    assert(ValueCaster.cast("date", "2024-01-02") ==
      java.time.LocalDate.parse("2024-01-02"))
    val tz = ValueCaster.cast("timestamptz", "2024-01-02 03:04:05+02")
      .asInstanceOf[java.time.OffsetDateTime]
    assert(tz.toInstant.toString == "2024-01-02T01:04:05Z")
  }

  test("ValueCaster: interval text to (months, days, micros)") {
    assert(ValueCaster.parseInterval("1 year 2 mons 3 days 04:05:06.5") ==
      ((14, 3, 4 * 3600000000L + 5 * 60000000L + 6500000L)))
    assert(ValueCaster.parseInterval("-00:00:01") == ((0, 0, -1000000L)))
  }

  test("ArrayLexer: quoted elements, escapes, NULL, nesting") {
    assert(ValueCaster.lexArray("{a,b,c}") == Seq("a", "b", "c"))
    assert(ValueCaster.lexArray("""{"a,b",c}""") == Seq("a,b", "c"))
    assert(ValueCaster.lexArray("""{"he said \"hi\"",x}""") ==
      Seq("""he said "hi"""", "x"))
    assert(ValueCaster.lexArray("{a,NULL,b}") == Seq("a", null, "b"))
    assert(ValueCaster.lexArray("""{"NULL"}""") == Seq("NULL")) // quoted literal
    assert(ValueCaster.lexArray("{{1,2},{3,4}}") == Seq("{1,2}", "{3,4}"))
    // quoted elements INSIDE a nested array must survive the re-lex:
    // quotes/escapes pass through verbatim at depth > 0
    assert(ValueCaster.lexArray("""{{"a,b"},{c}}""") == Seq("""{"a,b"}""", "{c}"))
    assert(ValueCaster.lexArray("""{{"a,b"},{c}}""").map(ValueCaster.lexArray) ==
      Seq(Seq("a,b"), Seq("c")))
    assert(ValueCaster.lexArray("""{{"x\"y,z"}}""").map(ValueCaster.lexArray) ==
      Seq(Seq("""x"y,z""")))
    assert(ValueCaster.lexArray("{}") == Nil)
    assert(ValueCaster.cast("_int4", "{1,2,NULL}") == Seq(1L, 2L, null))
    // multidim arrays: nested literals recurse with the same type name
    assert(ValueCaster.cast("_int4", "{{1,2},{3,4}}") ==
      Seq(Seq(1L, 2L), Seq(3L, 4L)))
    assert(ValueCaster.cast("_text", """{{"a,b"},{c}}""") ==
      Seq(Seq("a,b"), Seq("c")))
    // a QUOTED element whose text begins with '{' is a string, not a
    // nested literal — the lexer's quote tag must survive to cast
    assert(ValueCaster.lexArrayTagged("""{"{a}",b}""") ==
      Seq(("{a}", true), ("b", false)))
    assert(ValueCaster.cast("_text", """{"{a}",b}""") == Seq("{a}", "b"))
    assert(ValueCaster.cast("_text", """{"{1,2}"}""") == Seq("{1,2}"))
    assert(ValueCaster.cast("vector", "[0.5, 1.5]") == Seq(0.5f, 1.5f))
  }

  test("ArrayLexer round-trips randomized pg array literals (fixed seed)") {
    val rnd = new scala.util.Random(7)
    def randElem(): String = {
      val n = 1 + rnd.nextInt(8)
      (0 until n).map(_ => "ab,\"\\{} x".charAt(rnd.nextInt(9))).mkString
    }
    def quote(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    (1 to 50).foreach { _ =>
      val elems = (0 until rnd.nextInt(6)).map(_ =>
        if (rnd.nextBoolean()) null else randElem())
      val literal = elems.map {
        case null => "NULL"
        case e    => quote(e)
      }.mkString("{", ",", "}")
      val lexed = ValueCaster.lexArray(literal)
      assert(lexed == elems.toSeq, s"round-trip failed for $literal")
    }
  }

  // ---- Backfill / AIMD -------------------------------------------------

  test("PageSizeOptimizer grows additively under budget, backs off multiplicatively") {
    val opt = new PageSizeOptimizer(100, maxTimeoutMs = 1000)
    opt.record(100) // fast → grow
    assert(opt.pageSize == 125)
    opt.record(5000) // timeout → halve
    assert(opt.pageSize == 62)
    (1 to 50).foreach(_ => opt.record(10))
    assert(opt.pageSize <= 50000)
  }

  test("Backfill.run pages the whole table exactly once, in order, as read events") {
    val orders = Tables.orders(spark, sf()).limit(500)
    val out = Backfill.run(spark, orders, Seq("o_orderdate", "o_orderkey"),
      new PageSizeOptimizer(128, maxTimeoutMs = 60000))
    assert(out.count() == 500)
    assert(out.select("o_orderkey").distinct().count() == 500)
    assert(out.filter(col("action") =!= "read").count() == 0)
  }

  test("Backfill.runPartitioned: one parallel pass == the paged loop, ranges globally ordered") {
    val orders = Tables.orders(spark, sf())
    val paged = Backfill.run(spark, orders, Seq("o_orderdate", "o_orderkey"),
      new PageSizeOptimizer(512, maxTimeoutMs = 60000))
    val ranged = Backfill.runPartitioned(orders,
      Seq("o_orderdate", "o_orderkey"), numRanges = 8)
    assert(ranged.count() == paged.count())
    assert(ranged.select("o_orderkey").exceptAll(
      paged.select("o_orderkey")).count() == 0)
    // range partitioning is GLOBALLY ordered: partition i's max cursor
    // precedes partition i+1's min cursor
    val bounds = ranged
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"),
        col("o_orderdate"), col("o_orderkey"))
      .groupBy("p")
      .agg(min(struct(col("o_orderdate"), col("o_orderkey"))).as("lo"),
        max(struct(col("o_orderdate"), col("o_orderkey"))).as("hi"))
      .orderBy("p")
      .collect()
    bounds.sliding(2).foreach {
      case Array(a, b) =>
        val hiA = a.getStruct(2)
        val loB = b.getStruct(1)
        val cmp = hiA.getAs[java.time.LocalDateTime](0)
          .compareTo(loB.getAs[java.time.LocalDateTime](0))
        assert(cmp < 0 || (cmp == 0 && hiA.getLong(1) <= loB.getLong(1)),
          s"ranges overlap: ${a} vs ${b}")
      case _ => ()
    }
  }

  test("Backfill.run resumes from the spool: completed pages not re-scanned, debris dropped") {
    val orders = Tables.orders(spark, sf()).limit(400)
    val spool = java.nio.file.Files
      .createTempDirectory("graft_bf_resume").toString
    // full reference run into its own spool
    val expect = Backfill.run(spark, orders, Seq("o_orderkey"),
      new PageSizeOptimizer(100, maxTimeoutMs = 60000, growFactor = 1.0))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    // simulate a crash after two completed pages + one half-written page
    val keys = orders.select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0))
    Seq(0, 1).foreach { p =>
      graft.ops.Keyset.page(orders, Seq("o_orderkey"),
          if (p == 0) None else Some(Seq(keys(100 * p - 1))), 100)
        .withColumn("action", lit("read"))
        .write.mode("overwrite").parquet(s"$spool/page=$p")
    }
    val debris = java.nio.file.Paths.get(s"$spool/page=2")
    java.nio.file.Files.createDirectories(debris)
    java.nio.file.Files.writeString(debris.resolve("part-000.parquet"), "junk")
    // resumed run continues from page 2's cursor and rewrites the debris
    val out = Backfill.run(spark, orders, Seq("o_orderkey"),
      new PageSizeOptimizer(100, maxTimeoutMs = 60000, growFactor = 1.0),
      spoolDir = Some(spool))
    assert(out.select("o_orderkey").collect().map(_.getLong(0)).sorted
      .sameElements(expect))
    // a SECOND resume after completion is a no-op read (the _DONE marker):
    // page count unchanged, same rows
    val again = Backfill.run(spark, orders, Seq("o_orderkey"),
      new PageSizeOptimizer(100, maxTimeoutMs = 60000, growFactor = 1.0),
      spoolDir = Some(spool))
    assert(again.count() == 400)

    // crash DIRECTLY after writing the final end-of-table EMPTY page but
    // before its cleanup/_DONE: resume must converge, not throw on the
    // empty page's missing cursor
    val spool2 = java.nio.file.Files
      .createTempDirectory("graft_bf_resume2").toString
    Seq(0, 1, 2, 3).foreach { p =>
      graft.ops.Keyset.page(orders, Seq("o_orderkey"),
          if (p == 0) None else Some(Seq(keys(100 * p - 1))), 100)
        .withColumn("action", lit("read"))
        .write.mode("overwrite").parquet(s"$spool2/page=$p")
    }
    orders.limit(0).withColumn("action", lit("read"))
      .write.mode("overwrite").parquet(s"$spool2/page=4") // empty probe page
    val resumed = Backfill.run(spark, orders, Seq("o_orderkey"),
      new PageSizeOptimizer(100, maxTimeoutMs = 60000, growFactor = 1.0),
      spoolDir = Some(spool2))
    assert(resumed.select("o_orderkey").collect().map(_.getLong(0)).sorted
      .sameElements(expect))
  }

  test("Backfill fencing drops PKs seen on the CDC stream") {
    val orders = Tables.orders(spark, sf()).limit(100)
      .withColumn("record_pk", col("o_orderkey").cast("string"))
    val seen = orders.limit(10).select("record_pk")
    val out = Backfill.run(spark, orders, Seq("o_orderkey"),
      new PageSizeOptimizer(64, maxTimeoutMs = 60000),
      fence = Some((seen, Seq("record_pk"))))
    assert(out.count() == 90)
  }

  // ---- PipelineSpec ----------------------------------------------------

  test("PipelineSpec parses a full consumer config") {
    val cfg = PipelineSpec.parse(
      """{"name": "c1",
        | "source": {"include_schemas": ["public"], "exclude_table_oids": [16387]},
        | "actions": ["insert", "update"],
        | "filters": [{"field": "record_value", "op": ">", "values": ["50"],
        |              "value_type": "number"},
        |             {"field": "record_props", "op": "==", "values": ["1"],
        |              "value_type": "number", "jsonb_path": "k"}],
        | "message_grouping": false,
        | "timestamp_format": "unix_microsecond"}""".stripMargin)
    assert(cfg.name == "c1")
    assert(cfg.scope.includeSchemas.contains(Seq("public")))
    assert(cfg.actions == Seq("insert", "update"))
    assert(cfg.filters.length == 2)
    assert(cfg.filters(1).jsonbPath.contains("k"))
    assert(!cfg.messageGrouping)
  }

  test("PipelineSpec rejects invalid specs like the reference changesets") {
    assertThrows[IllegalArgumentException](PipelineSpec.parse("""{"actions":[]}"""))
    assertThrows[IllegalArgumentException](
      PipelineSpec.parse("""{"name":"x","actions":["truncate"]}"""))
    assertThrows[IllegalArgumentException](
      PipelineSpec.parse("""{"name":"x","filters":[{"field":"f","op":"~"}]}"""))
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","source":{"include_schemas":["a"],"exclude_schemas":["b"]}}"""))
  }

  test("PipelineSpec parses delivery tuning + validated sink destination") {
    val cfg = PipelineSpec.parse(
      """{"name": "c2",
        | "group_columns": ["record_user_id", "table_name"],
        | "batch_size": 50,
        | "ack_wait_ms": 5000,
        | "max_retry_count": 5,
        | "legacy_transform": "record_only",
        | "destination": {"type": "kafka", "topic": "orders",
        |                 "hosts": "k1:9092"}}""".stripMargin)
    assert(cfg.groupColumns == Seq("record_user_id", "table_name"))
    assert(cfg.batchSize.contains(50))
    assert(cfg.effectiveBatchSize == 50)
    assert(cfg.ackWaitMs == 5000L)
    assert(cfg.maxRetryCount == 5)
    assert(cfg.legacyTransform == "record_only")
    assert(cfg.sink.map(_.sinkType).contains("kafka"))
    assert(cfg.sink.get.settings("topic") == "orders")

    // per-sink batch-size default when unspecified (sink_consumer.ex)
    val kafkaDefault = PipelineSpec.parse(
      """{"name":"c3","destination":{"type":"kafka","topic":"t"}}""")
    assert(kafkaDefault.effectiveBatchSize ==
      SinkAdapters.defaultBatchSizes("kafka"))

    // unknown sink type / missing required destination field / bad bounds
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","destination":{"type":"carrier_pigeon"}}"""))
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","destination":{"type":"s2","basin":"b"}}"""))
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","batch_size":0}"""))
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","legacy_transform":"maybe"}"""))
  }

  test("load shedding: discard_on_full caps per-group backlog, pause is lossless") {
    val cdc = Cdc.fromEvents(Tables.events(spark, sf()))
    val paused = graft.ops.Filters.shedOverflow(cdc, 5, "pause_on_full")
    assert(paused.count() == cdc.count())
    val shed = graft.ops.Filters.shedOverflow(cdc, 5, "discard_on_full")
    val perGroup = shed.groupBy("group_id").count()
    assert(perGroup.filter(col("count") > 5).count() == 0)
    // survivors are the OLDEST per group (cursor order), not arbitrary
    val g = cdc.groupBy("group_id").count().filter(col("count") > 5)
      .select("group_id").head().getString(0)
    val kept = shed.filter(col("group_id") === g)
      .select("commit_lsn", "commit_idx").orderBy("commit_lsn", "commit_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val oldest = cdc.filter(col("group_id") === g)
      .select("commit_lsn", "commit_idx").orderBy("commit_lsn", "commit_idx")
      .limit(5).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.sameElements(oldest))
    assertThrows[IllegalArgumentException](
      graft.ops.Filters.shedOverflow(cdc, 5, "drop_everything"))
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","load_shedding_policy":"maybe"}"""))
    assert(PipelineSpec.parse(
      """{"name":"x","load_shedding_policy":"discard_on_full"}""")
      .loadSheddingPolicy == "discard_on_full")
  }

  test("PipelineSpec.render round-trips: parse(render(cfg)) == cfg") {
    val cfgs = Seq(
      PipelineSpec.parse("""{"name":"min"}"""),
      PipelineSpec.parse(
        """{"name": "full",
          | "source": {"include_schemas": ["public"], "exclude_table_oids": [16387]},
          | "actions": ["insert", "update"],
          | "filters": [{"field": "record_value", "op": ">", "values": ["50"],
          |              "value_type": "number", "jsonb_path": "k"}],
          | "message_grouping": false,
          | "timestamp_format": "unix_microsecond",
          | "group_columns": ["record_user_id"],
          | "batch_size": 25,
          | "ack_wait_ms": 5000,
          | "max_retry_count": 7,
          | "legacy_transform": "record_only",
          | "load_shedding_policy": "discard_on_full",
          | "destination": {"type": "nats", "subject": "cdc.orders"}}""".stripMargin))
    cfgs.foreach { cfg =>
      assert(PipelineSpec.parse(PipelineSpec.render(cfg)) == cfg)
    }
  }

  test("user functions as config: validated, applied, and round-tripped") {
    val cfg = PipelineSpec.parse(
      """{"name": "fns",
        | "filter_function": "record_value > 50 AND action = 'insert'",
        | "transform_functions": {"value_eur": "round(record_value * 0.92, 2)"},
        | "routing_function": {"topic": "concat('cdc.', table_name)"},
        | "destination": {"type": "kafka", "topic": "t"}}""".stripMargin)
    assert(cfg.filterFunction.contains("record_value > 50 AND action = 'insert'"))
    assert(PipelineSpec.parse(PipelineSpec.render(cfg)) == cfg)

    // the pipeline applies all three stages
    val cdc = Cdc.fromEvents(Tables.events(spark, sf()))
    val out = graft.streaming.CdcPipeline.build(cdc, cfg)
    assert(out.columns.contains("value_eur"))
    val rows = out.select("record_value", "action", "topic").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(0) > 50 && r.getString(1) == "insert"))
    assert(rows.forall(_.getString(2).startsWith("cdc.")))

    // syntax error, denied function, unknown routing key → parse-time errors
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","filter_function":"record_value >"}"""))
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","filter_function":"rand() > 0.5"}"""))
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","routing_function":{"stream_key":"'s'"},
        | "destination":{"type":"kafka","topic":"t"}}""".stripMargin))
    // a subquery must not smuggle a denied function past the tree walk
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","filter_function":"(SELECT rand()) > 0.5"}"""))
    // zero-arg unix_timestamp reads the clock — denied; with args it's pure
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","filter_function":"unix_timestamp() % 60 < 30"}"""))
    PipelineSpec.parse(
      """{"name":"x","filter_function":"unix_timestamp(commit_ts) > 0"}""")
    // non-object function blocks are malformed, not silently empty
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","transform_functions":"round(record_value, 2)"}"""))
  }

  test("user functions express LOOP-shaped logic via sequence + HOF folds (MiniElixir control-flow analogue)") {
    // the reference's MiniElixir lets user transforms loop/recur; the
    // Spark surface covers the bounded forms with sequence() + HOF folds
    // — iteration with accumulator state, per-element transforms, and
    // filtering — all deterministic and sandbox-clean
    val cfg = PipelineSpec.parse(
      """{"name": "loops",
        | "transform_functions": {
        |   "compounded_cents":
        |     "aggregate(sequence(1, 12), CAST(round(record_value * 100) AS BIGINT), (acc, m) -> acc + acc div 100)",
        |   "digit_sum":
        |     "aggregate(transform(split(CAST(record_id AS STRING), ''), c -> ascii(c) - 48), 0, (a, d) -> a + d)",
        |   "n_long_words":
        |     "size(filter(split(record_props, ' '), w -> length(w) >= 4))"}}""".stripMargin)
    val cdc = Cdc.fromEvents(Tables.events(spark, sf()))
    val out = graft.streaming.CdcPipeline.build(cdc, cfg)
      .select("record_id", "record_value", "compounded_cents", "digit_sum")
      .collect()
    assert(out.nonEmpty)
    out.take(50).foreach { r =>
      val id = r.getLong(0)
      // 12 rounds of integer 1% compounding, verified against a plain
      // Scala loop — the user expression IS a loop with carried state
      var acc = math.round(r.getDouble(1) * 100)
      (1 to 12).foreach(_ => acc += acc / 100)
      assert(r.getLong(2) == acc, s"id=$id")
      assert(r.getInt(3) == id.toString.map(_ - '0').sum, s"id=$id")
    }
  }

  test("iterate_functions: bounded fixed-count loops unroll, apply, round-trip; unbounded forms rejected") {
    val cfg = PipelineSpec.parse(
      """{"name": "iter",
        | "iterate_functions": {
        |   "minstd12": {"init": "record_id % 2147483646 + 1",
        |     "step": "(x * 48271) % 2147483647", "var": "x",
        |     "iterations": 12},
        |   "halving": {"init": "CAST(round(record_value * 100) AS BIGINT)",
        |     "step": "acc div 2", "var": "acc", "iterations": 5}}}""".stripMargin)
    assert(PipelineSpec.parse(PipelineSpec.render(cfg)) == cfg)
    val cdc = Cdc.fromEvents(Tables.events(spark, sf()))
    val out = graft.streaming.CdcPipeline.build(cdc, cfg)
      .select("record_id", "record_value", "minstd12", "halving")
      .collect()
    assert(out.nonEmpty)
    out.take(50).foreach { r =>
      var x = r.getLong(0) % 2147483646L + 1
      (1 to 12).foreach(_ => x = (x * 48271) % 2147483647L)
      assert(r.getLong(2) == x, s"id=${r.getLong(0)}")
      var acc = math.round(r.getDouble(1) * 100)
      (1 to 5).foreach(_ => acc /= 2)
      assert(r.getLong(3) == acc)
    }
    // the executed plan contains NO runtime loop — n=0 is just init
    assert(graft.ops.Iterate.unroll("7", "x * x", "x", 0) != null)
    // a step referencing the loop variable k>1 times grows the tree k^n
    // ("x + x" @ 40 ⇒ ~2^40 nodes) — must reject at plan build, never
    // OOM the driver; single-occurrence steps at max depth stay fine
    assertThrows[IllegalArgumentException](
      graft.ops.Iterate.unroll("1", "x + x", "x", 40))
    assertThrows[IllegalArgumentException](
      graft.ops.Iterate.unroll("1", "x * x + x * x", "x", 30))
    assert(graft.ops.Iterate.unroll("1", "x + 1", "x", 64) != null)
    assert(graft.ops.Iterate.unroll("1", "x + x", "x", 8) != null)

    def bad(body: String) = assertThrows[IllegalArgumentException](
      PipelineSpec.parse(s"""{"name":"x","iterate_functions":{"f": $body}}"""))
    // unbounded / over-cap / negative / non-literal iteration counts
    bad("""{"init":"0","step":"x+1","var":"x","iterations":65}""")
    bad("""{"init":"0","step":"x+1","var":"x","iterations":-1}""")
    bad("""{"init":"0","step":"x+1","var":"x","iterations":"record_id"}""")
    // the deny-list walks init and step like any user expression
    bad("""{"init":"rand()","step":"x+1","var":"x","iterations":3}""")
    bad("""{"init":"0","step":"x + rand()","var":"x","iterations":3}""")
    bad("""{"init":"0","step":"x + (SELECT 1)","var":"x","iterations":3}""")
    // malformed loop variable / missing fields / reserved target
    bad("""{"init":"0","step":"x+1","var":"x y","iterations":3}""")
    bad("""{"init":"0","step":"x+1","iterations":3}""")
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","iterate_functions":{"commit_lsn":
        | {"init":"0","step":"x+1","var":"x","iterations":3}}}""".stripMargin))
    // a loop variable inside a string literal is NOT substituted
    val lit = graft.ops.Iterate.unroll("'x'", "concat(x, 'x')", "x", 2)
    val one = spark.range(1).select(lit.as("s")).collect().head.getString(0)
    assert(one == "xxx", s"got '$one' — literal 'x' must stay a literal")
  }

  test("sandbox: parenless literal functions (clock/user reads) are denied") {
    // `current_timestamp` with no parens parses as an UnresolvedAttribute,
    // and Spark's literal-function resolution binds it to the clock at
    // analysis time — the UnresolvedFunction deny-list alone never sees it
    for (form <- Seq("current_timestamp", "current_date", "localtimestamp"))
      assertThrows[IllegalArgumentException](PipelineSpec.parse(
        s"""{"name":"x","filter_function":"commit_ts < $form"}"""))
    for (form <- Seq("current_user", "session_user", "user"))
      assertThrows[IllegalArgumentException](PipelineSpec.parse(
        s"""{"name":"x","transform_functions":{"who":"$form"}}"""))
    // qualified attributes of the same name are real column references
    PipelineSpec.parse(
      """{"name":"x","filter_function":"accounts.user = 'a'"}""")
  }

  test("sandbox: higher-order-function lambdas pass (the MiniElixir loop analog) but cannot smuggle denied calls") {
    // HOFs are the declarative form of MiniElixir's per-element loops
    // (Enum.map / reduce / filter over record fields) — allowed as long
    // as the lambda body is itself clean
    PipelineSpec.parse(
      """{"name":"x","transform_functions":
        | {"doubled":"transform(from_json(record_props, 'array<int>'), x -> x * 2)"}}"""
        .stripMargin)
    PipelineSpec.parse(
      """{"name":"x","transform_functions":
        | {"total":"aggregate(from_json(record_props, 'array<int>'), 0, (a, x) -> a + x)"}}"""
        .stripMargin)
    PipelineSpec.parse(
      """{"name":"x","filter_function":
        | "exists(from_json(record_props, 'array<int>'), x -> x > 10)"}"""
        .stripMargin)
    // ...but a denied function INSIDE a lambda body is still caught by
    // the same tree walk (lambdas are ordinary subtrees, not subqueries)
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","transform_functions":
        | {"noisy":"transform(from_json(record_props, 'array<int>'), x -> x + rand())"}}"""
        .stripMargin))
    assertThrows[IllegalArgumentException](PipelineSpec.parse(
      """{"name":"x","filter_function":
        | "exists(from_json(record_props, 'array<int>'), x -> x > unix_timestamp())"}"""
        .stripMargin))
  }

  test("transform_functions may not overwrite envelope or router columns") {
    for (reserved <- Seq("commit_lsn", "record_pk", "action", "group_id",
        "topic", "stream_key", "message_key"))
      assertThrows[IllegalArgumentException](PipelineSpec.parse(
        s"""{"name":"x","transform_functions":{"$reserved":"'boom'"}}"""))
    // non-reserved names still pass and land as output columns
    val cfg = PipelineSpec.parse(
      """{"name":"x","transform_functions":{"value_eur":"record_value * 0.92"}}""")
    assert(cfg.transformFunctions.map(_._1) == Seq("value_eur"))
  }

  test("nested transform paths: root-reserved rejected, record paths allowed") {
    // mutating INSIDE a reserved column by dot path is still forbidden
    for (reserved <- Seq("group_id.x", "record_pk.inner", "topic.part"))
      assertThrows[IllegalArgumentException](PipelineSpec.parse(
        s"""{"name":"x","transform_functions":{"$reserved":"'boom'"}}"""))
    // malformed paths (empty segments) fail at config load
    for (bad <- Seq("record.", ".tier", "record..tier"))
      assertThrows[IllegalArgumentException](PipelineSpec.parse(
        s"""{"name":"x","transform_functions":{"$bad":"'x'"}}"""))
    // a non-reserved root with a nested path parses
    val cfg = PipelineSpec.parse(
      """{"name":"x","transform_functions":{"record.user.tier":"'gold'"}}""")
    assert(cfg.transformFunctions.map(_._1) == Seq("record.user.tier"))
  }

  test("nested transform paths mutate inside the record struct (put_in analog)") {
    val nested = Cdc.fromEvents(Tables.events(spark, sf())).limit(50)
      .withColumn("record", struct(
        struct(col("record_user_id").as("id"), lit("std").as("tier")).as("user"),
        col("record_value").as("v")))
    val cfg = graft.streaming.ConsumerConfig(name = "m",
      transformFunctions = Seq(
        "record.user.tier" -> "CASE WHEN record.v > 100 THEN 'gold' ELSE 'std' END",
        "record.audit" -> "named_struct('seen', true)"))
    val out = graft.streaming.CdcPipeline.build(nested, cfg)
    val rows = out.select(col("record.user.tier"), col("record.v"),
      col("record.audit.seen"), col("record.user.id")).collect()
    assert(rows.forall(r => r.getString(0) == (if (r.getDouble(1) > 100) "gold" else "std")))
    assert(rows.forall(_.getBoolean(2)))  // added nested struct present
    // sibling fields untouched by the mutation
    assert(rows.forall(r => !r.isNullAt(3)))
    // recordDrop is the pop_in analog
    val dropped = nested.select(
      graft.ops.Transforms.recordDrop(col("record"), "user.tier").as("record"))
    assert(!dropped.select("record.user.*").columns.contains("tier"))
  }

  test("routing function over a non-kafka sink: null override falls back to that sink's default") {
    val cfg = PipelineSpec.parse(
      """{"name": "rs",
        | "routing_function": {"stream_key":
        |   "CASE WHEN action = 'delete' THEN 'audit.stream' END"},
        | "destination": {"type": "redis_stream", "stream_key": "cfg.stream"}}"""
        .stripMargin)
    val cdc = Cdc.fromEvents(Tables.events(spark, sf()))
    val out = graft.streaming.CdcPipeline.build(cdc, cfg)
    val byAction = out.select("action", "stream_key").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(byAction.filter(_._1 == "delete").forall(_._2 == "audit.stream"))
    // non-deletes fall back to the redis_stream DEFAULT router, not null
    assert(byAction.filter(_._1 == "insert")
      .forall(_._2.startsWith("sequin.")))
    assert(byAction.forall(_._2 != null))
  }

  test("group_columns override the pk-derived delivery group in the pipeline") {
    val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(100)
    val cfg = graft.streaming.ConsumerConfig(name = "g",
      groupColumns = Seq("record_user_id", "table_name"))
    val out = graft.streaming.CdcPipeline.build(cdc, cfg)
    val row = out.select("group_id", "record_user_id", "table_name").head()
    assert(row.getString(0) == s"${row.getLong(1)}:${row.getString(2)}")
  }

  // ---- Sink adapters ---------------------------------------------------

  test("sink wire adapters produce the transport column shapes") {
    val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(50)
    val routed = graft.ops.Routing.kafka(cdc)

    val kafka = SinkAdapters.kafkaWire(routed)
    assert(kafka.columns.toSeq == Seq("ack_id", "ledger_group_id") ++ Seq("topic", "key", "value"))
    assert(kafka.filter(col("value").isNull).count() == 0)

    val redis = SinkAdapters.redisStringWire(cdc, ttlSeconds = Some(60))
    assert(redis.columns.toSeq == Seq("ack_id", "ledger_group_id") ++ Seq("key", "value", "op", "ttl"))
    val delOps = redis.filter(col("op") === "DEL")
    assert(delOps.count() ==
      cdc.filter(col("action") === "delete").count())
    assert(delOps.filter(col("value").isNotNull).count() == 0)

    val sqs = SinkAdapters.sqsWire(cdc, "http://queue")
    assert(sqs.select("message_dedup_id").distinct().count() == 50)

    val es = SinkAdapters.esBulkWire(cdc, "idx")
    assert(es.filter(col("bulk_lines").contains("\"delete\"")).count() ==
      cdc.filter(col("action") === "delete").count())
  }

  test("SQS-buffered HTTP push: drain(enqueue(df)) == direct push bodies") {
    val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(50)
    val queued = SinkAdapters.httpPushSqsEnqueueWire(cdc, "http://main-queue")
    assert(queued.columns.toSeq ==
      Seq("queue_url", "message_id", "message_body"))
    // deterministic message ids (the reference uses uuid4; ours must
    // replay-dedup), and every body is the {"data": base64} wrapper
    assert(queued.select("message_id").distinct().count() == 50)
    assert(queued.filter(!col("message_body").startsWith("{\"data\":\"")).count() == 0)

    val drained = SinkAdapters.httpPushSqsDeliverWire(queued, "http://ep")
    assert(drained.head().getString(2) == "sqs") // x-sequin-via marker
    val direct = SinkAdapters.httpPushWire(cdc, "http://ep")
    // the two-hop route delivers exactly the direct route's bodies
    assert(drained.select("body").exceptAll(direct.select("body")).isEmpty)
    assert(direct.select("body").exceptAll(drained.select("body")).isEmpty)
  }

  test("sink adapter sweep: the remaining transports' wire shapes") {
    val cdc = Cdc.fromEvents(Tables.events(spark, sf())).limit(50)
    val deletes = cdc.filter(col("action") === "delete").count()

    val xadd = SinkAdapters.redisStreamWire(cdc)
    assert(xadd.columns.toSeq ==
      Seq("ack_id", "ledger_group_id") ++
        Seq("stream_key", "entry_id", "fields"))
    val row = xadd.select("stream_key", "entry_id", "fields").head()
    assert(row.getString(0).startsWith("sequin."))
    assert(row.getString(1) == "*")
    val fields = row.getMap[String, String](2)
    assert(fields.keySet == Set("record", "changes", "action", "metadata"))

    val sns = SinkAdapters.snsWire(cdc, "arn:aws:sns:us-east-1:1:t", isFifo = true)
    assert(sns.columns.toSeq ==
      Seq("ack_id", "ledger_group_id") ++ Seq("topic_arn", "message_group_id", "message_dedup_id", "message"))
    assert(sns.filter(col("message_dedup_id").isNull).count() == 0)
    val snsStd = SinkAdapters.snsWire(cdc, "arn:aws:sns:us-east-1:1:t")
    assert(snsStd.filter(col("message_group_id").isNotNull).count() == 0)

    val kin = SinkAdapters.kinesisWire(cdc, "arn:aws:kinesis:us-east-1:1:stream/s")
    assert(kin.columns.toSeq == Seq("ack_id", "ledger_group_id") ++ Seq("stream_arn", "partition_key", "data"))
    assert(kin.filter(length(col("partition_key")) > 256).count() == 0)
    assert(kin.filter(col("data").rlike("^[A-Za-z0-9+/=]+$")).count() == 50)

    val s2 = SinkAdapters.s2Wire(cdc, "basin1", "stream1")
    assert(s2.columns.toSeq == Seq("ack_id", "ledger_group_id") ++ Seq("basin", "stream", "body"))

    val ps = SinkAdapters.pubsubWire(cdc)
    assert(ps.columns.toSeq == Seq("ack_id", "ledger_group_id") ++ Seq("topic_id", "data", "attributes", "ordering_key"))
    val attrs = ps.select("attributes").head().getMap[String, String](0)
    assert(attrs("type") == "event")
    assert(Set("insert", "update", "delete").contains(attrs("action")))

    val nats = SinkAdapters.natsWire(cdc)
    assert(nats.columns.toSeq == Seq("ack_id", "ledger_group_id") ++ Seq("subject", "headers", "payload"))
    assert(nats.filter(col("subject").rlike(
      "^sequin\\.postgres\\.(public|audit)\\.t[0-4]\\.(insert|update|delete)$"))
      .count() == 50)
    assert(nats.select("headers").head().getMap[String, String](0)
      .contains("Nats-Msg-Id"))

    val rmq = SinkAdapters.rabbitmqWire(cdc, "sequin-exchange")
    assert(rmq.columns.toSeq ==
      Seq("ack_id", "ledger_group_id") ++ Seq("exchange", "routing_key", "message_id", "payload"))
    assert(rmq.select("message_id").distinct().count() == 50)

    val hub = SinkAdapters.eventHubWire(cdc, "hub1")
    assert(hub.columns.toSeq == Seq("ack_id", "ledger_group_id") ++ Seq("event_hub_name", "partition_key", "body"))

    val ts = SinkAdapters.typesenseWire(cdc)
    assert(ts.columns.toSeq ==
      Seq("ack_id", "ledger_group_id") ++ Seq("collection_name", "ts_action", "doc_id", "document"))
    assert(ts.filter(col("ts_action") === "delete").count() == deletes)
    assert(ts.filter(col("ts_action") === "delete" &&
      col("document").isNotNull).count() == 0)
    assert(ts.filter(col("ts_action") === "index" &&
      !col("document").contains("\"id\"")).count() == 0)

    val ms = SinkAdapters.meilisearchWire(cdc, "idx")
    assert(ms.filter(col("ms_action") === "delete").count() == deletes)

    val push = SinkAdapters.httpPushWire(cdc, "https://e.test/h")
    assert(push.columns.toSeq == Seq("method", "endpoint", "body"))
    assert(push.filter(col("body").contains("\"metadata\"")).count() == 50)
    val legacy = SinkAdapters.httpPushWire(cdc, "https://e.test/h",
      legacyRecordOnly = true)
    assert(legacy.filter(col("body").contains("\"metadata\"")).count() == 0)

    val batched = SinkAdapters.httpPushBatchedWire(cdc, "https://e.test/h",
      batchSize = 8, partitions = 4)
    assert(batched.agg(sum("n")).head().getLong(0) == 50)
    assert(batched.filter(col("n") > 8).count() == 0)
    assert(batched.filter(!col("body").startsWith("{\"data\":[")).count() == 0)
    assert(batched.filter(col("first_seq") > col("last_seq")).count() == 0)
  }

  test("default batch sizes mirror sink_consumer.ex") {
    assert(SinkAdapters.defaultBatchSizes("kafka") == 200)
    assert(SinkAdapters.defaultBatchSizes("redis_stream") == 50)
    assert(SinkAdapters.defaultBatchSizes("gcp_pubsub") == 1)
    assert(SinkAdapters.defaultBatchSizes("http_push") == 1) // default
  }

  // ---- Multimodal ------------------------------------------------------

  test("multimodal frame sampling slices n fixed-width byte windows") {
    import spark.implicits._
    val df = Seq(Tuple1("abcdefghijklmnopqrstuvwxyz".getBytes)).toDF("bytes")
    val frames = df.select(Multimodal.frameSample(col("bytes"), 4, 5).as("f"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(frames.length == 4)
    assert(frames.forall(_.length == 5))
  }

  test("multimodal stub decode is deterministic and schema-complete") {
    implicit val s = spark
    import s.implicits._
    val assets = Multimodal.assetsFromDocuments(
      Tables.documents(spark, sf())).as[Multimodal.Asset]
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.length == Tables.documents(spark, sf()).count())
    assert(feats.forall(f => f.width >= 64 && f.width < 128))
    assert(feats.forall(f => f.content_hash.length == 32))
    val again = Multimodal.extractFeatures(assets).collect()
    val a1 = feats.sortBy(_.asset_id).toSeq
    val a2 = again.sortBy(_.asset_id).toSeq
    a1.zip(a2).foreach { case (x, y) => assert(x == y, s"mismatch: $x vs $y") }
  }

  test("multimodal resize emits fixed-size payloads, deterministic, batched") {
    implicit val s = spark
    import s.implicits._
    val assets = Multimodal.assetsFromDocuments(
      Tables.documents(spark, sf())).as[Multimodal.Asset]
    val resized = Multimodal.resizeTo(assets, w = 8, h = 8, batchSize = 16)
      .collect().sortBy(_.asset_id)
    assert(resized.length == Tables.documents(spark, sf()).count())
    assert(resized.forall(r => r.bytes.length == 64 && r.width == 8 && r.height == 8))
    // nearest-neighbor over the byte plane: first sample is the first byte
    val srcFirst = assets.collect().sortBy(_.asset_id).map(_.bytes.head)
    assert(resized.map(_.bytes.head).sameElements(srcFirst))
    // deterministic across runs
    val again = Multimodal.resizeTo(assets, 8, 8, batchSize = 16)
      .collect().sortBy(_.asset_id)
    resized.zip(again).foreach { case (x, y) =>
      assert(x.bytes.sameElements(y.bytes)) }
  }

  test("Health.ingestSnapshot: the q41 batch snapshot feeds the health " +
      "registry (active tables healthy, silent tables warn)") {
    val reg = new graft.config.Health.Registry()
    val snapshot = SparkEntry.queries("q41_health_snapshot")(spark, sf())
    reg.ingestSnapshot(snapshot)
    val ids = snapshot.select("table_schema", "table_name").collect()
      .map(r => s"${r.getString(0)}.${r.getString(1)}")
    assert(ids.nonEmpty)
    ids.foreach { id =>
      val h = reg.health("sink_consumer", id)
      val ing = h.checks.find(_.slug == "messages_ingested").get
      assert(ing.status == "healthy", s"$id: $ing")
    }
    // a table with zero events in the window warns instead of lying
    import spark.implicits._
    reg.ingestSnapshot(Seq(("public", "silent", 0L))
      .toDF("table_schema", "table_name", "n"))
    val h = reg.health("sink_consumer", "public.silent")
    assert(h.checks.find(_.slug == "messages_ingested").get
      .status == "warning")
  }
}
