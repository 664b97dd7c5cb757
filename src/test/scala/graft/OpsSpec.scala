package graft

import graft.model.Cdc
import graft.ops._
import org.apache.spark.sql.functions._

/** Unit specs for the batch operator library (semantics the DuckDB oracle
  * can't probe directly: null handling, edge ordering, config validation).
  */
class OpsSpec extends SparkSpec {

  private lazy val cdc = Cdc.fromEvents(Tables.events(spark, sf())).cache()

  test("keyset page is strictly after the cursor and correctly ordered") {
    val page = Keyset.page(Tables.orders(spark, sf()),
      Seq("o_orderdate", "o_orderkey"),
      Some(Seq(java.time.LocalDateTime.parse("1995-06-01T00:00:00"), 0L)), 50)
      .collect()
    assert(page.length == 50)
    val keys = page.map(r => (r.getAs[java.time.LocalDateTime]("o_orderdate"),
      r.getAs[Long]("o_orderkey")))
    assert(keys.sameElements(keys.sortBy(identity)))
  }

  test("source scope include xor exclude is enforced") {
    assertThrows[IllegalArgumentException] {
      SourceScope(includeSchemas = Some(Seq("a")), excludeSchemas = Some(Seq("b")))
    }
  }

  test("action filter always passes backfill reads") {
    import spark.implicits._
    val df = Seq(("read", 1L), ("insert", 2L), ("delete", 3L))
      .toDF("action", "id")
    val out = Filters.actionFilter(df, Seq("insert")).collect().map(_.getLong(1))
    assert(out.toSet == Set(1L, 2L))
  }

  test("cistring column filter is case-insensitive") {
    import spark.implicits._
    val df = Seq("ABC", "abc", "xyz").toDF("v")
    val out = Filters.columnFilters(df,
      Seq(ColumnFilter("v", "==", Seq("AbC"), "cistring"))).count()
    assert(out == 2)
  }

  test("not_in with null column value is null-safe (drops nulls like the reference)") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("b"), None).toDF("v")
    val out = Filters.columnFilters(df,
      Seq(ColumnFilter("v", "not_in", Seq("a")))).collect().map(_.getString(0))
    // null not_in ('a') → NULL → filtered out (three-valued logic)
    assert(out.toSeq == Seq("b"))
  }

  test("changesDiff: only updates with differing old value carry changes") {
    val out = Transforms.changesDiff(cdc)
      .groupBy(col("action"), col("changed_value").isNotNull.as("has_change"))
      .count().collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(!out.contains(("insert", true)))
    assert(!out.contains(("delete", true)))
    assert(out.contains(("update", true)))
  }

  test("group id: empty parts collapse to null (ungrouped)") {
    import spark.implicits._
    val df = Seq(("x", "1"), (null, null)).toDF("a", "b")
    val out = df.select(Transforms.groupId(Seq(col("a"), col("b"))).as("g"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("x:1"), None))
  }

  test("toastResolve takes old value only for sentinel cells") {
    import spark.implicits._
    val df = Seq((Map("a" -> "unchanged_toast", "b" -> "new"),
      Map("a" -> "old_a", "b" -> "old_b"))).toDF("new", "old")
    val out = df.select(Transforms.toastResolve(col("new"), col("old")).as("r"))
      .collect().head.getMap[String, String](0)
    assert(out("a") == "old_a" && out("b") == "new")
  }

  test("headOfGroup emits exactly one row per non-null group plus all null-group rows") {
    val withNulls = cdc.withColumn("group_id",
      when(col("table_schema") =!= "audit", col("group_id")))
    val out = Ordering.headOfGroup(withNulls)
    val nonNullGroups = withNulls.filter(col("group_id").isNotNull)
      .select("group_id").distinct().count()
    val nullRows = withNulls.filter(col("group_id").isNull).count()
    assert(out.count() == nonNullGroups + nullRows)
  }

  test("dedupLatest keeps the highest (lsn, idx) per key") {
    import spark.implicits._
    val df = Seq(("k", 1L, 5L, "old"), ("k", 2L, 0L, "new"), ("k", 1L, 9L, "mid"))
      .toDF("record_pk", "commit_lsn", "commit_idx", "payload")
    val out = Ordering.dedupLatest(df, Seq("record_pk"),
      Seq(col("commit_lsn"), col("commit_idx"))).collect()
    assert(out.length == 1 && out.head.getAs[String]("payload") == "new")
  }

  test("minCursor is the lexicographic struct-min, not per-column mins") {
    import spark.implicits._
    val df = Seq((5L, 0L), (3L, 9L), (3L, 2L)).toDF("commit_lsn", "commit_idx")
    val out = Ordering.minCursor(df).collect().head
    assert(out.getLong(0) == 3L && out.getLong(1) == 2L)
  }

  test("enrich join keeps unmatched events with null dimension columns") {
    import spark.implicits._
    val events = Seq((1L, "a"), (2L, "b")).toDF("k", "payload")
    val dim = Seq((1L, "dim1")).toDF("dk", "dv")
    val out = Joins.enrich(events, dim, events("k"), dim("dk"))
      .orderBy("k").collect()
    assert(out.length == 2)
    assert(out(1).isNullAt(out(1).fieldIndex("dv")))
  }

  test("routing override: user value wins, null falls back, unknown key rejected at plan time") {
    val routed = Routing.kafka(cdc)
    val over = Routing.withOverrides(routed, "kafka",
      Map("topic" -> when(col("action") === "delete", lit("audit"))))
    val byAction = over.select("action", "topic").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(byAction.filter(_._1 == "delete").forall(_._2 == "audit"))
    assert(byAction.filter(_._1 == "insert").forall(_._2.startsWith("sequin.")))
    // unknown key for the sink type → rejected BEFORE any job runs
    // (mirrors validate_no_extra_keys in routing/helpers.ex)
    val ex = intercept[IllegalArgumentException] {
      Routing.withOverrides(routed, "kafka",
        Map("stream_key" -> lit("x")))
    }
    assert(ex.getMessage.contains("stream_key"))
    // unknown sink type is also a plan-time error
    assertThrows[IllegalArgumentException] {
      Routing.withOverrides(routed, "carrier_pigeon", Map.empty)
    }
    // the per-sink "action" routing key is the SINK OP — overriding it
    // must target the router column (ts_action), never the CDC envelope's
    // action column
    val ts = Routing.withOverrides(Routing.typesense(cdc), "typesense",
      Map("action" -> lit("emplace")))
    assert(ts.select("ts_action").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("emplace"))
    assert(ts.select("action").distinct().count() > 1) // envelope intact
  }

  test("gapFill: LOCF + exact interpolation, on-grid observation, negative slope") {
    import spark.implicits._
    // key 1: obs at t=5 (v 100) and t=25 (v 40) with step 10 → grid
    // {10, 20}: locf 100 at both; interp is the exact floor of the
    // negative-slope line: 100 + (40-100)*(h-5)/20
    // key 2: a single obs exactly on the grid → locf = interp = itself
    val obs = Seq((1L, 5L, 100L), (1L, 25L, 40L), (2L, 30L, 7L))
      .toDF("k", "us", "cents")
    val out = ops.TimeSeries.gapFill(obs, "k", "us", "cents", 10L)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("h_us")) ->
        ((r.getAs[Long]("locf_cents"), r.getAs[Long]("interp_cents"))))
      .toMap
    assert(out.size == 3)
    assert(out((1L, 10L)) == ((100L, 85L)))  // 100 + (-60*5)/20 = 85
    assert(out((1L, 20L)) == ((100L, 55L)))  // 100 + (-60*15)/20 = 55
    assert(out((2L, 30L)) == ((7L, 7L)))     // den = 0 → the obs itself
  }

  test("asOf join: latest at-or-before match, >= at equal ts, no-match nulls") {
    import spark.implicits._
    val probes = Seq((1L, 100L, "p_at_state"), (1L, 200L, "p_between"),
      (1L, 50L, "p_before_any"), (2L, 50L, "p_no_state"))
      .toDF("k", "pts", "pid")
    val state = Seq((1L, 100L, "s100"), (1L, 150L, "s150"), (3L, 10L, "sx"))
      .toDF("k", "sts", "sval")
    val out = Joins.asOf(probes, state, Seq("k"), "pts", "sts",
        Seq("sval", "sts")).collect()
      .map(r => r.getAs[String]("pid") ->
        Option(r.getAs[String]("sval"))).toMap
    assert(out.size == 4)                        // every probe survives
    assert(out("p_at_state") == Some("s100"))    // >= semantics: equal ts matches
    assert(out("p_between") == Some("s150"))     // latest prior, not first
    assert(out("p_before_any") == None)          // state only in the future
    assert(out("p_no_state") == None)            // key never had state
  }

  test("asOf join: NULL right ts / NULL right keys never match (ASOF semantics)") {
    import spark.implicits._
    val probes = Seq((Some(1L), 100L, "p1"), (None, 100L, "p_null_key"))
      .toDF("k", "pts", "pid")
    // NULL sts would sort nulls-first and carry forward into every probe;
    // NULL key would pair with the NULL-key probe via window partitioning
    val state = Seq((Some(1L), None, "s_null_ts"),
      (None, Some(50L), "s_null_key"))
      .toDF("k", "sts", "sval")
    val out = Joins.asOf(probes, state, Seq("k"), "pts", "sts", Seq("sval"))
      .collect().map(r => r.getAs[String]("pid") ->
        Option(r.getAs[String]("sval"))).toMap
    assert(out.size == 2)               // probes survive (left-outer)
    assert(out("p1") == None)           // NULL-ts state is not state
    assert(out("p_null_key") == None)   // NULL keys don't equijoin
  }

  test("asOf join: equal-ts state rows resolve to the greatest payload") {
    import spark.implicits._
    val probes = Seq((1L, 100L, "p")).toDF("k", "pts", "pid")
    val state = Seq((1L, 100L, "aaa"), (1L, 100L, "zzz"))
      .toDF("k", "sts", "sval")
    val out = Joins.asOf(probes, state, Seq("k"), "pts", "sts", Seq("sval"))
      .collect()
    assert(out.head.getAs[String]("sval") == "zzz")
  }

  test("rangeJoin: inclusive bounds, key isolation, multi-band exactly-once") {
    import spark.implicits._
    // band = 10: interval [5, 25] touches bands 0, 1, 2
    val pts = Seq((1L, 5L, "at_start"), (1L, 25L, "at_end"),
      (1L, 15L, "mid"), (1L, 4L, "before"), (1L, 26L, "after"),
      (2L, 15L, "wrong_key"))
      .toDF("k", "pus", "pid")
    val iv = Seq((1L, 5L, 25L, "w1")).toDF("k", "ws", "we", "wid")
    val out = Joins.rangeJoin(pts, iv, Seq("k"), "pus", "ws", "we",
      bandMicros = 10L).collect()
    // every qualifying pair appears EXACTLY once despite the 3-band
    // explosion; bounds are inclusive on both ends; keys isolate
    assert(out.map(_.getAs[String]("pid")).sorted.toSeq ==
      Seq("at_end", "at_start", "mid"))
  }

  test("rangeJoin: parity with the naive nested-loop join; negative epochs band correctly") {
    import spark.implicits._
    // pseudo-random small corpus straddling zero (pre-1970 epochs):
    // truncating div would shift negative bands by one — floor-div must not
    val pts = (0 until 200).map { i =>
      (i.toLong % 5, (i * 37 % 61).toLong - 30, i.toLong)
    }.toDF("k", "pus", "pid")
    val iv = (0 until 40).map { j =>
      val s = (j * 53 % 47).toLong - 25
      (j.toLong % 5, s, s + (j % 13).toLong, j.toLong)
    }.toDF("k", "ws", "we", "wid")
    val got = Joins.rangeJoin(pts, iv, Seq("k"), "pus", "ws", "we",
        bandMicros = 7L)
      .select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = pts.as("p").join(iv.as("i"),
        col("p.k") === col("i.k") &&
          col("pus") >= col("ws") && col("pus") <= col("we"))
      .select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.length == got.distinct.length)   // no duplicate pairs
  }

  test("funnel: strictly-ordered chain, depth counts, no-step-1 users dropped") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, "signup"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "signup"), (2L, 5L, "click"),  // click BEFORE signup
      (3L, 10L, "click"), (3L, 20L, "purchase"), // never signed up
      (4L, 10L, "signup"), (4L, 10L, "click"),   // equal ts: strict >
      // click-after-signup is at 20, so the purchase at 15 doesn't chain
      (5L, 10L, "signup"), (5L, 5L, "click"), (5L, 20L, "click"),
      (5L, 15L, "purchase"))
      .toDF("user_id", "us", "event_type")
    val out = Behavior.funnel(ev, "user_id", "us", "event_type",
      Seq("signup", "click", "purchase")).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Int]("depth"), Option(r.getAs[Any]("t2_us")))).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 5L))   // user 3 dropped
    assert(out(1L) == (3, Some(20L)))
    assert(out(2L) == (1, None))                 // pre-signup click ignored
    assert(out(4L) == (1, None))                 // ts tie is not "after"
    assert(out(5L) == (2, Some(20L)))            // purchase predates t2
  }

  test("transitions: lead pairs per user, event_id tiebreak, integer ppm") {
    import spark.implicits._
    val ev = Seq(
      // user 1 stream: a b a b  →  a→b ×2, b→a ×1
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"),
      (1L, 4L, 40L, "b"),
      // user 2 stream: a b c  →  a→b, b→c ; b and c share ts=20, the
      // event_id tiebreak orders b before c
      (2L, 5L, 10L, "a"), (2L, 6L, 20L, "b"), (2L, 7L, 20L, "c"))
      .toDF("user_id", "event_id", "us", "event_type")
    val out = Behavior.transitions(ev, "user_id", "us", "event_id",
        "event_type").collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_from"),
          r.getAs[Long]("prob_ppm"))).toMap
    assert(out == Map(
      ("a", "b") -> (3L, 3L, 1000000L),
      ("b", "a") -> (1L, 2L, 500000L),
      ("b", "c") -> (1L, 2L, 500000L)))
  }

  test("cohortRetention: first-week cohorts, user-weeks counted once") {
    import spark.implicits._
    val wk = 604800000000L
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, wk + 5L),  // cohort 0: wk0 twice (dedups), wk1
      (2L, wk * 2), (2L, wk * 4),         // cohort 2: offsets 0 and 2
      (3L, wk * 2 + 3L))                  // cohort 2: offset 0
      .toDF("user_id", "us")
    val out = Behavior.cohortRetention(ev, "user_id", "us").collect()
      .map(r => (r.getAs[Long]("cohort_wk"), r.getAs[Int]("week_offset")) ->
        r.getAs[Long]("n_users")).toMap
    assert(out == Map((0L, 0) -> 1L, (0L, 1) -> 1L,
      (2L, 0) -> 2L, (2L, 2) -> 1L))
  }

  test("interval coverage: running-max sweep merges containment and touch") {
    import spark.implicits._
    val iv = Seq(
      // key 1: long interval CONTAINS the second; third starts before the
      // long one ends — a lag-based sweep (prev row's end, not running
      // max) would wrongly split after the short [10,20)
      (1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 30L, 120L),
      // key 2: touching intervals merge (half-open), then a gap
      (2L, 4L, 0L, 10L), (2L, 5L, 10L, 20L), (2L, 6L, 25L, 30L))
      .toDF("k", "id", "s_us", "e_us")
    val got = Intervals.coverage(iv, "k", "s_us", "e_us", "id").collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[Long]("n_intervals"),
        r.getAs[Long]("n_spans"), r.getAs[Long]("covered_us"))).toMap
    assert(got(1L) == (3L, 1L, 120L))
    assert(got(2L) == (3L, 2L, 25L))
  }

  test("anomalies: integer z² flags spikes, honors min-n and variance") {
    import spark.implicits._
    val flat = (1L to 12L).map(i => (1L, i, i, 100L))       // zero variance
    val young = (1L to 5L).map(i => (2L, 100 + i, i, 100L)) // n < 10
    val noisy = (1L to 10L).map(i =>                        // alternating
      (3L, 200 + i, i, if (i % 2 == 0) 90L else 110L))      // 90/110
    val ev = (flat ++ Seq((1L, 13L, 13L, 200L)) ++
      young ++ Seq((2L, 106L, 6L, 9999L)) ++
      noisy ++ Seq((3L, 211L, 11L, 110L), (3L, 212L, 12L, 200L)))
      .toDF("user_id", "event_id", "us", "c")
    val got = Behavior.anomalies(ev, "user_id", "us", "event_id", "c")
      .collect().map(_.getAs[Long]("event_id")).toSet
    // user 1: spike over a zero-variance window (thr = 0) flags;
    // user 2: wild value but only 5 priors — under min-n, silent;
    // user 3: 110 inside the noise band (dev² 10000 < thr 90000) is NOT
    // flagged, 200 (dev² ~1e6) is. The 212 window holds 11 values.
    assert(got == Set(13L, 212L))
  }

  test("timeWeightedAvg: holds until next event, single-event keys drop") {
    import spark.implicits._
    val ev = Seq(
      // user 1: 100 held 10us, 200 held 20us → twap (1000+4000) div 30
      (1L, 1L, 0L, 100L), (1L, 2L, 10L, 200L), (1L, 3L, 30L, 50L),
      (2L, 4L, 5L, 999L)) // single event: no holding period, no row
      .toDF("user_id", "event_id", "us", "c")
    val got = Behavior.timeWeightedAvg(ev, "user_id", "us", "event_id", "c")
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_holds"), r.getAs[Long]("held_us"),
          r.getAs[Long]("twap_cents"))).toMap
    assert(got == Map(1L -> (2L, 30L, 166L)))
  }

  test("stickiness: sliding 7-day distinct actives from the user-day table") {
    import spark.implicits._
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L), (1L, 5L), (1L, day + 1L),   // u1 active d0 (twice), d1
      (2L, 2L), (2L, day * 8))              // u2 active d0, d8
      .toDF("user_id", "us")
    val got = Behavior.stickiness(ev, "user_id", "us").collect()
      .map(r => r.getAs[Long]("day") -> (r.getAs[Long]("dau"),
        r.getAs[Long]("wau"), r.getAs[Long]("stickiness_ppm"))).toMap
    // d1's trailing week includes both users (u2's d0 supports w1..w6)
    assert(got == Map(0L -> (2L, 2L, 1000000L),
      1L -> (1L, 2L, 500000L), 8L -> (1L, 1L, 1000000L)))
  }

  test("globalRank: matches a single-partition row_number over a total order") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val df = (1L to 500L).map(i => (i, (i * 7919) % 100)).toDF("id", "v")
      .repartition(13) // scrambled input partitioning
    val got = graft.ops.Ordering.globalRank(df,
        Seq(col("v").desc, col("id").asc), "rk")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rk",
        row_number().over(W.orderBy(col("v").desc, col("id").asc))
          .cast("long"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("sessionize: splits strictly past the gap, 0-based per-key indexes") {
    import spark.implicits._
    val df = Seq(
      (1L, 0L, 10L, 1.0),    // user 1, session 0
      (2L, 10L, 10L, 2.0),   // diff == gap → SAME session (strict >)
      (3L, 21L, 10L, 3.0),   // diff 11 > gap → session 1
      (4L, 0L, 77L, 5.0))    // user 77: own indexing from 0
      .toDF("event_id", "us", "user_id", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("value"))
    val assigned = Sessions.assign(df, "user_id", "ts", "event_id", 10L)
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
    val rolled = Sessions.rollup(df, "user_id", "ts", "event_id", 10L, "value")
      .orderBy("user_id", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rolled.toSeq == Seq(
      (10L, 0L, 0L, 10L, 2L, 300L),   // events 1+2: 0..10us, 1.0+2.0 → 300c
      (10L, 1L, 21L, 21L, 1L, 300L),  // event 3 alone
      (77L, 0L, 0L, 0L, 1L, 500L)))
  }

  test("incremental rollup board: every subtotal level telescopes across " +
      "windows and matches hand-computed totals") {
    import spark.implicits._
    // two-level key (region, city); lifecycles span the window split at
    // lsn 4: the update and delete in window 2 must adjust THREE board
    // rows each (city, region, grand total)
    val chs = Seq(
      (1L, "insert", "a", "r1", "c1", Some(10L), None),
      (2L, "insert", "b", "r1", "c2", Some(20L), None),
      (3L, "insert", "c", "r2", "c3", Some(40L), None),
      (5L, "update", "a", "r1", "c1", Some(15L), Some(10L)),
      (6L, "delete", "b", "r1", "c2", None, Some(20L)))
    val df = chs.toDF("lsn", "action", "pk", "region", "city", "new_v", "old_v")
    val measures = Seq(
      IncrementalView.liveCount(col("action")),
      IncrementalView.sumOf("s", col("action"), col("new_v"), col("old_v")))
    val keys = Seq("region", "city")
    val v1 = IncrementalView.deltaRollup(
      df.filter(col("lsn") <= 4), keys.map(col), measures)
    val advanced = IncrementalView.advanceRollup(
      v1, df.filter(col("lsn") > 4), keys, measures)
    def boardOf(v: org.apache.spark.sql.DataFrame) = v.collect().map { r =>
      (Option(r.getString(0)).getOrElse("*"),
        Option(r.getString(1)).getOrElse("*")) ->
        ((r.getLong(3), r.getLong(4)))
    }.toMap
    val got = boardOf(advanced)
    // live rows at the end: a=15 (r1/c1), c=40 (r2/c3)
    assert(got == Map(
      ("r1", "c1") -> ((1L, 15L)),
      ("r1", "c2") -> ((0L, 0L)),     // b deleted — nets to zero
      ("r1", "*") -> ((1L, 15L)),
      ("r2", "c3") -> ((1L, 40L)),
      ("r2", "*") -> ((1L, 40L)),
      ("*", "*") -> ((2L, 55L))))
    assert(got == boardOf(IncrementalView.deltaRollup(
      df, keys.map(col), measures)))
  }

  test("SCD2: deletes close versions without emitting; re-insert reopens; " +
      "versionAt honors closed intervals") {
    import spark.implicits._
    // one key's full lifecycle: insert v1 → update v2 → delete → insert v3
    val df = Seq(
      (10L, 0L, "insert", "k1", 1L),
      (20L, 0L, "update", "k1", 2L),
      (30L, 0L, "delete", "k1", 2L),
      (40L, 0L, "insert", "k1", 3L),
      (15L, 0L, "insert", "k2", 9L))
      .toDF("commit_lsn", "commit_idx", "action", "g", "v")
    val versions = Scd.type2(df, "g")
      .select("g", "v", "commit_lsn", "valid_to_lsn", "is_current")
      .orderBy("g", "commit_lsn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4)))
    assert(versions.toSeq == Seq(
      ("k1", 1L, 10L, Some(20L), 0),  // closed by the update
      ("k1", 2L, 20L, Some(30L), 0),  // closed by the DELETE (no row for it)
      ("k1", 3L, 40L, None, 1),       // reopened, current
      ("k2", 9L, 15L, None, 1)))
    def at(lsn: Long): Set[(String, Long)] =
      Scd.versionAt(Scd.type2(df, "g"), lsn).select("g", "v").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(at(25) == Set(("k1", 2L), ("k2", 9L)))
    assert(at(35) == Set(("k2", 9L)))            // k1 deleted at 30
    assert(at(45) == Set(("k1", 3L), ("k2", 9L)))
    assert(at(5) == Set.empty)
  }

  test("incremental view: multi-window advance telescopes to ground truth " +
      "under pk churn (insert→update→update→delete)") {
    import spark.implicits._
    // Synthesized pk HISTORIES (the oracle-gated q71 stream has one change
    // per pk; this exercises the telescoping the gate can't): each pk runs
    // insert(v0) → update(v0→v1) → update(v1→v2) → delete(v2), truncated
    // at a random stage, interleaved across pks in lsn order.
    val rnd = new scala.util.Random(42)
    var lsn = 0L
    val chs = (0 until 60).flatMap { p =>
      val g = s"g${p % 7}"
      val vals = Seq.fill(3)(rnd.nextInt(1000).toLong)
      val stages = 1 + rnd.nextInt(4)
      (0 until stages).map { st =>
        lsn += 1 + rnd.nextInt(3)
        val action =
          if (st == 0) "insert" else if (st == 3) "delete" else "update"
        val nv: java.lang.Long = if (action == "delete") null else vals(st)
        val ov: java.lang.Long = if (st == 0) null else vals(st - 1)
        (lsn, action, s"p$p", g, nv, ov)
      }
    }
    val df = chs.toDF("lsn", "action", "pk", "g", "new_v", "old_v")
    val measures = Seq(
      IncrementalView.liveCount(col("action")),
      IncrementalView.sumOf("s", col("action"), col("new_v"), col("old_v")))

    // ground truth at a cursor: replay the live-row map
    def truth(at: Long): Map[String, (Long, Long)] = {
      val live = scala.collection.mutable.Map[String, (String, Long)]()
      chs.filter(_._1 <= at).sortBy(_._1).foreach {
        case (_, "delete", pk, _, _, _) => live.remove(pk)
        case (_, _, pk, g, nv, _)       => live(pk) = (g, nv.longValue())
      }
      live.values.groupBy(_._1).map { case (g, vs) =>
        g -> ((vs.size.toLong, vs.map(_._2).sum))
      }
    }
    def viewMap(v: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      v.filter(col("n") =!= 0).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val cursors = Seq(lsn / 4, lsn / 2, (3 * lsn) / 4, lsn)
    var view = IncrementalView.delta(
      df.filter(col("lsn") <= cursors.head), col("g"), measures)
    assert(viewMap(view) == truth(cursors.head))
    cursors.sliding(2).foreach { case Seq(a, b) =>
      view = IncrementalView.advance(view,
        df.filter(col("lsn") > a && col("lsn") <= b), col("g"), measures)
      assert(viewMap(view) == truth(b))
    }
    // telescoping: the multi-window result == one-shot delta over everything
    val oneShot = IncrementalView.delta(df, col("g"), measures)
    assert(viewMap(view) == viewMap(oneShot))
    // with exact old images, a group emptied of live rows nets to exactly 0
    assert(view.filter(col("n") === 0).collect()
      .forall(_.getLong(2) == 0L))
    // scale shape: maintenance is pure aggregation — no join anywhere in
    // the physical plan, and the window is partially aggregated before
    // its one shuffle
    val plan = view.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert(plan.contains("HashAggregate"))
  }

  test("advanceMax: fast path for raises, pruned recompute for max removals, transient peaks never surface") {
    import spark.implicits._
    type L = java.lang.Long
    def l(v: Long): L = v
    // prefix (lsn ≤ 10) builds the stored view; window is (10, 20]:
    //   gA raise-only · gB delete of its max · gC lowering of its max ·
    //   gD born in-window with a raise-then-lower chain (the transient
    //   800 peak must NOT surface) · gE emptied entirely
    val chs: Seq[(Long, String, String, String, L, L)] = Seq(
      (1L, "insert", "a1", "gA", l(100), null),
      (2L, "insert", "b1", "gB", l(500), null),
      (3L, "insert", "b2", "gB", l(200), null),
      (4L, "insert", "c1", "gC", l(900), null),
      (5L, "insert", "c2", "gC", l(300), null),
      (6L, "insert", "e1", "gE", l(50), null),
      (11L, "insert", "a2", "gA", l(400), null),
      (12L, "delete", "b1", "gB", null, l(500)),
      (13L, "update", "c1", "gC", l(250), l(900)),
      (14L, "insert", "d1", "gD", l(800), null),
      (15L, "update", "d1", "gD", l(350), l(800)),
      (16L, "delete", "e1", "gE", null, l(50)))
    def stateAt(at: Long) = {
      val live = scala.collection.mutable.Map[String, (String, Long)]()
      chs.filter(_._1 <= at).sortBy(_._1).foreach {
        case (_, "delete", pk, _, _, _) => live.remove(pk)
        case (_, _, pk, g, nv, _)       => live(pk) = (g, nv.longValue())
      }
      live.values.toSeq.toDF("group_key", "v")
    }
    val view1 = stateAt(10).groupBy("group_key").agg(max(col("v")).as("mx"))
    val win = chs.filter(c => c._1 > 10 && c._1 <= 20)
      .map(c => (c._4, Option(c._5).map(_.longValue()),
        Option(c._6).map(_.longValue())))
      .toDF("group_key", "new_v", "old_v")
    val out = IncrementalView.advanceMax(view1, win, stateAt(20))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("gA" -> 400L, "gB" -> 200L, "gC" -> 300L,
      "gD" -> 350L), s"got $out")
    assert(!out.contains("gE"), "an emptied group must disappear")
    // prunedness: handing advanceMax a state containing ONLY the groups
    // that genuinely need recompute must not change the answer — the
    // fast-path groups never read it
    val prunedState = stateAt(20)
      .filter(col("group_key").isin("gB", "gC", "gD"))
    val out2 = IncrementalView.advanceMax(view1, win, prunedState)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2 == out, "fast-path groups must not depend on the state scan")
  }
}
