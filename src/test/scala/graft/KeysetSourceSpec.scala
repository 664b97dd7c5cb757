package graft

import graft.ops.Keyset
import graft.sources.{KeysetParquet, KeysetParquetProvider}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Tuple-keyset DSv2 source (§7.4): the full row-value comparison reaches
  * the scan as a pushed filter, row groups are pruned conservatively via
  * footer stats, and results are byte-identical to the built-in parquet
  * source on the same queries.
  */
class KeysetSourceSpec extends SparkSpec {

  private def srcName = classOf[KeysetParquetProvider].getName
  private def ordersPath = s"${sf("sf0.01")}/orders.parquet"

  test("DSv2 source reproduces spark.read.parquet exactly (schema + rows)") {
    val v2 = spark.read.format(srcName).load(ordersPath)
    val v1 = spark.read.parquet(ordersPath)
    assert(v2.schema == v1.schema)
    assert(v2.count() == v1.count())
    val a = v2.orderBy("o_orderkey").collect()
    val b = v1.orderBy("o_orderkey").collect()
    assert(a.sameElements(b))
  }

  test("q01/q02/q03 keyset queries stay green against the DSv2 source") {
    val cursor = Seq(java.time.LocalDateTime.parse("1995-06-01T00:00:00"), 3000L)
    val cols = Seq("o_orderdate", "o_orderkey")

    val v2 = spark.read.format(srcName).load(ordersPath)
    val v1 = spark.read.parquet(ordersPath)

    val page2 = Keyset.page(v2, cols, Some(cursor), 100)
      .select("o_orderkey", "o_orderdate", "o_totalprice").collect()
    val page1 = Keyset.page(v1, cols, Some(cursor), 100)
      .select("o_orderkey", "o_orderdate", "o_totalprice").collect()
    assert(page2.sameElements(page1))

    val n2 = Keyset.remainingCount(v2, cols, cursor).head().getLong(0)
    val n1 = Keyset.remainingCount(v1, cols, cursor).head().getLong(0)
    assert(n2 == n1)

    val f2 = Keyset.firstRow(v2, cols).select("o_orderkey").head().getLong(0)
    val f1 = Keyset.firstRow(v1, cols).select("o_orderkey").head().getLong(0)
    assert(f2 == f1)
  }

  test("the FULL tuple predicate lands in the DSv2 pushed filters") {
    val v2 = spark.read.format(srcName).load(ordersPath)
    val page = Keyset.page(v2, Seq("o_orderdate", "o_orderkey"),
      Some(Seq(java.time.LocalDateTime.parse("1995-06-01T00:00:00"), 3000L)), 100)
    val plan = page.queryExecution.executedPlan.toString
    // the Or(GreaterThan, And(EqualTo, GreaterThan)) tree — not just the
    // leading bound — reaches the scan
    assert(plan.contains("PushedFilters"), plan.take(2000))
    assert(plan.contains("Or(GreaterThan(o_orderdate"), plan.take(2000))
    assert(plan.contains("And(EqualTo(o_orderdate"), plan.take(2000))
    assert(plan.contains("GreaterThan(o_orderkey,3000)"), plan.take(2000))
    // column pruning reached the source too
    assert(plan.contains("graft-keyset"), plan.take(2000))
  }

  test("row-group stats pruning: conservative tri-state evaluation") {
    val schema = StructType(Seq(StructField("d", LongType),
      StructField("k", LongType)))
    // one row group with d in [10, 20], k in [100, 200]
    val stats = Map[String, (Any, Any)](
      "d" -> (BigDecimal(10), BigDecimal(20)),
      "k" -> (BigDecimal(100), BigDecimal(200)))
    val tuple = Or(GreaterThan("d", 30L),
      And(EqualTo("d", 30L), GreaterThan("k", 5L)))
    assert(!KeysetParquet.couldMatch(tuple, stats, schema)) // d never > 30 nor = 30
    val tupleLow = Or(GreaterThan("d", 15L),
      And(EqualTo("d", 15L), GreaterThan("k", 500L)))
    assert(KeysetParquet.couldMatch(tupleLow, stats, schema)) // d can be > 15
    val tupleEq = Or(GreaterThan("d", 20L),
      And(EqualTo("d", 20L), GreaterThan("k", 150L)))
    assert(KeysetParquet.couldMatch(tupleEq, stats, schema)) // d = 20 ∧ k can be > 150
    val tupleEqHigh = Or(GreaterThan("d", 20L),
      And(EqualTo("d", 20L), GreaterThan("k", 300L)))
    assert(!KeysetParquet.couldMatch(tupleEqHigh, stats, schema)) // k never > 300
    // unknown columns / cross-domain comparisons never prune
    assert(KeysetParquet.couldMatch(GreaterThan("missing", 1L), stats, schema))
    assert(KeysetParquet.couldMatch(GreaterThan("d", "not-a-number"), stats, schema))
    assert(KeysetParquet.couldMatch(IsNotNull("d"), stats, schema))
  }

  test("planInputPartitions prunes row groups a cursor has passed") {
    // multi-row-group file: write orders sorted by the cursor tuple with
    // small row groups so later cursors can prune earlier groups
    val dir = java.nio.file.Files.createTempDirectory("graft_keyset_rg").toString
    spark.read.parquet(ordersPath)
      .orderBy("o_orderdate", "o_orderkey")
      .coalesce(1)
      .write.option("parquet.block.size", "65536")
      .mode("overwrite").parquet(dir)

    val file = KeysetParquet.listFiles(dir).head
    val (_, blocks) = KeysetParquet.footerBlocks(file)
    assume(blocks.size > 1, s"need multiple row groups, got ${blocks.size}")

    val v2 = spark.read.format(srcName).load(file)
    val lateCursor = Seq(java.time.LocalDateTime.parse("1998-06-01T00:00:00"), 0L)
    val page = Keyset.page(v2, Seq("o_orderdate", "o_orderkey"),
      Some(lateCursor), 10)
    // correctness against built-in parquet on the same file
    val expect = Keyset.page(spark.read.parquet(file),
      Seq("o_orderdate", "o_orderkey"), Some(lateCursor), 10)
      .select("o_orderkey").collect().map(_.getLong(0))
    val got = page.select("o_orderkey").collect().map(_.getLong(0))
    assert(got.sameElements(expect))
    // and the scan planned fewer partitions than row groups
    val scans = page.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.inputPartitions.size < blocks.size,
      s"expected pruning: ${scans.head.inputPartitions.size} of ${blocks.size}")
  }

  test("fastRemainingCount: metadata-exact on sorted layout, graceful on unsorted, null cursor rows excluded") {
    import org.apache.spark.sql.functions._
    val cols = Seq("o_orderdate", "o_orderkey")
    val after = Seq(java.time.LocalDateTime.parse("1996-01-01T00:00:00"), 0L)
    val expect = Keyset.remainingCount(spark.read.parquet(ordersPath),
      cols, after).head().getLong(0)

    // SORTED layout, small row groups: most groups are provably past the
    // cursor and counted from footers alone; only straddlers scan
    val sorted = java.nio.file.Files.createTempDirectory("graft_fc_sorted").toString
    spark.read.parquet(ordersPath).orderBy("o_orderdate", "o_orderkey")
      .coalesce(1).write.option("parquet.block.size", "65536")
      .mode("overwrite").parquet(sorted)
    val (metaRows, boundary, total) =
      Keyset.classifyBlocks(spark, sorted, cols, after)
    assume(total > 3, s"need several row groups, got $total")
    assert(boundary.size < total,
      s"metadata path never engaged: ${boundary.size} boundary of $total")
    assert(metaRows > 0, "no fully-contained group was metadata-counted")
    assert(Keyset.fastRemainingCount(spark, sorted, cols, after)
      .head().getLong(0) == expect)

    // UNSORTED layout (hash-shuffled): groups straddle, boundary scan
    // dominates — still exact
    val unsorted = java.nio.file.Files.createTempDirectory("graft_fc_unsorted").toString
    spark.read.parquet(ordersPath).repartition(4, col("o_orderkey"))
      .write.mode("overwrite").parquet(unsorted)
    assert(Keyset.fastRemainingCount(spark, unsorted, cols, after)
      .head().getLong(0) == expect)

    // null cursor values never satisfy the tuple predicate: rows with a
    // null o_orderdate must not be metadata-counted or scanned into the
    // total (stats min/max can still look fully-past-the-cursor)
    val withNulls = java.nio.file.Files.createTempDirectory("graft_fc_nulls").toString
    val base = spark.read.parquet(ordersPath)
    base.withColumn("o_orderdate",
        when(col("o_orderkey") % 100 === 0, lit(null)
          .cast(base.schema("o_orderdate").dataType))
        .otherwise(col("o_orderdate")))
      .orderBy("o_orderdate", "o_orderkey").coalesce(1)
      .write.option("parquet.block.size", "65536")
      .mode("overwrite").parquet(withNulls)
    val expectNulls = Keyset.remainingCount(
      spark.read.parquet(withNulls), cols, after).head().getLong(0)
    assert(Keyset.fastRemainingCount(spark, withNulls, cols, after)
      .head().getLong(0) == expectNulls)
  }

  test("fastRemainingCount: exact under a non-UTC session (mixed-domain cursor)") {
    // a LocalDateTime cursor against an instant-domain (isAdjustedToUTC)
    // column: Spark's residual filter casts the literal via the SESSION
    // timezone, so footer-stat classification must use the same instant —
    // an all-UTC stats interpretation counts the wrong groups as fully-in
    val cols = Seq("o_orderdate", "o_orderkey")
    val after = Seq(java.time.LocalDateTime.parse("1996-01-01T00:00:00"), 0L)
    val sorted = java.nio.file.Files.createTempDirectory("graft_fc_tz").toString
    spark.read.parquet(ordersPath).orderBy("o_orderdate", "o_orderkey")
      .coalesce(1).write.option("parquet.block.size", "65536")
      .mode("overwrite").parquet(sorted)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      // +05:45 — a non-whole-hour offset catches sub-hour drift too
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
      val expect = Keyset.remainingCount(spark.read.parquet(sorted),
        cols, after).head().getLong(0)
      assert(Keyset.fastRemainingCount(spark, sorted, cols, after)
        .head().getLong(0) == expect)
      // and the metadata path still engages (the DST slack band only
      // downgrades groups NEAR the cursor, not the whole layout)
      val (metaRows, boundary, total) =
        Keyset.classifyBlocks(spark, sorted, cols, after)
      assert(total > 3 && boundary.size < total && metaRows > 0,
        s"metadata path: $metaRows meta rows, ${boundary.size} of $total boundary")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("encodeBlocks/decodeBlocks: per-file grouped wire form roundtrips") {
    import graft.sources.KeysetRowGroupPartition
    val bs = Seq(
      KeysetRowGroupPartition("/data/part-0001.parquet", 4L, 1048576L),
      KeysetRowGroupPartition("/data/part-0001.parquet", 1048580L, 524288L),
      KeysetRowGroupPartition("/data/part-0002.parquet", 4L, 65536L))
    val wire = KeysetParquet.encodeBlocks(bs)
    assert(KeysetParquet.decodeBlocks(wire) == bs)
    // each path appears ONCE regardless of its group count — the wire
    // form is O(files + groups·digits), not O(groups·path-length)
    assert("part-0001\\.parquet".r.findAllIn(wire).length == 1)
    assert(KeysetParquet.decodeBlocks(KeysetParquet.encodeBlocks(Seq.empty))
      == Seq.empty)
  }
}
