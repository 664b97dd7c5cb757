package graft.backfill

import graft.ops.{Joins, Keyset}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** AIMD page-size controller for backfill scans — the reference's
  * PageSizeOptimizer (`/root/reference/lib/sequin/runtime/
  * page_size_optimizer.ex`, 175 LoC): additively grow the page while
  * batches come back under the time budget, multiplicatively back off on
  * timeout.
  */
final class PageSizeOptimizer(
    initialPageSize: Int,
    maxTimeoutMs: Long,
    growFactor: Double = 1.25,
    backoffFactor: Double = 0.5,
    maxPageSize: Int = 50000) {
  private var current = initialPageSize

  def pageSize: Int = current

  /** Feed back one batch's observed latency. */
  def record(tookMs: Long): Unit = {
    current =
      if (tookMs > maxTimeoutMs) math.max(1, (current * backoffFactor).toInt)
      else math.min(maxPageSize, math.max(current + 1, (current * growFactor).toInt))
  }
}

/** Keyset-paginated backfill: page a table in `(sortCols)` tuple order,
  * emitting `action = "read"` CDC events per page, with CDC-stream fencing
  * (`SURVEY.md` S6-S8, `/root/reference/lib/sequin/runtime/
  * table_reader_server.ex`).
  *
  * The driver-side loop advances the cursor (like the reference's
  * GenStateMachine); each page is a distributed, pushdown-friendly scan —
  * at 100 TB the same loop runs against a JDBC/DSv2 source with the tuple
  * predicate pushed to the database, and pages parallelize into cursor
  * ranges.
  */
object Backfill {

  /** One page: rows after `cursor`, as read-events; returns (events, next
    * cursor, rowCount).
    *
    * The next cursor is read with a desc-sort + limit 1 — ONE collected
    * row, regardless of page size (the reference reads `max_cursor` the
    * same way, table_reader.ex:221-298). The page row count comes from a
    * distributed count, so the driver never holds page-sized data.
    */
  def page(table: DataFrame, sortCols: Seq[String], cursor: Option[Seq[Any]],
      pageSize: Int): (DataFrame, Option[Seq[Any]], Long) = {
    val pageDf = Keyset.page(table, sortCols, cursor, pageSize)
    val n = pageDf.count()
    val next = if (n < pageSize) None else maxCursor(pageDf, sortCols)
    (pageDf.withColumn("action", lit("read")), next, n)
  }

  /** Max cursor tuple of a page — desc-sort + limit 1, ONE collected row;
    * None for an empty page.
    */
  private def maxCursor(df: DataFrame, sortCols: Seq[String]): Option[Seq[Any]] =
    df.select(sortCols.map(col): _*)
      .orderBy(sortCols.map(c => col(c).desc): _*).limit(1)
      .collect().headOption.map(_.toSeq)

  /** Full backfill loop with AIMD page sizing. `fence`: PKs already seen on
    * the live CDC stream during the scan (stale backfill rows dropped —
    * message_handler.ex:66-94). Returns the read-event DataFrame.
    *
    * Each page is MATERIALIZED to a spool directory as it is produced —
    * the reference likewise streams pages out rather than holding the
    * scan (`table_reader_server.ex` flushes batches to the consumer as
    * they arrive). The returned DataFrame reads the spool, so every page
    * was scanned exactly once and the plan is a flat parquet read, not an
    * O(pages)-deep union whose consumption would re-run every page's
    * filter+sort+limit against the table.
    */
  def run(spark: SparkSession, table: DataFrame, sortCols: Seq[String],
      optimizer: PageSizeOptimizer,
      fence: Option[(DataFrame, Seq[String])] = None,
      spoolDir: Option[String] = None): DataFrame = {
    val spool = spoolDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_backfill_spool").toString)
    // Crash resume: completed pages already in the spool are not re-read
    // from the table — the cursor restarts from the LAST completed page's
    // max tuple, the reference's persisted `cursor` semantics
    // (table_reader_server.ex keeps the backfill cursor in Redis/pg so an
    // interrupted scan continues, not restarts). A page left half-written
    // by the crash is dropped (no _SUCCESS marker) and re-scanned.
    var pageNo = firstIncompletePage(spool)
    var done = java.nio.file.Files.exists(
      java.nio.file.Paths.get(spool).resolve(DoneMarker))
    // resume cursor from the last completed page's max tuple; None for an
    // empty last page (crash between writing a final empty page and its
    // cleanup) — and not computed at all when _DONE skips the loop
    var cursor: Option[Seq[Any]] =
      if (pageNo == 0 || done) None
      else maxCursor(spark.read.parquet(s"$spool/page=${pageNo - 1}"), sortCols)
    if (!done && pageNo > 0 && cursor.isEmpty) {
      // the last "completed" page is EMPTY: it was the end-of-table probe;
      // drop it and finish (the loop would only rewrite an empty page)
      deleteDir(s"$spool/page=${pageNo - 1}")
      pageNo -= 1
      cursor =
        if (pageNo == 0) None
        else maxCursor(spark.read.parquet(s"$spool/page=${pageNo - 1}"), sortCols)
    }
    while (!done) {
      val t0 = System.nanoTime()
      val pageSize = optimizer.pageSize
      // ONE table scan per page: materialize, then read count + cursor
      // from the (small) materialized page, not from the table again
      val pageDir = s"$spool/page=$pageNo"
      Keyset.page(table, sortCols, cursor, pageSize)
        .withColumn("action", lit("read"))
        .write.mode("overwrite").parquet(pageDir)
      val written = spark.read.parquet(pageDir)
      val n = written.count() // parquet footer metadata — no row scan
      optimizer.record((System.nanoTime() - t0) / 1000000L)
      if (n < pageSize) done = true
      else cursor = Some(written.select(sortCols.map(col): _*)
        .orderBy(sortCols.map(c => col(c).desc): _*).limit(1)
        .head().toSeq)
      if (n == 0) deleteDir(pageDir) else pageNo += 1
      if (done) java.nio.file.Files.createFile(
        java.nio.file.Paths.get(spool).resolve(DoneMarker))
    }
    val all =
      if (pageNo > 0) spark.read.parquet(s"$spool/page=*")
      else table.limit(0).withColumn("action", lit("read"))
    fence match {
      case Some((cdcSeen, keys)) => Joins.backfillFence(all, cdcSeen, keys)
      case None                  => all
    }
  }

  /** The fully parallel form: ONE range-partitioned scan instead of the
    * sequential page loop. `repartitionByRange` samples cursor-tuple
    * boundaries and gives every executor a contiguous cursor range —
    * equivalent to precomputing all page cursors up front and scanning
    * the ranges concurrently. Order holds within and ACROSS partitions
    * (range partitioning is globally ordered), so downstream consumers
    * see the same cursor order the paged loop produces. Use this when
    * the source tolerates a full parallel scan (snapshot/parquet/Iceberg);
    * the paged [[run]] remains the shape for sources that must be read
    * gently (a production primary behind a `LIMIT`ed keyset query).
    */
  def runPartitioned(table: DataFrame, sortCols: Seq[String],
      numRanges: Int,
      fence: Option[(DataFrame, Seq[String])] = None): DataFrame = {
    val scanned = table
      .repartitionByRange(numRanges, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .withColumn("action", lit("read"))
    fence match {
      case Some((cdcSeen, keys)) => Joins.backfillFence(scanned, cdcSeen, keys)
      case None                  => scanned
    }
  }

  private val DoneMarker = "_DONE"

  /** Count the leading run of COMPLETE pages (`_SUCCESS` present) in the
    * spool and delete any half-written later page dirs (crash debris) so
    * the resumed loop rewrites them from a clean slate.
    */
  private def firstIncompletePage(spool: String): Int = {
    val root = java.nio.file.Paths.get(spool)
    if (!java.nio.file.Files.exists(root)) return 0
    var i = 0
    while (java.nio.file.Files.exists(
        root.resolve(s"page=$i").resolve("_SUCCESS"))) i += 1
    var j = i
    while (java.nio.file.Files.exists(root.resolve(s"page=$j"))) {
      deleteDir(root.resolve(s"page=$j").toString); j += 1
    }
    i
  }

  private def deleteDir(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.reverse.foreach(f => scala.util.Try(java.nio.file.Files.delete(f)))
    }
  }
}
