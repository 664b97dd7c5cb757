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
    * cursor) — next cursor = last row's sort-key values, None when done.
    */
  def page(table: DataFrame, sortCols: Seq[String], cursor: Option[Seq[Any]],
      pageSize: Int): (DataFrame, Option[Seq[Any]]) = {
    val pageDf = Keyset.page(table, sortCols, cursor, pageSize)
    val rows = pageDf.select(sortCols.map(col): _*).collect()
    val next =
      if (rows.length < pageSize) None
      else Some(rows.last.toSeq)
    (pageDf.withColumn("action", lit("read")), next)
  }

  /** Full backfill loop with AIMD page sizing. `fence`: PKs already seen on
    * the live CDC stream during the scan (stale backfill rows dropped —
    * message_handler.ex:66-94). Returns the unioned read-event DataFrame.
    */
  def run(spark: SparkSession, table: DataFrame, sortCols: Seq[String],
      optimizer: PageSizeOptimizer,
      fence: Option[(DataFrame, Seq[String])] = None): DataFrame = {
    var cursor: Option[Seq[Any]] = None
    var done = false
    val pages = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (!done) {
      val t0 = System.nanoTime()
      val (pageDf, next) = page(table, sortCols, cursor, optimizer.pageSize)
      optimizer.record((System.nanoTime() - t0) / 1000000L)
      pages += pageDf
      cursor = next
      done = next.isEmpty
    }
    val all = pages.reduceOption(_.unionByName(_))
      .getOrElse(table.limit(0).withColumn("action", lit("read")))
    fence match {
      case Some((cdcSeen, keys)) => Joins.backfillFence(all, cdcSeen, keys)
      case None                  => all
    }
  }
}
