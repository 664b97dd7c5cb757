package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's four specialized joins (J1-J4), Spark-first.
  *
  * Scale notes: enrichment dimensions (customers, parts, config tables) are
  * small relative to the event stream, so J1 defaults to a broadcast hash
  * join — zero shuffle of the 100 TB fact side. The anti-joins (J3/J4, F7)
  * shuffle only the key columns after Catalyst prunes, and AQE converts them
  * to broadcast when the right side is small.
  */
object Joins {

  /** J1 — enrichment lookup join: attach dimension attributes to each event
    * by PK equality; missing match → NULLs
    * (`/root/reference/lib/sequin/consumers/consumers.ex:1656-1740`,
    * invoked per delivery batch in `sink_pipeline.ex:263-268`).
    *
    * The reference runs `WHERE id = ANY($pks)` against the source DB per
    * batch and hash-merges results; declaratively that is a left-outer
    * equi-join, and for small dims we force broadcast so the fact side never
    * shuffles.
    */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: Column, dimKey: Column,
      broadcastDim: Boolean = true): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    events.join(d, eventKey === dimKey, "left_outer")
  }

  /** J3 — backfill fencing: drop backfill rows whose PK appeared on the live
    * CDC stream during the batch window (CDC wins; stale-read fence)
    * (`/root/reference/lib/sequin/runtime/message_handler.ex:66-94`).
    */
  def backfillFence(backfill: DataFrame, cdcSeen: DataFrame, keys: Seq[String]): DataFrame =
    backfill.join(cdcSeen.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** F7/W6 (batch form) — delivered-message skip: drop messages whose
    * `(commit_lsn, commit_idx)` is already in the delivered ledger
    * (`/root/reference/lib/sequin/runtime/sink_pipeline.ex:244-247`,
    * `message_ledgers.ex:60-100`).
    */
  def rejectDelivered(batch: DataFrame, ledger: DataFrame): DataFrame =
    batch.join(ledger.select("commit_lsn", "commit_idx").distinct(),
      Seq("commit_lsn", "commit_idx"), "left_anti")

  /** J4 — ledger audit: keys present in the undelivered cursor set but
    * missing from the sink table = lost messages
    * (`/root/reference/lib/sequin/runtime/message_consistency_check_worker.ex`).
    */
  def auditLost(expected: DataFrame, sink: DataFrame, keys: Seq[String]): DataFrame =
    expected.join(sink.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** As-of join (beyond the reference — Spark has no built-in): attach to
    * each left row the LATEST right row with the same `keys` and
    * `rightTs <= leftTs` (the `>=` inequality DuckDB's ASOF JOIN uses);
    * no match → NULL payload (left-outer semantics). The state-at-event-time
    * primitive: "which dimension version / last heartbeat / prior action was
    * current when this event happened".
    *
    * NOT a range join (which would pair every in-window row, O(matches));
    * and not a per-probe sort: both sides are union-tagged and carried
    * forward by ONE `last(ignoreNulls)` running window per key — a single
    * shuffle on the join keys, O(n log n) within partitions, the same
    * partitioning delivery already uses. At 100 TB both sides stream
    * through one sort-merge pass; no driver-side state, no broadcast of
    * the (potentially huge) state side.
    *
    * Right rows sharing (keys, ts) are resolved deterministically: the
    * greatest `payload` struct (field order = `payload` order) wins —
    * pre-aggregate the right side if a different tie rule is wanted.
    *
    * `payload` columns must not collide with left column names (alias the
    * right side first); `rightTs` itself may be included in `payload` to
    * expose the matched version's timestamp.
    *
    * NULL handling matches DuckDB's ASOF JOIN (an equi+inequality join):
    * right rows with a NULL `rightTs` or NULL key are dropped up front —
    * otherwise NULL ts would sort first (asc = nulls first) and become
    * carry-forward state matching every later probe, and NULL keys would
    * pair with each other via the window partitioning.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val state = struct(payload.map(col): _*)
    val rightTagged = right
      .filter(col(rightTs).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(col(rightTs).as("__asof_ts"), lit(0).as("__side"),
          state.as("__state")): _*)
    val leftTagged = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__side", lit(1))
    // allowMissingColumns: left rows get a NULL __state, right rows get
    // NULL left columns (dropped after the probe filter)
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // state rows sort BEFORE the probes they qualify for (ts asc, side asc)
    // so `rightTs == leftTs` matches (>= semantics); among equal-ts state
    // rows the greatest __state is last and wins
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").asc, col("__side").asc, col("__state").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__match",
      last(col("__state"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__match.$p").as(p)): _*)
  }

  /** Banded range (interval) join — beyond the reference; the scale-safe
    * form of `points.ts BETWEEN intervals.start AND intervals.end` with
    * equality on `keys` (the attribution-window / maintenance-window /
    * point-in-validity-period shape). Handing Catalyst the raw inequality
    * pair yields a BroadcastNestedLoopJoin — an O(|points|·|intervals|)
    * pair space that is a cliff at 100 TB. Here both sides are mapped
    * onto fixed-width time bands (floor-div of BIGINT micros by
    * `bandMicros`), turning the join into an EQUI-join on (keys, band)
    * plus a residual filter: an interval explodes into one row per band
    * it touches, a point lives in exactly ONE band, so every qualifying
    * (point, interval) pair meets exactly once — no post-join dedup.
    *
    * Choose `bandMicros` ≈ the typical interval length: the explosion
    * factor stays ≤ 2 while the band key keeps temporally-unrelated rows
    * out of the same shuffle bucket. Banding uses true floor division
    * (`(x - pmod(x, w)) div w`), so negative epochs band correctly —
    * plain `div` truncates toward zero and would shift pre-1970 rows by
    * one band. Inner-join semantics (recover unmatched intervals with a
    * left_anti if needed); NULL keys or bounds drop, as in SQL. Hot keys
    * compose with [[Skew.saltedJoin]] upstream. Column names must not
    * collide across the two sides (alias first), and the three ts
    * columns are BIGINT micros.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointTs: String, startCol: String, endCol: String,
      bandMicros: Long): DataFrame = {
    require(bandMicros > 0, s"bandMicros must be positive: $bandMicros")
    def bandOf(c: String): Column =
      expr(s"(($c - pmod($c, ${bandMicros}L)) div ${bandMicros}L)")
    val p = points.withColumn("__band", bandOf(pointTs))
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__band",
        explode(sequence(bandOf(startCol), bandOf(endCol))))
    p.join(iv, keys :+ "__band")
      .filter(col(startCol) <= col(pointTs) && col(pointTs) <= col(endCol))
      .drop("__band")
  }
}
