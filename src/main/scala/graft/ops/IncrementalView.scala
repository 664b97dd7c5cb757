package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a CDC change stream —
  * the consumer-side payoff of change capture: a downstream aggregate kept
  * current by applying each window of changes, never by rescanning the
  * source table.
  *
  * The reference's change messages carry both row images — `record` (new)
  * and `changes` (old values, REPLICA IDENTITY FULL) — exactly so
  * consumers can maintain derived state from the stream alone
  * (`/root/reference/lib/sequin/runtime/message.ex:27-46`,
  * `/root/reference/lib/sequin/consumers/consumer_event.ex:27-56`; the
  * change-retention doc's replay workflow rebuilds downstream state from
  * retained changes, `/root/reference/docs/reference/change-retention.mdx`).
  * This op closes that loop for additive aggregates (COUNT / SUM / their
  * ratios): each change contributes `f(new image) - f(old image)`, so the
  * per-group deltas TELESCOPE — applying a window of changes moves the
  * view from cursor L1 exactly to cursor L2, regardless of how many times
  * a pk changed inside the window, with no joins and no access to the
  * base table.
  *
  * Scale shape (the whole point): [[delta]] is one partially-aggregated
  * `groupBy` over the window's changes — map-side combine shrinks it to
  * |touched groups| rows before the single shuffle; [[advance]] merges
  * that delta into the stored view with a second hash aggregate. Cost is
  * O(window changes + view size), independent of base-table size: at
  * 100 TB retained history, advancing last hour's view reads last hour's
  * changes, nothing else (combine with the epoch-pruned
  * `EventTableSink.changesBetween` scan and the read side is pruned too).
  *
  * Contracts:
  *   - contributions must be exact integers (cast to BIGINT internally) —
  *     FP addition is order-dependent and an incrementally-maintained
  *     double would drift from a recompute;
  *   - the group key must be immutable per pk (it is the business key;
  *     the reference's `group_id` has the same contract);
  *   - under replica-identity DEFAULT the old image can be absent
  *     (NULL-contribution = 0) — the view then tracks net-of-visible
  *     changes, the same degradation the reference's `changes` field has.
  */
object IncrementalView {

  /** One maintainable measure: the contribution of the NEW row image
    * (NULL for deletes) and of the OLD row image (NULL for inserts).
    * NULL contributes 0 — absent image, absent contribution.
    */
  final case class Measure(name: String, newContrib: Column, oldContrib: Column)

  /** Live-row count: insert +1, delete -1, update net 0. */
  def liveCount(action: Column, name: String = "n"): Measure =
    Measure(name,
      when(action =!= "delete", lit(1L)),
      when(action =!= "insert", lit(1L)))

  /** Sum of an integer-valued column over live rows: insert adds the new
    * value, update adds the new minus the old image's value, delete
    * removes the old image's value.
    */
  def sumOf(name: String, action: Column, newValue: Column,
      oldValue: Column): Measure =
    Measure(name,
      when(action =!= "delete", newValue),
      when(action =!= "insert", oldValue))

  /** The per-group delta of a window of changes: for every measure,
    * `sum(new-image contribution - old-image contribution)` grouped by
    * the (immutable) group key. A view at cursor L is `delta` over the
    * whole prefix `lsn <= L`; the output column `group_key` carries the
    * key, measure columns carry their [[Measure.name]]s.
    */
  def delta(changes: DataFrame, groupKey: Column,
      measures: Seq[Measure]): DataFrame = {
    require(measures.nonEmpty, "at least one measure")
    val aggs = measures.map { m =>
      sum(coalesce(m.newContrib.cast("bigint"), lit(0L)) -
          coalesce(m.oldContrib.cast("bigint"), lit(0L))).as(m.name)
    }
    changes.groupBy(groupKey.as("group_key")).agg(aggs.head, aggs.tail: _*)
  }

  /** Advance a stored view by one window of changes: `view@L1 union
    * delta(changes in (L1, L2])`, re-aggregated by key. Telescoping makes
    * the result exactly `view@L2`; groups the window never touched pass
    * through the hash aggregate unchanged (and with a pre-shuffled view,
    * never leave their partition). Groups whose every measure returns to
    * zero are kept — dropping them is a policy choice: filter on a
    * [[liveCount]] measure if empty groups should vanish.
    */
  def advance(view: DataFrame, windowChanges: DataFrame, groupKey: Column,
      measures: Seq[Measure]): DataFrame = {
    val d = delta(windowChanges, groupKey, measures)
    val aggs = measures.map(m => sum(col(m.name)).as(m.name))
    view.unionByName(d).groupBy(col("group_key")).agg(aggs.head, aggs.tail: _*)
  }

  /** ROLLUP form of [[delta]]: the per-level deltas of a maintained
    * SUBTOTAL board. Expand emits every rollup level of each change
    * map-side, so one window pass maintains all subtotal levels and the
    * grand total at once; `gid` (grouping_id) tags the level so NULL
    * group values in the data can never collide with a subtotal marker.
    * Keys must be immutable per pk, like [[delta]]'s.
    */
  def deltaRollup(changes: DataFrame, keys: Seq[Column],
      measures: Seq[Measure]): DataFrame = {
    require(measures.nonEmpty, "at least one measure")
    val aggs = grouping_id().as("gid") +: measures.map { m =>
      sum(coalesce(m.newContrib.cast("bigint"), lit(0L)) -
          coalesce(m.oldContrib.cast("bigint"), lit(0L))).as(m.name)
    }
    changes.rollup(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Advance a stored rollup board: union with the window's per-level
    * deltas, re-aggregated by (keys, gid). Each level telescopes
    * independently, so the whole subtotal hierarchy lands exactly on its
    * recompute at the new cursor — O(window × levels + board), never a
    * rescan.
    */
  def advanceRollup(view: DataFrame, windowChanges: DataFrame,
      keys: Seq[String], measures: Seq[Measure]): DataFrame = {
    val d = deltaRollup(windowChanges, keys.map(col), measures)
    val aggs = measures.map(m => sum(col(m.name)).as(m.name))
    view.unionByName(d).groupBy((keys :+ "gid").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incrementally maintain a per-group MAX — the NON-INVERTIBLE
    * aggregate the telescoping delta algebra cannot express (a delete
    * cannot "subtract" from a max). The production technique is a
    * monotone fast path plus BOUNDED partial recompute:
    *
    *   - groups whose window only RAISES (every change's new value ≥ its
    *     old, no removal at-or-above the stored max) advance as
    *     `greatest(stored, max(new values))` — no state access;
    *   - groups where a removal or lowering touches a value ≥ the stored
    *     max recompute from the state snapshot at the new cursor,
    *     PRUNED to exactly those groups (the join pushes the group keys
    *     into the state scan).
    *
    * Cost: O(window + affected groups' state rows), never O(table).
    * Soundness of the fast-path test: with a consistent view at L1,
    * every live value ≤ stored max, so removing the max row always has
    * `old ≥ stored max`; in-window churn chains keep the property
    * because a chained change's old image is the previous in-window
    * value, which the raise path already lifted past the stored max.
    *
    * Inputs: `view` = (group_key, mx) at L1; `window` = one row per
    * change in (L1, L2] with `new_v` (NULL for deletes) and `old_v`
    * (NULL when the row had no prior live image — the CDC old image);
    * `stateAtL2` = (group_key, v) live rows at L2 (e.g. a pruned
    * `EventTableSink.stateAsOf` read). Groups emptied at L2 disappear.
    */
  def advanceMax(view: DataFrame, window: DataFrame,
      stateAtL2: DataFrame): DataFrame = {
    val raises = window.filter(col("new_v").isNotNull)
      .groupBy("group_key").agg(max(col("new_v")).as("raise_mx"))
    // a change can threaten the stored max only by REMOVING or LOWERING
    // a value at-or-above it; groups with NO stored row (born inside the
    // window) treat the stored max as -∞, so any in-window lowering or
    // delete still routes them to recompute (a raise-then-lower chain in
    // a brand-new group must not surface the transient peak)
    val shrinkGroups = window.join(view, Seq("group_key"), "left_outer")
      .filter(col("old_v").isNotNull &&
        (col("new_v").isNull || col("new_v") < col("old_v")) &&
        col("old_v") >= coalesce(col("mx"), lit(Long.MinValue)))
      .select("group_key").distinct()
    val recomputed = stateAtL2.join(shrinkGroups, Seq("group_key"))
      .groupBy("group_key").agg(max(col("v")).as("mx"))
    val fast = view.join(shrinkGroups, Seq("group_key"), "left_anti")
      .join(raises.join(shrinkGroups, Seq("group_key"), "left_anti"),
        Seq("group_key"), "full_outer")
      .select(col("group_key"),
        greatest(coalesce(col("mx"), col("raise_mx")),
          coalesce(col("raise_mx"), col("mx"))).as("mx"))
    fast.unionByName(recomputed)
  }
}
