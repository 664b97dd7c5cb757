package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream (beyond the reference —
  * these are the queries its users run downstream of delivery, expressed
  * engine-side): ordered-step funnels, event-transition matrices, cohort
  * retention. All integer micros end to end; every op is one-or-few
  * map-side-combinable aggregations over a single (user) shuffle — no
  * self-joins of the raw event table against itself.
  */
object Behavior {

  /** Ordered-step funnel: for each user, the earliest strictly-ordered
    * completion chain through `steps` — t1 = min ts of step 1,
    * t_i = min ts of step i AFTER t_{i-1} — plus the reached depth.
    * Users who never hit step 1 are excluded (depth-0 rows carry no
    * information the total user count doesn't).
    *
    * Scale shape: the chained conditional minima are whole-partition
    * window aggregates over ONE hash partitioning on `userCol` — k steps
    * cost k Window passes over the same Exchange, not k self-joins of
    * the 100 TB event table. `tsCol` is BIGINT micros.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame =
    funnel(events, userCol, tsCol, typeCol, steps, maxGapUs = None)

  /** Funnel with an optional per-step CONVERSION WINDOW: step i counts
    * only within `maxGapUs` of step i-1 (the "converted within an hour"
    * form), FIRST-TOUCH ANCHORED: the chain is anchored at each step's
    * EARLIEST qualifying occurrence (the standard product-analytics
    * "first" counting mode). This is a deliberate semantics choice, not
    * an optimization: a user whose first anchor times out but whose
    * later anchor would have converted counts as NOT converted — the
    * any-anchor variant is a different (and quadratic-leaning) query.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGapUs: Option[Long]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapUs.forall(_ > 0), "maxGapUs must be positive")
    val w = Window.partitionBy(userCol)
    val withTs = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else {
          val after = col(typeCol) === step && col(tsCol) > col(s"t${i}_us")
          maxGapUs match {
            case Some(gap) =>
              after && col(tsCol) <= col(s"t${i}_us") + lit(gap)
            case None => after
          }
        }
      df.withColumn(s"t${i + 1}_us", min(when(cond, col(tsCol))).over(w))
    }
    val tCols = steps.indices.map(i => s"t${i + 1}_us")
    // t_i non-null implies t_{i-1} non-null (the chain), so depth is just
    // the count of reached stages
    val depth = tCols.map(c => when(col(c).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    withTs
      .groupBy(col(userCol))
      .agg(max(col(tCols.head)).as(tCols.head),
        tCols.tail.map(c => max(col(c)).as(c)): _*)
      .filter(col(tCols.head).isNotNull)
      .withColumn("depth", depth.cast("int"))
  }

  /** Event-type transition matrix: adjacent-pair counts in each user's
    * ts-ordered stream, with the per-source total and an integer
    * parts-per-million transition probability (exact `div` — no FP).
    * `tieCol` breaks equal-ts ordering deterministically.
    *
    * One (user) shuffle for the lead window, then two tiny aggregations
    * over the |types|² pair space.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
    pairs
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy("from_type")))
      .withColumn("prob_ppm", expr("(n * 1000000L) div n_from"))
  }

  /** Trailing-window anomaly flags: an event is anomalous when its value
    * deviates from the mean of the user's previous `lookback` values by
    * more than `kSigma` standard deviations. The z² test is cross-
    * multiplied into exact integers — with n = window count, s = Σc,
    * q = Σc², flag iff `(n·c − s)² > k²·(n·q − s²)` — so there is no FP
    * mean/variance anywhere and the flags are engine-reproducible.
    *
    * Scale shape: one hash partitioning on `userCol`, one bounded-frame
    * window pass (three running sums share the frame); no self-join of
    * the event table against its own history.
    */
  def anomalies(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, centsCol: String, lookback: Int = 20,
      minN: Int = 10, kSigma: Int = 3): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, -1)
    val c = col(centsCol)
    val flagged = events
      .withColumn("win_n", count(c).over(w).cast("bigint"))
      .withColumn("__s", sum(c).over(w))
      .withColumn("__q", sum(c * c).over(w))
      .withColumn("dev2",
        (col("win_n") * c - col("__s")) * (col("win_n") * c - col("__s")))
      .withColumn("thr", lit(kSigma.toLong * kSigma) *
        (col("win_n") * col("__q") - col("__s") * col("__s")))
    flagged
      .filter(col("win_n") >= minN && col("dev2") > col("thr"))
      .drop("__s", "__q")
  }

  /** Per-key time-weighted average: each event's value is "held" until
    * the key's next event; the TWAP is Σ(c·Δus) div Σ(Δus) in exact
    * integer arithmetic (the final event has no holding period and drops
    * out, as in any last-price-carried series). One lead window over one
    * (key, ts) sort, then a map-side-combinable aggregation.
    */
  def timeWeightedAvg(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, centsCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__next", lead(col(tsCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .withColumn("__dur", col("__next") - col(tsCol))
      .groupBy(col(userCol))
      .agg(count(lit(1)).cast("bigint").as("n_holds"),
        sum(col("__dur")).cast("bigint").as("held_us"),
        sum(col(centsCol) * col("__dur")).cast("bigint").as("weighted"))
      .withColumn("twap_cents", expr("weighted div held_us"))
  }

  /** DAU/WAU stickiness: per day, the distinct actives that day (DAU),
    * the distinct actives over the trailing 7 days (WAU), and their
    * ratio in exact ppm. Distinct-over-a-sliding-window does NOT
    * decompose from daily distincts, so each (user, day) row fans out to
    * the ≤7 window-end days it supports — a bounded explode over the
    * ALREADY-deduplicated user-day table (one row per user-day, never
    * raw events), then one distinct + count per window.
    */
  def stickiness(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val dayUs = 86400000000L
    val active = events
      .select(col(userCol), expr(s"$tsCol div ${dayUs}L").as("d"))
      .distinct()
    val dau = active.groupBy(col("d"))
      .agg(count(lit(1)).cast("bigint").as("dau"))
    val wau = active
      .select(col(userCol),
        explode(sequence(col("d"), col("d") + 6)).as("w"))
      .distinct()
      .groupBy(col("w"))
      .agg(count(lit(1)).cast("bigint").as("wau"))
    dau.join(wau, col("d") === col("w"))
      .select(col("d").as("day"), col("dau"), col("wau"),
        expr("(dau * 1000000) div wau").as("stickiness_ppm"))
  }

  /** Weekly cohort retention: users bucketed by the epoch-week of their
    * first event (the cohort), counted once per (cohort, week-offset)
    * they were active in. The classic retention triangle.
    *
    * Scale shape: the raw table collapses to distinct (user, week) FIRST
    * (map-side combined), so the cohort join touches one row per
    * user-week, never raw events; the cohort side is one row per user.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val weekUs = 7L * 86400 * 1000000
    val active = events
      .select(col(userCol), expr(s"$tsCol div ${weekUs}L").as("wk"))
      .distinct()
    val cohorts = active.groupBy(userCol).agg(min("wk").as("cohort_wk"))
    active.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_wk"),
        (col("wk") - col("cohort_wk")).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Multi-touch attribution: each conversion event is credited from the
    * touch set since the user's previous conversion — first-touch type,
    * last-touch type, and exact-integer linear credit (`value_cents div
    * n` to every touch, the remainder to the last touch, so credit sums
    * to the conversion value EXACTLY — no FP split). Conversions with no
    * preceding touch keep the full value as `remainder_cents` (organic).
    * Touches after a user's last conversion credit nothing.
    *
    * Journey assignment is a running conversion counter, not a time-range
    * join: a touch with k conversions strictly before it belongs to
    * conversion k+1. Scale shape: ONE hash partitioning on `userCol`
    * serves the counter window, the (user, conv_idx) equi-join (both
    * sides inherit the partitioning), and the per-journey aggregate —
    * never a raw-event self-join on time ranges.
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, valueCol: String,
      convType: String, touchTypes: Seq[String]): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touch types must be non-empty and disjoint from the conversion type")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = events
      .withColumn("__cents", round(col(valueCol) * 100).cast("bigint"))
      .withColumn("__cum",
        sum((col(typeCol) === convType).cast("int")).over(w))
    val conv = cum.filter(col(typeCol) === convType)
      .select(col(userCol), col("__cum").as("conv_idx"),
        col(tieCol).as("conv_event_id"), col("__cents").as("value_cents"))
    val touches = cum.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), (col("__cum") + 1).as("conv_idx"),
        col(tsCol).as("t_ts"), col(tieCol).as("t_id"),
        col(typeCol).as("t_type"))
    val wa = Window.partitionBy(col(userCol), col("conv_idx"))
      .orderBy(col("t_ts"), col("t_id"))
    val wd = Window.partitionBy(col(userCol), col("conv_idx"))
      .orderBy(col("t_ts").desc, col("t_id").desc)
    val agg = touches
      .withColumn("__ra", row_number().over(wa))
      .withColumn("__rd", row_number().over(wd))
      .groupBy(col(userCol), col("conv_idx"))
      .agg(count(lit(1)).as("n_touches"),
        max(when(col("__ra") === 1, col("t_type"))).as("first_touch"),
        max(when(col("__rd") === 1, col("t_type"))).as("last_touch"))
    conv.join(agg, Seq(userCol, "conv_idx"), "left_outer")
      .select(col(userCol), col("conv_idx"), col("conv_event_id"),
        col("value_cents"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        col("first_touch"), col("last_touch"))
      .withColumn("per_touch_cents",
        when(col("n_touches") > 0,
          expr("value_cents div n_touches")).otherwise(lit(0L)))
      .withColumn("remainder_cents",
        when(col("n_touches") > 0, col("value_cents") % col("n_touches"))
          .otherwise(col("value_cents")))
  }
}
