package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization (beyond the reference — the resampling
  * step every metrics/feature pipeline runs before model input): project
  * irregular observations onto a fixed-step grid with
  * last-observation-carried-forward AND exact linear interpolation.
  *
  * The naive formulation joins every grid point against every
  * observation in range (O(grid × obs) pair space, a
  * BroadcastNestedLoopJoin cliff). Here both neighbors come from ONE
  * union merge-sort: observations and grid probes share a single
  * shuffle on the key; a forward running window carries the latest
  * observation ≤ h, a backward one the earliest ≥ h — the [[Joins.asOf]]
  * discipline, run in both directions over one exchange (two sorts, no
  * second shuffle, no per-probe scan).
  *
  * All value arithmetic is exact integer cents/micros; interpolation
  * uses portable floor division (`(n - pmod(n, d)) div d` — the
  * subtraction makes the quotient exact, so truncating `div` IS floor
  * and every engine agrees, negative slopes included).
  */
object TimeSeries {

  /** Fixed-step gap fill per key over `[ceil(min ts), floor(max ts)]`
    * grid points (both neighbors therefore always exist). Input rows:
    * `keyCol`, `tsMicros` (bigint epoch micros, non-negative), and
    * `valueCents` (bigint). Multiple observations on one exact
    * microsecond resolve to their max (deterministic; pre-aggregate for
    * a different rule).
    *
    * Returns `(key, h_us, locf_cents, interp_cents)` — one row per grid
    * point: the carried-forward value and the linear interpolation
    * between the bracketing observations (equal-neighbor grid points,
    * i.e. an observation exactly on the grid, return it unchanged).
    */
  def gapFill(df: DataFrame, keyCol: String, tsMicros: String,
      valueCents: String, stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"grid step must be positive: $stepMicros")
    val obs = df
      .filter(col(tsMicros).isNotNull && col(keyCol).isNotNull &&
        col(valueCents).isNotNull)
      .groupBy(col(keyCol), col(tsMicros).cast("long").as("t"))
      .agg(max(col(valueCents)).cast("long").as("v"))
    // per-key grid bounds; ts >= 0 so truncating div is floor
    val grid = obs.groupBy(col(keyCol))
      .agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
      .select(col(keyCol),
        expr(s"(mn + ${stepMicros - 1}L) div ${stepMicros}L * " +
          s"${stepMicros}L").as("gs"),
        expr(s"mx div ${stepMicros}L * ${stepMicros}L").as("ge"))
      .filter(col("gs") <= col("ge"))
      .select(col(keyCol),
        explode(sequence(col("gs"), col("ge"), lit(stepMicros))).as("t"))
    val states = obs.select(col(keyCol), col("t"), lit(0).as("kind"),
      col("v"))
    val probes = grid.select(col(keyCol), col("t"), lit(1).as("kind"),
      lit(null).cast("long").as("v"))
    // state rows order before an equal-ts probe in BOTH directions, so a
    // grid point landing exactly on an observation sees it as prev AND next
    val wAsc = Window.partitionBy(col(keyCol))
      .orderBy(col("t").asc, col("kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(col(keyCol))
      .orderBy(col("t").desc, col("kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = when(col("kind") === 0, struct(col("t").as("ot"),
      col("v").as("ov")))
    val den = col("n").getField("ot") - col("p").getField("ot")
    val num = (col("n").getField("ov") - col("p").getField("ov")) *
      (col("t") - col("p").getField("ot"))
    states.unionByName(probes)
      .withColumn("p", last(st, ignoreNulls = true).over(wAsc))
      .withColumn("n", last(st, ignoreNulls = true).over(wDesc))
      .filter(col("kind") === 1)
      .withColumn("__num", num)
      .withColumn("__den", den)
      .select(col(keyCol), col("t").as("h_us"),
        col("p").getField("ov").as("locf_cents"),
        when(col("__den") === 0, col("p").getField("ov"))
          .otherwise(col("p").getField("ov") +
            expr("(__num - pmod(__num, __den)) div __den"))
          .as("interp_cents"))
  }
}
