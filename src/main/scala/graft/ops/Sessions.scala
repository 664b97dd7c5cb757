package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (beyond the reference — the standard
  * event-stream analytics operator): events closer than `gapMicros` to
  * their predecessor (per key) belong to the same session.
  *
  * Batch form: one shuffle on the key — a lag + running-sum window pair
  * over `(key, ts)`, both reusing the same sort. Timestamps compare as
  * exact integer micros (no interval arithmetic), so session boundaries
  * are engine-reproducible.
  *
  * Streaming form: Spark's native `session_window` with a watermark —
  * state-store-backed, merges windows as late-but-in-watermark events
  * arrive, finalizes a session when event time passes gap + delay.
  */
object Sessions {

  /** Assign `session_idx` (0-based, per key, in time order) to each event.
    * `tieBreak` makes the intra-key order total when timestamps collide —
    * pass a unique id column.
    */
  def assign(df: DataFrame, key: String, tsCol: String, tieBreak: String,
      gapMicros: Long): DataFrame = {
    val order = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    val tsUs = unix_micros(col(tsCol))
    val prevUs = lag(unix_micros(col(tsCol)), 1).over(order)
    val isNew = when(prevUs.isNull || tsUs - prevUs > gapMicros, 1L)
      .otherwise(0L)
    df.withColumn("session_idx",
      (sum(isNew).over(order.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)) - lit(1)).cast("bigint"))
  }

  /** Per-session rollup: bounds, event count, exact integer-cents value sum.
    * Composes [[assign]]; the rollup groups by the SAME key the window
    * sorted by, so AQE coalesces without a second wide shuffle.
    */
  def rollup(df: DataFrame, key: String, tsCol: String, tieBreak: String,
      gapMicros: Long, valueCol: String): DataFrame =
    assign(df, key, tsCol, tieBreak, gapMicros)
      .groupBy(col(key), col("session_idx"))
      .agg(
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(round(col(valueCol) * 100).cast("bigint")).as("value_cents"))

  /** Streaming sessions: native `session_window` keyed state. Watermark
    * bounds the open-session state; a session closes (and emits, in append
    * mode) once event time passes its end + gap.
    */
  def streaming(df: DataFrame, key: String, tsCol: String, gap: String,
      watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(col(key), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(key), unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"), col("n_events"))
}
