package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union analytics via a sweep line (beyond the reference — the
  * standard "total covered time" report over possibly-overlapping spans:
  * uptime, activity coverage, SLA windows).
  *
  * The naive formulation self-joins intervals against intervals to find
  * overlaps — O(n²) per key and a BroadcastNestedLoopJoin cliff at 100 TB.
  * The sweep needs ONE hash partitioning on the key and two window passes
  * over the same sort: an interval starts a new covered span iff its start
  * lies strictly past the running max end of every earlier interval
  * (classic merge-overlapping-intervals), then spans aggregate per key.
  * All arithmetic is exact integer micros.
  */
object Intervals {

  /** Per-key union coverage over `[startCol, endCol)` micro intervals:
    * `n_intervals` raw rows, `n_spans` merged disjoint spans, `covered_us`
    * total union length. Touching intervals (start == running end) merge
    * (half-open semantics). `tieCol` totalizes the sweep order under
    * equal (start, end).
    */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, tieCol: String): DataFrame = {
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol), col(tieCol))
    val prevMaxEnd = max(col(endCol))
      .over(order.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L)
      .otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("__span", sum(col("__new"))
        .over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__span"))
      .agg(min(col(startCol)).as("__s"), max(col(endCol)).as("__e"),
        count(lit(1)).as("__n"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).cast("bigint").as("n_intervals"),
        count(lit(1)).cast("bigint").as("n_spans"),
        sum(col("__e") - col("__s")).cast("bigint").as("covered_us"))
  }
}
