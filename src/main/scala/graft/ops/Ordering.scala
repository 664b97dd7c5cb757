package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordering / windowed-delivery semantics W1-W6 + O2-O4 in batch form.
  *
  * The streaming runtime forms live in `graft.streaming`; these are the
  * deterministic, oracle-checkable batch renditions over the CDC envelope.
  *
  * Scale notes: every window here partitions by a delivery key
  * (`group_id`), so the shuffle is hash-partitioned on the same key the
  * runtime partitions delivery by — one shuffle, reused. Global sorts
  * appear only where the reference itself is globally ordered (W1 total
  * order restore), and Spark executes them as range-partitioned sorts, not
  * single-node sorts.
  */
object Ordering {

  /** W1/Q20 — restore total `(commit_lsn, commit_idx)` order after parallel
    * decode (`/root/reference/lib/sequin/runtime/slot_producer/
    * reorder_buffer.ex`). Range-partitioned sort in Spark.
    */
  def totalOrder(df: DataFrame): DataFrame =
    df.orderBy(col("commit_lsn"), col("commit_idx"))

  /** Exact global 1-based rank over `order` (which must be a TOTAL order
    * — include a unique tiebreak) WITHOUT a single-partition window: the
    * frame range-partitions and sorts (Spark's distributed sort), then
    * `zipWithIndex` adds per-partition offsets in one extra count pass.
    * A bare `row_number() OVER (ORDER BY ...)` collapses every row onto
    * one task — fine at 10⁵ rows, fatal at 10⁹; this is the rank shape
    * that survives the scale-up. The rank value depends only on the
    * total order, not on where the range bounds fall, so output is
    * deterministic across partitionings.
    */
  def globalRank(df: DataFrame, order: Seq[Column],
      rankCol: String = "rank"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(ranked, schema)
  }

  /** W2/Q21 — deliverable head-of-line per group: oldest message per
    * `group_id` (`/root/reference/lib/sequin/runtime/
    * slot_message_store_state.ex:432-478`). Null groups deliver
    * independently (consumers.ex:770-771) so they are passed through.
    */
  def headOfGroup(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("group_id"))
      .orderBy(col("commit_lsn"), col("commit_idx"))
    df.filter(col("group_id").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .unionByName(df.filter(col("group_id").isNull))
  }

  /** W3/Q22 — CDC-over-backfill priority merge: union both streams, CDC
    * first, then strict `(lsn, idx)` order within each class
    * (`/root/reference/lib/sequin/runtime/slot_message_store_state.ex:519-631`).
    */
  def priorityMerge(cdc: DataFrame, backfill: DataFrame): DataFrame =
    cdc.withColumn("priority", lit(0))
      .unionByName(backfill.withColumn("priority", lit(1)))
      .orderBy(col("priority"), col("commit_lsn"), col("commit_idx"))

  /** W6/Q4 — exactly-once dedup, batch form: keep the latest image per
    * idempotency key (`/root/reference/lib/sequin/runtime/
    * wal_pipeline_server.ex:336-445` upsert = last-writer-wins per
    * `(seq, record_pk)`).
    */
  def dedupLatest(df: DataFrame, keyCols: Seq[String], seqCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(seqCols.map(_.desc): _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** W5/Q23 — bytes-batcher: assign each message a batch bucket so no batch
    * exceeds `maxBytes`, preserving per-group order
    * (`/root/reference/lib/sequin/runtime/sink_pipeline.ex:413-435`).
    * Running `sum(byte_size)` over the delivery order, integer-divided by
    * the cap. (Greedy first-fit differs only when a single message spans a
    * boundary; the reference flushes on overflow, matching this bucketing
    * for the declared oracle.)
    */
  def byteBatches(df: DataFrame, maxBytes: Long): DataFrame = {
    val w = Window.partitionBy(col("group_id"))
      .orderBy(col("commit_lsn"), col("commit_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_bytes", sum(col("byte_size")).over(w))
      .withColumn("batch_idx",
        ((col("running_bytes") - lit(1)) / lit(maxBytes)).cast("bigint"))
  }

  /** A2/Q17 — min unpersisted WAL cursor: struct-min over
    * `(commit_lsn, commit_idx)` — drives the `confirmed_flush_lsn` ack
    * watermark (`/root/reference/lib/sequin/runtime/
    * slot_message_store_state.ex:365-392`).
    */
  def minCursor(df: DataFrame): DataFrame =
    df.agg(min(struct(col("commit_lsn"), col("commit_idx"))).as("min_cursor"))
      .select(col("min_cursor.commit_lsn").as("min_commit_lsn"),
        col("min_cursor.commit_idx").as("min_commit_idx"))
}
