package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension build from a CDC change stream — the
  * versioned-dimension payoff of change capture: every change to a
  * dimension key becomes a type-2 version row with a `[valid_from,
  * valid_to)` cursor interval, so any downstream join can pick the
  * version that was current at a given WAL cursor (point-in-time-correct
  * enrichment; the leakage-free-features shape training pipelines need).
  *
  * The reference retains per-key change history for exactly this kind of
  * replay (`/root/reference/docs/reference/change-retention.mdx`; message
  * envelope with both images, `lib/sequin/runtime/message.ex:27-46`);
  * the SCD2 rendition turns that history into queryable validity
  * intervals.
  *
  * Scale shape: ONE shuffle on the dimension key, then a per-key sorted
  * window (`lead`) — no self-join of the history against itself (the
  * naive "close each version with the next change" formulation is a
  * range self-join, quadratic on hot keys). Deletes emit no version row
  * but still CLOSE the prior version at the delete's cursor, because
  * `lead` runs BEFORE the delete rows are filtered out.
  */
object Scd {

  /** Type-2 versions from a Cdc-envelope stream (`commit_lsn`,
    * `commit_idx`, `action` columns): each non-delete change becomes a
    * version valid from its own cursor until the key's next change
    * (NULL = still current). A delete closes the prior version and emits
    * nothing; a later re-insert simply opens the key's next version.
    */
  def type2(changes: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("commit_lsn"), col("commit_idx"))
    changes
      .withColumn("valid_to_lsn", lead(col("commit_lsn"), 1).over(w))
      .withColumn("valid_to_idx", lead(col("commit_idx"), 1).over(w))
      .filter(col("action") =!= "delete")
      .withColumn("is_current", col("valid_to_lsn").isNull.cast("int"))
  }

  /** The version of each key current AT a cursor: `valid_from <= (lsn,
    * idx) < valid_to` — a filter over [[type2]] output, no window, no
    * join. Equivalent to `EventTableSink.stateAsOf` but computed from a
    * materialized version table (one predicate pushdown-able scan).
    */
  def versionAt(versions: DataFrame, lsn: Long, idx: Long = Long.MaxValue): DataFrame = {
    val fromOk = col("commit_lsn") < lsn ||
      (col("commit_lsn") === lsn && col("commit_idx") <= idx)
    val toOk = col("valid_to_lsn").isNull || col("valid_to_lsn") > lsn ||
      (col("valid_to_lsn") === lsn && col("valid_to_idx") > idx)
    versions.filter(fromOk && toOk)
  }
}
