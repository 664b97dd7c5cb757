package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyset (cursor) pagination over a stable sort key — the reference's
  * backfill table scan (S6/S9/S10/O1).
  *
  * Semantics from `/root/reference/lib/sequin/runtime/keyset_cursor.ex:93-113`
  * (`WHERE (c1,c2,..) > (?,?,..) ORDER BY c1,c2,.. LIMIT ?`) and
  * `/root/reference/lib/sequin/runtime/table_reader.ex:221-298`.
  *
  * The tuple (lexicographic) comparison is expressed with `struct(...) >
  * struct(...)` — Spark compares structs field-by-field natively, keeps the
  * predicate inside whole-stage codegen, and (unlike an OR-expansion) leaves
  * a single simple range predicate for pushdown. At cluster scale the scan
  * becomes a JDBC/DataSourceV2 read partitioned by cursor ranges; the
  * operator shape below is unchanged.
  */
object Keyset {

  private def cursorTuple(cols: Seq[String]): Column = struct(cols.map(col): _*)

  private def literalTuple(values: Seq[Any]): Column = struct(values.map(lit): _*)

  /** One keyset page: rows strictly after `after` in `(cols)` order.
    * `after = None` is the initial page (min-cursor init, keyset_cursor.ex:42-91).
    *
    * The struct comparison itself is not pushable to parquet/JDBC (row-value
    * predicate), so the implied single-column bound `cols.head >= after.head`
    * is added as a redundant conjunct: Catalyst pushes IT into the scan
    * (`PushedFilters: [GreaterThanOrEqual(...)]`), pruning row groups /
    * partitions — at 100 TB this bound is what keeps later pages from
    * rescanning the whole table. Results are identical (the tuple compare
    * implies the bound).
    */
  def page(df: DataFrame, cols: Seq[String], after: Option[Seq[Any]], limit: Int): DataFrame = {
    val filtered = after match {
      case Some(vals) =>
        df.filter(col(cols.head) >= lit(vals.head) &&
          cursorTuple(cols) > literalTuple(vals))
      case None => df
    }
    filtered.orderBy(cols.map(col): _*).limit(limit)
  }

  /** S9 — exact count of the remaining scan (table_reader.ex:333-362). */
  def remainingCount(df: DataFrame, cols: Seq[String], after: Seq[Any]): DataFrame =
    df.filter(col(cols.head) >= lit(after.head) &&
        cursorTuple(cols) > literalTuple(after))
      .agg(count(lit(1)).as("remaining_count"))

  /** S10 — first row in cursor order (table_reader.ex:303-326). */
  def firstRow(df: DataFrame, cols: Seq[String]): DataFrame =
    df.orderBy(cols.map(col): _*).limit(1)
}
