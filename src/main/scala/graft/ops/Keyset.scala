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

  /** The full row-value comparison `(c1,..,cn) > (v1,..,vn)` in its
    * OR-expanded form:
    * `c1 > v1 OR (c1 = v1 AND (c2 > v2 OR (c2 = v2 AND ...)))`.
    *
    * Unlike a `struct(...) > struct(...)` compare (which Catalyst cannot
    * translate to a `sources.Filter`), this form IS translatable — the
    * WHOLE tuple predicate reaches the scan as
    * `PushedFilters: [Or(GreaterThan(c1,v1), And(EqualTo(c1,v1), ...))]`
    * for parquet (row-group + page stats pruning) and any
    * SupportsPushDownFilters DSv2 source (see
    * [[graft.sources.KeysetParquetProvider]]). At 100 TB that is the
    * difference between later pages re-scanning the table and skipping
    * straight to the cursor's row groups.
    */
  def tuplePredicate(cols: Seq[String], values: Seq[Any]): Column = {
    val (c, v) = (col(cols.head), lit(values.head))
    if (cols.size == 1) c > v
    else c > v || (c === v && tuplePredicate(cols.tail, values.tail))
  }

  /** One keyset page: rows strictly after `after` in `(cols)` order.
    * `after = None` is the initial page (min-cursor init, keyset_cursor.ex:42-91).
    *
    * The redundant leading bound `cols.head >= after.head` is kept as a
    * simple range conjunct (cheap min/max checks even for sources that
    * can't evaluate the Or-tree); results are identical (the tuple
    * compare implies it).
    */
  def page(df: DataFrame, cols: Seq[String], after: Option[Seq[Any]], limit: Int): DataFrame = {
    val filtered = after match {
      case Some(vals) =>
        df.filter(col(cols.head) >= lit(vals.head) &&
          tuplePredicate(cols, vals))
      case None => df
    }
    filtered.orderBy(cols.map(col): _*).limit(limit)
  }

  /** S9 — exact count of the remaining scan (table_reader.ex:333-362). */
  def remainingCount(df: DataFrame, cols: Seq[String], after: Seq[Any]): DataFrame =
    df.filter(col(cols.head) >= lit(after.head) &&
        tuplePredicate(cols, after))
      .agg(count(lit(1)).as("remaining_count"))

  /** S10 — first row in cursor order (table_reader.ex:303-326). */
  def firstRow(df: DataFrame, cols: Seq[String]): DataFrame =
    df.orderBy(cols.map(col): _*).limit(1)
}
