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

  /** The tuple predicate as a DSv2 `sources.Filter` tree — the exact
    * shape Catalyst pushes for [[tuplePredicate]], built directly so
    * metadata-only evaluation ([[fastRemainingCount]]) and the scan
    * agree on semantics by construction.
    */
  def tupleFilter(cols: Seq[String], values: Seq[Any])
      : org.apache.spark.sql.sources.Filter = {
    import org.apache.spark.sql.sources._
    val gt = GreaterThan(cols.head, values.head)
    if (cols.size == 1) gt
    else Or(gt, And(EqualTo(cols.head, values.head),
      tupleFilter(cols.tail, values.tail)))
  }

  /** S9 at 100 TB: the remaining-scan count with FULLY-CONTAINED row
    * groups counted from parquet footer metadata alone — only the
    * groups whose (min, max) stats STRADDLE the cursor are scanned.
    * On a cursor-sorted layout that is O(1) boundary groups per file
    * regardless of table size: counting "rows after the cursor" over
    * 100 TB costs footer reads plus one or two row-group scans, not a
    * table scan. On an unsorted layout every group straddles and this
    * degrades gracefully to exactly the scan [[remainingCount]] does.
    *
    * Classification (`couldMatch` × `mustMatch`, both conservative over
    * (min, max) and recorded null counts) fans out over files as a
    * Spark job — no driver-side footer loop; only the boundary block
    * descriptors and one long per file come back. The boundary scan
    * reuses the DSv2 source with an explicit `blocks` option and
    * re-applies the row-level predicate in Spark, so a stats lie or an
    * uncertain group can only cost I/O, never correctness.
    */
  /** Fully-in / boundary / total classification of every row group under
    * `path` against the cursor filter — fanned out over files as a Spark
    * job; only (meta-row count, boundary descriptors, group count) per
    * file return to the driver.
    */
  private[graft] def classifyBlocks(spark: org.apache.spark.sql.SparkSession,
      path: String, cols: Seq[String], after: Seq[Any])
      : (Long, Seq[graft.sources.KeysetRowGroupPartition], Long) = {
    import graft.sources.{KeysetParquet, KeysetRowGroupPartition}
    import org.apache.spark.sql.sources.{And => FAnd, GreaterThanOrEqual => FGte}
    val filter = FAnd(FGte(cols.head, after.head), tupleFilter(cols, after))
    val files = KeysetParquet.listFiles(path)
    // the session timezone travels to the tasks: a LocalDateTime cursor
    // against an instant-domain (isAdjustedToUTC) column is compared the
    // way the residual Spark filter will cast it — under a non-UTC
    // session an all-UTC stats interpretation would silently count the
    // wrong groups as fully-in
    val zoneStr = spark.sessionState.conf.sessionLocalTimeZone
    val perFile = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 32)))
      .map { file =>
        val zone = java.time.ZoneId.of(zoneStr)
        val (msgType, metas) = KeysetParquet.footerBlockMeta(file)
        val sparkFull = KeysetParquet.sparkSchema(msgType)
        var metaRows = 0L
        val boundary = Seq.newBuilder[KeysetRowGroupPartition]
        metas.foreach { m =>
          if (KeysetParquet.mustMatch(filter, m.stats, m.nulls, zone))
            metaRows += m.rows
          else if (KeysetParquet.couldMatch(filter, m.stats, sparkFull, zone))
            boundary += KeysetRowGroupPartition(file, m.start, m.len)
        }
        (metaRows, boundary.result(), metas.size.toLong)
      }.collect()
    (perFile.map(_._1).sum, perFile.flatMap(_._2).toSeq,
      perFile.map(_._3).sum)
  }

  def fastRemainingCount(spark: org.apache.spark.sql.SparkSession,
      path: String, cols: Seq[String], after: Seq[Any]): DataFrame = {
    import graft.sources.{KeysetParquet, KeysetParquetProvider}
    val (metaRows, boundary, totalGroups) = classifyBlocks(spark, path, cols, after)
    // Degraded layout (unsorted: most groups straddle the cursor): the
    // explicit block list stops paying for itself — it would serialize a
    // near-complete row-group inventory into one driver-held read-option
    // string. Fall back to the PLAIN pruned scan (the DSv2 source prunes
    // by the same stats at plan time), which reads the same groups
    // without shipping the list.
    if (boundary.isEmpty)
      spark.range(1).select(lit(metaRows).as("remaining_count"))
    else if (boundary.size * 2 >= totalGroups)
      remainingCount(
        spark.read.format(classOf[KeysetParquetProvider].getName)
          .option("path", path).load(),
        cols, after)
    else
      spark.read.format(classOf[KeysetParquetProvider].getName)
        .option("path", path)
        .option("blocks", KeysetParquet.encodeBlocks(boundary))
        .load()
        .filter(col(cols.head) >= lit(after.head) &&
          tuplePredicate(cols, after))
        .agg((count(lit(1)) + lit(metaRows)).as("remaining_count"))
  }
}
