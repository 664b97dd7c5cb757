package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for multi-dimensional data skipping.
  *
  * At 100 TB, which predicates prune is decided before any query runs —
  * by how rows were laid out into files. A single-column sort gives
  * min/max pruning on that column only; every other predicate scans the
  * whole table. Z-ordering (bit-interleaving the dimensions into one
  * sort key, the Morton curve) trades a little pruning power on the
  * first column for pruning power on ALL of them: each of k interleaved
  * dimensions selects ~N^((k-1)/k) of N files for a point range instead
  * of all N.
  *
  * The z-value itself is pure integer bit arithmetic (shift/and/or) —
  * codegen'd end to end, exactly reproducible in any engine, and cheap
  * enough to compute on the fly at write time. Spark then does the rest
  * with stock machinery: `repartitionByRange(zval)` gives contiguous
  * non-overlapping z-ranges per output file (one range-exchange — the
  * same shuffle a plain sorted write pays), and parquet's footer stats
  * make every file a prunable z-cube.
  *
  * Reference analog: none — the reference delivers events and leaves
  * destination-table layout to Postgres. This is the Spark-side lever
  * its event-log DESTINATIONS need at scale (the same reason
  * Delta/Iceberg grew OPTIMIZE ZORDER BY).
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of two non-negative
    * long columns (a's bit i → z bit 2i, b's bit i → z bit 2i+1).
    * Callers pick `bits` to cover the dimension domains (values beyond
    * `bits` wrap into the same z-range, degrading locality but never
    * correctness); for skewed real-valued dims, map to a bounded rank
    * (bucket index) first.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    // Mask to the sampled window first: arithmetic shiftright on a
    // negative input would set every sampled bit (one giant z-bucket).
    val window = lit((1L << bits) - 1)
    val aa = a.cast("bigint").bitwiseAND(window)
    val bb = b.cast("bigint").bitwiseAND(window)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(aa, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** The same z-value as ANSI SQL text (for oracles / pushdown-free
    * engines) — kept in ONE place so the Spark column and the SQL can
    * never drift.
    */
  def zValueSql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val m = (1L << bits) - 1
    (0 until bits).map { i =>
      s"(((($a & $m) >> $i) & 1) << ${2 * i}) + (((($b & $m) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Write `df` with parquet BLOOM FILTERS on `bloomCols` — the
    * point-lookup complement to [[zorderWrite]]. Min/max footer stats
    * prune range predicates on SORTED dimensions; on a high-cardinality
    * UNSORTED column (a random pk), every file's [min, max] spans the
    * whole domain and stats prune nothing. A per-row-group bloom filter
    * answers `pk = X` membership probabilistically (no false negatives),
    * so an equality probe skips every row group whose filter says
    * absent — at 100 TB, a pk lookup touches a handful of row groups
    * instead of the table. `expectedNdv` sizes the filter (per row
    * group); `LayoutSpec` proves the written filters answer presence
    * exactly and absence with a low FP rate.
    */
  def bloomWrite(df: DataFrame, bloomCols: Seq[String], path: String,
      nFiles: Int, expectedNdv: Long): Unit = {
    require(bloomCols.nonEmpty && expectedNdv > 0)
    val w0 = df.repartition(nFiles).write.mode("overwrite")
    val w = bloomCols.foldLeft(w0) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }
    w.parquet(path)
  }

  /** Write `df` z-ordered on (`a`, `b`) into `nFiles` files at `path`:
    * one range exchange on the z-value (contiguous, non-overlapping
    * z-ranges per file), sorted within each file so parquet page stats
    * prune too. The z-column itself is not persisted — it is a layout
    * decision, not data.
    */
  def zorderWrite(df: DataFrame, a: Column, b: Column, bits: Int,
      path: String, nFiles: Int): Unit = {
    // withColumn would silently replace (and drop then loses) a
    // pre-existing column of the same name.
    val zCol = Iterator.from(0).map(i => if (i == 0) "__z" else s"__z$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(zCol, zValue(a, b, bits))
      .repartitionByRange(nFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
      .write.mode("overwrite").parquet(path)
  }

  // ---- bucketed co-located joins ----------------------------------------

  /** Write `df` as a BUCKETED, bucket-sorted parquet table: rows are
    * hash-clustered on `key` into `buckets` files, and the clustering is
    * recorded in the catalog so every later reader knows it.
    *
    * This is pre-shuffling as a LAYOUT decision — the complement of
    * [[zorderWrite]] (which buys predicate pruning; this buys join
    * locality). A fact-fact join (lineitem ⋈ orders, delivery-ledger
    * audits, event-table reconciliation) otherwise shuffles BOTH sides
    * on every query; two tables bucketed on their join keys with the
    * same bucket count join bucket-i-against-bucket-i — a SortMergeJoin
    * with NO Exchange on either side, at any scale. At 100 TB the
    * repeated join is exactly where AQE cannot save you: a shuffle
    * avoided beats a shuffle optimized, and the write-time shuffle is
    * paid ONCE for every downstream join that reuses the layout.
    *
    * The pre-write `repartition(buckets, key)` uses the SAME hash Spark
    * assigns bucket ids with, so each task owns exactly one bucket →
    * one file per bucket — the single-file-per-bucket layout that also
    * lets the reader skip the join's Sort, not just its Exchange.
    *
    * The table is written EXTERNAL under `path` and re-registered
    * per-session (the default in-memory catalog forgets definitions
    * across JVMs; the files persist).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val dir = new java.io.File(path)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (dir.exists()) rm(dir)
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .option("path", dir.getAbsolutePath)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys, pinned to the merge
    * strategy the bucketing exists for (a broadcast would work on a toy
    * side but is the wrong proof at scale: the plan gate asserts the
    * co-located SortMergeJoin shape — zero Exchange).
    */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"),
        col(leftKey) === col(rightKey))
}
