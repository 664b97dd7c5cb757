package graft.sinks

import graft.ops.Ordering
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.util.Try

/** Change-retention sink: idempotent upsert of CDC batches into an event
  * table — the reference's WAL-pipeline destination
  * (`/root/reference/lib/sequin/runtime/wal_pipeline_server.ex:336-445`:
  * `INSERT ... ON CONFLICT (seq, record_pk) DO UPDATE` — per-row conflict
  * resolution touches only the conflicting rows, never the whole table).
  *
  * Spark rendition: the table is hash-bucketed by `record_pk` into
  * `numBuckets` directories (`bucket=N`). An upsert MERGEs
  * last-writer-wins (version = `(commit_lsn, commit_idx)`) and rewrites
  * ONLY the buckets the batch touches — I/O per micro-batch is
  * O(batch + touched-bucket bytes), not O(table). At 100 TB retained, a
  * 10k-row batch rewrites ~`touched/numBuckets` of the table at most, and
  * raising `numBuckets` (a per-table constant chosen at creation) bounds
  * that further; with Delta/Iceberg this becomes a genuine `MERGE INTO`
  * with file-level pruning, same plan shape.
  *
  * Crash safety: each touched bucket is staged to a dot-prefixed temp dir
  * (invisible to Spark's file index) and swapped in two renames with an
  * `.old-` backup; [[repair]] runs before every read/upsert and rolls a
  * half-swapped bucket back, so a crashed batch never loses the table and
  * replaying the batch is idempotent — W6's exactly-once contract without
  * a transactional store.
  *
  * `foreach`-batch usage:
  * {{{
  * stream.writeStream.foreachBatch { (batch, _) =>
  *   EventTableSink.upsert(spark, batch, path)
  * }
  * }}}
  */
object EventTableSink {

  val keyCols: Seq[String] = Seq("record_pk")
  val seqCols: Seq[String] = Seq("commit_lsn", "commit_idx")
  val BucketCol = "bucket"
  val DefaultBuckets = 64

  /** Stable bucket assignment — must never change for an existing table. */
  def bucketOf(pk: Column, numBuckets: Int): Column =
    pmod(xxhash64(pk), lit(numBuckets)).cast("int")

  // ---- concurrent-writer fencing (the WireSink epoch pattern) ----------

  /** Handle for the table's single legitimate writer at a given epoch —
    * see [[openWriter]]. A fenced handle's upserts throw instead of
    * interleaving bucket swaps with the newer owner.
    */
  final class Writer private[sinks] (val path: String, val epoch: Long) {
    def upsert(spark: SparkSession, batch: DataFrame,
        numBuckets: Int = DefaultBuckets): Unit =
      EventTableSink.upsert(spark, batch, path, numBuckets, Some(this))
  }

  private def epochFile(path: String): Path = Paths.get(path).resolve("_epoch")

  /** Current writer epoch (0 = table never opened with fencing). The
    * `_epoch` name is underscore-prefixed so Spark's file index ignores it.
    */
  def currentEpoch(path: String): Long = {
    val f = epochFile(path)
    if (!Files.exists(f)) 0L
    else Try(new String(Files.readAllBytes(f), "UTF-8").trim.toLong).getOrElse(0L)
  }

  /** Take over the table as its single writer: bump the `_epoch` file
    * (temp + atomic rename) and return a fenced handle. Every handle from
    * an earlier epoch is thereby fenced — its next upsert fails fast
    * rather than racing bucket swaps against the new owner. Two streams
    * upserting one table MUST each hold a current handle; the second
    * `openWriter` wins (last-writer-wins at the granularity of handles).
    * Same recipe as log/leader epoch fencing; the un-fenced `upsert`
    * overload keeps the single-writer assumption implicit for embedded
    * use.
    */
  def openWriter(path: String): Writer = {
    val root = Paths.get(path)
    Files.createDirectories(root)
    val next = currentEpoch(path) + 1
    val tmp = root.resolve(s".epoch-${System.nanoTime()}")
    Files.write(tmp, next.toString.getBytes("UTF-8"))
    Files.move(tmp, epochFile(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    new Writer(path, next)
  }

  private def fenceCheck(path: String, writer: Option[Writer]): Unit =
    writer.foreach { w =>
      val cur = currentEpoch(path)
      if (cur != w.epoch)
        throw new IllegalStateException(
          s"event-table writer fenced: epoch ${w.epoch} superseded by " +
            s"$cur at $path")
    }

  /** Read the table (internal bucket column dropped). `mergeSchema`
    * because buckets untouched since an upstream schema change still hold
    * the narrower files — the union schema is the table's schema.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    repair(path)
    spark.read.option("mergeSchema", "true").parquet(path).drop(BucketCol)
  }

  /** Point lookup: the read-side payoff of bucketing — the key's bucket
    * is computed driver-side and ONLY that one directory is scanned
    * (1/numBuckets of the table), the file-level analogue of the
    * reference's `consumer_events` pk index.
    */
  def lookup(spark: SparkSession, path: String, pk: String,
      numBuckets: Int = DefaultBuckets): DataFrame = {
    repair(path)
    import spark.implicits._
    val b = Seq(pk).toDF(keyCols.head)
      .select(bucketOf(col(keyCols.head), numBuckets)).head().getInt(0)
    val dir = bucketDir(path, b)
    if (!Files.exists(dir))
      spark.read.option("mergeSchema", "true").parquet(path)
        .drop(BucketCol).limit(0)
    else
      spark.read.option("mergeSchema", "true").option("basePath", path)
        .parquet(dir.toString)
        .drop(BucketCol).filter(col(keyCols.head) === pk)
  }

  /** Idempotently merge `batch` into the bucketed parquet table at `path`,
    * rewriting only the buckets present in the batch. With a `writer`
    * handle, the epoch is checked on entry AND immediately before the
    * bucket swaps, so a writer superseded mid-merge aborts with its
    * staging directory cleaned up and the table untouched.
    */
  def upsert(spark: SparkSession, batch: DataFrame, path: String,
      numBuckets: Int = DefaultBuckets,
      writer: Option[Writer] = None): Unit = {
    fenceCheck(path, writer)
    repair(path)
    val target = Paths.get(path)
    val keyed = batch.withColumn(BucketCol, bucketOf(col(keyCols.head), numBuckets))
      .localCheckpoint() // evaluate once: bucket scan + merge both consume it
    val touched = keyed.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return

    val existingDirs = touched.map(b => bucketDir(path, b))
      .filter(Files.exists(_)).map(_.toString)
    val existing: Option[DataFrame] =
      if (existingDirs.isEmpty) None
      else Try(spark.read.option("mergeSchema", "true")
        .option("basePath", path).parquet(existingDirs: _*)).toOption

    // allowMissingColumns both ways: an upstream schema change (column
    // added or dropped mid-stream, S2b relation change) widens the table
    // with nulls instead of silently DROPPING the batch's new columns
    val unioned = existing match {
      case Some(cur) => cur.unionByName(keyed, allowMissingColumns = true)
      case None      => keyed
    }
    val merged = Ordering.dedupLatest(unioned, keyCols, seqCols.map(col))

    val tmp = target.resolve(s".tmp-${System.nanoTime()}")
    // cluster by bucket before the partitioned write: one task owns each
    // touched bucket, so a bucket dir is a few contiguous files, not
    // (writer tasks × buckets) fragments — and the swap moves fewer files.
    // Rows are additionally SORTED by key within each bucket so parquet
    // min/max column-chunk stats are tight: a point lookup prunes row
    // groups INSIDE the bucket dir, not just the dir itself.
    merged.repartition(col(BucketCol))
      .sortWithinPartitions(col(BucketCol) +: keyCols.map(col): _*)
      .write.partitionBy(BucketCol).mode(SaveMode.Overwrite)
      .parquet(tmp.toString)
    // last fence before mutating live dirs: a writer superseded during
    // the merge aborts here, leaving the new owner's table intact
    try fenceCheck(path, writer)
    catch { case e: Throwable => deleteRecursively(tmp); throw e }
    touched.foreach { b =>
      val live = bucketDir(path, b)
      val staged = tmp.resolve(s"$BucketCol=$b")
      val old = oldDir(path, b)
      if (Files.exists(staged)) {
        deleteRecursively(old)
        if (Files.exists(live))
          Files.move(live, old, StandardCopyOption.REPLACE_EXISTING)
        Files.move(staged, live)
        deleteRecursively(old)
      }
    }
    deleteRecursively(tmp)
  }

  /** Retention: evict rows whose `tsCol` is before `cutoff` — the
    * reference's change-retention expiry
    * (`/root/reference/docs/reference/change-retention.mdx:112-137`:
    * a pg_cron job runs `DELETE ... WHERE committed_at < now() - interval
    * '30 days'`; pg_partman drops whole time partitions for high volume).
    *
    * Spark rendition, scale-shaped like the pg_partman path: the expiry
    * probe aggregates expired counts per bucket — a columnar scan of the
    * ts column only, pruned further by parquet footer min/max — and the
    * rewrite touches ONLY buckets that hold expired rows, through the
    * same staged-write + two-rename swap as [[upsert]] (crash-safe via
    * [[repair]], fenced via the `writer` epoch). A fully-expired bucket's
    * directory is dropped outright (the partition-drop fast path).
    * Returns the number of rows evicted.
    */
  def retention(spark: SparkSession, path: String, tsCol: String,
      cutoff: Column, writer: Option[Writer] = None): Long = {
    fenceCheck(path, writer)
    repair(path)
    val target = Paths.get(path)
    if (!Files.exists(target)) return 0L
    val t = Try(spark.read.option("mergeSchema", "true").parquet(path))
      .getOrElse(return 0L)
    val perBucket = t.filter(col(tsCol) < cutoff)
      .groupBy(col(BucketCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (perBucket.isEmpty) return 0L
    val affected = perBucket.keys.toSeq.sorted
    // NULL ts rows are NOT expired (they never matched the probe's
    // `< cutoff` either — e.g. rows from buckets written before tsCol
    // existed, read back as NULL under mergeSchema): keep them, or a
    // rewrite of their bucket would silently drop them uncounted
    val keep = t.filter(col(BucketCol).isin(affected: _*))
      .filter(col(tsCol) >= cutoff || col(tsCol).isNull)
    val tmp = target.resolve(s".tmp-${System.nanoTime()}")
    keep.repartition(col(BucketCol))
      .sortWithinPartitions(col(BucketCol) +: keyCols.map(col): _*)
      .write.partitionBy(BucketCol).mode(SaveMode.Overwrite)
      .parquet(tmp.toString)
    try fenceCheck(path, writer)
    catch { case e: Throwable => deleteRecursively(tmp); throw e }
    affected.foreach { b =>
      val live = bucketDir(path, b)
      val staged = tmp.resolve(s"$BucketCol=$b")
      val old = oldDir(path, b)
      deleteRecursively(old)
      if (Files.exists(live))
        Files.move(live, old, StandardCopyOption.REPLACE_EXISTING)
      if (Files.exists(staged)) Files.move(staged, live)
      deleteRecursively(old)
    }
    deleteRecursively(tmp)
    perBucket.values.sum
  }

  /** Change feed between two cursors: the NET effect per record_pk of
    * every change in `(fromLsn, toLsn]` — latest version in the window,
    * tagged with whether the pk ended up upserted or deleted. The
    * incremental-consumer primitive: a downstream rebuilt from snapshot
    * `fromLsn` applies exactly these rows to reach `toLsn` (one windowed
    * dedup over a cursor-pruned scan).
    */
  def changesBetween(events: DataFrame, fromLsn: Long, toLsn: Long): DataFrame = {
    val window = events.filter(
      col(seqCols.head) > fromLsn && col(seqCols.head) <= toLsn)
    Ordering.dedupLatest(window, keyCols, seqCols.map(col))
      .withColumn("net_effect",
        when(col("action") === "delete", "delete").otherwise("upsert"))
  }

  /** Time travel over retained changes: the record state "as of" a WAL
    * cursor — for each `record_pk`, the latest version at or below
    * `(lsn, idx)`, with deleted records absent. This is the replay payoff
    * of change retention (the reference replays `consumer_events` /
    * `wal_events` to rebuild or backfill downstream state,
    * `wal_pipeline_server.ex` batch reader): any historical snapshot is a
    * pure query over the event table. Narrow filter (prunes on the lsn
    * column at scan time) + one hash-partitioned window by pk.
    */
  def stateAsOf(events: DataFrame, lsn: Long, idx: Long = Long.MaxValue): DataFrame = {
    val upTo = events.filter(
      col(seqCols.head) < lsn ||
        (col(seqCols.head) === lsn && col(seqCols(1)) <= idx))
    Ordering.dedupLatest(upTo, keyCols, seqCols.map(col))
      .filter(col("action") =!= "delete")
  }

  private def bucketDir(path: String, b: Int): Path =
    Paths.get(path).resolve(s"$BucketCol=$b")

  // dot-prefixed → invisible to Spark's partition discovery
  private def oldDir(path: String, b: Int): Path =
    Paths.get(path).resolve(s".old-$BucketCol=$b")

  /** Roll back any bucket left half-swapped by a crash (live dir missing,
    * `.old-` backup present) and drop stale temp/backup dirs.
    */
  def repair(path: String): Unit = {
    val root = Paths.get(path)
    if (!Files.exists(root)) return
    import scala.jdk.CollectionConverters._
    val entries = {
      val s = Files.list(root)
      try s.iterator().asScala.toSeq finally s.close()
    }
    entries.foreach { p =>
      val name = p.getFileName.toString
      if (name.startsWith(s".old-$BucketCol=")) {
        val live = root.resolve(name.stripPrefix(".old-"))
        if (!Files.exists(live)) Files.move(p, live)
        else deleteRecursively(p)
      } else if (name.startsWith(".tmp-")) deleteRecursively(p)
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(p)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.reverse.foreach(f => Try(Files.delete(f)))
    }
  }
}
