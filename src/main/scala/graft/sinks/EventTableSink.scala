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
  * For high volume the reference time-partitions the event table with
  * pg_partman so retention DROPs whole partitions instead of DELETE-ing
  * rows (`/root/reference/docs/reference/change-retention.mdx:112-137`).
  *
  * Spark rendition — a TWO-dimensional layout `bucket=B/epoch=E`:
  *   - `bucket` = hash(record_pk) % numBuckets: bounds the blast radius of
  *     an upsert and gives point lookups a 1/numBuckets scan.
  *   - `epoch` = commit_lsn div epochWidth: the pg_partman time-partition
  *     analog. Commit order is monotone, so an append-mostly stream lands
  *     each batch in the newest epoch of each bucket; retention drops
  *     whole fully-expired `epoch=E` directories in O(expired) (no read,
  *     no rewrite) and rewrites only the one boundary epoch; replay
  *     windows (`changesBetween`/`stateAsOf` over the stored table) prune
  *     to in-window epoch dirs via partition filters.
  *
  * An upsert MERGEs last-writer-wins (version = `(commit_lsn,
  * commit_idx)`) and rewrites ONLY the affected `(bucket, epoch)` dirs:
  * the epochs the batch's rows land in, plus the epochs holding the
  * superseded prior versions of the batch's pks (found by a thin
  * pk-column scan of the touched buckets). I/O per micro-batch is
  * O(batch + affected-epoch bytes) — at 100 TB retained, inserting new
  * rows touches one epoch dir per bucket, never the table's history.
  * With Delta/Iceberg this becomes a genuine `MERGE INTO` with file-level
  * pruning, same plan shape.
  *
  * Crash safety: staged writes to a dot-prefixed temp dir (invisible to
  * Spark's file index), per-(bucket,epoch) two-rename swaps with `.old-`
  * backups, one-way `.del-` tombstone renames for dropped dirs; [[repair]]
  * runs before every read/upsert and rolls a half-swapped dir back (or
  * finishes a half-finished drop), so a crashed batch never loses the
  * table and replaying the batch is idempotent — W6's exactly-once
  * contract without a transactional store.
  *
  * `numBuckets` and `epochWidth` are per-table layout constants chosen at
  * creation and must never change for an existing table (like the
  * reference's partition interval).
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
  val EpochCol = "epoch"
  val DefaultBuckets = 64
  /** Default lsn-units per epoch dir. lsn strides like a byte offset, so
    * real tables size this to their WAL volume per retention interval
    * (one epoch ≈ one droppable retention unit).
    */
  val DefaultEpochWidth = 1L << 20

  /** Stable bucket assignment — must never change for an existing table. */
  def bucketOf(pk: Column, numBuckets: Int): Column =
    pmod(xxhash64(pk), lit(numBuckets)).cast("int")

  /** Stable epoch assignment — `lsn div width`. Exact integer semantics:
    * Column `/` is a double divide whose 53-bit mantissa would corrupt
    * lsn past 2^53, so divide the mod-aligned numerator as decimal(38,0).
    * NULL-lsn rows (never produced by the CDC pipeline, but defended) pin
    * to epoch -1 so they survive retention untouched.
    */
  def epochOf(lsn: Column, epochWidth: Long): Column =
    coalesce(
      ((lsn - pmod(lsn, lit(epochWidth))).cast("decimal(38,0)") /
        lit(epochWidth)).cast("int"),
      lit(-1))

  // ---- concurrent-writer fencing (the WireSink epoch pattern) ----------

  /** Handle for the table's single legitimate writer at a given epoch —
    * see [[openWriter]]. A fenced handle's upserts throw instead of
    * interleaving dir swaps with the newer owner.
    */
  final class Writer private[sinks] (val path: String, val epoch: Long) {
    def upsert(spark: SparkSession, batch: DataFrame,
        numBuckets: Int = DefaultBuckets,
        epochWidth: Long = DefaultEpochWidth): Unit =
      EventTableSink.upsert(spark, batch, path, numBuckets, epochWidth,
        Some(this))
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
    * rather than racing dir swaps against the new owner. Two streams
    * upserting one table MUST each hold a current handle; the second
    * `openWriter` wins (last-writer-wins at the granularity of handles).
    *
    * The guarantee is BEST-EFFORT race narrowing, not mutual exclusion:
    * the epoch is re-verified immediately before EACH dir swap (one
    * rename's worth of window), but a concurrent `openWriter` landing
    * inside that window can still interleave one swap with the new
    * owner. Upsert idempotency makes the outcome recoverable (the new
    * owner's replay converges); a hard guarantee needs a lock service or
    * a transactional table format.
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

  /** Read the table (internal layout columns dropped). `mergeSchema`
    * because dirs untouched since an upstream schema change still hold
    * the narrower files — the union schema is the table's schema.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    repair(path)
    spark.read.option("mergeSchema", "true").parquet(path)
      .drop(BucketCol, EpochCol)
  }

  /** Point lookup: the read-side payoff of bucketing — the key's bucket
    * is computed driver-side and ONLY that one directory subtree is
    * scanned (1/numBuckets of the table), the file-level analogue of the
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
        .drop(BucketCol, EpochCol).limit(0)
    else
      spark.read.option("mergeSchema", "true").option("basePath", path)
        .parquet(dir.toString)
        .drop(BucketCol, EpochCol).filter(col(keyCols.head) === pk)
  }

  /** Idempotently merge `batch` into the layout at `path`, rewriting only
    * the affected `(bucket, epoch)` dirs: those receiving batch rows plus
    * those holding superseded prior versions of the batch's pks. With a
    * `writer` handle, the epoch is checked on entry and re-verified
    * before each dir swap (see [[openWriter]] for the exact guarantee).
    */
  def upsert(spark: SparkSession, batch: DataFrame, path: String,
      numBuckets: Int = DefaultBuckets,
      epochWidth: Long = DefaultEpochWidth,
      writer: Option[Writer] = None): Unit = {
    fenceCheck(path, writer)
    repair(path)
    val target = Paths.get(path)
    val keyed = batch
      .withColumn(BucketCol, bucketOf(col(keyCols.head), numBuckets))
      .withColumn(EpochCol, epochOf(col(seqCols.head), epochWidth))
      .localCheckpoint() // evaluate once: pair scan + merge both consume it
    val batchPairs = keyed.select(BucketCol, EpochCol).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    if (batchPairs.isEmpty) return

    val touchedBucketDirs = batchPairs.map(_._1).distinct
      .map(b => bucketDir(path, b)).filter(Files.exists(_)).map(_.toString)
    // thin pk-column scan of the touched buckets: which existing epochs
    // hold a prior version of a batch pk (and must be rewritten without
    // it)? Bounded collect: ≤ touched buckets × live epochs pairs. No
    // mergeSchema: the scan reads only the key column, which every file
    // has — skipping the union-schema footer pass over all files.
    val supersededPairs: Array[(Int, Int)] =
      if (touchedBucketDirs.isEmpty) Array.empty
      else spark.read.option("basePath", path)
        .parquet(touchedBucketDirs: _*)
        .select((keyCols :+ BucketCol :+ EpochCol).map(col): _*)
        .join(broadcast(keyed.select(keyCols.head).distinct()), keyCols)
        .select(BucketCol, EpochCol).distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1)))
    val affected = (batchPairs ++ supersededPairs).distinct.sorted

    val affectedDirs = affected.map { case (b, e) => pairDir(path, b, e) }
      .filter(Files.exists(_)).map(_.toString)
    // NO Try here: if an affected dir exists but cannot be read, the
    // upsert must ABORT (nothing mutated yet) — swallowing the failure
    // would merge without those rows and the swap would then drop the
    // "emptied" live dirs, silently deleting data on an IO error
    val existing: Option[DataFrame] =
      if (affectedDirs.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true")
        .option("basePath", path).parquet(affectedDirs: _*))

    // allowMissingColumns both ways: an upstream schema change (column
    // added or dropped mid-stream, S2b relation change) widens the table
    // with nulls instead of silently DROPPING the batch's new columns
    val unioned = existing match {
      case Some(cur) => cur.unionByName(keyed, allowMissingColumns = true)
      case None      => keyed
    }
    val merged = Ordering.dedupLatest(unioned, keyCols, seqCols.map(col))

    val tmp = target.resolve(s".tmp-${System.nanoTime()}")
    // cluster by (bucket, epoch) before the partitioned write: one task
    // owns each affected dir, so it holds a few contiguous files, not
    // (writer tasks × dirs) fragments — and the swap moves fewer files.
    // Rows are additionally SORTED by key within each dir so parquet
    // min/max column-chunk stats are tight: a point lookup prunes row
    // groups INSIDE the dir, not just the dir itself.
    merged.repartition(col(BucketCol), col(EpochCol))
      .sortWithinPartitions(
        Seq(col(BucketCol), col(EpochCol)) ++ keyCols.map(col): _*)
      .write.partitionBy(BucketCol, EpochCol).mode(SaveMode.Overwrite)
      .parquet(tmp.toString)
    swapPairs(path, affected, tmp, writer)
  }

  /** Swap each affected pair's staged dir into place (or drop the live
    * dir when the merge emptied it), re-verifying the writer fence before
    * every swap. Cleans the staging dir up on completion or fence abort.
    */
  private def swapPairs(path: String, affected: Seq[(Int, Int)], tmp: Path,
      writer: Option[Writer]): Unit = {
    try {
      affected.foreach { case (b, e) =>
        fenceCheck(path, writer) // re-verify per swap: one-rename window
        val live = pairDir(path, b, e)
        val staged = tmp.resolve(s"$BucketCol=$b").resolve(s"$EpochCol=$e")
        val old = oldDir(path, b, e)
        if (Files.exists(staged)) {
          Files.createDirectories(bucketDir(path, b))
          deleteRecursively(old)
          if (Files.exists(live))
            Files.move(live, old, StandardCopyOption.REPLACE_EXISTING)
          Files.move(staged, live)
          deleteRecursively(old)
        } else if (Files.exists(live)) {
          // merge emptied this epoch (all its rows superseded): one-way
          // tombstone rename, then delete — repair finishes, never undoes
          dropDir(path, live)
        }
      }
    } catch { case e: Throwable => deleteRecursively(tmp); throw e }
    deleteRecursively(tmp)
    dropEmptyBuckets(path)
  }

  /** Epoch-compaction span metadata: the max `groupEpochs` ever applied
    * to this table (1 = never compacted). The stored-table
    * [[changesBetween]] reads it to widen its lower partition bound —
    * a compacted dir is labeled with its GROUP-MIN epoch, so rows of
    * epoch E can live in a dir labeled as low as `E − (span−1)`.
    */
  private def compactionFile(path: String): Path =
    Paths.get(path).resolve("_compaction")

  def compactionSpan(path: String): Int = {
    val f = compactionFile(path)
    if (Files.exists(f))
      Try(Files.readString(f).trim.toInt).getOrElse(1).max(1)
    else 1
  }

  private val SourcesManifest = "_sources"

  /** Epoch compaction — the OPTIMIZE half of the pg_partman analogy. An
    * append-mostly stream leaves one narrow epoch dir per `epochWidth`
    * of WAL forever: a year of retention at production WAL volume is
    * hundreds of thousands of tiny dirs per bucket, and every replay
    * pays the file-listing. `compact` coalesces each run of
    * `groupEpochs` consecutive cold epochs (label ≤ `uptoEpoch`; callers
    * keep a margin below the live head) into ONE dir labeled with the
    * group-min epoch — dir count drops ×groupEpochs while rows, reads,
    * [[changesBetween]], [[stateAsOf]], [[lookup]] and [[retention]] are
    * all unchanged (they are row-predicate-driven; epoch labels only
    * prune). Partition pruning stays EXACT via the `_compaction` span
    * bound, written BEFORE any dir moves.
    *
    * Crash safety (a different shape from the upsert swap, which is
    * 1-dir-in-place; this is N dirs → 1): the combined dir is staged as
    * `.cmt-epoch=L` carrying a `_sources` manifest of the dirs it
    * replaces, then the finish routine drops each source one-way and
    * promotes the staged dir. [[repair]] re-runs the same finish for any
    * `.cmt-` it finds, so every crash point converges forward to the
    * compacted state — never duplicated, never lost.
    *
    * Returns the number of directories eliminated.
    */
  def compact(spark: SparkSession, path: String, uptoEpoch: Int,
      groupEpochs: Int, writer: Option[Writer] = None): Int = {
    require(groupEpochs >= 2 && groupEpochs <= (1 << 20),
      s"groupEpochs must be in [2, 2^20]: $groupEpochs")
    fenceCheck(path, writer)
    repair(path)
    val root = Paths.get(path)
    if (!Files.exists(root)) return 0
    import scala.jdk.CollectionConverters._
    def list(p: Path): Seq[Path] = {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq finally s.close()
    }
    // driver-side dir listing (bounded by live dir count): cold epochs
    // grouped to their floor boundary; only multi-dir groups move
    val groups: Seq[(Int, Int, Seq[Int])] = list(root)
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith(s"$BucketCol="))
      .flatMap { bdir =>
        val b = bdir.getFileName.toString.stripPrefix(s"$BucketCol=").toInt
        val es = list(bdir).map(_.getFileName.toString)
          .filter(_.startsWith(s"$EpochCol="))
          .map(_.stripPrefix(s"$EpochCol=").toInt)
          .filter(_ <= uptoEpoch)
        es.groupBy(e => e - Math.floorMod(e, groupEpochs)).toSeq.collect {
          case (label, srcs) if srcs.size >= 2 => (b, label, srcs.sorted)
        }
      }
    if (groups.isEmpty) return 0
    // widen the span BEFORE any mutation: a reader racing (or resuming
    // after) a crash must already use the conservative bound
    val span = math.max(compactionSpan(path), groupEpochs)
    Files.writeString(compactionFile(path), span.toString)

    val srcDirs = groups.flatMap { case (b, _, es) =>
      es.map(e => pairDir(path, b, e).toString) }
    val combined = spark.read.option("mergeSchema", "true")
      .option("basePath", path).parquet(srcDirs: _*)
      .withColumn(EpochCol,
        (col(EpochCol) - pmod(col(EpochCol), lit(groupEpochs))).cast("int"))
    val tmp = root.resolve(s".tmp-${System.nanoTime()}")
    combined.repartition(col(BucketCol), col(EpochCol))
      .sortWithinPartitions(
        Seq(col(BucketCol), col(EpochCol)) ++ keyCols.map(col): _*)
      .write.partitionBy(BucketCol, EpochCol).mode(SaveMode.Overwrite)
      .parquet(tmp.toString)
    groups.foreach { case (b, label, srcs) =>
      fenceCheck(path, writer)
      val staged = tmp.resolve(s"$BucketCol=$b").resolve(s"$EpochCol=$label")
      if (Files.exists(staged)) {
        // manifest written while still UNDER .tmp- (crash here = clean
        // rollback); the rename makes staging + manifest visible as one
        Files.writeString(staged.resolve(SourcesManifest),
          srcs.map(e => s"$EpochCol=$e").mkString("\n"))
        val cmt = bucketDir(path, b).resolve(s".cmt-$EpochCol=$label")
        deleteRecursively(cmt)
        Files.move(staged, cmt)
        finishCompaction(bucketDir(path, b), cmt)
      }
    }
    deleteRecursively(tmp)
    groups.map { case (_, _, srcs) => srcs.size - 1 }.sum
  }

  /** Finish (or, from [[repair]], re-finish after a crash) one staged
    * compaction: drop every manifest-listed source dir one-way, then
    * promote the staged dir to live. Idempotent from any interruption
    * point — already-dropped sources no-op, and the promote happens
    * exactly once.
    */
  private def finishCompaction(bdir: Path, cmt: Path): Unit = {
    val manifest = cmt.resolve(SourcesManifest)
    if (!Files.exists(manifest)) { deleteRecursively(cmt); return }
    Files.readString(manifest).split("\n").filter(_.nonEmpty)
      .foreach(n => dropDir(bdir.toString, bdir.resolve(n)))
    val live = bdir.resolve(cmt.getFileName.toString.stripPrefix(".cmt-"))
    if (!Files.exists(live)) Files.move(cmt, live)
    else deleteRecursively(cmt) // promote already done by a prior finish
  }

  /** Retention: evict rows whose `tsCol` is before `cutoff` — the
    * reference's change-retention expiry
    * (`/root/reference/docs/reference/change-retention.mdx:112-137`:
    * a pg_cron job runs `DELETE ... WHERE committed_at < now() - interval
    * '30 days'`; pg_partman drops whole time partitions for high volume).
    *
    * Spark rendition at pg_partman parity: a per-(bucket,epoch) expiry
    * probe with the cutoff PUSHED into a thin ts-column scan (row-group
    * ts stats skip fully-live epochs; the payload is never read)
    * classifies each candidate epoch dir. Fully-expired dirs are
    * DROPPED outright — no read, no rewrite, O(1) data I/O each — and
    * only boundary dirs (mixed expired/live rows; with monotone commit
    * ts, one per bucket) are rewritten through the staged-write swap.
    * Total cost ∝ expired rows + boundary dirs, NOT table size (probe
    * included — dirs with no expired rows are never read or touched).
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
    // Expiry probe, pass 1 — find EXPIRED rows with the cutoff PUSHED
    // into the scan: parquet row-group ts stats skip fully-live epochs
    // wholesale (commit ts correlates with the lsn-derived epoch, so a
    // live epoch's min ts clears the cutoff), leaving data I/O ∝ expired
    // + boundary rows, not table rows. NULL ts rows never match
    // `< cutoff` (e.g. dirs written before tsCol existed, read back as
    // NULL under mergeSchema): they keep their dir off the full-drop
    // path and survive any boundary rewrite.
    val expiredByPair = t.filter(col(tsCol) < cutoff)
      .groupBy(col(BucketCol), col(EpochCol))
      .agg(count(lit(1)).as("expired"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    if (expiredByPair.isEmpty) return 0L
    // Pass 2 — totals for CANDIDATE dirs only (the ones holding any
    // expired row): dirs with zero expired rows are never read or
    // touched. Bounded: |candidates| ≤ expired rows.
    val candDirs = expiredByPair.keys.toSeq.sorted
      .map { case (b, e) => pairDir(path, b, e) }
      .filter(Files.exists(_)).map(_.toString)
    val totals =
      if (candDirs.isEmpty) Map.empty[(Int, Int), Long]
      else spark.read.option("mergeSchema", "true")
        .option("basePath", path).parquet(candDirs: _*)
        .groupBy(col(BucketCol), col(EpochCol))
        .agg(count(lit(1)).as("total"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
        .toMap
    val stats = expiredByPair.map { case (pair, expired) =>
      pair -> ((totals.getOrElse(pair, expired), expired))
    }
    // .toSeq BEFORE collect: collecting (Int, Int) pairs out of a Map
    // would rebuild a Map keyed by bucket, silently collapsing all but
    // one epoch per bucket
    val fullDrop = stats.toSeq.collect {
      case (pair, (total, expired)) if expired == total && total > 0 => pair
    }.sorted
    val boundary = stats.toSeq.collect {
      case (pair, (total, expired)) if expired > 0 && expired < total => pair
    }.sorted
    val evicted = stats.values.map(_._2).sum
    if (evicted == 0) return 0L

    // pg_partman path: drop whole expired epoch dirs, no data I/O
    fullDrop.foreach { case (b, e) =>
      fenceCheck(path, writer)
      dropDir(path, pairDir(path, b, e))
    }

    if (boundary.nonEmpty) {
      val dirs = boundary.map { case (b, e) => pairDir(path, b, e).toString }
      val keep = spark.read.option("mergeSchema", "true")
        .option("basePath", path).parquet(dirs: _*)
        .filter(col(tsCol) >= cutoff || col(tsCol).isNull)
      val tmp = target.resolve(s".tmp-${System.nanoTime()}")
      keep.repartition(col(BucketCol), col(EpochCol))
        .sortWithinPartitions(
          Seq(col(BucketCol), col(EpochCol)) ++ keyCols.map(col): _*)
        .write.partitionBy(BucketCol, EpochCol).mode(SaveMode.Overwrite)
        .parquet(tmp.toString)
      swapPairs(path, boundary, tmp, writer)
    } else dropEmptyBuckets(path)
    evicted
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

  /** [[changesBetween]] over a STORED table: the epoch layout turns the
    * window bound into a partition filter, so the scan lists only the
    * in-window `epoch=E` dirs — a replay of last hour's changes against
    * 100 TB of retained history reads last hour's directories, nothing
    * else. (Exact: rows with lsn in `(from, to]` live in epochs
    * `[from div w, to div w]` by construction.)
    */
  def changesBetween(spark: SparkSession, path: String, fromLsn: Long,
      toLsn: Long, epochWidth: Long = DefaultEpochWidth): DataFrame = {
    repair(path)
    // compacted dirs are labeled with their group-min epoch, so the
    // lower bound widens by (span−1); the upper bound is unchanged
    // (labels never exceed their rows' epochs). Uncompacted tables have
    // span = 1 — the original exact bound.
    val span = compactionSpan(path)
    val t = spark.read.option("mergeSchema", "true").parquet(path)
      .filter(
        col(EpochCol) >= lit((fromLsn / epochWidth).toInt - (span - 1)) &&
        col(EpochCol) <= lit((toLsn / epochWidth).toInt))
      .drop(BucketCol, EpochCol)
    changesBetween(t, fromLsn, toLsn)
  }

  /** Replay-consumer enrichment join with ZERO join-attributable
    * Exchange — q101's co-located-join lever applied to the event table.
    *
    * The replay shape `changesBetween ⋈ dimension` repeats every time a
    * downstream rebuilds, so its shuffle is worth designing away: the
    * changes side arrives at the join ALREADY hash-partitioned on
    * `record_pk` (dedupLatest's window shuffles on exactly the join
    * key), and `dimTable` is a bucketed catalog table
    * ([[graft.ops.Layout.writeBucketed]]) whose bucket count matches the
    * session's shuffle partitions — so the SortMergeJoin consumes the
    * window's partitioning on the left and the bucket layout on the
    * right, introducing NO new Exchange (the plan's only shuffle is the
    * dedup window's own, which replay pays regardless). At 100 TB
    * retained, the dimension's write-time shuffle is paid once for every
    * replay that reuses it. PlanAuditSpec gates the shape.
    *
    * `dimKeyCol` must be the dimension's bucket column; rows keyed by
    * `record_pk`.
    */
  def replayJoin(spark: SparkSession, path: String, fromLsn: Long,
      toLsn: Long, epochWidth: Long, dimTable: String,
      dimKeyCol: String): DataFrame = {
    val changes = changesBetween(spark, path, fromLsn, toLsn, epochWidth)
    val dim = spark.table(dimTable).hint("merge")
    if (dimKeyCol == keyCols.head) // using-join keeps the key unambiguous
      changes.hint("merge").join(dim, Seq(dimKeyCol))
    else changes.hint("merge").join(dim, col(keyCols.head) === col(dimKeyCol))
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

  /** [[stateAsOf]] over a STORED table: epoch partition pruning caps the
    * scan at dirs `<= lsn div width` (plus the NULL-lsn pin at -1).
    */
  def stateAsOf(spark: SparkSession, path: String, lsn: Long, idx: Long,
      epochWidth: Long): DataFrame = {
    repair(path)
    val t = spark.read.option("mergeSchema", "true").parquet(path)
      .filter(col(EpochCol) <= lit((lsn / epochWidth).toInt))
      .drop(BucketCol, EpochCol)
    stateAsOf(t, lsn, idx)
  }

  private def bucketDir(path: String, b: Int): Path =
    Paths.get(path).resolve(s"$BucketCol=$b")

  private def pairDir(path: String, b: Int, e: Int): Path =
    bucketDir(path, b).resolve(s"$EpochCol=$e")

  // dot-prefixed → invisible to Spark's partition discovery
  private def oldDir(path: String, b: Int, e: Int): Path =
    bucketDir(path, b).resolve(s".old-$EpochCol=$e")

  /** One-way crash-safe delete: tombstone rename (`.del-`, invisible to
    * Spark) then recursive delete. [[repair]] finishes interrupted drops
    * — `.del-` is never restored, unlike `.old-` backups.
    */
  private def dropDir(path: String, live: Path): Unit = {
    if (!Files.exists(live)) return
    val tomb = live.getParent.resolve(s".del-${live.getFileName}")
    deleteRecursively(tomb)
    Files.move(live, tomb, StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(tomb)
  }

  /** A bucket whose last epoch dir was dropped leaves an empty `bucket=B`
    * shell; remove it so partition discovery never trips on a dir with no
    * files (and a fully-expired table reads back as an empty dir listing).
    */
  private def dropEmptyBuckets(path: String): Unit = {
    val root = Paths.get(path)
    if (!Files.exists(root)) return
    import scala.jdk.CollectionConverters._
    val buckets = {
      val s = Files.list(root)
      try s.iterator().asScala.toSeq finally s.close()
    }
    buckets.filter(_.getFileName.toString.startsWith(s"$BucketCol="))
      .foreach { b =>
        val children = {
          val s = Files.list(b)
          try s.iterator().asScala.toSeq finally s.close()
        }
        if (children.isEmpty) Try(Files.delete(b))
      }
  }

  /** Roll back any dir left half-swapped by a crash (live dir missing,
    * `.old-` backup present), finish any half-finished drop (`.del-`
    * tombstones), and clear stale temp/backup dirs — at both the bucket
    * and epoch level.
    */
  def repair(path: String): Unit = {
    val root = Paths.get(path)
    if (!Files.exists(root)) return
    import scala.jdk.CollectionConverters._
    def list(p: Path): Seq[Path] = {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq finally s.close()
    }
    def heal(dir: Path, prefix: String): Unit =
      list(dir).foreach { p =>
        val name = p.getFileName.toString
        if (name.startsWith(s".old-$prefix=")) {
          val live = dir.resolve(name.stripPrefix(".old-"))
          if (!Files.exists(live)) Files.move(p, live)
          else deleteRecursively(p)
        } else if (name.startsWith(s".cmt-$prefix=")) {
          // a compaction crashed between staging and finish: the staged
          // dir + manifest carry everything needed to converge FORWARD
          finishCompaction(dir, p)
        } else if (name.startsWith(".del-")) deleteRecursively(p)
        else if (name.startsWith(".tmp-")) deleteRecursively(p)
      }
    heal(root, BucketCol) // legacy flat layout + root-level debris
    list(root).filter { p =>
      Files.isDirectory(p) && p.getFileName.toString.startsWith(s"$BucketCol=")
    }.foreach(heal(_, EpochCol))
    dropEmptyBuckets(path)
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
