package graft.sinks

import graft.ops.Ordering
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.util.Try

/** Change-retention sink: idempotent upsert of CDC batches into an event
  * table — the reference's WAL-pipeline destination
  * (`/root/reference/lib/sequin/runtime/wal_pipeline_server.ex:336-445`:
  * `INSERT ... ON CONFLICT (seq, record_pk) DO UPDATE`).
  *
  * Spark rendition: MERGE-style last-writer-wins keyed by
  * `(record_pk)` with `(commit_lsn, commit_idx)` as the version — a
  * read-union-dedup-rewrite on plain parquet (the Delta-less stand-in;
  * with Delta/Iceberg this is a genuine `MERGE INTO` with file-level
  * pruning). Writes go to a temp dir then atomically swap, so a crashed
  * batch never corrupts the table and replaying it is idempotent — the
  * exactly-once contract of W6 without a transactional store.
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

  /** Idempotently merge `batch` into the parquet table at `path`. */
  def upsert(spark: SparkSession, batch: DataFrame, path: String): Unit = {
    val target = Paths.get(path)
    val existing: Option[DataFrame] =
      if (Files.exists(target)) Try(spark.read.parquet(path)).toOption else None
    val unioned = existing match {
      case Some(cur) => cur.unionByName(batch.select(cur.columns.map(col): _*))
      case None      => batch
    }
    val merged = Ordering.dedupLatest(unioned, keyCols, seqCols.map(col))
    val tmp = path + ".tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = path + ".old"
    if (Files.exists(target)) {
      Files.move(target, Paths.get(old), StandardCopyOption.REPLACE_EXISTING)
    }
    Files.move(Paths.get(tmp), target)
    deleteRecursively(Paths.get(old))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Try(Files.delete(f)))
    }
  }
}
