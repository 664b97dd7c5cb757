package graft.sinks

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.util.{Map => JMap, UUID}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The delivery-side connector boundary as a DataSourceV2 sink —
  * `graft-wiresink` — mirroring [[graft.sources.WalSpool]] on the write
  * side.
  *
  * The reference's 17 sink pipelines all end the same way: a batch of
  * `(destination, ordering key, payload bytes)` handed to a network client
  * (`/root/reference/lib/sequin/runtime/sink_pipeline.ex:39-98` —
  * `handle_batch` is the only transport-specific step). Every adapter in
  * [[SinkAdapters]] reduces to that TRANSPORT tuple via [[WireSink.toTransport]],
  * so one DSv2 writer covers the whole catalog; swapping a real network
  * client for the segment files touches nothing upstream of `commit`.
  *
  * Exactly-once: Structured Streaming replays an uncommitted epoch after a
  * crash, so the sink must make `commit(epochId, _)` idempotent
  * (the reference keeps a delivered-cursor ledger for the same reason,
  * `message_ledgers.ex:60-100`). Here an epoch becomes ONE atomically
  * renamed directory `epoch-<id>`; a replayed commit sees the directory
  * already published, discards its temp files, and returns — the same
  * publish protocol as the WAL spool's segments, applied to epochs.
  *
  * Scale posture: each task streams its partition straight to its own
  * segment file (no per-task buffering beyond an IO buffer, no driver
  * involvement until the tiny commit-message fan-in), so a 1000-executor
  * epoch writes 1000 files in parallel and the driver renames one
  * directory. Per-group delivery order is whatever order rows arrive at
  * the writer — repartition by `group_id` upstream (R3) and rows for one
  * group land in one segment, in order.
  */
object WireSink {

  /** Segment file magic ("GWIR" + version 1). */
  val Magic: Int = 0x47574952
  val Version: Int = 1

  /** The transport tuple — the narrow waist every sink adapter reduces to. */
  val schema: StructType = StructType(Seq(
    StructField("sink_type", StringType, nullable = false),
    StructField("dest", StringType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("body", StringType, nullable = false)))

  final case class TransportRow(sink_type: String, dest: String,
      key: String, body: String)

  /** Reduce an adapter's wire shape to the transport tuple. `key` may be
    * null (keyless transports); `body` is typically the adapter's payload
    * column or a `to_json(struct(...))` of the remaining wire columns.
    */
  def toTransport(wire: DataFrame, sinkType: String, dest: Column,
      key: Column, body: Column): DataFrame =
    wire.select(lit(sinkType).as("sink_type"), dest.cast("string").as("dest"),
      key.cast("string").as("key"), body.cast("string").as("body"))

  private def fs(p: Path): FileSystem = p.getFileSystem(new Configuration())

  private[sinks] def writeRecord(out: DataOutputStream, sinkType: String,
      dest: String, key: String, body: String): Unit = {
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8"); out.writeInt(b.length); out.write(b)
    }
    str(sinkType); str(dest)
    if (key == null) out.writeInt(-1) else str(key)
    str(body)
  }

  /** Read one wire segment fully. */
  def readSegment(file: String): Seq[TransportRow] = {
    val p = new Path(file)
    val in = new DataInputStream(fs(p).open(p))
    try {
      require(in.readInt() == Magic, s"$file: not a GWIR segment")
      require(in.readInt() == Version, s"$file: unsupported version")
      def str(len: Int): String = {
        val b = new Array[Byte](len); in.readFully(b); new String(b, "UTF-8")
      }
      val buf = scala.collection.mutable.ArrayBuffer.empty[TransportRow]
      var eof = false
      while (!eof) {
        val first = try in.readInt() catch { case _: EOFException => eof = true; -1 }
        if (!eof) {
          val sinkType = str(first)
          val dest = str(in.readInt())
          val keyLen = in.readInt()
          val key = if (keyLen < 0) null else str(keyLen)
          val body = str(in.readInt())
          buf += TransportRow(sinkType, dest, key, body)
        }
      }
      buf.toSeq
    } finally in.close()
  }

  /** Published epoch directories, in epoch order. */
  def listEpochs(dir: String): Seq[String] = {
    val d = new Path(dir)
    val filesystem = fs(d)
    if (!filesystem.exists(d)) Seq.empty
    else filesystem.listStatus(d).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("epoch-"))
      .sortBy(p => p.getName.stripPrefix("epoch-").toLong)
      .map(_.toString)
  }

  /** Everything delivered so far, as a DataFrame (segments read
    * cluster-parallel — the audit/replay view of the wire log).
    */
  def readWireLog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val segs = listEpochs(dir).flatMap { e =>
      val p = new Path(e)
      fs(p).listStatus(p).toSeq.map(_.getPath.toString)
        .filter(_.endsWith(".wire"))
    }
    spark.sparkContext.parallelize(segs, math.max(1, segs.size))
      .flatMap(readSegment).toDF()
  }
}

class WireSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-wiresink"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WireSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WireSinkTable(properties.get("path"))
}

final class WireSinkTable(path: String) extends Table with SupportsWrite {
  require(path != null, "graft-wiresink requires option(\"path\", …)")
  override def name(): String = s"graft-wiresink($path)"
  override def schema(): StructType = WireSink.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fieldNames.sameElements(WireSink.schema.fieldNames),
      s"graft-wiresink expects columns ${WireSink.schema.fieldNames.mkString(",")}, " +
        s"got ${info.schema().fieldNames.mkString(",")} — reduce with WireSink.toTransport")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new WireBatchWrite(path, info.queryId())
        override def toStreaming: StreamingWrite = new WireStreamingWrite(path)
      }
    }
  }
}

final case class WireSegmentCommit(tempPath: String, rows: Long)
    extends WriterCommitMessage

/** Shared epoch-publish logic: move task temp files into `.tmp-<name>`,
  * rename to `<name>`; if `<name>` is already published (replay), drop the
  * temp files instead. Returns true if this call published.
  */
private object WirePublish {
  private def fs(p: Path): FileSystem = p.getFileSystem(new Configuration())

  def publish(dir: String, name: String,
      messages: Array[WriterCommitMessage]): Boolean = {
    val root = new Path(dir)
    val filesystem = fs(root)
    filesystem.mkdirs(root)
    val dest = new Path(root, name)
    val parts = messages.collect { case m: WireSegmentCommit => m }
    if (filesystem.exists(dest)) { // replayed epoch — exactly-once no-op
      parts.filter(_.tempPath.nonEmpty)
        .foreach(m => filesystem.delete(new Path(m.tempPath), false))
      return false
    }
    val tmp = new Path(root, s".tmp-$name")
    if (filesystem.exists(tmp)) filesystem.delete(tmp, true) // stale attempt
    filesystem.mkdirs(tmp)
    parts.zipWithIndex.foreach { case (m, i) =>
      if (m.tempPath.nonEmpty) { // empty partitions write no file
        val src = new Path(m.tempPath)
        if (filesystem.exists(src))
          require(filesystem.rename(src, new Path(tmp, f"part-$i%05d.wire")),
            s"move $src into $tmp failed")
      }
    }
    if (!filesystem.rename(tmp, dest)) {
      // lost a publish race (two attempts of the same epoch): treat as replay
      require(filesystem.exists(dest), s"rename $tmp -> $dest failed")
      filesystem.delete(tmp, true)
      false
    } else true
  }

  def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: WireSegmentCommit if m.tempPath.nonEmpty => m }
      .foreach { m =>
        val p = new Path(m.tempPath)
        fs(p).delete(p, false): Unit
      }
}

final class WireStreamingWrite(dir: String) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new WireWriterFactory(dir)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    WirePublish.publish(dir, s"epoch-$epochId", messages): Unit
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    WirePublish.abort(messages)
}

final class WireBatchWrite(dir: String, queryId: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new WireWriterFactory(dir)
  // batch publishes keyed by queryId: re-running the same job republishes
  // under a fresh id; a driver-side retry of the same write is a no-op
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    WirePublish.publish(dir, s"epoch-batch-$queryId", messages): Unit
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    WirePublish.abort(messages)
}

final class WireWriterFactory(dir: String)
    extends StreamingDataWriterFactory with DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new WireDataWriter(dir, partitionId, taskId, epochId)
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId, -1L)
}

/** Streams its partition to one `.inflight` temp file; `commit` hands the
  * path to the driver, `abort` deletes it. Rows are written as they
  * arrive — memory use is one IO buffer regardless of partition size.
  */
final class WireDataWriter(dir: String, partitionId: Int, taskId: Long,
    epochId: Long) extends DataWriter[InternalRow] {
  private val path = new Path(dir,
    s".inflight-$epochId-$partitionId-$taskId-${UUID.randomUUID()}")
  private val filesystem = path.getFileSystem(new Configuration())
  private var out: DataOutputStream = _
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    if (out == null) { // lazy: empty partitions produce no file
      filesystem.mkdirs(path.getParent)
      out = new DataOutputStream(filesystem.create(path, true))
      out.writeInt(WireSink.Magic)
      out.writeInt(WireSink.Version)
    }
    WireSink.writeRecord(out,
      row.getUTF8String(0).toString,
      row.getUTF8String(1).toString,
      if (row.isNullAt(2)) null else row.getUTF8String(2).toString,
      row.getUTF8String(3).toString)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    WireSegmentCommit(if (out == null) "" else path.toString, rows)
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); filesystem.delete(path, false) }: Unit
  }

  override def close(): Unit = ()
}
