package graft.sources

import java.time.ZoneOffset
import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Tuple-keyset DataSourceV2 parquet source (SURVEY §7.4): a
  * `SupportsPushDownFilters` scan that receives the FULL row-value
  * comparison — `Keyset.tuplePredicate`'s
  * `Or(GreaterThan(c1,v1), And(EqualTo(c1,v1), GreaterThan(c2,v2)))` —
  * and prunes parquet ROW GROUPS by evaluating that whole boolean tree
  * against footer min/max statistics, conservatively (a row group is
  * skipped only when the predicate cannot hold anywhere inside it).
  *
  * This models the reference's keyset scan boundary
  * (`lib/sequin/runtime/keyset_cursor.ex:93-113`: the row-value `WHERE
  * (c1,c2) > (?,?)` runs inside Postgres with index support); here the
  * "index" is parquet column statistics. Row-level evaluation stays with
  * Spark (every filter is returned as residual), so the source can never
  * change results — only skip I/O.
  *
  * One InputPartition per (file, row-group): at 100 TB the scan
  * parallelizes across row groups while later backfill pages prune
  * straight to the cursor's groups. The record decode uses parquet-mr's
  * example API (simple, row-at-a-time); swapping in a vectorized reader
  * changes no interface above `PartitionReader`.
  *
  * Usage: `spark.read.format(classOf[KeysetParquetProvider].getName)
  * .load(path)`.
  */
class KeysetParquetProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-keyset"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = KeysetParquet.listFiles(options.get("path"))
    require(files.nonEmpty, s"no parquet files under ${options.get("path")}")
    KeysetParquet.sparkSchema(KeysetParquet.footerSchema(files.head))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new KeysetParquetTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

final class KeysetParquetTable(path: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-keyset($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeysetScanBuilder(path, schema,
      Option(options.get("blocks")).map(KeysetParquet.decodeBlocks))
}

final class KeysetScanBuilder(path: String, schema: StructType,
    blocks: Option[Seq[KeysetRowGroupPartition]] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = schema

  /** Accept every filter we can evaluate against stats; return ALL of
    * them as residual — Spark re-checks rows, the source only skips row
    * groups, so pushdown can prune but never corrupt.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(KeysetParquet.supportedForStats)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new KeysetScan(path, required, pushed, blocks)
}

final class KeysetScan(path: String, required: StructType,
    pushed: Array[Filter],
    blocks: Option[Seq[KeysetRowGroupPartition]] = None) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-keyset $path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}" +
      blocks.fold("")(b => s", Blocks: ${b.size}")

  /** With an explicit `blocks` option the scan reads EXACTLY those row
    * groups (the boundary-scan half of `Keyset.fastRemainingCount` —
    * row groups whose stats straddle the cursor); otherwise list + prune
    * by footer stats as usual.
    */
  override def planInputPartitions(): Array[InputPartition] =
    blocks match {
      case Some(bs) => bs.map(b => b: InputPartition).toArray
      case None =>
        // session zone for mixed-domain timestamp stats (Catalyst folds
        // casts into pushed literals, so pushed filters are same-domain
        // in practice — this is belt-and-braces, not load-bearing)
        val zone = try java.time.ZoneId.of(org.apache.spark.sql.SparkSession
          .active.sessionState.conf.sessionLocalTimeZone)
        catch { case _: Throwable => java.time.ZoneOffset.UTC }
        KeysetParquet.listFiles(path).flatMap { file =>
          val (msgType, blocks) = KeysetParquet.footerBlocks(file)
          val sparkFull = KeysetParquet.sparkSchema(msgType)
          blocks.collect {
            case (start, len, stats)
                if pushed.forall(f =>
                  KeysetParquet.couldMatch(f, stats, sparkFull, zone)) =>
              KeysetRowGroupPartition(file, start, len): InputPartition
          }
        }.toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new KeysetReaderFactory(required.fieldNames)
}

final case class KeysetRowGroupPartition(file: String, blockStart: Long,
    blockLen: Long) extends InputPartition

final class KeysetReaderFactory(requiredCols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KeysetRowGroupPartition]
    new KeysetRowGroupReader(p.file, p.blockStart, p.blockLen, requiredCols)
  }
}

/** Reads one row group of one file, projected to `requiredCols`. */
final class KeysetRowGroupReader(file: String, blockStart: Long,
    blockLen: Long, requiredCols: Array[String])
    extends PartitionReader[InternalRow] {
  private val inputFile =
    HadoopInputFile.fromPath(new Path(file), new Configuration())
  // parquet selects the row groups whose MIDPOINT falls in the range, so
  // cover exactly this block's [start, start + compressedSize)
  private val reader = new ParquetFileReader(inputFile,
    ParquetReadOptions.builder().withRange(blockStart, blockStart + blockLen).build())
  private val fullType = reader.getFooter.getFileMetaData.getSchema
  private val projection: MessageType = new MessageType("spark_schema",
    requiredCols.map(c => fullType.getType(fullType.getFieldIndex(c))): _*)
  reader.setRequestedSchema(projection)

  private val pages = reader.readNextRowGroup()
  private val recordReader =
    if (pages == null) null
    else new ColumnIOFactory().getColumnIO(projection)
      .getRecordReader(pages, new GroupRecordConverter(projection))
  private val total = if (pages == null) 0L else pages.getRowCount
  private var consumed = 0L
  private var current: InternalRow = _

  override def next(): Boolean =
    if (consumed >= total) false
    else {
      current = KeysetParquet.groupToRow(recordReader.read(), projection)
      consumed += 1
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

object KeysetParquet {

  /** List parquet files via the Hadoop FileSystem (same path resolution
    * as the reader side, so HDFS/S3 paths work, not just local ones).
    */
  def listFiles(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).toSeq.map(_.getPath.toString)
        .filter(_.endsWith(".parquet")).sorted
    else Seq(path)
  }

  def footerSchema(file: String): MessageType = {
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }

  /** One row group's footer metadata: byte range, normalized (min,max)
    * stats, per-column null counts (−1 when the writer didn't record
    * one), and the exact row count.
    */
  final case class BlockMeta(start: Long, len: Long,
      stats: Map[String, (Any, Any)], nulls: Map[String, Long], rows: Long)

  def footerBlockMeta(file: String): (MessageType, Seq[BlockMeta]) = {
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    try {
      val msgType = r.getFooter.getFileMetaData.getSchema
      import scala.jdk.CollectionConverters._
      val blocks = r.getFooter.getBlocks.asScala.toSeq.map { b =>
        val cols = b.getColumns.asScala
        val stats = cols.flatMap { c =>
          val s = c.getStatistics
          val name = c.getPath.toDotString
          if (s == null || !s.hasNonNullValue) None
          else {
            val prim = msgType.getType(msgType.getFieldIndex(name))
              .asPrimitiveType()
            for {
              lo <- normalizeStat(s.genericGetMin, prim)
              hi <- normalizeStat(s.genericGetMax, prim)
            } yield name -> (lo, hi)
          }
        }.toMap
        val nulls = cols.map { c =>
          val s = c.getStatistics
          c.getPath.toDotString ->
            (if (s == null || !s.isNumNullsSet) -1L else s.getNumNulls)
        }.toMap
        BlockMeta(b.getStartingPos, b.getCompressedSize, stats, nulls,
          b.getRowCount)
      }
      (msgType, blocks)
    } finally r.close()
  }

  /** Footer blocks: (startingPos, compressedSize, normalized (min,max)). */
  def footerBlocks(file: String): (MessageType, Seq[(Long, Long, Map[String, (Any, Any)])]) = {
    val (msgType, metas) = footerBlockMeta(file)
    (msgType, metas.map(m => (m.start, m.len, m.stats)))
  }

  /** Wire form of a row-group list for the `blocks` read option —
    * grouped PER FILE (the path appears once, then `start,len` offset
    * pairs), so the option string is O(files + groups*digits) instead of
    * O(groups*path-length): on a degraded/unsorted layout where many
    * groups straddle the cursor, repeating a long object-store path per
    * group dominated the driver-held string.
    */
  def encodeBlocks(bs: Seq[KeysetRowGroupPartition]): String = {
    val byFile = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
    bs.foreach(b => byFile.getOrElseUpdate(b.file,
      scala.collection.mutable.ArrayBuffer.empty) += ((b.blockStart, b.blockLen)))
    byFile.map { case (f, offs) =>
      f + "\u0001" + offs.map { case (s, l) => s"$s,$l" }.mkString("\u0002")
    }.mkString("\u0003")
  }

  def decodeBlocks(s: String): Seq[KeysetRowGroupPartition] =
    if (s.isEmpty) Seq.empty
    else s.split('\u0003').toSeq.flatMap { filePart =>
      val Array(f, offs) = filePart.split('\u0001')
      offs.split('\u0002').toSeq.map { o =>
        val Array(st, ln) = o.split(',')
        KeysetRowGroupPartition(f, st.toLong, ln.toLong)
      }
    }

  /** parquet MessageType → the Spark schema `spark.read.parquet` infers
    * for the same file (so swapping sources never changes results).
    */
  def sparkSchema(msgType: MessageType): StructType = {
    import scala.jdk.CollectionConverters._
    StructType(msgType.getFields.asScala.toSeq.map { f =>
      val prim = f.asPrimitiveType()
      val dt = (prim.getPrimitiveTypeName, prim.getLogicalTypeAnnotation) match {
        case (INT64, ts: TimestampLogicalTypeAnnotation) =>
          if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
        case (INT64, _)   => LongType
        case (INT32, _: DateLogicalTypeAnnotation) => DateType
        case (INT32, _)   => IntegerType
        case (DOUBLE, _)  => DoubleType
        case (FLOAT, _)   => FloatType
        case (BOOLEAN, _) => BooleanType
        case (BINARY, _: StringLogicalTypeAnnotation) => StringType
        case (BINARY, _)  => BinaryType
        case (t, l) => throw new UnsupportedOperationException(
          s"graft-keyset: unsupported parquet type $t ($l) for ${f.getName}")
      }
      StructField(f.getName, dt, nullable = true)
    })
  }

  /** One decoded record → InternalRow in projection order. */
  def groupToRow(g: Group, projection: MessageType): InternalRow = {
    val n = projection.getFieldCount
    val values = new Array[Any](n)
    var i = 0
    while (i < n) {
      values(i) =
        if (g.getFieldRepetitionCount(i) == 0) null
        else {
          val prim = projection.getType(i).asPrimitiveType()
          (prim.getPrimitiveTypeName, prim.getLogicalTypeAnnotation) match {
            case (INT64, ts: TimestampLogicalTypeAnnotation) =>
              g.getLong(i, 0) * tsUnitToMicros(ts) // Spark internal = micros
            case (INT64, _)   => g.getLong(i, 0)
            case (INT32, _: DateLogicalTypeAnnotation) => g.getInteger(i, 0)
            case (INT32, _)   => g.getInteger(i, 0)
            case (DOUBLE, _)  => g.getDouble(i, 0)
            case (FLOAT, _)   => g.getFloat(i, 0)
            case (BOOLEAN, _) => g.getBoolean(i, 0)
            case (BINARY, _: StringLogicalTypeAnnotation) =>
              UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
            case (BINARY, _)  => g.getBinary(i, 0).getBytes
            case (t, l) => throw new UnsupportedOperationException(
              s"graft-keyset: unsupported parquet type $t ($l)")
          }
        }
      i += 1
    }
    new GenericInternalRow(values)
  }

  private def tsUnitToMicros(ts: TimestampLogicalTypeAnnotation): Long =
    ts.getUnit match {
      case TimeUnit.MILLIS => 1000L
      case TimeUnit.MICROS => 1L
      case u => throw new UnsupportedOperationException(s"timestamp unit $u")
    }

  /** Filters whose stats evaluation we implement. */
  def supportedForStats(f: Filter): Boolean = f match {
    case And(l, r)              => supportedForStats(l) && supportedForStats(r)
    case Or(l, r)               => supportedForStats(l) && supportedForStats(r)
    case _: GreaterThan         => true
    case _: GreaterThanOrEqual  => true
    case _: LessThan            => true
    case _: LessThanOrEqual     => true
    case _: EqualTo             => true
    case _: IsNotNull           => true
    case _                      => false
  }

  /** Conservative row-group test: false ONLY when `f` cannot hold for any
    * row given the column (min, max); anything uncertain returns true.
    */
  def couldMatch(f: Filter, stats: Map[String, (Any, Any)],
      schema: StructType,
      zone: java.time.ZoneId = ZoneOffset.UTC): Boolean = f match {
    case And(l, r) =>
      couldMatch(l, stats, schema, zone) && couldMatch(r, stats, schema, zone)
    case Or(l, r) =>
      couldMatch(l, stats, schema, zone) || couldMatch(r, stats, schema, zone)
    case GreaterThan(a, v) =>
      bound(a, stats).forall { case (_, hi) => cmp(hi, norm(v), zone).forall(_ > 0) }
    case GreaterThanOrEqual(a, v) =>
      bound(a, stats).forall { case (_, hi) => cmp(hi, norm(v), zone).forall(_ >= 0) }
    case LessThan(a, v) =>
      bound(a, stats).forall { case (lo, _) => cmp(lo, norm(v), zone).forall(_ < 0) }
    case LessThanOrEqual(a, v) =>
      bound(a, stats).forall { case (lo, _) => cmp(lo, norm(v), zone).forall(_ <= 0) }
    case EqualTo(a, v) =>
      bound(a, stats).forall { case (lo, hi) =>
        cmp(lo, norm(v), zone).forall(_ <= 0) && cmp(hi, norm(v), zone).forall(_ >= 0)
      }
    case _ => true
  }

  /** Conservative every-row test: true ONLY when `f` provably holds for
    * EVERY row of the group given (min, max) and a recorded zero null
    * count (a null never satisfies a comparison, so unknown or nonzero
    * nulls disqualify); anything uncertain returns false. The dual of
    * [[couldMatch]] — together they classify a row group as fully-in /
    * fully-out / boundary, which is what lets
    * `Keyset.fastRemainingCount` count fully-in groups from footer
    * metadata alone.
    */
  def mustMatch(f: Filter, stats: Map[String, (Any, Any)],
      nulls: Map[String, Long],
      zone: java.time.ZoneId = ZoneOffset.UTC): Boolean = {
    def noNulls(a: String): Boolean = nulls.get(a).contains(0L)
    f match {
      case And(l, r) =>
        mustMatch(l, stats, nulls, zone) && mustMatch(r, stats, nulls, zone)
      case Or(l, r) =>
        mustMatch(l, stats, nulls, zone) || mustMatch(r, stats, nulls, zone)
      case GreaterThan(a, v) => noNulls(a) &&
        bound(a, stats).exists { case (lo, _) => cmp(lo, norm(v), zone).exists(_ > 0) }
      case GreaterThanOrEqual(a, v) => noNulls(a) &&
        bound(a, stats).exists { case (lo, _) => cmp(lo, norm(v), zone).exists(_ >= 0) }
      case LessThan(a, v) => noNulls(a) &&
        bound(a, stats).exists { case (_, hi) => cmp(hi, norm(v), zone).exists(_ < 0) }
      case LessThanOrEqual(a, v) => noNulls(a) &&
        bound(a, stats).exists { case (_, hi) => cmp(hi, norm(v), zone).exists(_ <= 0) }
      case EqualTo(a, v) => noNulls(a) &&
        bound(a, stats).exists { case (lo, hi) =>
          cmp(lo, norm(v), zone).exists(_ == 0) && cmp(hi, norm(v), zone).exists(_ == 0)
        }
      case IsNotNull(a) => noNulls(a)
      case _ => false
    }
  }

  private def bound(col: String, stats: Map[String, (Any, Any)]) =
    stats.get(col)

  /** A timestamp value with its DOMAIN made explicit: `instantDomain`
    * means micros since the epoch (parquet isAdjustedToUTC=true, or an
    * Instant/Timestamp literal); otherwise wall-clock micros (parquet
    * TimestampNTZ, or a LocalDateTime literal). Same-domain comparisons
    * are zone-free; MIXED comparisons go through the session timezone —
    * exactly the cast Spark's row-level filter applies — because an
    * all-UTC assumption silently mis-classifies row groups under a
    * non-UTC session (a LocalDateTime cursor against an instant column
    * is the q103 shape).
    */
  private[sources] final case class TsMicros(micros: Long,
      instantDomain: Boolean)

  /** Normalize a footer stat value to the comparable domain. */
  private def normalizeStat(v: Any, prim: PrimitiveType): Option[Any] =
    (prim.getPrimitiveTypeName, prim.getLogicalTypeAnnotation) match {
      case (INT64, ts: TimestampLogicalTypeAnnotation) =>
        Some(TsMicros(
          v.asInstanceOf[java.lang.Long].longValue * tsUnitToMicros(ts),
          ts.isAdjustedToUTC))
      case (INT64, _) | (INT32, _: DateLogicalTypeAnnotation) | (INT32, _) =>
        Some(BigDecimal(v.asInstanceOf[Number].longValue))
      case (DOUBLE, _) | (FLOAT, _) =>
        Some(BigDecimal(v.asInstanceOf[Number].doubleValue))
      case (BINARY, _: StringLogicalTypeAnnotation) =>
        Some(v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
      case _ => None // unsupported stat type: never prune on it
    }

  /** Normalize a Spark filter literal to the comparable domain. A
    * LocalDateTime is a WALL-CLOCK value (TimestampNTZ literal) — the
    * zone-free epoch-second mapping below is the wall domain encoding,
    * not a UTC interpretation; Instant/Timestamp are instant-domain.
    */
  private def norm(v: Any): Any = v match {
    case t: java.time.LocalDateTime =>
      TsMicros(t.toEpochSecond(ZoneOffset.UTC) * 1000000L +
        t.getNano / 1000L, instantDomain = false)
    case t: java.time.Instant =>
      TsMicros(t.getEpochSecond * 1000000L + t.getNano / 1000L,
        instantDomain = true)
    case t: java.sql.Timestamp =>
      TsMicros(t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L,
        instantDomain = true)
    case d: java.time.LocalDate => BigDecimal(d.toEpochDay)
    case d: java.sql.Date       => BigDecimal(d.toLocalDate.toEpochDay)
    case n: java.math.BigDecimal => BigDecimal(n)
    case n: Number if n.isInstanceOf[java.lang.Double] ||
        n.isInstanceOf[java.lang.Float] => BigDecimal(n.doubleValue)
    case n: Number              => BigDecimal(n.longValue)
    case s: String              => s
    case u: UTF8String          => u.toString
    case other                  => other
  }

  /** Wall↔instant conversion error for a zone is bounded by the SPREAD
    * of that zone's historical UTC offsets: the conversion assumes one
    * of the zone's offsets and the row's true offset is another, so
    * |error| ≤ max(offset) − min(offset) over the zone's rules. Inside
    * that band around a mixed-domain boundary the comparison ABSTAINS
    * (cmp = None), downgrading the group to a boundary scan — costs one
    * row-group read, never correctness. Computed per zone (cached):
    * ~1 h for ordinary DST zones (tighter than any fixed constant),
    * ~25 h for pathological histories like Pacific/Apia's 2011
    * date-line jump (where a fixed 4 h constant would mis-sign), 0 for
    * fixed-offset zones (exact conversion).
    */
  private val zoneSlackCache =
    new java.util.concurrent.ConcurrentHashMap[java.time.ZoneId, Long]()

  private def mixedTsSlackMicros(zone: java.time.ZoneId): Long =
    zoneSlackCache.computeIfAbsent(zone, { z =>
      val rules = z.getRules
      if (rules.isFixedOffset) 0L
      else {
        import scala.jdk.CollectionConverters._
        val transitionOffsets = rules.getTransitions.asScala.toSeq.flatMap(t =>
          Seq(t.getOffsetBefore.getTotalSeconds.toLong,
            t.getOffsetAfter.getTotalSeconds.toLong))
        // recurring (future DST) rules + the current instant's offset
        // cover zones whose transition LIST is empty but rules are not
        val recurring = rules.getTransitionRules.asScala.toSeq.flatMap(r =>
          Seq(r.getOffsetBefore.getTotalSeconds.toLong,
            r.getOffsetAfter.getTotalSeconds.toLong))
        val now = rules.getOffset(java.time.Instant.EPOCH)
          .getTotalSeconds.toLong
        val all = transitionOffsets ++ recurring :+ now
        (all.max - all.min) * 1000000L
      }
    })

  private def wallToInstantMicros(wall: Long, zone: java.time.ZoneId): Long = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(wall, 1000000L),
      Math.floorMod(wall, 1000000L).toInt * 1000, ZoneOffset.UTC)
    val inst = ldt.atZone(zone).toInstant
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  private def instantToWallMicros(inst: Long, zone: java.time.ZoneId): Long = {
    val ldt = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(Math.floorDiv(inst, 1000000L),
        Math.floorMod(inst, 1000000L) * 1000L), zone)
    ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }

  /** Compare within one domain; None (never prune) across domains.
    * Mixed timestamp domains convert the LITERAL side (`b`) into the
    * stat side's domain via `zone` — the session timezone, matching the
    * row-level cast — and abstain inside the DST slack band.
    */
  private def cmp(a: Any, b: Any, zone: java.time.ZoneId): Option[Int] =
    (a, b) match {
      case (x: TsMicros, y: TsMicros) if x.instantDomain == y.instantDomain =>
        Some(java.lang.Long.compare(x.micros, y.micros))
      case (x: TsMicros, y: TsMicros) =>
        val yConv =
          if (x.instantDomain) wallToInstantMicros(y.micros, zone)
          else instantToWallMicros(y.micros, zone)
        val d = x.micros - yConv
        if (Math.abs(d) <= mixedTsSlackMicros(zone)) None
        else Some(java.lang.Long.signum(d))
      case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
      case (x: String, y: String)         => Some(x.compareTo(y))
      case _                              => None
    }
}
