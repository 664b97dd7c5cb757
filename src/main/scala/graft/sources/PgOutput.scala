package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

/** Binary pgoutput logical-replication frame codec — the engine's real
  * ingestion boundary. Decodes the frames a Postgres `START_REPLICATION
  * (proto_version '1', publication_names ...)` stream emits into typed
  * messages whose text cells feed [[graft.types.ValueCaster]].
  *
  * Wire layout is the public PostgreSQL logical streaming replication
  * protocol (`protocol.sgml`, "Logical Replication Message Formats");
  * semantic reference: `/root/reference/lib/sequin/runtime/
  * postgres_adapter/decoder.ex:267-474` (frame dispatch, `'t'/'n'/'u'`
  * tuple cells, toast sentinel) and `oid_database.ex` (oid → type name).
  *
  * All integers are big-endian. LSNs are carried as a single u64
  * (`hi32 << 32 | lo32`); timestamps are converted from the PG epoch
  * (2000-01-01) to unix MICROSECONDS at the boundary so nothing downstream
  * ever sees a PG epoch.
  *
  * The [[encode]] side exists for tests and frame synthesis (the container
  * has no live Postgres): `decode(encode(m)) == m` is property-tested.
  */
object PgOutput {

  /** Unix micros of 2000-01-01T00:00:00Z — the PG timestamp epoch. */
  val PgEpochUnixMicros: Long = 946684800000000L

  // ---------------------------------------------------------------- cells

  /** One column value inside a tuple. */
  sealed trait Cell extends Serializable
  object Cell {
    /** `'n'` — SQL NULL. */
    case object Null extends Cell
    /** `'u'` — TOAST column omitted from the wire (decoder.ex:428-430). */
    case object UnchangedToast extends Cell
    /** `'t'` — text-format value (len-prefixed bytes, UTF-8). */
    final case class Text(value: String) extends Cell
  }

  /** Cells → the text form [[graft.types.ValueCaster.cast]] consumes:
    * NULL stays null, toast becomes the sentinel string.
    */
  def textCells(cells: Seq[Cell]): Seq[String] = cells.map {
    case Cell.Null           => null
    case Cell.UnchangedToast => graft.types.ValueCaster.ToastSentinel
    case Cell.Text(v)        => v
  }

  // ------------------------------------------------------------- messages

  sealed trait PgMessage extends Serializable

  final case class Begin(finalLsn: Long, commitTsMicros: Long, xid: Long)
      extends PgMessage
  final case class Commit(flags: Int, lsn: Long, endLsn: Long,
      commitTsMicros: Long) extends PgMessage
  final case class Origin(originLsn: Long, name: String) extends PgMessage
  final case class RelationColumn(name: String, isKey: Boolean, typeOid: Long,
      typeModifier: Int) {
    /** pg type name via the oid map; unknown oids fall back to text. */
    def pgType: String = OidNames.nameFor(typeOid)
  }
  final case class Relation(id: Long, namespace: String, name: String,
      replicaIdentity: String, columns: Seq[RelationColumn]) extends PgMessage
  final case class Insert(relationId: Long, tuple: Seq[Cell]) extends PgMessage
  final case class Update(relationId: Long, oldTuple: Option[Seq[Cell]],
      keyTuple: Option[Seq[Cell]], tuple: Seq[Cell]) extends PgMessage
  final case class Delete(relationId: Long, oldTuple: Option[Seq[Cell]],
      keyTuple: Option[Seq[Cell]]) extends PgMessage
  final case class Truncate(options: Int, relationIds: Seq[Long])
      extends PgMessage
  final case class PgType(id: Long, namespace: String, name: String)
      extends PgMessage
  final case class LogicalMessage(transactional: Boolean, lsn: Long,
      prefix: String, content: Array[Byte]) extends PgMessage {
    override def equals(o: Any): Boolean = o match {
      case m: LogicalMessage => m.transactional == transactional &&
        m.lsn == lsn && m.prefix == prefix &&
        java.util.Arrays.equals(m.content, content)
      case _ => false
    }
  }
  final case class Unsupported(data: Array[Byte]) extends PgMessage

  /** `X/Y` display form of an LSN (hi32/lo32 in hex), as `pg_lsn` prints. */
  def formatLsn(lsn: Long): String =
    f"${(lsn >>> 32).toInt}%X/${lsn.toInt}%X"

  // --------------------------------------------------------------- decode

  /** Decode one replication frame. Unknown tags → [[Unsupported]] (the
    * reference's catch-all, decoder.ex:407) rather than an exception — a
    * stream must survive protocol additions.
    */
  def decode(frame: Array[Byte]): PgMessage = {
    val buf = ByteBuffer.wrap(frame)
    try {
      (buf.get(): @annotation.switch) match {
        case 'B' =>
          Begin(buf.getLong, pgToUnixMicros(buf.getLong), u32(buf))
        case 'C' =>
          val flags = buf.get() & 0xff
          Commit(flags, buf.getLong, buf.getLong, pgToUnixMicros(buf.getLong))
        case 'O' =>
          Origin(buf.getLong, cstring(buf))
        case 'R' =>
          val id = u32(buf)
          val ns = cstring(buf)
          val name = cstring(buf)
          val ident = (buf.get().toChar).toString
          val ncols = buf.getShort & 0xffff
          val cols = (0 until ncols).map { _ =>
            val flags = buf.get() & 0xff
            val cname = cstring(buf)
            RelationColumn(cname, isKey = (flags & 1) == 1, u32(buf), buf.getInt)
          }
          Relation(id, ns, name, ident, cols)
        case 'I' =>
          val rel = u32(buf)
          require(buf.get() == 'N', "insert frame missing new-tuple marker")
          Insert(rel, tuple(buf))
        case 'U' =>
          val rel = u32(buf)
          var old: Option[Seq[Cell]] = None
          var key: Option[Seq[Cell]] = None
          var tag = buf.get().toChar
          if (tag == 'O') { old = Some(tuple(buf)); tag = buf.get().toChar }
          else if (tag == 'K') { key = Some(tuple(buf)); tag = buf.get().toChar }
          require(tag == 'N', s"update frame missing new tuple, saw '$tag'")
          Update(rel, old, key, tuple(buf))
        case 'D' =>
          val rel = u32(buf)
          buf.get().toChar match {
            case 'O' => Delete(rel, Some(tuple(buf)), None)
            case 'K' => Delete(rel, None, Some(tuple(buf)))
            case t   => throw new IllegalArgumentException(s"delete tuple tag '$t'")
          }
        case 'T' =>
          val n = u32(buf).toInt
          val opts = buf.get() & 0xff
          Truncate(opts, (0 until n).map(_ => u32(buf)))
        case 'Y' =>
          PgType(u32(buf), cstring(buf), cstring(buf))
        case 'M' =>
          val transactional = buf.get() != 0
          val lsn = buf.getLong
          val prefix = cstring(buf)
          val len = buf.getInt
          val content = new Array[Byte](len)
          buf.get(content)
          LogicalMessage(transactional, lsn, prefix, content)
        case _ => Unsupported(frame)
      }
    } catch { case _: Exception => Unsupported(frame) }
  }

  /** Truncate option bits → names (0b01 cascade, 0b10 restart identity). */
  def truncateOptions(options: Int): Seq[String] =
    Seq(1 -> "cascade", 2 -> "restart_identity")
      .collect { case (bit, name) if (options & bit) != 0 => name }

  private def tuple(buf: ByteBuffer): Seq[Cell] = {
    val n = buf.getShort & 0xffff
    (0 until n).map { _ =>
      (buf.get().toChar: @annotation.switch) match {
        case 'n' => Cell.Null
        case 'u' => Cell.UnchangedToast
        case 't' =>
          val len = buf.getInt
          val bytes = new Array[Byte](len)
          buf.get(bytes)
          Cell.Text(new String(bytes, UTF_8))
        case t => throw new IllegalArgumentException(s"tuple cell tag '$t'")
      }
    }
  }

  private def cstring(buf: ByteBuffer): String = {
    val out = new ArrayBuffer[Byte]()
    var b = buf.get()
    while (b != 0) { out += b; b = buf.get() }
    new String(out.toArray, UTF_8)
  }

  private def u32(buf: ByteBuffer): Long = buf.getInt & 0xffffffffL

  private def pgToUnixMicros(pgMicros: Long): Long = pgMicros + PgEpochUnixMicros

  // --------------------------------------------------------------- encode

  /** Encode a message back to its wire frame (tests / synthesis only). */
  def encode(msg: PgMessage): Array[Byte] = msg match {
    case Begin(finalLsn, ts, xid) =>
      val b = alloc(1 + 8 + 8 + 4)
      b.put('B'.toByte).putLong(finalLsn).putLong(ts - PgEpochUnixMicros)
        .putInt(xid.toInt)
      done(b)
    case Commit(flags, lsn, endLsn, ts) =>
      val b = alloc(1 + 1 + 8 + 8 + 8)
      b.put('C'.toByte).put(flags.toByte).putLong(lsn).putLong(endLsn)
        .putLong(ts - PgEpochUnixMicros)
      done(b)
    case Origin(lsn, name) =>
      val nb = name.getBytes(UTF_8)
      val b = alloc(1 + 8 + nb.length + 1)
      b.put('O'.toByte).putLong(lsn).put(nb).put(0.toByte)
      done(b)
    case Relation(id, ns, name, ident, cols) =>
      val colBytes = cols.map { c =>
        val cn = c.name.getBytes(UTF_8)
        val b = alloc(1 + cn.length + 1 + 4 + 4)
        b.put((if (c.isKey) 1 else 0).toByte).put(cn).put(0.toByte)
          .putInt(c.typeOid.toInt).putInt(c.typeModifier)
        done(b)
      }
      val nsb = ns.getBytes(UTF_8); val nb = name.getBytes(UTF_8)
      val b = alloc(1 + 4 + nsb.length + 1 + nb.length + 1 + 1 + 2 +
        colBytes.map(_.length).sum)
      b.put('R'.toByte).putInt(id.toInt).put(nsb).put(0.toByte)
        .put(nb).put(0.toByte).put(ident.head.toByte)
        .putShort(cols.size.toShort)
      colBytes.foreach(b.put)
      done(b)
    case Insert(rel, t) =>
      val tb = tupleBytes(t)
      val b = alloc(1 + 4 + 1 + tb.length)
      b.put('I'.toByte).putInt(rel.toInt).put('N'.toByte).put(tb)
      done(b)
    case Update(rel, old, key, t) =>
      val oldPart = old.map(o => 'O'.toByte +: tupleBytes(o))
        .orElse(key.map(k => 'K'.toByte +: tupleBytes(k)))
        .getOrElse(Array.empty[Byte])
      val tb = tupleBytes(t)
      val b = alloc(1 + 4 + oldPart.length + 1 + tb.length)
      b.put('U'.toByte).putInt(rel.toInt).put(oldPart).put('N'.toByte).put(tb)
      done(b)
    case Delete(rel, old, key) =>
      val (tag, t) = old.map(('O', _)).orElse(key.map(('K', _))).getOrElse(
        throw new IllegalArgumentException("delete needs an old or key tuple"))
      val tb = tupleBytes(t)
      val b = alloc(1 + 4 + 1 + tb.length)
      b.put('D'.toByte).putInt(rel.toInt).put(tag.toByte).put(tb)
      done(b)
    case Truncate(opts, rels) =>
      val b = alloc(1 + 4 + 1 + 4 * rels.size)
      b.put('T'.toByte).putInt(rels.size).put(opts.toByte)
      rels.foreach(r => b.putInt(r.toInt))
      done(b)
    case PgType(id, ns, name) =>
      val nsb = ns.getBytes(UTF_8); val nb = name.getBytes(UTF_8)
      val b = alloc(1 + 4 + nsb.length + 1 + nb.length + 1)
      b.put('Y'.toByte).putInt(id.toInt).put(nsb).put(0.toByte)
        .put(nb).put(0.toByte)
      done(b)
    case LogicalMessage(transactional, lsn, prefix, content) =>
      val pb = prefix.getBytes(UTF_8)
      val b = alloc(1 + 1 + 8 + pb.length + 1 + 4 + content.length)
      b.put('M'.toByte).put((if (transactional) 1 else 0).toByte)
        .putLong(lsn).put(pb).put(0.toByte).putInt(content.length).put(content)
      done(b)
    case Unsupported(data) => data
  }

  private def tupleBytes(cells: Seq[Cell]): Array[Byte] = {
    val parts = cells.map {
      case Cell.Null           => Array('n'.toByte)
      case Cell.UnchangedToast => Array('u'.toByte)
      case Cell.Text(v) =>
        val vb = v.getBytes(UTF_8)
        val b = alloc(1 + 4 + vb.length)
        b.put('t'.toByte).putInt(vb.length).put(vb)
        done(b)
    }
    val b = alloc(2 + parts.map(_.length).sum)
    b.putShort(cells.size.toShort)
    parts.foreach(b.put)
    done(b)
  }

  private def alloc(n: Int) = ByteBuffer.allocate(n)
  private def done(b: ByteBuffer): Array[Byte] = {
    require(!b.hasRemaining, "frame size mismatch")
    b.array()
  }
}

/** pg_catalog OID → type name for the types the engine casts
  * (oid_database.ex; the full table is generated from `pg_type` — these
  * OIDs are stable public Postgres catalog constants). Unknown oids decay
  * to "text", matching ValueCaster's raw-string fallback.
  */
object OidNames {
  private val names: Map[Long, String] = Map(
    16L -> "bool", 17L -> "bytea", 18L -> "char", 19L -> "name",
    20L -> "int8", 21L -> "int2", 23L -> "int4", 25L -> "text",
    26L -> "oid", 114L -> "json", 142L -> "xml", 700L -> "float4",
    701L -> "float8", 790L -> "money", 1042L -> "bpchar",
    1043L -> "varchar", 1082L -> "date", 1083L -> "time",
    1114L -> "timestamp", 1184L -> "timestamptz", 1186L -> "interval",
    1266L -> "timetz", 1700L -> "numeric", 2950L -> "uuid",
    3802L -> "jsonb",
    // array element oids (leading _ = array of, like the wire names)
    1000L -> "_bool", 1001L -> "_bytea", 1005L -> "_int2", 1007L -> "_int4",
    1016L -> "_int8", 1009L -> "_text", 1021L -> "_float4",
    1022L -> "_float8", 1015L -> "_varchar", 1182L -> "_date",
    1115L -> "_timestamp", 1185L -> "_timestamptz", 1231L -> "_numeric",
    199L -> "_json", 3807L -> "_jsonb", 2951L -> "_uuid")

  def nameFor(oid: Long): String = names.getOrElse(oid, "text")

  def oidFor(name: String): Long =
    names.collectFirst { case (k, v) if v == name => k }.getOrElse(25L)
}
