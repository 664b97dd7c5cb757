package graft

import graft.config.PipelineSpec
import graft.sinks.SinkDispatch
import graft.sources.{PgOutput, PgStream, WalSpool, WalSpoolProvider}
import graft.sources.PgOutput._
import graft.streaming.SlotRuntime
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Multiple SLOTS on one SparkSession — the reference runs one
  * supervisor per replication slot (`/root/reference/lib/sequin/runtime/
  * supervisor.ex:234`), and the Spark rendition is one [[SlotRuntime]]
  * (own spool, own checkpoint, own streaming query) per slot sharing the
  * session/cluster. The contract under test: a slow slot never gates its
  * sibling (independent queries, per-lane scheduler pools), and slots
  * stop/restart INDEPENDENTLY — one slot's shutdown loses nothing and
  * the restarted slot resumes from its own checkpoint while the sibling
  * keeps serving.
  */
class MultiSlotSpec extends SparkSpec {

  private final class CountingRedis {
    val xadds = new ConcurrentLinkedQueue[String]()
    // held gate: XADDs block until release() — the deterministic "slow
    // slot" (no timing race: the slot CANNOT finish while held)
    @volatile var gate: java.util.concurrent.CountDownLatch = null
    private val server =
      new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    private val acceptor = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        val t = new Thread(() => {
          val in = sock.getInputStream
          val out = sock.getOutputStream
          def line(): String = {
            val sb = new StringBuilder
            var c = in.read()
            while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
            in.read(); sb.toString
          }
          try while (true) {
            if (in.read() < 0) throw new java.io.EOFException
            val n = line().toInt
            val args = (0 until n).map { _ =>
              in.read()
              val len = line().toInt
              val buf = new Array[Byte](len)
              var off = 0
              while (off < len) off += in.read(buf, off, len - off)
              in.read(); in.read()
              new String(buf, UTF_8)
            }
            if (args.head == "XADD") {
              val g = gate
              if (g != null) g.await()
              xadds.add(args.mkString("|"))
            }
            out.write("$3\r\n1-1\r\n".getBytes(UTF_8)); out.flush()
          } catch { case _: Exception => sock.close() }
        })
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    def stop(): Unit = server.close()
    def ids(): Vector[Long] = xadds.asScala.toVector.flatMap(x =>
      "\"id\":(\\d+)".r.findFirstMatchIn(x).map(_.group(1).toLong))
  }

  private val relation = Relation(16384L, "public", "events_src", "d", Seq(
    RelationColumn("event_id", isKey = true, 20L, -1),
    RelationColumn("user_id", isKey = false, 20L, -1),
    RelationColumn("event_type", isKey = false, 25L, -1),
    RelationColumn("value", isKey = false, 701L, -1),
    RelationColumn("props", isKey = false, 3802L, -1)))

  private def txn(eventId: Long, seqBase: Long): Seq[PgStream.Frame] = {
    val lsn = eventId * 8
    val cells = Seq(Cell.Text(eventId.toString), Cell.Text("1"),
      Cell.Text("purchase"), Cell.Text("5.0"), Cell.Text("{}"))
    Seq(
      PgStream.Frame("slot", seqBase,
        PgOutput.encode(Begin(lsn, eventId * 1000, eventId))),
      PgStream.Frame("slot", seqBase + 1,
        PgOutput.encode(Insert(16384L, cells))),
      PgStream.Frame("slot", seqBase + 2,
        PgOutput.encode(Commit(0, lsn, lsn + 8, eventId * 1000))))
  }

  private def cfgFor(name: String): graft.streaming.ConsumerConfig =
    PipelineSpec.parse(
      s"""{"name":"$name",
         |"destination":{"type":"redis_stream","stream_key":"k"}}"""
        .stripMargin)

  /** One slot: its own spool dir, checkpoint and shared query, two
    * lanes on `srv`.
    */
  private final class Slot(tag: String, srv: CountingRedis) {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dir: String =
      java.nio.file.Files.createTempDirectory(s"mslot_${tag}_wal").toString
    val ckpt: String =
      java.nio.file.Files.createTempDirectory(s"mslot_${tag}_ck").toString
    private val metrics = new graft.config.Metrics.Registry()
    private val health = new graft.config.Health.Registry()
    private var seg = 0
    private var frameSeq = 10L
    var runtime: SlotRuntime = _

    def start(): SlotRuntime = {
      val decoded = PgStream.decodeStateful(
        spark.readStream.format(classOf[WalSpoolProvider].getName)
          .option("path", dir).load().as[PgStream.Frame])
      val typed = PgStream.toRecords(decoded.toDF(), relation)
        .select(col("event_id"),
          timestamp_micros(col("commit_ts_us")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      runtime = new SlotRuntime(graft.model.Cdc.fromEvents(typed),
        checkpointLocation = Some(ckpt))
      runtime.attach(cfgFor(s"$tag-0"),
        SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
        metrics, health, s"$tag-0")
      runtime.attach(cfgFor(s"$tag-1"),
        SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
        metrics, health, s"$tag-1")
      runtime.query // both lanes attached — start
      runtime
    }

    /** Append `ids` as one segment (relation header on the first). */
    def write(ids: Seq[Long]): Unit = {
      val frames = ids.flatMap { id =>
        val f = txn(id, frameSeq); frameSeq += 10; f
      }
      val withRel =
        if (seg == 0)
          PgStream.Frame("slot", 1L, PgOutput.encode(relation)) +: frames
        else frames
      WalSpool.writeSegment(dir, WalSpool.segmentName(seg.toLong), withRel)
      seg += 1
    }
  }

  test("two slots on one session: a slow slot never gates its sibling; " +
      "slots stop and restart independently from their own checkpoints " +
      "while the sibling keeps serving") {
    val srvA = new CountingRedis()
    val srvB = new CountingRedis()
    val a = new Slot("a", srvA)
    val b = new Slot("b", srvB)
    try {
      a.start(); b.start()
      // ---- non-starvation, deterministically: A's transport is HELD
      // (every XADD blocks on the gate), B must still complete its own
      // work in full — independent queries share the session without a
      // cross-slot fence
      srvA.gate = new java.util.concurrent.CountDownLatch(1)
      val idsA1 = (1001L to 1050L)
      val idsB1 = (2001L to 2050L)
      a.write(idsA1); b.write(idsB1)
      b.runtime.query.processAllAvailable()
      b.runtime.awaitQuiesce()
      assert(idsB1.forall(b2 => srvB.ids().contains(b2)),
        "slot B must be fully delivered while A's transport is held")
      assert(srvA.ids().isEmpty,
        "precondition: A's transport gate must actually hold")
      // A completes on its own clock once the transport recovers
      srvA.gate.countDown(); srvA.gate = null
      a.runtime.query.processAllAvailable()
      a.runtime.awaitQuiesce()
      assert(idsA1.forall(i => srvA.ids().contains(i)))
      // ---- independent stop/restart: stop A with UNPROCESSED segments
      // on its spool; B keeps serving; A restarts from its checkpoint
      a.runtime.stop()
      val idsA2 = (1051L to 1080L)
      a.write(idsA2) // lands while the slot is down
      val idsB2 = (2051L to 2080L)
      b.write(idsB2)
      b.runtime.query.processAllAvailable()
      b.runtime.awaitQuiesce()
      assert(idsB2.forall(i => srvB.ids().contains(i)),
        "slot B must keep serving while A is down")
      a.start() // fresh SlotRuntime, same spool + checkpoint
      a.runtime.query.processAllAvailable()
      a.runtime.awaitQuiesce()
      val aIds = srvA.ids()
      (idsA1 ++ idsA2).foreach(i =>
        assert(aIds.contains(i), s"missing $i on restarted slot A"))
      // exactly-once across the restart for each lane: every id at most
      // twice total (once per lane), none more
      aIds.groupBy(identity).foreach { case (id, hits) =>
        assert(hits.size <= 2, s"id $id delivered ${hits.size}x")
      }
      // B saw none of A's traffic
      assert(srvB.ids().forall(_ >= 2000L))
    } finally {
      try a.runtime.stop() catch { case _: Exception => () }
      try b.runtime.stop() catch { case _: Exception => () }
      srvA.stop(); srvB.stop()
    }
  }
}
