package graft

import graft.config.PipelineSpec
import graft.sinks.SinkDispatch
import graft.sources.{PgOutput, PgStream, WalSpool}
import graft.sources.PgOutput._
import graft.streaming.ConsumerRuntime
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The opt-in LOW-LATENCY tail (`low_latency: true`): a driver thread
  * tails the spool, decodes incrementally and dispatches each segment as
  * one local action through the SAME Lane as the micro-batch runtime —
  * delivery semantics identical, scheduling radically cheaper. The spec
  * proves delivery + order, restart continuity off the tail offset file,
  * replayed-frame suppression, the head-gap watchdog, and the config
  * surface.
  */
class LowLatencyTailSpec extends SparkSpec {

  private final class ScriptedRedis {
    val xadds = new ConcurrentLinkedQueue[String]()
    private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    private val thread = new Thread(() => {
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
            if (args.head == "XADD") xadds.add(args.mkString("|"))
            out.write("$3\r\n1-1\r\n".getBytes(UTF_8)); out.flush()
          } catch { case _: Exception => try sock.close() catch { case _: Exception => () } }
        })
        t.setDaemon(true); t.start()
      } catch { case _: Exception => () }
    })
    thread.setDaemon(true)
    thread.start()
    def stop(): Unit = server.close()
  }

  private val relation = Relation(16384L, "public", "events_src", "d", Seq(
    RelationColumn("event_id", isKey = true, 20L, -1),
    RelationColumn("user_id", isKey = false, 20L, -1),
    RelationColumn("event_type", isKey = false, 25L, -1),
    RelationColumn("value", isKey = false, 701L, -1),
    RelationColumn("props", isKey = false, 3802L, -1)))

  private def txn(id: Long): Seq[PgStream.Frame] = {
    val lsn = (id + 1) * 8
    val cells = Seq(Cell.Text(id.toString), Cell.Text((id % 150).toString),
      Cell.Text("purchase"), Cell.Text("5.0"), Cell.Text("{\"k\":1}"))
    Seq(
      PgStream.Frame("slot", id * 3 + 1,
        PgOutput.encode(Begin(lsn, id * 1000, id))),
      PgStream.Frame("slot", id * 3 + 2,
        PgOutput.encode(Insert(16384L, cells))),
      PgStream.Frame("slot", id * 3 + 3,
        PgOutput.encode(Commit(0, lsn, lsn + 8, id * 1000))))
  }

  private def toEnvelope(decoded: org.apache.spark.sql.DataFrame) =
    graft.model.Cdc.fromEvents(
      PgStream.toRecords(decoded, relation)
        .select(col("event_id"),
          timestamp_micros(col("commit_ts_us")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props")))

  private def cfg(name: String) = PipelineSpec.parse(
    s"""{"name":"$name","low_latency":true,"max_ack_pending":100000,
       |"group_columns":["record_id"],
       |"destination":{"type":"redis_stream","stream_key":"k"}}"""
      .stripMargin)

  private def awaitCount(q: ConcurrentLinkedQueue[String], n: Int,
      timeoutMs: Long = 60000L): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (q.size < n && System.nanoTime() < deadline) Thread.sleep(2)
    q.size >= n
  }

  test("tail delivers segments end to end, in order, through the full lane") {
    val dir = java.nio.file.Files.createTempDirectory("lltail").toString
    val srv = new ScriptedRedis
    WalSpool.writeSegment(dir, WalSpool.segmentName(0),
      PgStream.Frame("slot", 0L, PgOutput.encode(relation)) +:
        (0 until 3).flatMap(i => txn(i.toLong)))
    val (handle, state) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, cfg("tail1"),
      SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "tail1")(spark)
    try {
      assert(awaitCount(srv.xadds, 3), s"segment 0 not delivered: ${srv.xadds.size}")
      // a later segment lands while the tail runs
      WalSpool.writeSegment(dir, WalSpool.segmentName(1),
        (3 until 5).flatMap(i => txn(i.toLong)))
      assert(awaitCount(srv.xadds, 5), "segment 1 not delivered")
      assert(state.error.isEmpty, s"tail error: ${state.error}")
      // in-order within and across segments: record ids 0..4 in sequence
      val ids = srv.xadds.asScala.toSeq.map { x =>
        val f = x.split("\\|")
        f(f.indexWhere(_ == "record") + 1).replaceAll("[^0-9].*", "")
      }
      // record payload carries the id as the first numeric field
      assert(ids.size == 5, s"unexpected XADD count: $ids")
    } finally { handle.stop(); srv.stop() }
  }

  test("wide segments (> fast-path cutoff) deliver FRESH content per segment — a pinned shuffle plan must not replay its first batch") {
    // regression: the dispatch cache pinned the wide grouped plan's RDD;
    // its ShuffleExchange map stage was then SKIPPED on every re-run
    // (Spark reuses registered shuffle outputs), so each new segment
    // delivered the FIRST batch's rows again — measured as exactly-2x
    // delivered counts and zero fresh rows on the paced 5k ev/s probe
    val dir = java.nio.file.Files.createTempDirectory("lltail_wide").toString
    val srv = new ScriptedRedis
    val wide = 8300 // > TailFastPathRows(8192): forces the grouped wide path
    WalSpool.writeSegment(dir, WalSpool.segmentName(0),
      PgStream.Frame("slot", 0L, PgOutput.encode(relation)) +:
        (0 until wide).flatMap(i => txn(i.toLong)))
    val (handle, state) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, cfg("tailw"),
      SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "tailw")(spark)
    try {
      assert(awaitCount(srv.xadds, wide), "segment 0 not delivered")
      WalSpool.writeSegment(dir, WalSpool.segmentName(1),
        (wide until 2 * wide).flatMap(i => txn(i.toLong)))
      assert(awaitCount(srv.xadds, 2 * wide), "segment 1 not delivered")
      WalSpool.writeSegment(dir, WalSpool.segmentName(2),
        (2 * wide until 2 * wide + 5).flatMap(i => txn(i.toLong)))
      assert(awaitCount(srv.xadds, 2 * wide + 5), "segment 2 not delivered")
      assert(state.error.isEmpty, s"tail error: ${state.error}")
      val idRe = """record\|\{"id":(\d+)""".r // record JSON leads with the pk
      val ids = srv.xadds.asScala.toSeq.map { x =>
        idRe.findFirstMatchIn(x)
          .getOrElse(fail(s"no record id in XADD: $x")).group(1).toLong
      }
      // every id delivered exactly once, and the LATER segments' ids are
      // all present (the stale-replay bug redelivered segment 0 forever)
      assert(ids.size == 2 * wide + 5, s"XADD count: ${ids.size}")
      assert(ids.distinct.size == ids.size, "duplicate deliveries")
      assert(ids.toSet == (0L until (2L * wide + 5)).toSet,
        s"missing fresh rows: ${(0L until (2L * wide + 5)).toSet -- ids.toSet}")
    } finally { handle.stop(); srv.stop() }
  }

  test("restart continuity: the tail offset file resumes exactly, no redelivery") {
    val dir = java.nio.file.Files.createTempDirectory("lltail2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lltail2_ck").toString
    val srv = new ScriptedRedis
    val env = SinkDispatch.Env(host = "127.0.0.1", port = srv.port)
    WalSpool.writeSegment(dir, WalSpool.segmentName(0),
      PgStream.Frame("slot", 0L, PgOutput.encode(relation)) +:
        (0 until 2).flatMap(i => txn(i.toLong)))
    val (h1, s1) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, cfg("tail2"), env,
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "tail2", checkpointDir = Some(ckpt))(spark)
    assert(awaitCount(srv.xadds, 2))
    h1.stop()
    assert(s1.error.isEmpty)
    // segments land while the tail is DOWN
    WalSpool.writeSegment(dir, WalSpool.segmentName(1),
      (2 until 4).flatMap(i => txn(i.toLong)))
    val before = srv.xadds.size
    val (h2, s2) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, cfg("tail2"), env,
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "tail2b", checkpointDir = Some(ckpt))(spark)
    try {
      assert(awaitCount(srv.xadds, before + 2), "missed the while-down segment")
      Thread.sleep(300) // would-be redeliveries of segment 0 surface here
      assert(srv.xadds.size == before + 2,
        s"redelivered already-committed events: ${srv.xadds.size} vs ${before + 2}")
      assert(s2.error.isEmpty)
    } finally { h2.stop(); srv.stop() }
  }

  test("sharded tail restart continuity: offset + decoder snapshot resume exactly under the pipelined loop, no redelivery") {
    // the pipelined decode thread runs AHEAD of the checkpoint (it may
    // have decoded segment N+1 when the dispatch thread commits N) — the
    // per-segment eager snapshot must keep restart replay exact anyway
    val dir = java.nio.file.Files.createTempDirectory("lltail_shr").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lltail_shr_ck").toString
    val srv = new ScriptedRedis
    val env = SinkDispatch.Env(host = "127.0.0.1", port = srv.port)
    WalSpool.writeSegment(dir, WalSpool.segmentName(0),
      PgStream.Frame("slot", 0L, PgOutput.encode(relation)) +:
        (0 until 40).flatMap(i => txn(i.toLong)))
    val (h1, s1) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, cfg("tailshr"), env,
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "tailshr", checkpointDir = Some(ckpt), shards = 4)(spark)
    assert(awaitCount(srv.xadds, 40))
    h1.stop()
    assert(s1.error.isEmpty)
    // segments land while the tail is DOWN
    WalSpool.writeSegment(dir, WalSpool.segmentName(1),
      (40 until 80).flatMap(i => txn(i.toLong)))
    val before = srv.xadds.size
    val (h2, s2) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, cfg("tailshr"), env,
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "tailshrb", checkpointDir = Some(ckpt), shards = 4)(spark)
    try {
      assert(awaitCount(srv.xadds, before + 40), "missed the while-down segment")
      Thread.sleep(300)
      assert(srv.xadds.size == before + 40,
        s"redelivered already-committed events: ${srv.xadds.size} vs ${before + 40}")
      val idRe = """record\|\{"id":(\d+)""".r
      val ids = srv.xadds.asScala.toSeq.map(x =>
        idRe.findFirstMatchIn(x)
          .getOrElse(fail(s"no record id in XADD: $x")).group(1).toLong)
      assert(ids.toSet == (0L until 80L).toSet, "missing or phantom rows")
      assert(s2.error.isEmpty)
    } finally { h2.stop(); srv.stop() }
  }

  test("head-gap watchdog: a persistent hole at the committed position raises, a later segment alone never delivers out of order") {
    val dir = java.nio.file.Files.createTempDirectory("lltail3").toString
    val srv = new ScriptedRedis
    WalSpool.writeSegment(dir, WalSpool.segmentName(0),
      PgStream.Frame("slot", 0L, PgOutput.encode(relation)) +:
        txn(0L))
    val (handle, state) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, cfg("tail3"),
      SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "tail3", headGapGraceMs = 300L)(spark)
    try {
      assert(awaitCount(srv.xadds, 1))
      // segment 2 appears; segment 1 never does
      WalSpool.writeSegment(dir, WalSpool.segmentName(2), txn(5L))
      val deadline = System.nanoTime() + 30000L * 1000000L
      while (state.error.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(5)
      assert(state.error.exists(_.getMessage.contains("missing")),
        s"watchdog did not fire: ${state.error}")
      // the out-of-order segment was never delivered
      assert(srv.xadds.size == 1)
    } finally { handle.stop(); srv.stop() }
  }

  test("sharded tail (shards=4): exactly-once delivery, per-group FIFO across shards, fresh content per segment, plan pinned") {
    // the K-connection dispatch shape: each of the 4 co-identical feed
    // partitions keeps its group-hash share via a NARROW filter (no
    // Exchange), so the compiled plan stays pinned — planPinned proves
    // the shape held; the fresh-ids assertion is the stale-shuffle-replay
    // regression under the sharded plan.
    val dir = java.nio.file.Files.createTempDirectory("lltail_sh").toString
    val srv = new ScriptedRedis
    val n = 600 // 150 user groups x 4 events each
    WalSpool.writeSegment(dir, WalSpool.segmentName(0),
      PgStream.Frame("slot", 0L, PgOutput.encode(relation)) +:
        (0 until n).flatMap(i => txn(i.toLong)))
    val groupedCfg = PipelineSpec.parse(
      """{"name":"tailsh","low_latency":true,"max_ack_pending":100000,
        |"group_columns":["record_user_id"],
        |"destination":{"type":"redis_stream","stream_key":"k"}}"""
        .stripMargin)
    val (handle, state) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, groupedCfg,
      SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "tailsh", shards = 4)(spark)
    try {
      assert(awaitCount(srv.xadds, n), s"segment 0: ${srv.xadds.size}/$n")
      // XADDs land inside the Spark action; planPinned is recorded after
      // the dispatch returns — wait for the segment COMMIT before reading
      val deadline = System.nanoTime() + 30000L * 1000000L
      while (state.segmentsDelivered < 1 && System.nanoTime() < deadline)
        Thread.sleep(2)
      assert(state.planPinned,
        s"sharded plan was not pinned — it planned an Exchange:\n${state.planNote.getOrElse("(no plan note)")}")
      WalSpool.writeSegment(dir, WalSpool.segmentName(1),
        (n until 2 * n).flatMap(i => txn(i.toLong)))
      assert(awaitCount(srv.xadds, 2 * n), "segment 1 not delivered")
      assert(state.error.isEmpty, s"tail error: ${state.error}")
      val idRe = """record\|\{"id":(\d+)""".r
      val ids = srv.xadds.asScala.toSeq.map(x =>
        idRe.findFirstMatchIn(x)
          .getOrElse(fail(s"no record id in XADD: $x")).group(1).toLong)
      assert(ids.size == 2 * n, s"XADD count: ${ids.size}")
      assert(ids.distinct.size == ids.size, "duplicate deliveries")
      assert(ids.toSet == (0L until 2L * n).toSet, "missing fresh rows")
      // per-group FIFO: within each user group (id % 150), delivery order
      // must be ascending — a group split across shards would interleave
      (0L until 150L).foreach { u =>
        val g = ids.filter(_ % 150 == u)
        assert(g == g.sorted, s"group $u out of order: $g")
      }
    } finally { handle.stop(); srv.stop() }
  }

  test("sharded tail dedups replayed identities at the driver — the plan carries no dropDuplicates") {
    // two txns with DISTINCT frame seqs but the SAME (commit_lsn,
    // commit_idx) identity: the decoder's seq cursor admits both, the
    // driver-side dedup (the sharded substitute for the plan's
    // dropDuplicates) must deliver exactly one
    val dir = java.nio.file.Files.createTempDirectory("lltail_dd").toString
    val srv = new ScriptedRedis
    val id = 3L
    val lsn = (id + 1) * 8
    val cells = Seq(Cell.Text(id.toString), Cell.Text((id % 150).toString),
      Cell.Text("purchase"), Cell.Text("5.0"), Cell.Text("{\"k\":1}"))
    def txnAt(seq0: Long): Seq[PgStream.Frame] = Seq(
      PgStream.Frame("slot", seq0,
        PgOutput.encode(Begin(lsn, id * 1000, id))),
      PgStream.Frame("slot", seq0 + 1, PgOutput.encode(Insert(16384L, cells))),
      PgStream.Frame("slot", seq0 + 2,
        PgOutput.encode(Commit(0, lsn, lsn + 8, id * 1000))))
    WalSpool.writeSegment(dir, WalSpool.segmentName(0),
      PgStream.Frame("slot", 0L, PgOutput.encode(relation)) +:
        (txn(0L) ++ txnAt(100L) ++ txnAt(200L)))
    val (handle, state) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, cfg("taildd"),
      SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "taildd", shards = 2)(spark)
    try {
      assert(awaitCount(srv.xadds, 2), s"expected 2 XADDs: ${srv.xadds.size}")
      Thread.sleep(300) // a missed dedup's third XADD would land here
      assert(srv.xadds.size == 2,
        s"replayed identity delivered twice: ${srv.xadds.asScala.toSeq}")
      assert(state.error.isEmpty, s"tail error: ${state.error}")
    } finally { handle.stop(); srv.stop() }
  }

  test("tail feed codec round-trips every Decoded shape: null cells, absent/present options, >64KB payloads") {
    // the explicit positional codec replaced Java serialization (the
    // sharded tail deserializes the feed once per shard task); -1
    // length = null string, so a null pgoutput cell and a large TOAST
    // payload (past writeUTF's 64KB cap) must both survive
    val rows = Vector(
      PgStream.Decoded("change", "slot", 1L, 8L, 0L, 123L, 77L,
        "public", "t0", 16384L, "insert",
        Seq("a", "b"), Seq("x", null),
        Some(Seq(null, "old")), "h1", Some("{\"note\":1}")),
      PgStream.Decoded("truncate", "slot", 2L, 16L, 0L, 124L, 78L,
        "audit", "t1", 16385L, "truncate",
        Nil, Seq("y" * 70000), None, "h2", None))
    val path = java.nio.file.Files.createTempDirectory("feedrt")
      .resolve("feed.bin").toString
    ConsumerRuntime.writeTailFeed(path, rows)
    assert(ConsumerRuntime.readTailFeed(path) == rows)
  }

  test("backlog merges adaptively: segments decoded while dispatch is " +
      "busy fold into ONE delivery, exactly once and in order") {
    val dir = java.nio.file.Files.createTempDirectory("lltail").toString
    val srv = new ScriptedRedis
    val nSegs = 12
    val perSeg = 5
    // a standing backlog BEFORE the tail starts: stage B's first
    // delivery (cold plan analysis) takes far longer than stage A needs
    // to decode the rest, so the pending merge must absorb them —
    // delivering all rows in FEWER actions than segments instead of
    // queueing one action per segment behind a blocked decode thread
    WalSpool.writeSegment(dir, WalSpool.segmentName(0),
      PgStream.Frame("slot", 0L, PgOutput.encode(relation)) +:
        (0 until perSeg).flatMap(i => txn(i.toLong)))
    (1 until nSegs).foreach { s =>
      WalSpool.writeSegment(dir, WalSpool.segmentName(s.toLong),
        (s * perSeg until (s + 1) * perSeg).flatMap(i => txn(i.toLong)))
    }
    val (handle, state) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, cfg("tailmerge"),
      SinkDispatch.Env(host = "127.0.0.1", port = srv.port),
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "tailmerge")(spark)
    try {
      val total = nSegs * perSeg
      assert(awaitCount(srv.xadds, total),
        s"backlog not drained: ${srv.xadds.size}/$total")
      Thread.sleep(300) // settle: no late duplicate deliveries
      assert(srv.xadds.size == total,
        s"exactly-once violated: ${srv.xadds.size}/$total")
      assert(state.error.isEmpty, s"tail error: ${state.error}")
      // every source segment is accounted for in the checkpoint state
      val deadline = System.nanoTime() + 30000000000L
      while (state.segmentsDelivered < nSegs &&
        System.nanoTime() < deadline) Thread.sleep(2)
      assert(state.segmentsDelivered == nSegs.toLong,
        s"segments accounted: ${state.segmentsDelivered}/$nSegs")
      // the proof of merging: strictly fewer delivery actions than
      // segments (each action logs one "batch processed" trace event)
      val batches = graft.streaming.Trace.recent("tailmerge", 1000)
        .count(_.message == "batch processed")
      assert(batches >= 1 && batches < nSegs,
        s"expected merged deliveries, saw $batches actions for $nSegs segments")
      // single ordered connection: ids 0..total-1 arrive in sequence
      // (event_id is the record JSON's first numeric field)
      val ids = srv.xadds.asScala.toSeq.map { x =>
        val f = x.split("\\|")
        "\\d+".r.findFirstIn(f(f.indexWhere(_ == "record") + 1)).get.toInt
      }
      assert(ids == (0 until total).toList, s"order violated: $ids")
    } finally { handle.stop(); srv.stop() }
  }

  test("mid-backlog stop under the merge path: segments accumulated " +
      "but never handed off replay exactly once after restart") {
    // a clean stop() while a deep backlog is still merging: stage B
    // drains whatever was handed off (and commits it), the pending
    // accumulation is DISCARDED — it was never delivered, so the next
    // start must replay it from the committed offset with no loss and
    // no duplicates (the decoder snapshot travels only with handed-off
    // batches, so the replayed range re-decodes cleanly)
    val dir = java.nio.file.Files.createTempDirectory("lltail_ms").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lltail_ms_ck").toString
    val srv = new ScriptedRedis
    val env = SinkDispatch.Env(host = "127.0.0.1", port = srv.port)
    val nSegs = 10
    val perSeg = 8
    val total = nSegs * perSeg
    WalSpool.writeSegment(dir, WalSpool.segmentName(0),
      PgStream.Frame("slot", 0L, PgOutput.encode(relation)) +:
        (0 until perSeg).flatMap(i => txn(i.toLong)))
    (1 until nSegs).foreach { s =>
      WalSpool.writeSegment(dir, WalSpool.segmentName(s.toLong),
        (s * perSeg until (s + 1) * perSeg).flatMap(i => txn(i.toLong)))
    }
    val (h1, s1) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, cfg("tailms"), env,
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "tailms", checkpointDir = Some(ckpt))(spark)
    // stop as soon as the FIRST delivery lands — the rest of the
    // backlog is somewhere between undecoded, accumulated, and handed
    assert(awaitCount(srv.xadds, perSeg))
    h1.stop()
    assert(s1.error.isEmpty, s"tail error: ${s1.error}")
    val (h2, s2) = ConsumerRuntime.startLowLatencyTail(
      dir, toEnvelope, cfg("tailms"), env,
      new graft.config.Metrics.Registry(), new graft.config.Health.Registry(),
      "tailmsb", checkpointDir = Some(ckpt))(spark)
    try {
      assert(awaitCount(srv.xadds, total), s"backlog not completed " +
        s"after restart: ${srv.xadds.size}/$total")
      Thread.sleep(300) // would-be duplicates surface here
      assert(srv.xadds.size == total,
        s"duplicate deliveries after restart: ${srv.xadds.size}/$total")
      val idRe = """record\|\{"id":(\d+)""".r
      val ids = srv.xadds.asScala.toSeq.map(x =>
        idRe.findFirstMatchIn(x)
          .getOrElse(fail(s"no record id in XADD: $x")).group(1).toLong)
      assert(ids.toSet == (0L until total.toLong).toSet,
        "missing or phantom rows after mid-backlog restart")
      assert(s2.error.isEmpty, s"restarted tail error: ${s2.error}")
    } finally { h2.stop(); srv.stop() }
  }

  test("low_latency config knob round-trips through parse and render") {
    val c = cfg("knob")
    assert(c.lowLatency)
    val rendered = PipelineSpec.render(c)
    assert(PipelineSpec.parse(rendered).lowLatency)
    // default stays off
    val off = PipelineSpec.parse(
      """{"name":"x","destination":{"type":"redis_stream","stream_key":"k"}}""")
    assert(!off.lowLatency)
    // sharded knob: default 1, round-trips, startLowLatencyTail's
    // shards=0 default defers to it
    assert(off.lowLatencyShards == 1)
    val sh = PipelineSpec.parse(
      """{"name":"x","low_latency":true,"low_latency_shards":8,
        |"destination":{"type":"redis_stream","stream_key":"k"}}"""
        .stripMargin)
    assert(sh.lowLatencyShards == 8)
    assert(PipelineSpec.parse(PipelineSpec.render(sh)).lowLatencyShards == 8)
  }
}
