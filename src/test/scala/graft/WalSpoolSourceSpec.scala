package graft

import java.nio.file.Files

import graft.sources.{PgOutput, PgStream, WalSpool, WalSpoolProvider}
import graft.sources.PgOutput._

/** S1 source boundary: the WAL-segment spool tailed as a DSv2
  * MicroBatchStream. Covers the publish protocol (half-written segments
  * invisible), batch replay parity, checkpointed offsets across a query
  * restart (exactly-once: no re-emission, relation cache survives in the
  * state store), and segment-level admission control.
  */
class WalSpoolSourceSpec extends SparkSpec {

  private val provider = classOf[WalSpoolProvider].getName

  private val relation = Relation(16384L, "public", "t", "d", Seq(
    RelationColumn("id", isKey = true, 20L, -1),
    RelationColumn("name", isKey = false, 25L, -1)))

  /** One self-contained txn (Begin + Insert + Commit) for row `id`. */
  private def txn(id: Long, seqBase: Long): Seq[PgStream.Frame] = Seq(
    PgStream.Frame("slot", seqBase, PgOutput.encode(Begin(id * 8, id * 1000, id))),
    PgStream.Frame("slot", seqBase + 1, PgOutput.encode(Insert(16384L,
      Seq(Cell.Text(id.toString), Cell.Text(s"row_$id"))))),
    PgStream.Frame("slot", seqBase + 2, PgOutput.encode(Commit(0, id * 8, id * 8 + 8, id * 1000))))

  test("segment codec round-trips; half-written segments are invisible; batch read == spool") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("walspool").toString

    val seg0 = PgStream.Frame("slot", 1L, PgOutput.encode(relation)) +: txn(1, 10)
    val seg1 = txn(2, 20) ++ txn(3, 30)
    WalSpool.writeSegment(dir, WalSpool.segmentName(0), seg0)
    WalSpool.writeSegment(dir, WalSpool.segmentName(1), seg1)
    // a concurrent shipper mid-write: dot-prefixed temp must not be listed
    Files.write(java.nio.file.Paths.get(dir, s".${WalSpool.segmentName(2)}.tmp"),
      Array[Byte](1, 2, 3))

    assert(WalSpool.readSegment(s"$dir/${WalSpool.segmentName(0)}")
      .map(f => (f.slot_id, f.seq, f.payload.toSeq)) ==
      seg0.map(f => (f.slot_id, f.seq, f.payload.toSeq)))
    assert(WalSpool.listSegments(dir).size == 2)

    val read = spark.read.format(provider).option("path", dir).load()
      .as[PgStream.Frame].collect().sortBy(_.seq)
      .map(f => (f.slot_id, f.seq, f.payload.toSeq))
    assert(read.toSeq == (seg0 ++ seg1).sortBy(_.seq)
      .map(f => (f.slot_id, f.seq, f.payload.toSeq)))
  }

  test("streaming tail: checkpointed offsets, exactly-once across restart, relation cache survives") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("walspool").toString
    val ckpt = Files.createTempDirectory("walspool_ckpt").toString
    val out = Files.createTempDirectory("walspool_out").toString

    // parquet sink: supports checkpoint recovery (memory sink does not)
    def run() = PgStream.decodeStateful(
      spark.readStream.format(provider).option("path", dir).load()
        .as[PgStream.Frame])
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()

    // segment 0 announces the relation; segments 0-1 carry txns 1-3
    WalSpool.writeSegment(dir, WalSpool.segmentName(0),
      PgStream.Frame("slot", 1L, PgOutput.encode(relation)) +: txn(1, 10))
    val q1 = run()
    try {
      q1.processAllAvailable()
      WalSpool.writeSegment(dir, WalSpool.segmentName(1), txn(2, 20) ++ txn(3, 30))
      q1.processAllAvailable()
      assert(spark.read.parquet(out).filter("kind = 'change'").count() == 3)
    } finally q1.stop()

    // new segment lands while the query is DOWN; restart from checkpoint
    WalSpool.writeSegment(dir, WalSpool.segmentName(2), txn(4, 40))
    val q2 = run()
    try {
      q2.processAllAvailable()
      val changes = spark.read.parquet(out).filter("kind = 'change'")
        .orderBy("seq").collect()
      // exactly ONE new txn appended — segments 0-1 are NOT re-emitted
      assert(changes.length == 4)
      val r = changes.last
      assert(r.getAs[scala.collection.Seq[String]]("values").toSeq ==
        Seq("4", "row_4"))
      // relation was announced in segment 0, BEFORE the restart: the
      // decode still knows column names -> the cache crossed the restart
      assert(r.getAs[scala.collection.Seq[String]]("columns").toSeq ==
        Seq("id", "name"))
      assert(r.getAs[String]("table_name") == "t")
    } finally q2.stop()
  }

  test("retention: consumed segments pruned below the checkpointed offset; tail continues") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("walspool").toString
    val ckpt = Files.createTempDirectory("walspool_ckpt").toString
    val out = Files.createTempDirectory("walspool_out").toString

    def run() = spark.readStream
      .format(classOf[WalSpoolProvider].getName).load(dir)
      .as[PgStream.Frame]
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()

    WalSpool.writeSegment(dir, WalSpool.segmentName(0), txn(1, 10))
    WalSpool.writeSegment(dir, WalSpool.segmentName(1), txn(2, 20))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 6)

    // both segments are committed in the checkpoint (offset = 2): recycle
    // them, land a new one, restart — only the new segment is read, and
    // the pruned files are gone from disk
    assert(WalSpool.pruneConsumed(dir, uptoOffset = 2) == 2)
    assert(WalSpool.listSegments(dir).isEmpty)
    WalSpool.writeSegment(dir, WalSpool.segmentName(2), txn(3, 30))
    val q2 = run()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
      assert(rows.count() == 9) // exactly one new txn, nothing replayed
    } finally q2.stop()
  }

  test("publication gap: a segment visible before its predecessor stalls admission, not the query") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("walspool").toString

    // shipper raced: segment 2 renamed into place while 1 is still
    // in-flight — the stream must deliver segment 0, HOLD (not crash),
    // then deliver 1 and 2 once the gap closes
    WalSpool.writeSegment(dir, WalSpool.segmentName(0), txn(1, 10))
    WalSpool.writeSegment(dir, WalSpool.segmentName(2), txn(3, 30))

    val q = spark.readStream.format(provider).option("path", dir).load()
      .as[PgStream.Frame]
      .writeStream.format("memory").queryName("wal_gap")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(q.isActive, "an in-flight rename gap must not kill the query")
      assert(spark.table("wal_gap").count() == 3) // segment 0 only
      WalSpool.writeSegment(dir, WalSpool.segmentName(1), txn(2, 20))
      q.processAllAvailable()
      assert(spark.table("wal_gap").count() == 9) // 1 and 2 both admitted
      assert(spark.table("wal_gap").as[PgStream.Frame].collect()
        .map(_.seq).sorted.toSeq == Seq(10L, 11, 12, 20, 21, 22, 30, 31, 32))
    } finally q.stop()
  }

  test("head-gap watchdog: a segment missing AT the committed offset " +
      "past the grace window fails the query loudly instead of stalling " +
      "forever") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("walspool").toString

    WalSpool.writeSegment(dir, WalSpool.segmentName(0), txn(1, 10))
    val q = spark.readStream.format(provider)
      .option("path", dir).option("headGapGraceMs", "2000").load()
      .as[PgStream.Frame]
      .writeStream.format("memory").queryName("wal_headgap")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("wal_headgap").count() == 3) // committed offset = 1
      // segment 1 is lost (deleted under the query / over-pruned) while
      // the shipper has already published segment 2: admission anchors at
      // the committed offset, so nothing is admissible — within the grace
      // window the query HOLDS (an in-flight rename could close the gap)
      WalSpool.writeSegment(dir, WalSpool.segmentName(2), txn(3, 30))
      q.processAllAvailable()
      assert(q.isActive, "a head gap inside the grace window must hold, " +
        "not crash")
      assert(spark.table("wal_headgap").count() == 3)
      // ...past the window, the watchdog fails the query LOUDLY — the
      // alternative is a silent, symptomless stall forever
      val failed = intercept[
          org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination(60000)
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(failed).exists(_.contains("missing for over")),
        s"expected the head-gap watchdog message, got: ${msgs(failed)}")
    } finally q.stop()
  }

  test("admission control: maxSegmentsPerBatch bounds each micro-batch to one segment") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("walspool").toString

    (0 until 3).foreach(i =>
      WalSpool.writeSegment(dir, WalSpool.segmentName(i.toLong), txn(i + 10L, i * 10L)))

    val q = spark.readStream.format(provider)
      .option("path", dir).option("maxSegmentsPerBatch", "1").load()
      .as[PgStream.Frame]
      .writeStream.format("memory").queryName("wal_paced")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("wal_paced").count() == 9) // all frames arrive...
      val filled = q.recentProgress.filter(_.numInputRows > 0)
      assert(filled.length == 3) // ...one segment per micro-batch
      assert(filled.forall(_.numInputRows == 3))
    } finally q.stop()
  }
}
