package graft

import graft.sources.{PgOutput, PgStream}
import graft.sources.PgOutput._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end binary ingestion: real events rendered as pgoutput wire
  * transactions, streamed through `decodeStateful` in overlapping
  * micro-batches (frame replays included), typed via the pinned-schema
  * record path — output must equal a direct projection of the source
  * table, exactly once. This is the S1→S2→§1.2 slice the reference runs
  * between the replication socket and the consumer pipeline.
  */
/** Top-level so Spark can derive an encoder (inner classes need scope). */
case class BinaryIngestEv(event_id: Long, ts_us: Long, user_id: Long,
    event_type: String, value: Double, props: String)

class BinaryIngestE2ESpec extends SparkSpec {
  private type Ev = BinaryIngestEv

  private val relation = Relation(16384L, "public", "events_src", "d", Seq(
    RelationColumn("event_id", isKey = true, 20L, -1),
    RelationColumn("user_id", isKey = false, 20L, -1),
    RelationColumn("event_type", isKey = false, 25L, -1),
    RelationColumn("value", isKey = false, 701L, -1),
    RelationColumn("props", isKey = false, 3802L, -1)))

  private def txnFrames(e: Ev, seqBase: Long): Seq[PgStream.Frame] = {
    val lsn = (e.event_id / 7) * 8
    val cells = Seq(Cell.Text(e.event_id.toString), Cell.Text(e.user_id.toString),
      Cell.Text(e.event_type), Cell.Text(java.lang.Double.toString(e.value)),
      Cell.Text(e.props))
    Seq(
      PgStream.Frame("slot", seqBase, PgOutput.encode(
        Begin(lsn, e.ts_us, e.event_id % 100000))),
      PgStream.Frame("slot", seqBase + 1, PgOutput.encode(Insert(16384L, cells))),
      PgStream.Frame("slot", seqBase + 2, PgOutput.encode(
        Commit(0, lsn, lsn + 8, e.ts_us))))
  }

  test("wire txns through stateful decode + pinned typing == source table, exactly once") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Tables.events(spark, sf())
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .as[Ev].collect().sortBy(_.event_id).take(300)

    val frames = events.zipWithIndex.flatMap { case (e, i) =>
      txnFrames(e, 1000L + i * 3)
    }
    // relation announced once, at stream start (pgoutput behavior)
    val relFrame = PgStream.Frame("slot", 1L, PgOutput.encode(relation))

    val input = MemoryStream[PgStream.Frame]
    val query = PgStream.decodeStateful(input.toDS())
      .writeStream.format("memory").queryName("bin_e2e")
      .outputMode("append").start()
    try {
      // three micro-batches; batch 2 REPLAYS the last 60 frames of batch 1
      input.addData(relFrame +: frames.slice(0, 400): _*)
      query.processAllAvailable()
      input.addData(frames.slice(340, 700): _*)
      query.processAllAvailable()
      input.addData(frames.slice(700, frames.length): _*)
      query.processAllAvailable()

      val typed = PgStream.toRecords(spark.table("bin_e2e"), relation)
        .select("event_id", "user_id", "event_type", "value", "props", "xid")
        .orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3), r.getString(4), r.getLong(5)))

      val expected = events.map(e => (e.event_id, e.user_id, e.event_type,
        e.value, e.props, e.event_id % 100000))

      assert(typed.length == expected.length) // replays never re-emit
      assert(typed.sameElements(expected))    // values exact through the wire
    } finally query.stop()
  }
}
