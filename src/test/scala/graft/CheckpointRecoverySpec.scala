package graft

import graft.model.ChangeEvent
import graft.streaming.GroupFifo
import org.apache.spark.sql.{Encoders, SaveMode}
import java.sql.Timestamp

/** W7 — restart/recovery: the GroupFifo delivery cursor survives a query
  * restart through the checkpointed state store, so replayed input after
  * recovery is still exactly-once (`restart_wal_cursor` semantics,
  * `/root/reference/lib/sequin/runtime/slot_producer/slot_producer.ex:120-128`).
  *
  * Uses a file (parquet) streaming source + a real checkpoint dir —
  * MemoryStream cannot recover across restarts.
  */
class CheckpointRecoverySpec extends SparkSpec {

  private def ev(lsn: Long, group: String): ChangeEvent =
    ChangeEvent(lsn, 0L, Timestamp.valueOf("2024-01-01 00:00:00"), "update",
      "public", "t0", 16384L, s"pk$lsn", lsn, group.toLong, 1.0, "{}",
      None, s"$group:$lsn", group, 100L)

  test("GroupFifo cursor survives a query restart (checkpointed state)") {
    implicit val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val inDir = s"$base/in"
    val ckpt = s"$base/ckpt"
    val outDir = s"$base/out"
    val schema = Encoders.product[ChangeEvent].schema

    def startQuery() =
      GroupFifo.deliver(
          spark.readStream.schema(schema).parquet(inDir).as[ChangeEvent])
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()

    // run 1: deliver (8) and (16) for group 7
    Seq(ev(8, "7"), ev(16, "7")).toDS().write
      .mode(SaveMode.Append).parquet(inDir)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // run 2 (fresh query instance, same checkpoint): replay (8,16) + new (24)
    Seq(ev(8, "7"), ev(16, "7"), ev(24, "7")).toDS().write
      .mode(SaveMode.Append).parquet(inDir)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.schema(schema).parquet(outDir).as[ChangeEvent]
      .collect().sortBy(e => (e.commit_lsn, e.commit_idx))
      .map(_.commit_lsn)
    // replays of 8 and 16 were dropped by the RECOVERED cursor state
    assert(out.toSeq == Seq(8L, 16L, 24L))
  }
}
