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

  test("PgStream relation cache survives a query restart (checkpointed state)") {
    implicit val s = spark
    import s.implicits._
    import graft.sources.{PgOutput, PgStream}
    import graft.sources.PgOutput._

    val base = java.nio.file.Files.createTempDirectory("graft_pg_ckpt").toString
    val inDir = s"$base/in"
    val ckpt = s"$base/ckpt"
    val outDir = s"$base/out"
    val frameSchema = Encoders.product[PgStream.Frame].schema
    val outSchema = Encoders.product[PgStream.Decoded].schema

    val rel = Relation(55L, "public", "t55", "d", Seq(
      RelationColumn("id", isKey = true, 20L, -1),
      RelationColumn("v", isKey = false, 25L, -1)))
    def frame(seq: Long, payload: Array[Byte]) =
      PgStream.Frame("slot", seq, payload)
    def txn(seq: Long, lsn: Long, cells: Cell*) = Seq(
      frame(seq, PgOutput.encode(Begin(lsn, 1704067200000000L, 1L))),
      frame(seq + 1, PgOutput.encode(Insert(55L, cells))),
      frame(seq + 2, PgOutput.encode(Commit(0, lsn, lsn + 8, 1704067200000000L))))

    def startQuery() =
      PgStream.decodeStateful(
          spark.readStream.schema(frameSchema).parquet(inDir).as[PgStream.Frame])
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()

    // run 1: Relation announced ONCE + first txn
    (frame(1, PgOutput.encode(rel)) +:
      txn(2, 8, Cell.Text("1"), Cell.Text("a"))).toDS()
      .write.mode(SaveMode.Append).parquet(inDir)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // run 2 (fresh query, same checkpoint): NO relation frame — decoding
    // must come from the recovered cache; also replays the first txn
    (txn(2, 8, Cell.Text("1"), Cell.Text("a")) ++
      txn(10, 16, Cell.Text("2"), Cell.Text("b"))).toDS()
      .write.mode(SaveMode.Append).parquet(inDir)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.schema(outSchema).parquet(outDir)
      .as[PgStream.Decoded].collect()
      .filter(_.kind == "change").sortBy(_.seq)
    // replayed txn dropped; second txn decoded with the RECOVERED schema
    assert(rows.map(_.commit_lsn).toSeq == Seq(8L, 16L))
    assert(rows.forall(_.table_name == "t55"))
    assert(rows.forall(_.columns == Seq("id", "v")))
  }
}
