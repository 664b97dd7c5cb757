package graft

import java.nio.file.Files

import graft.sinks.{WireSink, WireSinkProvider, WireSinkTable}
import graft.sources.{PgOutput, PgStream, WalSpool}
import graft.sources.PgOutput._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Delivery-side DSv2 boundary: the wire sink's epoch publish protocol
  * (atomic rename, replayed-epoch no-op = exactly-once), task abort
  * cleanup, streaming end-to-end with checkpointed restart, and the full
  * ingest→deliver integration (WAL spool source → stateful decode → wire
  * sink) surviving a restart without duplicate delivery.
  */
class WireSinkSpec extends SparkSpec {

  private val provider = classOf[WireSinkProvider].getName

  private def transportRows(ids: Range) = ids.map(i =>
    WireSink.TransportRow("kafka", s"topic${i % 2}",
      if (i % 3 == 0) null else s"k$i", s"""{"n":$i}"""))

  private def logRows(dir: String) =
    WireSink.readWireLog(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._4)

  test("batch write publishes one epoch dir; wire log round-trips incl. null keys") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("wiresink").toString

    val rows = transportRows(0 until 100)
    s.createDataset(rows).toDF()
      .write.format(provider).option("path", dir).mode("append").save()

    assert(WireSink.listEpochs(dir).size == 1)
    val got = logRows(dir)
    assert(got.length == 100)
    assert(got.toSeq == rows.map(r => (r.sink_type, r.dest, r.key, r.body))
      .sortBy(_._4))
    // no stray temp/inflight files left behind
    val stray = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith(".tmp") || f.getName.startsWith(".inflight"))
    assert(stray.isEmpty)
  }

  test("schema contract: non-transport shapes are rejected at plan time") {
    implicit val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("wiresink").toString
    val e = intercept[Exception] {
      s.createDataset(Seq((1, "x"))).toDF("a", "b")
        .write.format(provider).option("path", dir).mode("append").save()
    }
    assert(e.getMessage.contains("toTransport") ||
      e.getMessage.contains("sink_type"))
  }

  /** Drive the StreamingWrite API directly to force the crash-replay case
    * a live query only hits nondeterministically: the same epoch committed
    * twice must publish once.
    */
  test("replayed epoch commit is a no-op (exactly-once); abort cleans temp files") {
    val dir = Files.createTempDirectory("wiresink").toString
    val info = new LogicalWriteInfo {
      override def queryId(): String = "test-query"
      override def schema(): StructType = WireSink.schema
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
    }
    val table = new WireSinkTable(dir)
    val write = table.newWriteBuilder(info).build().toStreaming

    def writeAttempt(values: Seq[WireSink.TransportRow]): WriterCommitMessage = {
      val factory = write.createStreamingWriterFactory(null)
      val w = factory.createWriter(0, 0L, 7L)
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(WireSink.schema)
      val ser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc)
        .createSerializer()
      values.foreach(v => w.write(ser(
        org.apache.spark.sql.Row(v.sink_type, v.dest, v.key, v.body)).copy()))
      w.commit()
    }

    val rows = transportRows(0 until 5)
    write.commit(7L, Array(writeAttempt(rows)))
    assert(WireSink.listEpochs(dir).size == 1)
    assert(logRows(dir).length == 5)

    // crash-replay: epoch 7 re-executes and commits again
    write.commit(7L, Array(writeAttempt(rows)))
    assert(WireSink.listEpochs(dir).size == 1)
    assert(logRows(dir).length == 5) // not doubled
    // the replayed attempt's temp file was discarded
    val stray = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith(".inflight"))
    assert(stray.isEmpty)

    // a failed epoch's tasks abort: temp file removed, nothing published
    val aborted = writeAttempt(rows)
    write.abort(8L, Array(aborted))
    assert(WireSink.listEpochs(dir).size == 1)
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".inflight")))
  }

  test("streaming: one epoch per micro-batch; restart continues without re-delivery") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("wiresink").toString
    val ckpt = Files.createTempDirectory("wiresink_ckpt").toString

    val in = MemoryStream[WireSink.TransportRow]
    def run() = in.toDF().writeStream.format(provider)
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = run()
    try {
      in.addData(transportRows(0 until 10): _*)
      q1.processAllAvailable()
      in.addData(transportRows(10 until 30): _*)
      q1.processAllAvailable()
      assert(logRows(dir).length == 30)
    } finally q1.stop()

    val epochsBefore = WireSink.listEpochs(dir).size
    val q2 = run()
    try {
      in.addData(transportRows(30 until 35): _*)
      q2.processAllAvailable()
      val got = logRows(dir)
      assert(got.length == 35) // nothing re-delivered, new batch delivered
      assert(WireSink.listEpochs(dir).size > epochsBefore)
    } finally q2.stop()
  }

  test("ingest→deliver integration: WAL spool → stateful decode → wire sink, restart-safe") {
    implicit val s = spark
    import s.implicits._
    val spool = Files.createTempDirectory("wal_in").toString
    val wire = Files.createTempDirectory("wire_out").toString
    val ckpt = Files.createTempDirectory("e2e_ckpt").toString

    val relation = Relation(16384L, "public", "t", "d", Seq(
      RelationColumn("id", isKey = true, 20L, -1),
      RelationColumn("name", isKey = false, 25L, -1)))
    def txn(id: Long, seqBase: Long): Seq[PgStream.Frame] = Seq(
      PgStream.Frame("slot", seqBase, PgOutput.encode(Begin(id * 8, id * 1000, id))),
      PgStream.Frame("slot", seqBase + 1, PgOutput.encode(Insert(16384L,
        Seq(Cell.Text(id.toString), Cell.Text(s"row_$id"))))),
      PgStream.Frame("slot", seqBase + 2, PgOutput.encode(Commit(0, id * 8, id * 8 + 8, id * 1000))))

    def run() = {
      val frames = spark.readStream
        .format(classOf[graft.sources.WalSpoolProvider].getName)
        .load(spool).as[PgStream.Frame]
      val decoded = PgStream.decodeStateful(frames)
        .filter(col("kind") === "change")
      val transport = WireSink.toTransport(
        decoded.toDF(), "kafka",
        dest = concat_ws(".", lit("sequin"), col("table_schema"), col("table_name")),
        key = col("values")(0),
        body = to_json(struct(col("commit_lsn"), col("columns"), col("values"))))
      transport.writeStream.format(provider)
        .option("path", wire).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    WalSpool.writeSegment(spool, WalSpool.segmentName(0),
      PgStream.Frame("slot", 1L, PgOutput.encode(relation)) +: txn(1, 10))
    val q1 = run()
    try {
      q1.processAllAvailable()
      assert(logRows(wire).length == 1)
    } finally q1.stop()

    // new txns land while the pipeline is down; restart must deliver
    // exactly those (relation cache restored from the state store)
    WalSpool.writeSegment(spool, WalSpool.segmentName(1), txn(2, 20) ++ txn(3, 30))
    val q2 = run()
    try {
      q2.processAllAvailable()
      val got = logRows(wire)
      assert(got.length == 3)
      assert(got.forall(_._2 == "sequin.public.t"))
      assert(got.map(_._3).sorted.toSeq == Seq("1", "2", "3"))
    } finally q2.stop()
  }
}
