package graft

import graft.model.{ChangeEvent, Cdc}
import graft.sinks.EventTableSink
import graft.streaming.{CdcPipeline, ConsumerConfig, GroupFifo}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** SURVEY §7.2 minimum end-to-end slice: a consumer over the synthesized
  * CDC stream — scope filter → action filter → column filter → pipeline →
  * per-group FIFO → idempotent event-table upsert — fed through a real
  * Structured Streaming query in micro-batches WITH REPLAYED OVERLAP, then
  * checked against the batch-computed expectation (the Spark rendition of
  * the reference's `priv/tests_e2e` exact-count + content assertions).
  */
class EndToEndSpec extends SparkSpec {

  test("CDC consumer end-to-end: stream with replays == batch oracle") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val cfg = ConsumerConfig(
      name = "e2e",
      scope = graft.ops.SourceScope(includeSchemas = Some(Seq("public"))),
      actions = Seq("insert", "update"))

    val cdcAll = Cdc.fromEvents(Tables.events(spark, sf()))
      .as[ChangeEvent].collect().sortBy(e => (e.commit_lsn, e.commit_idx))
      .take(3000)

    // ---- expected (batch semantics over the same events) ----
    val expected = Ordering.relevant(spark, cdcAll.toSeq.toDS().toDF())

    // ---- actual: stream in 3 overlapping micro-batches ----
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_e2e")
      .toString + "/events_table"
    val input = MemoryStream[ChangeEvent]
    val piped = CdcPipeline.build(input.toDF(), cfg)
    val query = piped.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        EventTableSink.upsert(batch.sparkSession, batch.toDF(), sinkDir)
      }
      .start()
    try {
      input.addData(cdcAll.slice(0, 1200): _*)
      query.processAllAvailable()
      input.addData(cdcAll.slice(1000, 2200): _*) // 200 replayed events
      query.processAllAvailable()
      input.addData(cdcAll.slice(2200, 3000): _*)
      query.processAllAvailable()

      val actual = spark.read.parquet(sinkDir)
        .select("record_pk", "record_value", "commit_lsn", "commit_idx")
        .orderBy("commit_lsn", "commit_idx")
        .collect().map(r => (r.getString(0), r.getDouble(1)))

      assert(actual.length == expected.length)
      assert(actual.toSeq == expected.toSeq)
    } finally query.stop()
  }

  /** Batch-side oracle for the streaming run. */
  private object Ordering {
    def relevant(s: org.apache.spark.sql.SparkSession,
        df: org.apache.spark.sql.DataFrame): Array[(String, Double)] = {
      val cfgApplied = df
        .filter(col("table_schema") === "public")
        .filter(col("action").isin("insert", "update"))
      graft.ops.Ordering.dedupLatest(cfgApplied, Seq("record_pk"),
          Seq(col("commit_lsn"), col("commit_idx")))
        .orderBy("commit_lsn", "commit_idx")
        .select("record_pk", "record_value")
        .collect().map(r => (r.getString(0), r.getDouble(1)))
    }
  }

  test("GroupFifo composed after CdcPipeline preserves per-group order under shuffle") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val cdcAll = Cdc.fromEvents(Tables.events(spark, sf()))
      .as[ChangeEvent].collect().take(2000)
    val shuffled = new scala.util.Random(7).shuffle(cdcAll.toSeq)

    val input = MemoryStream[ChangeEvent]
    val query = GroupFifo.deliver(input.toDS())
      .writeStream.format("memory").queryName("e2e_fifo")
      .outputMode("append").start()
    try {
      shuffled.grouped(700).foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
      }
      val out = spark.table("e2e_fifo").as[ChangeEvent].collect()
      // within each group, arrival order in the sink == cursor order for
      // the events that were deliverable (monotonic cursor per group)
      out.groupBy(_.group_id).foreach { case (_, evs) =>
        val cursors = evs.map(e => (e.commit_lsn, e.commit_idx))
        assert(cursors.sameElements(cursors.sorted),
          "per-group delivery order violated")
      }
      // no duplicates ever delivered
      assert(out.map(e => e.idempotency_key).distinct.length == out.length)
    } finally query.stop()
  }
}
