package graft

import graft.model.ChangeEvent
import graft.ops.Skew
import graft.streaming.CdcPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Scale-mechanics specs: watermark-bounded streaming dedup, skew-salted
  * joins/aggregations equivalence.
  */
class ScaleOpsSpec extends SparkSpec {

  private def ev(lsn: Long, ts: String): ChangeEvent =
    ChangeEvent(lsn, 0L, Timestamp.valueOf(ts), "update", "public", "t0",
      16384L, s"pk$lsn", lsn, 1L, 1.0, "{}", None, s"k:$lsn", "1", 100L)

  test("withStreamingDedup drops duplicate idempotency keys within the watermark") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    val q = CdcPipeline.withStreamingDedup(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()
    try {
      in.addData(ev(1, "2024-01-01 00:00:00"), ev(1, "2024-01-01 00:00:01"),
        ev(2, "2024-01-01 00:01:00"))
      q.processAllAvailable()
      in.addData(ev(1, "2024-01-01 00:02:00")) // duplicate within watermark
      q.processAllAvailable()
      val out = spark.table("wm_dedup").select("commit_lsn").collect()
        .map(_.getLong(0)).sorted
      assert(out.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "v")
    val right = (1L to 100L).map(k => (k, s"dim$k")).toDF("k", "dv")
    val plain = left.join(right, Seq("k")).select("k", "v", "dv")
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 8)
      .select("k", "v", "dv")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedCount equals plain groupBy count") {
    import spark.implicits._
    val df = (1 to 500).map(i => Tuple1(if (i <= 450) "hot" else s"k$i"))
      .toDF("k")
    val plain = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
