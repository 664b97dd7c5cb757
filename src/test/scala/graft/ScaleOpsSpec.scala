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

  test("AQE splits the skewed side of a sort-merge join at runtime (skew=true in the final plan)") {
    // the NO-CODE skew lever salting complements: AQE detects the hot
    // shuffle partition from runtime stats and splits it — assert the
    // executed adaptive plan actually took it on a hot-key join
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    import org.apache.spark.sql.functions.{col, lit}
    val left = s2.range(60000L)
      .select(lit(0L).as("k"), col("id").as("lv"))
      .union(s2.range(1000L).select((col("id") % 8 + 1).as("k"),
        col("id").as("lv")))
    val right = s2.range(9L).select(col("id").as("k"), col("id").as("rv"))
    val joined = left.join(right, "k")
    // collect on THIS DataFrame: count() spawns its own execution and
    // would leave joined's adaptive plan unfinalized
    assert(joined.collect().length == 61000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected a runtime skew split in:\n${plan.take(2500)}")
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
