package graft

import graft.sketch.Sketches
import graft.streaming.StreamingSketch
import graft.streaming.StreamingSketch.Reading
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming HLL: the stream-accumulated registers must be BIT-IDENTICAL
  * to the batch sketch over the same data — the merge property that makes
  * HLL streamable — and the per-batch emissions must be the running
  * estimates a live cardinality board would show.
  */
class StreamingSketchSpec extends SparkSpec {

  test("stream-accumulated estimate equals the batch sketch over the union") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import s.implicits._
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("source"), explode(
        graft.text.TextAnalysis.tokens(col("text"))).as("t"))
      .collect().map(r => Reading(r.getString(0), r.getString(1)))
    val (batch1, batch2) = docs.splitAt(docs.length / 2)

    val in = MemoryStream[Reading]
    val q = StreamingSketch.hllDistinct(in.toDS())
      .writeStream.format("memory").queryName("hll_board")
      .outputMode("update").start()
    try {
      in.addData(batch1.toIndexedSeq)
      q.processAllAvailable()
      in.addData(batch2.toIndexedSeq)
      q.processAllAvailable()
      // last emission per group = estimate over ALL data seen
      val streamed = spark.table("hll_board")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("group")
            .orderBy(col("n_seen").desc)))
        .where(col("rn") === 1)
        .select(col("group"), col("n_filled"), col("v_empty"), col("est"))
        .collect().map(r => (r.getString(0),
          (r.getInt(1), r.getInt(2), r.getLong(3)))).toMap

      val toks = Tables.documents(spark, sf("sf0.001"))
        .select(col("source"), explode(
          graft.text.TextAnalysis.tokens(col("text"))).as("t"))
      val batch = Sketches.hllDistinct(toks, "source", "t")
        .collect().map(r => (r.getString(0),
          (r.getAs[Int]("n_filled"), r.getAs[Int]("v_empty"),
           r.getAs[Long]("est")))).toMap

      assert(streamed == batch,
        s"streamed=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  test("portableHash mirror matches the Column expression") {
    import spark.implicits._
    val vals = Seq("hash", "join", "", "ünïcode", "a b c", "0")
    val fromCol = vals.toDF("v")
      .select(graft.functions.Hashing.portableHash(col("v")))
      .collect().map(_.getLong(0))
    val fromScala = vals.map(StreamingSketch.portableHash)
    assert(fromCol.toSeq == fromScala)
  }

  test("running estimate is monotone-ish: n_seen grows, registers never regress") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import s.implicits._
    val in = MemoryStream[Reading]
    val q = StreamingSketch.hllDistinct(in.toDS())
      .writeStream.format("memory").queryName("hll_mono")
      .outputMode("update").start()
    try {
      in.addData(Reading("g", "a"), Reading("g", "b"))
      q.processAllAvailable()
      in.addData(Reading("g", "c"), Reading("g", "a"))
      q.processAllAvailable()
      val rows = spark.table("hll_mono").orderBy("n_seen")
        .collect().map(r => (r.getAs[Int]("n_filled"), r.getAs[Long]("n_seen"),
          r.getAs[Long]("est")))
      assert(rows.length == 2)
      assert(rows(0)._2 == 2L && rows(1)._2 == 4L)
      // filled registers never shrink; tiny sets are linear-counting exact
      assert(rows(1)._1 >= rows(0)._1)
      assert(rows(1)._3 >= rows(0)._3)
    } finally q.stop()
  }

  test("streaming CMS top-k lands on the batch sweep's numbers over the " +
      "same corpus (cells sum — the merge property)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import s.implicits._
    import graft.streaming.StreamingSketch.Tok
    val docs = Tables.documents(spark, sf("sf0.001"))
    val toks = docs
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("t"))
      .collect().map(r => Tok("all", r.getString(0)))
    val (b1, b2) = toks.splitAt(toks.length / 2)
    // maxCandidates > vocabulary: every token stays resident, so the
    // final board must EQUAL the batch op (set, estimates, and order)
    val in = MemoryStream[Tok]
    val q = StreamingSketch.cmsHeavyHitters(in.toDS(), k = 10,
        maxCandidates = 1000000)
      .writeStream.format("memory").queryName("cms_board")
      .outputMode("update").start()
    try {
      in.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      in.addData(b2.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("cms_board")
        .where(col("n_seen") === toks.length.toLong)
        .orderBy("rk")
        .collect().map(r => (r.getAs[String]("token"),
          r.getAs[Long]("est"), r.getAs[Int]("rk"))).toSeq
      val batch = graft.sketch.Sketches.cmsHeavyHitters(docs, "text", 10)
        .orderBy("rk")
        .collect().map(r => (r.getAs[String]("t"),
          r.getAs[Long]("est"), r.getAs[Int]("rk"))).toSeq
      assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  test("streaming CMS candidate table stays bounded; residency favors " +
      "the heavy tokens") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import s.implicits._
    import graft.streaming.StreamingSketch.Tok
    // zipf-ish: token i arrives ~200/i times; 400 distinct >> cap of 32
    val arrivals = (1 to 400).flatMap(i =>
      Seq.fill(math.max(200 / i, 1))(Tok("g", f"tok$i%03d")))
    val in = MemoryStream[Tok]
    val q = StreamingSketch.cmsHeavyHitters(in.toDS(), k = 5,
        maxCandidates = 32)
      .writeStream.format("memory").queryName("cms_bounded")
      .outputMode("update").start()
    try {
      arrivals.grouped(500).foreach { g =>
        in.addData(g); q.processAllAvailable()
      }
      val last = spark.table("cms_bounded")
        .orderBy(col("n_seen").desc, col("rk")).limit(5)
        .collect().map(_.getAs[String]("token")).toSeq
      // the unambiguous heavy head survives candidate pruning
      assert(last.take(3) == Seq("tok001", "tok002", "tok003"), last)
    } finally q.stop()
  }
}
