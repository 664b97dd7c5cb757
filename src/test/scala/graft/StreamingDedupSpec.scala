package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-dup detection: arrivals match against ALL history (the
  * cross-batch property batch LSH lacks), replays never duplicate pairs,
  * distinct texts stay silent, and state survives across micro-batches.
  */
class StreamingDedupSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat sleeps near the warm stone wall in the garden shade"

  test("cross-batch near-dups found vs history; replays and distinct docs stay silent") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import s.implicits._
    val in = MemoryStream[(Long, String)]
    val hits = StreamingDedup.nearDups(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
    val q = hits.toDF()
      .writeStream.format("memory").queryName("dedup_hits")
      .outputMode("append").start()
    try {
      // batch 1: two identical docs + one unrelated
      in.addData((1L, base), (2L, base),
        (3L, "completely different subject matter entirely unrelated words " +
          "about compilers registers allocation spilling graphs coloring"))
      q.processAllAvailable()
      val b1 = spark.table("dedup_hits")
        .select("id_new", "id_seen").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(b1 == Set((2L, 1L))) // 2 arrived after 1; 3 matches nothing

      // batch 2: a near-copy arrives LATER — must match history (1 and 2),
      // and a replay of doc 1 must not re-emit anything
      in.addData((4L, base + " extra"), (1L, base))
      q.processAllAvailable()
      val all = spark.table("dedup_hits")
        .select("id_new", "id_seen").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(all.contains((4L, 1L)) && all.contains((4L, 2L)),
        s"doc 4 must match both historical copies, got $all")
      assert(!all.exists(p => p._1 == 1L), "replayed doc 1 re-emitted")
      // estimator sanity: identical docs agree on every position
      val est = spark.table("dedup_hits")
        .filter(col("id_new") === 2L).agg(max("est_jaccard"))
        .head().getDouble(0)
      assert(est == 1.0)
    } finally q.stop()
  }

  test("a full bucket slides (oldest evicted): new arrivals match recent history, not the frozen head") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val q = StreamingDedup.nearDups(
        in.toDS().toDF("doc_id", "text"), "doc_id", "text",
        maxPerBucket = 2)
      .writeStream.format("memory").queryName("dedup_slide")
      .outputMode("append").start()
    try {
      // identical docs land in the same buckets; capacity 2 per bucket
      in.addData((1L, base)); q.processAllAvailable()
      in.addData((2L, base)); q.processAllAvailable()
      in.addData((3L, base)); q.processAllAvailable() // evicts doc 1
      in.addData((4L, base)); q.processAllAvailable() // sees {2,3}… minus evictions
      val hits = spark.table("dedup_slide")
        .select("id_new", "id_seen").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // doc 3 arrived while {1,2} were held
      assert(hits.contains((3L, 1L)) && hits.contains((3L, 2L)))
      // doc 4 matches the RECENT window {2, 3} — doc 1 was evicted, but
      // under the old freeze behavior 4 would have matched {1, 2} and
      // NEVER seen doc 3
      assert(hits.contains((4L, 3L)), s"frozen bucket: $hits")
      assert(!hits.contains((4L, 1L)), s"evicted doc still matched: $hits")
    } finally q.stop()
  }
}
