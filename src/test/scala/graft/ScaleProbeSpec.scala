package graft

import graft.dedup.Dedup
import graft.similarity.Ann
import org.apache.spark.sql.DataFrame

/** 10× growth probes for the dedup/ANN family — the quadratic-cliff
  * detector the sf0.1 correctness gate can't provide. Each probe runs the
  * op on a synthesized corpus at N and 10N (constant near-dup density)
  * and asserts the runtime ratio stays far below the ~100× a cartesian
  * fallback or O(n²) pair explosion would show.
  *
  * Bounds are evidence-based (measured ratios + ~3× headroom), per op:
  *  - MinHash-LSH (td05 shape): near-linear by design — only (band, id)
  *    rows shuffle, verified pairs ∝ dup density.
  *  - SimHash banded (td07 shape): candidates are pigeonhole band
  *    collisions; with the 60-bit/15-bit-band fingerprint the random
  *    collision floor is N²/2¹⁵ per band — negligible until N ~ 10⁷.
  *  - SemDeDup (td32 shape): intrinsically N^1.5 when the cell count
  *    grows as √N (the paper's regime): assignment is N×√N centroid
  *    scores and pair space is N×cell. Expected 10×-data ratio is
  *    therefore ~31.6, NOT ~10 — the probe scales `centroidEvery` by
  *    √10 and bounds the ratio at 60 (cliff ≈ 100+).
  *
  * Timing discipline: one warm-up at small N (JIT + codegen), then
  * best-of-2 per size; small-N time is floored at 0.2s so planner
  * overhead can't inflate the ratio.
  */
class ScaleProbeSpec extends SparkSpec {

  private val SmallN = 2500
  private val BigN = 25000

  private def synthDocs(n: Int): DataFrame = {
    import spark.implicits._
    val vocab = (0 until 5000).map(i => f"w$i%04d")
    (0 until n).map { i =>
      // every 20th doc is a near-copy of its predecessor (3 of 60 words
      // swapped) — constant 5% near-dup density at every scale
      val base = if (i % 20 == 1) i - 1 else i
      val words = (0 until 60).map { j =>
        if (i % 20 == 1 && j < 3) s"x${i}v$j"
        else vocab(math.floorMod(
          scala.util.hashing.MurmurHash3.productHash((base, j)), vocab.size))
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text").repartition(32).cache()
  }

  private def synthEmbeddings(n: Int, centers: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = i % centers
      val emb = Array.tabulate(16) { d =>
        val noise = math.floorMod(
          scala.util.hashing.MurmurHash3.productHash((i, d)), 1000) / 1000.0f
        (math.sin(c * 31 + d) * 10).toFloat + noise - 0.5f
      }
      (i.toLong, emb)
    }.toDF("vec_id", "embedding").repartition(32).cache()
  }

  private def bestOf2(f: => Long): Double = {
    def once: Double = { val t0 = System.nanoTime(); val n = f; assert(n >= 0); (System.nanoTime() - t0) / 1e9 }
    math.min(once, once)
  }

  private def ratioOf(small: => Long, big: => Long, label: String): Double = {
    small // warm-up (JIT + codegen paths)
    val tS = math.max(bestOf2(small), 0.2)
    val tB = bestOf2(big)
    val r = tB / tS
    info(f"$label: small=${tS}%.2fs big=${tB}%.2fs ratio=${r}%.1f")
    r
  }

  test("minhash LSH near-dups grow near-linearly over 10x docs") {
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    try {
      val r = ratioOf(
        Dedup.minhashNearDups(small, "doc_id", "text").count(),
        Dedup.minhashNearDups(big, "doc_id", "text").count(),
        "minhash")
      assert(r < 30, s"minhash 10x growth ratio $r suggests a quadratic cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("simhash banded near-dups grow near-linearly over 10x docs") {
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    try {
      val r = ratioOf(
        Dedup.simhashNearDups(small, "doc_id", "text").count(),
        Dedup.simhashNearDups(big, "doc_id", "text").count(),
        "simhash")
      assert(r < 30, s"simhash 10x growth ratio $r suggests a quadratic cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("prefix-filtered ngram Jaccard grows near-linearly over 10x docs") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // 16 blocking strata (the lang×source analog) at both sizes: block
    // size grows 10x, so this is the probe that would catch a block²
    // cross join — the prefix filter keeps candidates ∝ co-occurrence
    val small = synthDocs(SmallN).withColumn("blk", pmod(col("doc_id"), lit(16)))
    val big = synthDocs(BigN).withColumn("blk", pmod(col("doc_id"), lit(16)))
    try {
      val r = ratioOf(
        Dedup.ngramJaccardNearDups(small, "doc_id", "text", n = 3,
          blockCols = Seq("blk"), threshold = 0.5).count(),
        Dedup.ngramJaccardNearDups(big, "doc_id", "text", n = 3,
          blockCols = Seq("blk"), threshold = 0.5).count(),
        "ngram-jaccard")
      assert(r < 30, s"ngram Jaccard 10x growth ratio $r suggests a block-squared cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("incremental cross-corpus dedup grows near-linearly over 10x (base + incoming)") {
    // the nightly-crawl shape: base and incoming both scale 10x; pair
    // space must stay ∝ band collisions, never base × incoming
    val smallBase = synthDocs(SmallN)
    val smallInc = synthDocs(SmallN / 5)
    val bigBase = synthDocs(BigN)
    val bigInc = synthDocs(BigN / 5)
    try {
      val r = ratioOf(
        Dedup.minhashNearDupsAgainst(smallBase, smallInc, "doc_id", "text").count(),
        Dedup.minhashNearDupsAgainst(bigBase, bigInc, "doc_id", "text").count(),
        "incremental-dedup")
      assert(r < 30, s"incremental dedup 10x growth ratio $r suggests base x incoming")
    } finally {
      smallBase.unpersist(); smallInc.unpersist()
      bigBase.unpersist(); bigInc.unpersist()
    }
  }

  test("winnowing near-dups grow near-linearly over 10x docs") {
    // fp equi-join: genuine substring collisions ∝ dup density (constant)
    // + a random floor of N_fps²/2³² — negligible at any probe size. A
    // cliff here would mean fingerprint selection degenerated (e.g. a
    // constant hash) and the join went quadratic.
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    try {
      val r = ratioOf(
        Dedup.winnowingNearDups(small, "doc_id", "text").count(),
        Dedup.winnowingNearDups(big, "doc_id", "text").count(),
        "winnowing")
      assert(r < 30, s"winnowing 10x growth ratio $r suggests an fp-collision cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("semDedup grows ~N^1.5 (cells ~ sqrt N) over 10x vectors, no cliff") {
    // centers scale 10x so genuine duplicate structure keeps pace with N;
    // centroidEvery scales sqrt(10) so the cell count grows as sqrt(N)
    val small = synthEmbeddings(SmallN, centers = 250)
    val big = synthEmbeddings(BigN, centers = 2500)
    try {
      val r = ratioOf(
        Ann.semDedup(small, centroidEvery = 32, threshold = 0.99).count(),
        Ann.semDedup(big, centroidEvery = 101, threshold = 0.99).count(),
        "semdedup")
      assert(r < 60, s"semDedup 10x growth ratio $r suggests a pair-space cliff")
    } finally { small.unpersist(); big.unpersist() }
  }
}
