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

  test("ngram snapshot novelty grows near-linearly over 10x docs") {
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    import org.apache.spark.sql.functions.col
    def run(df: DataFrame): Long =
      graft.training.TrainingPrep.ngramNovelty(
        df.filter(col("doc_id") % 2 === 0),
        df.filter(col("doc_id") % 2 === 1)
          .withColumn("source", (col("doc_id") % 10).cast("string")),
        "text", "source", n = 3).count()
    try {
      val r = ratioOf(run(small), run(big), "ngram_novelty")
      // two distinct hash aggs + one equi-join on the shingle hash:
      // strictly linear in shingle volume; a pair-space fallback would
      // show ~100x
      assert(r < 30, s"novelty 10x growth ratio $r suggests a cliff")
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

  test("PPJoin prefix filter: a pathologically common token does not explode candidates") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // EVERY doc contains the token 'aaa' — lexically FIRST, so a
    // lexical prefix order would put it in every prefix window and
    // candidates would go block² (n²/2 ≈ 180k pairs here). Rarest-first
    // ranks it last (frequency n), where the prefix never reaches it.
    val n = 600
    val docs = (0 until n).map { i =>
      val rare = (0 until 20).map(j => f"w${(i * 7 + j * 13) % 4000}%04d")
      (i.toLong, ("aaa" +: rare).mkString(" "))
    }.toDF("doc_id", "text")
    val sets = docs.select(col("doc_id"), lit(0).as("blk"),
      graft.functions.VectorExpressions
        .distinct_shingles(col("text"), 1, sorted = true).as("sh"))
    val cands = Dedup.ppjoinCandidates(sets, "doc_id", Seq("blk"),
      threshold = 0.5).count()
    val allPairs = n.toLong * (n - 1) / 2
    assert(cands < allPairs / 10,
      s"hot token leaked into prefixes: $cands candidates of $allPairs pairs")

    // and the filter stays LOSSLESS: verified output == brute-force
    // all-pairs Jaccard on the same corpus
    val filtered = Dedup.ngramJaccardNearDups(docs, "doc_id", "text",
      n = 1, blockCols = Nil, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .withColumn("j", graft.dedup.Dedup.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered == brute)
  }

  test("retention cost tracks expired rows, not table size") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    import spark.implicits._
    // same expired slice (500 old rows) in front of a 10x-different live
    // tail: expiry drops the same whole epochs in both, so its cost must
    // not scale with the live table behind it (the pg_partman property;
    // the hash-only round-5 layout rewrote O(table) here)
    def build(liveRows: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_retprobe")
        .toString + "/t"
      val rows = (0 until (500 + liveRows)).map { i =>
        val old = i < 500
        graft.model.ChangeEvent(8L * i, 0L,
          java.sql.Timestamp.valueOf(
            if (old) "2024-01-01 00:00:00" else "2024-02-01 00:00:00"),
          "update", "public", "t0", 16384L, i.toString, i.toLong, 1L, 1.0,
          "{}", None, s"k$i", "1", 100L)
      }
      graft.sinks.EventTableSink.upsert(spark, rows.toDF(), dir,
        numBuckets = 4, epochWidth = 2000)
      dir
    }
    def timeRet(dir: String): Double = {
      val t0 = System.nanoTime()
      val n = graft.sinks.EventTableSink.retention(spark, dir, "commit_ts",
        to_timestamp(lit("2024-01-15 00:00:00")))
      assert(n == 500)
      (System.nanoTime() - t0) / 1e9
    }
    // retention is destructive, so min-of-2 runs on FRESH tables per
    // size: the min reflects the plan's cost, not a GC pause or a
    // co-tenant JVM stealing the box (observed: ratio 5.5 under external
    // load vs ~2 in isolation on identical code)
    def minRet(liveRows: Int): Double =
      (1 to 2).map(_ => timeRet(build(liveRows))).min
    val tS = math.max(minRet(2000), 0.2)
    val tB = minRet(20000)
    val r = tB / tS
    info(f"retention: small=${tS}%.2fs big=${tB}%.2fs ratio=${r}%.1f")
    // bound 7: isolated runs measure ~2-3; a co-tenant JVM stealing the
    // box pushes identical code to 5.2-5.5 (observed twice), and the
    // regression this guards against — O(table) expiry rewriting every
    // bucket — shows 10-20x. 7 stays far from both.
    assert(r < 7, s"retention cost grew ${r}x for 10x live data")
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

  test("dedup survivorship funnel grows near-linearly over 10x docs " +
      "(narrow id/fp shuffles + component join, no text shuffle)") {
    import org.apache.spark.sql.functions.col
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    def run(df: DataFrame): Long =
      graft.training.TrainingPrep.dedupFunnel(
        df.withColumn("source", (col("doc_id") % 10).cast("string")),
        "doc_id", "source", "text",
        Dedup.minhashNearDups(df, "doc_id", "text").select("id_a", "id_b")
      ).count()
    try {
      val r = ratioOf(run(small), run(big), "dedup_funnel")
      // exact stage = fingerprint groupBy; near-dup stage = the (already
      // linear) LSH pairs + large-star/small-star components over PAIRS;
      // survivors re-join by component id — all linear-shaped
      assert(r < 30, s"funnel 10x growth ratio $r suggests a cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("IVF-PQ (train + encode + ADC search) grows ~N^1.5 over 10x " +
      "vectors (cells ~ sqrt N), no pair-space cliff") {
    import org.apache.spark.sql.functions.col
    // same regime as the semDedup probe: centers scale 10x (dup
    // structure keeps pace), centroidEvery scales sqrt(10) so the coarse
    // quantizer's cell count grows as sqrt N — cell ASSIGNMENT (N x
    // cells) is the dominant super-linear term, expected ratio ~31.6
    val small = synthEmbeddings(SmallN, centers = 250)
    val big = synthEmbeddings(BigN, centers = 2500)
    def run(df: DataFrame, centroidEvery: Int): Long = {
      val books0 = graft.similarity.Quantize.pqCodebooks(
        df, "embedding", m = 4, k = 16, step = 25, dims = 16)
      val books = graft.similarity.Quantize.refineCodebooks(
        df, "embedding", books0, m = 4, dims = 16, iters = 1)
      val codes = graft.similarity.Quantize.pqEncode(
        df, "embedding", books, m = 4, dims = 16)
      graft.similarity.Quantize.ivfPqTopK(
        df.filter(col("vec_id") < 5), df, codes, books, "embedding",
        m = 4, dims = 16, centroidEvery = centroidEvery, nprobe = 4,
        k = 5).count()
    }
    try {
      val r = ratioOf(run(small, 32), run(big, 101), "ivfpq")
      assert(r < 60, s"IVF-PQ 10x growth ratio $r suggests a cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("residual IVF-PQ (refine + residuals + encode + per-cell ADC) " +
      "grows ~N^1.5 over 10x vectors, no pair-space cliff") {
    import org.apache.spark.sql.functions.col
    // same regime as the raw IVF-PQ probe; the residual path adds the
    // coarse refine (N x cells — the same super-linear term as
    // assignment) and the per-(query, probed-cell) ADC tables (queries
    // x nprobe x m x k — corpus-independent)
    val small = synthEmbeddings(SmallN, centers = 250)
    val big = synthEmbeddings(BigN, centers = 2500)
    def run(df: DataFrame, centroidEvery: Int): Long = {
      val medoids = df.filter(col("vec_id") % centroidEvery === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("cent_emb"))
      val cents = graft.similarity.Ann.refineCentroids(df, medoids,
        iters = 1)
      val res = graft.similarity.Quantize.residuals(df, "embedding", cents)
        .localCheckpoint()
      val rb = graft.similarity.Quantize.refineCodebooks(res, "rvec",
        graft.similarity.Quantize.residualCodebooks(
          res, m = 4, k = 16, step = 25, dims = 16),
        m = 4, dims = 16, iters = 1)
      val rc = graft.similarity.Quantize.pqEncode(res, "rvec", rb,
        m = 4, dims = 16)
      graft.similarity.Quantize.ivfPqResidualTopK(
        df.filter(col("vec_id") < 5), df, rc, rb, cents, "embedding",
        m = 4, dims = 16, nprobe = 4, k = 5).count()
    }
    try {
      val r = ratioOf(run(small, 32), run(big, 101), "ivfpq_residual")
      assert(r < 60, s"residual IVF-PQ 10x growth ratio $r suggests a cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("bitext margin mining stays LSH-bounded over 10x vectors " +
      "(candidates ~ bucket collisions, never |src| x |tgt|)") {
    import org.apache.spark.sql.functions.col
    // centers scale 10x with N (the dup/cluster structure keeps pace)
    // AND bits scale log2(10) ~ 3-4 with N (the operator's sizing
    // contract: buckets-per-table ~ N / target-bucket-size), so
    // per-bucket density stays ~constant and the candidate relation
    // grows ~linearly. Measured WITHOUT the bits scaling: ratio 109 —
    // the quadratic collision cliff the contract exists to prevent.
    // probe-local fixture: center directions are RANDOM +-1 vectors, so
    // cross-center angles concentrate near 90 degrees and each vector's
    // true-neighbor set is its own center only (bounded). The shared
    // sin-curve fixture is wrong for PAIR-based probes — its centers lie
    // on a 1-D curve, so a constant FRACTION of all pairs is genuinely
    // similar and any miner's output is quadratic by construction.
    def vecs(n: Int, centers: Int): DataFrame = {
      import spark.implicits._
      (0 until n).map { i =>
        val c = i % centers
        val emb = Array.tabulate(16) { d =>
          val sign = if (math.floorMod(scala.util.hashing.MurmurHash3
            .productHash((c, d)), 2) == 0) 1.0f else -1.0f
          val noise = math.floorMod(scala.util.hashing.MurmurHash3
            .productHash((i, d, 7)), 100) / 1000.0f
          sign * 10.0f + noise
        }
        (i.toLong, emb)
      }.toDF("vec_id", "embedding").repartition(32).cache()
    }
    val small = vecs(SmallN, centers = 250)
    val big = vecs(BigN, centers = 2500)
    def run(df: DataFrame, bits: Int): Long =
      graft.similarity.Ann.bitextMarginMine(
        df.filter(col("vec_id") % 2 === 0),
        df.filter(col("vec_id") % 2 === 1),
        dims = 16, k = 4, tables = graft.similarity.Ann.LshTables,
        bits = bits, marginThresholdMicro = 1000000L).count()
    try {
      val r = ratioOf(run(small, 6), run(big, 10), "bitext-margin")
      assert(r < 30, s"bitext 10x growth ratio $r suggests a pair-space cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("unicode normalization chain grows near-linearly over 10x docs " +
      "(pure per-row map, no shuffle)") {
    import org.apache.spark.sql.functions._
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    def run(df: DataFrame): Long = {
      // the td94 chain: decomposed-accent + ligature + zero-width +
      // control debris through NFC then the scrub regexes
      val dirty = concat(lit("cafe\u0301 \uFB01le x\u200Byz \u0007"),
        col("text"))
      val nfc = graft.functions.VectorExpressions
        .normalize_text(dirty, "NFC")
      val clean = trim(regexp_replace(regexp_replace(regexp_replace(nfc,
        "[\\u200B\\u200C\\u200D\\uFEFF]", ""),
        "[\\x00-\\x08\\x0B-\\x1F\\x7F]", ""),
        "[ \\t\\n\\r]+", " "))
      df.select(length(clean).as("l"))
        .agg(sum(col("l"))).collect()
      df.count()
    }
    try {
      val r = ratioOf(run(small), run(big), "normalize")
      assert(r < 30, s"normalization 10x growth ratio $r suggests a cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("bloom decontamination grows near-linearly over 10x candidates") {
    import org.apache.spark.sql.functions.col
    // the benchmark filter is FIXED-size (2^18 bits) — only the candidate
    // probe volume scales, so the ratio must track the explode, never a
    // candidate x benchmark join
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    try {
      val r = ratioOf(
        graft.sketch.Sketches.bloomDecontam(
          small.where(col("doc_id") < 200), small.where(col("doc_id") >= 200),
          "doc_id", "text", n = 5).count(),
        graft.sketch.Sketches.bloomDecontam(
          big.where(col("doc_id") < 200), big.where(col("doc_id") >= 200),
          "doc_id", "text", n = 5).count(),
        "bloom-decontam")
      assert(r < 30, s"bloom 10x growth ratio $r suggests a join explosion")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("banded range join grows near-linearly over 10x (points + intervals)") {
    import spark.implicits._
    // time domain grows with n so per-(key, band) density is CONSTANT:
    // ~10 points and ~2 intervals per cell at every scale. A nested-loop
    // fallback would show ~100x on 10x data; banding must track ~10x.
    def synth(n: Int) = {
      val pts = (0 until n).map { i =>
        (i.toLong % 50, (i.toLong * 997) % (n.toLong * 10), i.toLong)
      }.toDF("k", "pus", "pid").repartition(32).cache()
      val iv = (0 until n / 5).map { j =>
        val s = (j.toLong * 4999) % (n.toLong * 10)
        (j.toLong % 50, s, s + 5000L, j.toLong)
      }.toDF("k", "ws", "we", "wid").repartition(32).cache()
      (pts, iv)
    }
    val (ps, is_) = synth(SmallN * 4)
    val (pb, ib) = synth(BigN * 4)
    try {
      val r = ratioOf(
        graft.ops.Joins.rangeJoin(ps, is_, Seq("k"), "pus", "ws", "we",
          bandMicros = 5000L).count(),
        graft.ops.Joins.rangeJoin(pb, ib, Seq("k"), "pus", "ws", "we",
          bandMicros = 5000L).count(),
        "range-join")
      assert(r < 30,
        s"range join 10x growth ratio $r suggests a nested-loop fallback")
    } finally {
      ps.unpersist(); is_.unpersist(); pb.unpersist(); ib.unpersist()
    }
  }

  test("graph family (pagerank + triangles) grows near-linearly over 10x edges") {
    import spark.implicits._
    // constant average degree (~8) at every scale: both the per-iteration
    // PageRank join volume and the oriented wedge space then grow ∝ n.
    // An unoriented triangle closure (or a cartesian fallback) on a graph
    // with hubs would blow up superlinearly — the probe graph includes a
    // hub (node 0 touches n/50 edges) to punish exactly that.
    def synth(n: Int) = (0 until n * 4).map { i =>
      val u = math.floorMod(
        scala.util.hashing.MurmurHash3.productHash((i, 1)), n).toLong
      val v =
        if (i % 50 == 0) 0L // hub edges
        else math.floorMod(
          scala.util.hashing.MurmurHash3.productHash((i, 2)), n).toLong
      (math.min(u, v), math.max(u, v))
    }.filter { case (a, b) => a != b }.distinct
      .toDF("a", "b").repartition(32).cache()
    val small = synth(SmallN)
    val big = synth(BigN)
    try {
      val rPr = ratioOf(
        graft.graph.GraphOps.pageRank(small, iters = 2, k = 10).count(),
        graft.graph.GraphOps.pageRank(big, iters = 2, k = 10).count(),
        "pagerank")
      assert(rPr < 30,
        s"pagerank 10x growth ratio $rPr suggests a quadratic cliff")
      val rTri = ratioOf(
        graft.graph.GraphOps.triangleStats(small).count(),
        graft.graph.GraphOps.triangleStats(big).count(),
        "triangles")
      assert(rTri < 30,
        s"triangle 10x growth ratio $rTri — orientation failed to bound wedges")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("KMV set ops stay pair-algebra-bounded over 10x values") {
    import org.apache.spark.sql.functions.{col, concat_ws, explode, lit, pmod}
    import graft.text.TextAnalysis
    // 16 groups at both sizes: group size grows 10x but each sketch stays
    // k rows, so the pair stage is constant and only the bottom-k windows
    // scale — linear, never |values|^2
    def grouped(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("g", concat_ws("", lit("g"), pmod(col("doc_id"), lit(16))))
      .select(col("g"), explode(TextAnalysis.shingles(col("text"), 3)).as("v"))
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    try {
      val r = ratioOf(
        graft.sketch.Sketches.kmvSetOps(grouped(small), "g", "v", k = 64).count(),
        graft.sketch.Sketches.kmvSetOps(grouped(big), "g", "v", k = 64).count(),
        "kmv-setops")
      assert(r < 30, s"kmv 10x growth ratio $r suggests a pair-space cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("incremental view: advance cost tracks the window, not the table") {
    import org.apache.spark.sql.functions._
    import graft.ops.IncrementalView
    // same 2k-change window applied against views derived from 10x-
    // different change histories: advance reads the (materialized) view +
    // the window only, so its cost must stay flat while a full recompute
    // scales with the history — the whole point of maintaining the view
    // incrementally instead of rescanning at 100 TB.
    def changes(n: Long) =
      spark.range(n).select(col("id").as("lsn"), lit("insert").as("action"),
        col("id").cast("string").as("pk"),
        (col("id") % 200).cast("string").as("g"),
        (col("id") % 1000).as("new_v"),
        lit(null).cast("bigint").as("old_v"))
    val measures = Seq(
      IncrementalView.liveCount(col("action")),
      IncrementalView.sumOf("s", col("action"), col("new_v"), col("old_v")))
    val (smallN, bigN) = (2000000L, 20000000L)
    def prep(n: Long) = (
      IncrementalView.delta(changes(n).filter(col("lsn") < n - 2000),
        col("g"), measures).localCheckpoint(),
      changes(n).filter(col("lsn") >= n - 2000).localCheckpoint())
    val (vS, wS) = prep(smallN)
    val (vB, wB) = prep(bigN)
    val rAdv = ratioOf(
      IncrementalView.advance(vS, wS, col("g"), measures).count(),
      IncrementalView.advance(vB, wB, col("g"), measures).count(),
      "iv-advance")
    assert(rAdv < 3, s"advance grew ${rAdv}x for 10x history — it is " +
      "reading the history, not the view+window")
    // and the maintained path must beat recomputing from all of history
    val tRecompute = bestOf2(
      IncrementalView.delta(changes(bigN), col("g"), measures).count())
    val tAdvance = bestOf2(
      IncrementalView.advance(vB, wB, col("g"), measures).count())
    info(f"iv: advance=${tAdvance}%.2fs recompute=${tRecompute}%.2fs")
    assert(tAdvance < tRecompute,
      s"advance ($tAdvance s) not cheaper than recompute ($tRecompute s)")
  }

  test("blocked-levenshtein fuzzy pairs grow near-linearly over 10x docs") {
    // random prefixes keep block sizes bounded, so the pair space is
    // Σ|block|² ∝ N — a cartesian fallback or a degenerate blocking
    // (everything in one block) would show ~100×
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    try {
      val r = ratioOf(
        Dedup.fuzzyPairs(small, "doc_id", "text").count(),
        Dedup.fuzzyPairs(big, "doc_id", "text").count(),
        "fuzzy")
      assert(r < 30, s"fuzzyPairs 10x growth ratio $r suggests a blocking cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("basket pair mining grows near-linearly over 10x orders (order-local pair space)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // n orders × 6 items from a 50-brand catalog: pair space per order
    // is ≤ 6·5/2 regardless of n
    def baskets(n: Int) = (0 until n).flatMap { o =>
      (0 until 6).map(j => (o.toLong, s"B${math.floorMod(
        scala.util.hashing.MurmurHash3.productHash((o, j)), 50)}"))
    }.toDF("o", "b").distinct().repartition(32).cache()
    val small = baskets(SmallN)
    val big = baskets(BigN)
    def pairs(df: org.apache.spark.sql.DataFrame): Long =
      df.as("x").join(df.as("y"),
          col("x.o") === col("y.o") && col("x.b") < col("y.b"))
        .groupBy(col("x.b"), col("y.b")).count().count()
    try {
      val r = ratioOf(pairs(small), pairs(big), "basket")
      assert(r < 30, s"basket 10x growth ratio $r — pair space not order-local")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("rolling sketch quantiles: 10x days costs ~10x (O(days x bins) merge, one value scan)") {
    import spark.implicits._
    def series(days: Int) = (0 until days).flatMap { d =>
      (0 until 200).map(i => (d.toLong,
        math.floorMod(scala.util.hashing.MurmurHash3
          .productHash((d, i)), 10000).toLong))
    }.toDF("day", "v").repartition(32).cache()
    val small = series(40)
    val big = series(400)
    try {
      val r = ratioOf(
        graft.sketch.Sketches.rollingHistQuantiles(small, "day", "v", 128,
          Seq(50, 95), 7).count(),
        graft.sketch.Sketches.rollingHistQuantiles(big, "day", "v", 128,
          Seq(50, 95), 7).count(),
        "rollingq")
      assert(r < 30, s"rolling quantiles 10x ratio $r — window is re-scanning raw values")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("Bradley-Terry ratings grow near-linearly over 10x items (block-bounded pair space)") {
    import spark.implicits._
    def synthItems(n: Int) = (0 until n)
      .map(i => (i.toLong, math.floorMod(
        scala.util.hashing.MurmurHash3.productHash((i, 7)), 10000).toLong))
      .toDF("doc_id", "score").repartition(32).cache()
    val small = synthItems(SmallN * 4)
    val big = synthItems(BigN * 4)
    try {
      val r = ratioOf(
        graft.training.TrainingPrep.preferenceRatings(small, "doc_id",
          "score", blockSize = 8, iters = 5).count(),
        graft.training.TrainingPrep.preferenceRatings(big, "doc_id",
          "score", blockSize = 8, iters = 5).count(),
        "bradley-terry")
      assert(r < 30,
        s"BT 10x growth ratio $r — pair space is no longer block-bounded")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("similarity packing grows near-linearly over 10x docs (log-scaled bucket width)") {
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    try {
      // bucketBits tracks log2(n) (the td95 sizing contract): constant
      // bits at 10x data would double per-bucket window size per decade
      val r = ratioOf(
        graft.training.TrainingPrep.similarityPack(small, "doc_id", "text",
          budget = 1024, bucketBits = 3).count(),
        graft.training.TrainingPrep.similarityPack(big, "doc_id", "text",
          budget = 1024, bucketBits = 6).count(),
        "simpack")
      assert(r < 30,
        s"similarity packing 10x growth ratio $r — simhash or window cliff")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("training-order interleave grows near-linearly over 10x docs (two global ranks, no per-source window)") {
    import spark.implicits._
    def corpus(n: Int) = (0 until n)
      .map(i => (s"src${i % 7}", i.toLong))
      .toDF("source", "doc_id").repartition(32).cache()
    val small = corpus(SmallN * 8)
    val big = corpus(BigN * 8)
    try {
      val r = ratioOf(
        graft.training.TrainingPrep.trainingOrder(small, "source", "doc_id").count(),
        graft.training.TrainingPrep.trainingOrder(big, "source", "doc_id").count(),
        "training-order")
      assert(r < 30,
        s"training order 10x growth ratio $r — a rank collapsed to one task")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("char entropy grows near-linearly over 10x docs (explode + hash agg, no per-doc window)") {
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    try {
      val r = ratioOf(
        graft.training.TrainingPrep.charEntropy(small, "doc_id", "text").count(),
        graft.training.TrainingPrep.charEntropy(big, "doc_id", "text").count(),
        "char-entropy")
      assert(r < 30,
        s"char entropy 10x growth ratio $r — histogram agg lost map-side combine")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("DPO pair mining grows near-linearly over 10x items (block-bounded ratings + blk-partitioned windows)") {
    import spark.implicits._
    def synthItems(n: Int) = (0 until n)
      .map(i => (i.toLong, math.floorMod(
        scala.util.hashing.MurmurHash3.productHash((i, 11)), 10000).toLong))
      .toDF("doc_id", "score").repartition(32).cache()
    val small = synthItems(SmallN * 4)
    val big = synthItems(BigN * 4)
    try {
      val r = ratioOf(
        graft.training.TrainingPrep.dpoPairs(small, "doc_id", "score",
          blockSize = 8, iters = 5).count(),
        graft.training.TrainingPrep.dpoPairs(big, "doc_id", "score",
          blockSize = 8, iters = 5).count(),
        "dpo-pairs")
      assert(r < 30,
        s"DPO pairing 10x growth ratio $r — a window lost its blk partitioning")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("CDC chunk dedup grows near-linearly over 10x docs (O(len) boundary pass, chunk-hash agg)") {
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    try {
      val r = ratioOf(
        graft.training.TrainingPrep.cdcChunkDedup(small, "doc_id", "text").count(),
        graft.training.TrainingPrep.cdcChunkDedup(big, "doc_id", "text").count(),
        "cdc-chunks")
      assert(r < 30,
        s"CDC chunking 10x growth ratio $r — boundary pass or occ join degenerated")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("containment near-dups grow near-linearly over 10x docs (rarest-prefix probe bounds the pair space)") {
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    try {
      val r = ratioOf(
        graft.dedup.Dedup.containmentNearDups(small, "doc_id", "text").count(),
        graft.dedup.Dedup.containmentNearDups(big, "doc_id", "text").count(),
        "containment")
      assert(r < 30,
        s"containment 10x growth ratio $r — a hub shingle reached the probing prefix")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("JPEG perceptual near-dup clusters grow near-linearly over 10x assets (per-row codec + one groupBy)") {
    import spark.implicits._
    def synthAssets(n: Int) = spark.range(n)
      .as[Long].map { d =>
        graft.multimodal.Multimodal.Asset(d, "image",
          graft.multimodal.MediaCodec.synthesizeJpegTwin(d), "synth")
      }.cache()
    val small = synthAssets(SmallN)
    val big = synthAssets(BigN)
    try {
      val r = ratioOf(
        graft.multimodal.Multimodal.imageNearDupClusters(small)(spark).count(),
        graft.multimodal.Multimodal.imageNearDupClusters(big)(spark).count(),
        "jpeg-neardup")
      assert(r < 30,
        s"jpeg perceptual near-dup 10x growth ratio $r — decode or cluster stage went superlinear")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("MP3 perceptual near-dup clusters grow near-linearly over 10x assets (per-row side-info walk + one groupBy)") {
    import spark.implicits._
    def synthAssets(n: Int) = spark.range(n)
      .as[Long].map { d =>
        graft.multimodal.Multimodal.Asset(d, "audio",
          graft.multimodal.MediaCodec.synthesizeMp3Twin(d), "synth")
      }.cache()
    val small = synthAssets(SmallN)
    val big = synthAssets(BigN)
    try {
      val r = ratioOf(
        graft.multimodal.Multimodal.audioNearDupClusters(small)(spark).count(),
        graft.multimodal.Multimodal.audioNearDupClusters(big)(spark).count(),
        "mp3-neardup")
      assert(r < 30,
        s"mp3 perceptual near-dup 10x growth ratio $r — side-info walk or cluster stage went superlinear")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("KN trigram surprisal grows near-linearly over 10x docs (distinct-ngram model tables + equi-joins)") {
    val small = synthDocs(SmallN)
    val big = synthDocs(BigN)
    try {
      val r = ratioOf(
        graft.training.TrainingPrep.knTrigramSurprisal(small, "doc_id", "text").count(),
        graft.training.TrainingPrep.knTrigramSurprisal(big, "doc_id", "text").count(),
        "kn-trigram")
      assert(r < 30,
        s"KN trigram 10x growth ratio $r — model join degenerated (skewed ngram key or broadcast loss)")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("replay join grows near-linearly over 10x retained history (epoch pruning + bucketed dim, no join shuffle)") {
    import org.apache.spark.sql.functions._
    // event tables with 10x-different retained histories, SAME replay
    // window size: changesBetween prunes to the window's epoch dirs and
    // the dim side is bucket-read, so the replay must track the WINDOW,
    // not the table — the property that makes replay viable against
    // 100 TB of retention
    def build(n: Long, tag: String): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"probe_rplj_$tag").toString
      val evs = spark.range(n).select(
        concat(lit("pk"), col("id")).as("record_pk"),
        (col("id") * 8).as("commit_lsn"), lit(0L).as("commit_idx"),
        lit("insert").as("action"), (col("id") % 97).cast("double").as("v"))
      graft.sinks.EventTableSink.upsert(spark, evs, dir,
        numBuckets = 4, epochWidth = 4096L)
      dir
    }
    val smallDir = build(20000L, "s")
    val bigDir = build(200000L, "b")
    val dim = spark.range(200000L)
      .select(concat(lit("pk"), col("id")).as("record_pk"),
        (col("id") % 5).cast("int").as("tier"))
    graft.ops.Layout.writeBucketed(dim, "graft_probe_rplj_dim", "record_pk",
      spark.sessionState.conf.numShufflePartitions,
      "target/bucketed/graft_probe_rplj_dim")
    val r = ratioOf(
      graft.sinks.EventTableSink.replayJoin(spark, smallDir, 8000L, 40000L,
        4096L, "graft_probe_rplj_dim", "record_pk").count(),
      graft.sinks.EventTableSink.replayJoin(spark, bigDir, 8000L, 40000L,
        4096L, "graft_probe_rplj_dim", "record_pk").count(),
      "replay-join")
    assert(r < 8,
      s"replay join 10x-history growth ratio $r — the window scan is " +
        s"reading history (epoch pruning lost) or the join grew a shuffle")
  }
}
