package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Dev probe: recall@10 of the residual IVF-PQ path vs the raw-vector
  * PQ path and the cell-probe ceilings, at several (m, nprobe,
  * shortlist) points — the measurement harness behind the
  * `ivfpq_residual_*` bench field and td110's design choices
  * (normalize-first, refined coarse quantizer, offset seeds).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("recall-probe")
      .getOrCreate()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    val q = emb.filter(col("vec_id") < 20)
    val exact = similarity.Ann.bruteForceTopK(q, emb, k = 10).localCheckpoint()
    def recallOf(approx: DataFrame): Double = {
      val a = approx.select(col("query_id"), col("corpus_id"))
      val hits = exact.select(col("query_id"), col("corpus_id")).join(
        a, Seq("query_id", "corpus_id"), "left_semi").count()
      val n = exact.count()
      if (n == 0) 0.0 else hits.toDouble / n
    }
    // raw-vector PQ (the r15 bench shape)
    val books0 = similarity.Quantize.pqCodebooks(
      emb, "embedding", m = 8, k = 64, step = 25, dims = 64)
    val books = similarity.Quantize.refineCodebooks(
      emb, "embedding", books0, m = 8, dims = 64, iters = 1)
    val codes = similarity.Quantize.pqEncode(
      emb, "embedding", books, m = 8, dims = 64)
    val rawPq = similarity.Quantize.ivfPqTopK(q, emb, codes, books,
      "embedding", m = 8, dims = 64, centroidEvery = 50, nprobe = 16, k = 10)
    val rawRerank = similarity.Quantize.ivfPqRerankTopK(q, emb, codes, books,
      "embedding", m = 8, dims = 64, centroidEvery = 50, nprobe = 16,
      shortlist = 200, k = 10)
    // residual PQ over the REFINED coarse quantizer (medoids + 2 Lloyd
    // rounds — the td14 oracle shape)
    val medoids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    val cents = similarity.Ann.refineCentroids(emb, medoids, iters = 2)
      .localCheckpoint()
    val res = similarity.Quantize.residuals(emb, "embedding", cents)
      .localCheckpoint()
    val rbooks0 = similarity.Quantize.residualCodebooks(
      res, m = 8, k = 64, step = 25, dims = 64)
    val rbooks = similarity.Quantize.refineCodebooks(
      res, "rvec", rbooks0, m = 8, dims = 64, iters = 1)
    val rcodes = similarity.Quantize.pqEncode(
      res, "rvec", rbooks, m = 8, dims = 64)
    def resAt(nprobe: Int, shortlist: Int) =
      similarity.Quantize.ivfPqResidualRerankTopK(q, emb, rcodes, rbooks,
        cents, "embedding", m = 8, dims = 64, nprobe = nprobe,
        shortlist = shortlist, k = 10)
    val resPq = similarity.Quantize.ivfPqResidualTopK(q, emb, rcodes, rbooks,
      cents, "embedding", m = 8, dims = 64, nprobe = 16, k = 10)
    // ceilings: exact cosine over the probed cells' members (infinite
    // shortlist) — what a perfect ADC could reach at this (nprobe, cells)
    println(s"[probe] medoid ceiling nprobe16:   ${recallOf(
      similarity.Ann.ivfTopK(q, emb, 50, 16, 10, refineIters = 0))}")
    println(s"[probe] refined ceiling nprobe16:  ${recallOf(
      similarity.Ann.ivfTopK(q, emb, 50, 16, 10, refineIters = 2))}")
    println(s"[probe] refined ceiling nprobe24:  ${recallOf(
      similarity.Ann.ivfTopK(q, emb, 50, 24, 10, refineIters = 2))}")
    println(s"[probe] raw ivfpq nprobe16:        ${recallOf(rawPq)}")
    println(s"[probe] raw ivfpq rerank200:       ${recallOf(rawRerank)}")
    println(s"[probe] res ivfpq nprobe16 (adc):  ${recallOf(resPq)}")
    println(s"[probe] res rerank200 nprobe16:    ${recallOf(resAt(16, 200))}")
    println(s"[probe] res rerank200 nprobe24:    ${recallOf(resAt(24, 200))}")
    println(s"[probe] res rerank400 nprobe24:    ${recallOf(resAt(24, 400))}")
    // finer subspaces: m=16 (4 dims each) halves per-code variance
    val rbooks16 = similarity.Quantize.refineCodebooks(
      res, "rvec", similarity.Quantize.residualCodebooks(
        res, m = 16, k = 64, step = 25, dims = 64),
      m = 16, dims = 64, iters = 1)
    val rcodes16 = similarity.Quantize.pqEncode(
      res, "rvec", rbooks16, m = 16, dims = 64)
    def res16At(nprobe: Int, shortlist: Int) =
      similarity.Quantize.ivfPqResidualRerankTopK(q, emb, rcodes16, rbooks16,
        cents, "embedding", m = 16, dims = 64, nprobe = nprobe,
        shortlist = shortlist, k = 10)
    println(s"[probe] res16 rerank100 nprobe24:  ${recallOf(res16At(24, 100))}")
    println(s"[probe] res16 rerank200 nprobe24:  ${recallOf(res16At(24, 200))}")
    println(s"[probe] res16 rerank200 nprobe16:  ${recallOf(res16At(16, 200))}")
    spark.stop()
  }
}
