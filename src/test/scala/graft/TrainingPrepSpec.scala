package graft

import graft.similarity.Quantize
import graft.text.TextAnalysis
import graft.training.TrainingPrep
import org.apache.spark.sql.functions._

/** Specs for the corpus-prep operators: stratified sampling invariants,
  * packing budget bounds, boilerplate detection, PII scrubbing, and
  * quantization error bounds.
  */
class TrainingPrepSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  test("stratified sampling is deterministic, rate-accurate and NESTED") {
    val half = TrainingPrep.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.5), defaultRate = 0.0).select("doc_id")
    val fifth = TrainingPrep.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.2), defaultRate = 0.0).select("doc_id")
    val nEn = docs.filter(col("lang") === "en").count().toDouble
    val nHalf = half.count().toDouble
    assert(math.abs(nHalf / nEn - 0.5) < 0.15, s"rate off: ${nHalf / nEn}")
    // nested: lowering a rate only REMOVES rows (hash-gate property)
    assert(fifth.exceptAll(half).count() == 0)
    // deterministic across runs
    assert(half.exceptAll(TrainingPrep.stratifiedSample(docs, "lang",
      "doc_id", Map("en" -> 0.5), defaultRate = 0.0).select("doc_id"))
      .count() == 0)
  }

  test("temperature sampling up-weights rare strata toward uniform, head keeps baseRate") {
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val headLang = counts.maxBy(_._2)._1
    val rareLang = counts.minBy(_._2)._1
    val kept = TrainingPrep.temperatureSample(docs, "lang", "doc_id", 0.4)
    val keptCounts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate(l: String) = keptCounts.getOrElse(l, 0L).toDouble / counts(l)
    // head stratum samples at ~baseRate; rarer strata at strictly higher
    // rates (∝ sqrt(n_max/n_s)), capped at 1.0
    assert(math.abs(rate(headLang) - 0.4) < 0.15, s"head rate ${rate(headLang)}")
    assert(rate(rareLang) > rate(headLang), s"$rareLang ${rate(rareLang)}")
    // deterministic and a SUBSET of the corpus keyed by the same hash gate
    assert(kept.exceptAll(
      TrainingPrep.temperatureSample(docs, "lang", "doc_id", 0.4)).count() == 0)
  }

  test("sequence packing respects the token budget (single-doc packs excepted)") {
    val packed = TrainingPrep.packSequences(docs, "text", "lang", "doc_id",
      budget = 256)
    val perPack = packed.groupBy("lang", "pack_idx")
      .agg(sum("n_toks").as("total"), count(lit(1)).as("n_docs"))
    // multi-doc packs exceed the budget by at most one doc's overhang —
    // contiguous bucketing: a pack's running span is < budget + max doc
    val maxDoc = packed.agg(max("n_toks")).head().getInt(0)
    val worst = perPack.agg(max("total")).head().getLong(0)
    assert(worst < 256 + maxDoc, s"pack of $worst tokens (maxDoc=$maxDoc)")
    // every doc assigned exactly one pack; pack ids contiguous from 0
    assert(packed.count() == docs.count())
    val ids = packed.filter(col("lang") === "en")
      .select("pack_idx").distinct().collect().map(_.getLong(0)).sorted
    assert(ids.head == 0L && ids.last == ids.length - 1)
  }

  test("boilerplate passages require minDocs distinct docs; exposure counts hits") {
    val passages = TrainingPrep.boilerplatePassages(docs, "doc_id", "text",
      n = 5, minDocs = 3)
    assert(passages.filter(col("n_docs") < 3).count() == 0)
    val exposure = TrainingPrep.boilerplateExposure(docs, "doc_id", "text",
      n = 5, minDocs = 3)
    // every exposed doc really contains >=1 shared passage
    assert(exposure.filter(col("n_boiler") < 1).count() == 0)
    // docs in the exposure table are a subset of the corpus
    assert(exposure.join(docs, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("PII scrubber masks emails, phones and digit runs with typed placeholders") {
    import spark.implicits._
    val rows = Seq(
      "write to alice.smith+x@mail.example.org today",
      "call 25-989-741-2988 x9",
      "card 4111111132 and pin 77",
      "clean text with no pii at all",
      "a@b.co 12-345-678-9012 123456789")
      .toDF("s")
      .select(TextAnalysis.scrubPii(col("s")).as("out"),
        TextAnalysis.piiMatchCount(col("s"), TextAnalysis.EmailRe).as("ne"),
        TextAnalysis.piiMatchCount(col("s"), TextAnalysis.PhoneRe).as("np"),
        TextAnalysis.piiMatchCount(col("s"), TextAnalysis.DigitRunRe).as("nn"))
      .collect()
    assert(rows(0).getString(0) == "write to <EMAIL> today")
    assert(rows(1).getString(0) == "call <PHONE> x9")
    assert(rows(2).getString(0) == "card <NUM> and pin 77")
    assert(rows(3).getString(0) == "clean text with no pii at all")
    assert(rows(4).getString(0) == "<EMAIL> <PHONE> <NUM>")
    assert(rows(4).getInt(1) == 1 && rows(4).getInt(2) == 1)
    assert(rows(0).getInt(1) == 1 && rows(1).getInt(2) == 1 && rows(2).getInt(3) == 1)
  }

  test("int8 quantization: codes in [0,255], reconstruction error <= scale/2") {
    val q = Quantize.withInt8(Tables.embeddings(spark, sf()), "embedding")
    assert(q.filter(exists(col("codes"),
      c => c < 0 || c > 255)).count() == 0)
    assert(q.filter(col("max_err") > col("scale") / 2 + lit(1e-12)).count() == 0)
    // constant vector edge: all-zero codes, zero error
    import spark.implicits._
    val const = Seq((1L, Array.fill(8)(2.5f))).toDF("vec_id", "embedding")
    val row = Quantize.withInt8(const, "embedding").head()
    assert(row.getAs[Seq[Long]]("codes").forall(_ == 0L))
    assert(row.getAs[Double]("max_err") == 0.0)
    assert(row.getAs[Double]("scale") == 0.0)
  }

  test("product quantization: m codes per vector in [0,k), ADC ranks contiguous") {
    val emb = Tables.embeddings(spark, sf())
    val books = Quantize.pqCodebooks(emb, "embedding", m = 8, k = 16,
      step = 25, dims = 64)
    assert(books.count() == 8 * 16)
    val codes = Quantize.pqEncode(emb, "embedding", books, m = 8, dims = 64)
    val n = emb.count()
    assert(codes.count() == n * 8) // exactly one code per (vector, subspace)
    assert(codes.filter(col("code") < 0 || col("code") >= 16).count() == 0)
    val top = Quantize.pqTopK(emb.filter(col("vec_id") < 3), codes, books,
      "embedding", m = 8, dims = 64, k = 5).collect()
    assert(top.length == 15)
    assert(top.forall(r => r.getAs[Long]("query_id") !=
      r.getAs[Long]("corpus_id")))
    // a duplicate of the query quantizes to the query's own codes — and
    // the query's codes are per-subspace argmins of its OWN ADC table, so
    // the duplicate must achieve the global minimum ADC distance
    val dupCorpus = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(1000L))
      .union(emb.filter(col("vec_id") > 0 && col("vec_id") < 100))
    val dupTop = Quantize.pqTopK(emb.filter(col("vec_id") === 0),
      Quantize.pqEncode(dupCorpus, "embedding", books, m = 8, dims = 64),
      books, "embedding", m = 8, dims = 64, k = 99).collect()
    val dupRow = dupTop.find(_.getAs[Long]("corpus_id") == 1000L).get
    assert(dupRow.getAs[Long]("adist_micro") ==
      dupTop.map(_.getAs[Long]("adist_micro")).min)
  }

  test("residual IVF-PQ: offset seeds avoid the zero-residual medoid trap; a duplicate of the query wins the per-cell ADC ranking") {
    val emb = Tables.embeddings(spark, sf())
    val medoids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("cent_emb"))
    val cents = graft.similarity.Ann.refineCentroids(emb, medoids,
      iters = 2).localCheckpoint()
    val res = Quantize.residuals(emb, "embedding", cents).localCheckpoint()
    assert(res.count() == emb.count()) // one residual row per vector
    val seeds = Quantize.residualCodebooks(res, m = 8, k = 16, step = 25,
      dims = 64)
    assert(seeds.count() == 8 * 16)
    // the seed-offset fix: seeding ON the medoid grid would fill the
    // book with (near-)zero residuals — no seed subvector may be
    // numerically zero (measured as a recall LOSS vs raw PQ when it was)
    assert(seeds.filter(aggregate(col("cvec"), lit(0.0),
      (a, v) => a + abs(v)) < lit(1e-9)).count() == 0)
    val rb = Quantize.refineCodebooks(res, "rvec", seeds, m = 8, dims = 64,
      iters = 1)
    val rc = Quantize.pqEncode(res, "rvec", rb, m = 8, dims = 64)
    val top = Quantize.ivfPqResidualTopK(emb.filter(col("vec_id") < 3),
      emb, rc, rb, cents, "embedding", m = 8, dims = 64, nprobe = 4,
      k = 5).collect()
    assert(top.length == 15)
    assert(top.forall(r => r.getAs[Long]("query_id") !=
      r.getAs[Long]("corpus_id")))
    // a duplicate of the query lands in the query's own cell (same
    // cosine ranking), carries the query's residual, quantizes to the
    // query's own per-subspace argmin codes — so it must achieve the
    // global minimum ADC distance among all probed candidates
    import spark.implicits._
    val dup = emb.filter(col("vec_id") === 7)
      .withColumn("vec_id", lit(1000L))
    val corpus2 = emb.union(dup)
    val rc2 = Quantize.pqEncode(
      Quantize.residuals(corpus2, "embedding", cents), "rvec", rb,
      m = 8, dims = 64)
    val out = Quantize.ivfPqResidualTopK(emb.filter(col("vec_id") === 7),
      corpus2, rc2, rb, cents, "embedding", m = 8, dims = 64, nprobe = 4,
      k = 400).collect()
    val dupRow = out.find(_.getAs[Long]("corpus_id") == 1000L).get
    assert(dupRow.getAs[Long]("adist_micro") ==
      out.map(_.getAs[Long]("adist_micro")).min)
  }

  test("oovRate: zero against a covering vocab, counts consistent, ratio exact") {
    import spark.implicits._
    val out = TrainingPrep.oovRate(docs, "doc_id", "text", vocabSize = 32)
      .select("doc_id", "n_toks", "n_oov", "oov_ratio")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, oov, ratio) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      assert(oov >= 0 && oov <= n)
      assert(ratio == oov.toDouble / n.toDouble)
    }
    // a vocab that covers every token ⇒ every doc scores 0 OOV
    val distinctToks = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().count().toInt
    val covered = TrainingPrep.oovRate(docs, "doc_id", "text", distinctToks)
      .agg(sum("n_oov")).as[Long].head()
    assert(covered == 0L)
  }

  test("decontamination flags eval-set copies and ignores disjoint docs") {
    import spark.implicits._
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),     // verbatim copy
      (2L, "alpha beta gamma delta unrelated"),   // partial overlap
      (3L, "zeta eta theta iota kappa"))          // disjoint
      .toDF("doc_id", "text")
    val out = TrainingPrep.decontaminate(corpus, eval, "doc_id", "text",
        n = 3, threshold = 0.5)
      .orderBy("doc_id").collect()
    // doc 1: all 3 shingles hit; doc 2: 2 of 3 hit (>= 0.5); doc 3: 0
    assert(out(0).getAs[Boolean]("contaminated"))
    assert(out(0).getAs[Double]("overlap") == 1.0)
    assert(out(1).getAs[Int]("n_hit") == 2 &&
      out(1).getAs[Boolean]("contaminated"))
    assert(out(2).getAs[Int]("n_hit") == 0 &&
      !out(2).getAs[Boolean]("contaminated"))
  }

  test("bigramMerges counts adjacent pairs corpus-wide; 1-token docs contribute none") {
    import spark.implicits._
    val docs = Seq("a b a b", "b a", "solo").toDF("text")
    val out = TrainingPrep.bigramMerges(docs, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "a b a b" → [a b, b a, a b]; "b a" → [b a]; "solo" → []
    assert(out.toSeq == Seq(("a b", 2L), ("b a", 2L)))
  }

  test("mixtureDivergence: identical strata have zero KL, skew is positive") {
    import spark.implicits._
    val same = Seq(("s1", "a a b"), ("s2", "a a b")).toDF("source", "text")
    val klSame = TrainingPrep.mixtureDivergence(same, "source", "text")
      .collect().map(r => r.getAs[Long]("kl_unats"))
    assert(klSame.forall(_ == 0L)) // p_stratum == p_corpus → ln(1) per token
    val skew = Seq(("s1", "a a a a"), ("s2", "b b b b"))
      .toDF("source", "text")
    val klSkew = TrainingPrep.mixtureDivergence(skew, "source", "text")
      .collect().map(r => r.getAs[Long]("kl_unats"))
    // each stratum is a point mass vs a 50/50 corpus → KL = ln 2 ≈ 693147
    assert(klSkew.forall(_ == 693147L))
  }

  test("firstReason assigns the FIRST violated rule; clean rows are kept") {
    import spark.implicits._
    val df = Seq((1L, 5, 0.1), (2L, 100, 0.1), (3L, 100, 0.9))
      .toDF("id", "n", "ratio")
    val out = df.select(col("id"), TrainingPrep.firstReason(Seq(
        "too_short" -> (col("n") < 10),
        "low_ratio" -> (col("ratio") < 0.5))).as("reason"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // row 1 violates BOTH rules → first wins; accounting stays disjoint
    assert(out == Map(1L -> "too_short", 2L -> "low_ratio", 3L -> "kept"))
  }

  test("centroidOutliers: exact micro-unit distance, planted outlier flagged") {
    import spark.implicits._
    val vecs = Seq(
      (1L, 0, Array(1f, 0f, 0f, 0f)),
      (2L, 0, Array(1f, 0f, 0f, 0f)),
      (3L, 0, Array(1f, 0f, 0f, 0f)),
      (4L, 0, Array(0f, 1f, 0f, 0f))) // far from the label-0 centroid
      .toDF("vec_id", "label", "embedding")
    val out = graft.similarity.Ann.centroidOutliers(vecs, dims = 4,
        thresholdMicro = 500000L)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    // centroid = (0.75, 0.25, 0, 0): members at sqrt(0.125)e6 ≈ 353553,
    // the outlier at sqrt(1.125)e6 ≈ 1060660 — exact integer expectations
    assert(out.toSeq == Seq((1L, 353553L, false), (2L, 353553L, false),
      (3L, 353553L, false), (4L, 1060660L, true)))
  }

  test("scrubBoilerplate removes exactly the covered tokens, keeps order, empties full-boiler docs") {
    import spark.implicits._
    // "a b c d e" appears in 3 docs -> boilerplate; unique tails survive
    val corpus = Seq(
      (1L, "a b c d e x y z"),
      (2L, "p q a b c d e r"),
      (3L, "a b c d e"), // fully covered -> empty
      (4L, "u v w x y z q q")) // clean
      .toDF("doc_id", "text")
    val out = TrainingPrep.scrubBoilerplate(corpus, "doc_id", "text",
        n = 5, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("x y z", 5L)))
    assert(out(2L) == (("p q r", 5L)))
    assert(out(3L) == (("", 5L)))
    assert(out(4L) == (("u v w x y z q q", 0L)))
  }

  test("scrubBoilerplate merges OVERLAPPING occurrences without double-deleting") {
    import spark.implicits._
    // "a a a a a a" contains the 5-gram "a a a a a" twice (pos 1, 2);
    // union of windows covers all 6 tokens, n_removed = 6 not 10
    val corpus = Seq(
      (1L, "a a a a a a"), (2L, "a a a a a m"), (3L, "n a a a a a"))
      .toDF("doc_id", "text")
    val out = TrainingPrep.scrubBoilerplate(corpus, "doc_id", "text",
        n = 5, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("", 6L)))
    assert(out(2L) == (("m", 5L)))
    assert(out(3L) == (("n", 5L)))
  }

  test("hashedTfIdf: exact integer weights, idf monotone in rarity, vectors feed the ANN stack") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (2L, base + " w31"),               // near-copy of 1
      (3L, (100 to 130).map(i => s"w$i").mkString(" ")),
      (4L, (200 to 230).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sparse = TrainingPrep.hashedTfIdf(corpus, "doc_id", "text", dim = 64)
      .cache()
    // weights are exact integers: tf * round(1e6 * ln(5 / (df + 1)))
    val row = sparse.filter(col("doc_id") === 3L).limit(1)
      .select("tf", "weight_micro").head()
    assert(row.getLong(1) % row.getLong(0) == 0) // weight = tf * integer idf
    // a bucket hit by every doc gets a smaller idf than a rare one
    val idfByDf = sparse.withColumn("idf", expr("weight_micro div tf"))
      .groupBy("bucket").agg(
        countDistinct("doc_id").as("df"), max("idf").as("idf"))
      .collect().map(r => r.getLong(1) -> r.getLong(2))
    for ((dfA, idfA) <- idfByDf; (dfB, idfB) <- idfByDf if dfA < dfB)
      assert(idfA >= idfB, s"idf not monotone: df=$dfA->$idfA, df=$dfB->$idfB")

    // composition: densify to 64-float vectors and run the existing ANN
    // brute-force — the near-copy must be doc 1's nearest neighbor
    val dense = sparse.groupBy(col("doc_id").as("vec_id"))
      .agg(map_from_arrays(collect_list(col("bucket")),
        collect_list(col("weight_micro"))).as("m"))
      .select(col("vec_id"), transform(sequence(lit(0), lit(63)),
        b => coalesce(element_at(col("m"), b), lit(0L)).cast("float"))
        .as("embedding"))
    val top = graft.similarity.Ann.bruteForceTopK(
        dense.filter(col("vec_id") === 1L), dense, k = 1)
      .head()
    assert(top.getAs[Long]("corpus_id") == 2L,
      s"near-copy not nearest: $top")
    assert(top.getAs[Double]("cos") > 0.9)
    sparse.unpersist()
  }

  test("chunkDocuments: stride windows, partial tail, short docs in one chunk") {
    import spark.implicits._
    val corpus = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks
      (2L, "only three tokens"))
      .toDF("doc_id", "text")
    val out = TrainingPrep.chunkDocuments(corpus, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(x => (x._1, x._2))
    // doc 1: starts 0,3,6 cover t1..t10 (last window partial at 9)
    assert(out.filter(_._1 == 1L).map(c => (c._2, c._3)).toSeq ==
      Seq((0, 4), (1, 4), (2, 4)))
    assert(out.find(x => x._1 == 1L && x._2 == 0).get._4 == "t1 t2 t3 t4")
    assert(out.find(x => x._1 == 1L && x._2 == 2).get._4 == "t7 t8 t9 t10")
    // every token of doc 1 appears in some chunk (windows overlap by 1)
    val covered = out.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
    assert(out.filter(_._1 == 2L).map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0, 3, "only three tokens")))
  }

  test("dsirSelect ranks target-like documents first, deterministically") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // target slice (is_tgt) speaks 'alpha beta'; raw background speaks
    // 'noise filler'; two candidate docs OUTSIDE the target slice — the
    // one echoing the target vocabulary must outrank the background one
    val docs = (
      (1 to 10).map(i => (i.toLong, true, "alpha beta alpha beta")) ++
      (11 to 40).map(i => (i.toLong, false, "noise filler noise filler")) ++
      Seq((100L, false, "alpha beta alpha beta"),
          (101L, false, "noise filler noise filler"))
    ).toDF("doc_id", "is_tgt", "text")
    val out = graft.training.TrainingPrep.dsirSelect(
        docs, "doc_id", "text", targetPred = col("is_tgt"),
        dim = 64, keep = 12)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("weight_micro"), r.getAs[Int]("rk")))
    // all 11 alpha-beta docs (10 target + echo 100) rank above every
    // background doc, and the echo's weight is positive (target-like)
    val ranked = out.sortBy(_._3).map(_._1)
    assert(ranked.take(11).toSet == ((1 to 10).map(_.toLong).toSet + 100L))
    assert(out.find(_._1 == 100L).get._2 > 0)
    assert(out.find(_._1 == 101L).isEmpty ||
      out.find(_._1 == 101L).get._2 < 0)
    // deterministic: a re-run is identical
    val again = graft.training.TrainingPrep.dsirSelect(
        docs, "doc_id", "text", targetPred = col("is_tgt"),
        dim = 64, keep = 12)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("weight_micro"), r.getAs[Int]("rk")))
    assert(out.sortBy(_._3).sameElements(again.sortBy(_._3)))
  }

  /** portable hash replicated in plain Scala (md5 first 8 hex chars). */
  private def pHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
  }

  test("qualityScore: integer dot product matches plain-Scala recomputation; rank/decile arithmetic exact") {
    implicit val s = spark
    import s.implicits._
    val df = Seq((1L, "a b a c"), (2L, "b c d"), (3L, "a a a a"))
      .toDF("doc_id", "text")
    val out = TrainingPrep.qualityScore(df, "doc_id", "text", dim = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_feats"),
        r.getAs[Long]("score_units"), r.getAs[Int]("rk"),
        r.getAs[Int]("decile")))
    // independent recomputation: buckets, tf, smoothed idf, seeded weights
    val toks = Map(1L -> Seq("a", "b", "a", "c"), 2L -> Seq("b", "c", "d"),
      3L -> Seq("a", "a", "a", "a"))
    def bucket(t: String) = (pHash(t) % 8).toInt
    val tf = toks.view.mapValues(_.groupBy(bucket).view
      .mapValues(_.size.toLong).toMap).toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    def idfMicro(b: Int) = math.round(1e6 * math.log(4.0 / (dfreq(b) + 1.0)))
    def wt(b: Int) = pHash(s"w|$b") % 2001 - 1000
    val want = tf.view.mapValues(
      _.map { case (b, t) => t * idfMicro(b) * wt(b) }.sum).toMap
    out.foreach { case (id, nf, score, _, _) =>
      assert(score == want(id), s"doc $id: $score != ${want(id)}")
      assert(nf == tf(id).size, s"doc $id n_feats")
    }
    // rank is dense over (score desc, id asc); 3 docs land deciles 0/3/6
    assert(out.sortBy(_._4).map(_._4).toSeq == Seq(1, 2, 3))
    assert(out.sortBy(_._4).map(_._5).toSeq == Seq(0, 3, 6))
    val byRank = out.sortBy(_._4).map(r => (r._3, r._1))
    assert(byRank.sameElements(byRank.sortBy { case (sc, id) => (-sc, id) }))
  }

  test("mixturePlan: sqrt-weighted budget split with exact integer epochs; allocation never exceeds budget") {
    implicit val s = spark
    import s.implicits._
    // n_toks: s1=4, s2=9 → weights exactly 2e6 / 3e6 (IEEE-exact sqrts)
    val df = Seq(("s1", "t t t t"), ("s2", "t t t t t t t t t"))
      .toDF("source", "text")
    val out = TrainingPrep.mixturePlan(df, "source", "text",
        budgetTokens = 100L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("s1").getAs[Long]("weight_micro") == 2000000L)
    assert(out("s2").getAs[Long]("weight_micro") == 3000000L)
    assert(out("s1").getAs[Long]("target_toks") == 40L)
    assert(out("s2").getAs[Long]("target_toks") == 60L)
    // repetition factors: s1 repeats 10x (upsample!), s2 6.67x — the
    // epochs>1 regime Bernoulli sampling cannot express
    assert(out("s1").getAs[Long]("epochs_micro") == 10000000L)
    assert(out("s2").getAs[Long]("epochs_micro") == 6666666L)
    // corpus-level: integer div never over-allocates the budget
    val plan = TrainingPrep.mixturePlan(docs, "source", "text",
      budgetTokens = 200000L)
    assert(plan.agg(sum("target_toks")).head.getLong(0) <= 200000L)
  }

  test("leakageFreeSplit: near-dup cluster members always share a split; assignment is total and hash-exact") {
    implicit val s = spark
    import s.implicits._
    val tiny = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = TrainingPrep.leakageFreeSplit(tiny, "doc_id", pairs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("comp"), r.getAs[Int]("split_bucket"),
          r.getAs[String]("split")))).toMap
    // chain 1-2-3 collapses to canonical 1; singletons are their own comp
    assert(Seq(1L, 2L, 3L).map(out(_)._1).forall(_ == 1L))
    assert(out(4L)._1 == 4L && out(5L)._1 == 5L)
    assert(Seq(1L, 2L, 3L).map(out(_)._3).distinct.size == 1)
    // the split decision is exactly hash(comp) mod 10 mapped 8/1/1
    out.values.foreach { case (comp, b, split) =>
      assert(b == (pHash(comp.toString) % 10).toInt)
      val wantSplit = if (b < 8) "train" else if (b == 8) "valid" else "test"
      assert(split == wantSplit)
    }
    // corpus-level leakage check: NO verified near-dup pair straddles a
    // split boundary, and every document is assigned
    val corpus = docs
    val cPairs = graft.dedup.Dedup.minhashNearDups(corpus, "doc_id", "text")
      .select("id_a", "id_b")
    val splits = TrainingPrep.leakageFreeSplit(corpus, "doc_id", cPairs)
    assert(splits.count() == corpus.count())
    val straddle = cPairs
      .join(splits.select(col("doc_id").as("id_a"), col("split").as("sa")),
        "id_a")
      .join(splits.select(col("doc_id").as("id_b"), col("split").as("sb")),
        "id_b")
      .filter(col("sa") =!= col("sb"))
    assert(straddle.count() == 0, "near-dup pair crossed a split boundary")
  }

  test("gopherRules: hand-computed metrics, per-rule booleans, integer micro-units") {
    implicit val s = spark
    import s.implicits._
    // doc 1: 6 words, all distinct-ish prose with 2 stopwords → passes all
    //   but ok_words at minWords=5 it passes; chars=the(3)+cat(3)+sat(3)+
    //   on(2)+a(1)+mat(3)=15 → mean 2.5 fails ok_wlen
    // doc 2: "x x x x" → dup_frac 3/4 fails ok_rep, no stopwords
    val df = Seq((1L, "the cat sat on a mat"), (2L, "x x x x"))
      .toDF("doc_id", "text")
    val out = TrainingPrep.gopherRules(df, "doc_id", "text", minWords = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_words") == 6L)
    assert(d1.getAs[Long]("mean_wlen_micro") == (1000000L * 15) / 6)
    assert(d1.getAs[Long]("alpha_frac_micro") == 1000000L)
    assert(d1.getAs[Int]("n_stopwords") == 2) // the, a
    assert(d1.getAs[Long]("dup_frac_micro") == 0L)
    assert(d1.getAs[Boolean]("ok_words") && !d1.getAs[Boolean]("ok_wlen") &&
      d1.getAs[Boolean]("ok_alpha") && d1.getAs[Boolean]("ok_stop") &&
      d1.getAs[Boolean]("ok_rep") && !d1.getAs[Boolean]("pass"))
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_words") == 4L)
    assert(d2.getAs[Long]("dup_frac_micro") == 750000L)
    assert(!d2.getAs[Boolean]("ok_rep") && !d2.getAs[Boolean]("ok_stop") &&
      !d2.getAs[Boolean]("pass"))
    // corpus-level: total, one row per doc, no nulls in any metric
    val full = TrainingPrep.gopherRules(docs, "doc_id", "text")
    assert(full.count() == docs.count())
    assert(full.filter(col("mean_wlen_micro").isNull ||
      col("pass").isNull).count() == 0)
  }

  test("Spectral.dominantComponent: hand-computed 2-dim power iteration, exact integers") {
    implicit val s = spark
    import s.implicits._
    // x-axis variance 4x the y-axis: iterates (1e6,1e6) -> (1e6,250000)
    // -> (1e6,62500), every step exact integer arithmetic
    val df = Seq(
      Array(2.0f, 0.0f), Array(-2.0f, 0.0f),
      Array(0.0f, 1.0f), Array(0.0f, -1.0f)).toDF("embedding")
    val out = graft.similarity.Spectral
      .dominantComponent(df, "embedding", dims = 2, iters = 2)
      .orderBy("dim").collect()
    assert(out.map(_.getAs[Long]("mean_micro")).toSeq == Seq(0L, 0L))
    assert(out.map(_.getAs[Long]("pc_micro")).toSeq == Seq(1000000L, 62500L))
    // degenerate corpus (zero variance): documented all-ones fallback
    val flat = Seq(Array(1.0f, 1.0f), Array(1.0f, 1.0f)).toDF("embedding")
    val f = graft.similarity.Spectral
      .dominantComponent(flat, "embedding", dims = 2, iters = 2)
      .orderBy("dim").collect()
    assert(f.map(_.getAs[Long]("pc_micro")).toSeq ==
      Seq(1000000L, 1000000L))
    // real corpus: 64 dims, iterate normalized to max-|component| = 1e6
    val pcs = graft.similarity.Spectral
      .dominantComponent(Tables.embeddings(spark, sf()), "embedding",
        dims = 64, iters = 2)
      .collect().map(_.getAs[Long]("pc_micro"))
    assert(pcs.length == 64 && pcs.map(math.abs).max == 1000000L)
  }

  test("exactSubstrScrub: shifted copies, within-doc repetition, short docs") {
    implicit val s = spark
    import s.implicits._
    // k=3. doc2 embeds doc1's "a b c d" shifted by one token — no span
    // BOUNDARY aligns, so the non-overlapping chop (spanDedup) would keep
    // it, but every interior 3-gram collides: dup starts {1, 2} cover
    // positions 1..4 → "z w" survives. doc3 repeats its own 3-token
    // chorus: the second+third copies' windows (starts 3, 4, 5) cover
    // 3..7, keeping exactly one copy. doc4 is shorter than k → untouched.
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "z a b c d w"),
      (3L, "p q r p q r p q"),
      (4L, "a b")).toDF("doc_id", "text")
    val out = TrainingPrep.exactSubstrScrub(df, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_tokens"),
          r.getAs[String]("text_scrubbed")))).toMap
    assert(out(1L) == ((5L, 0L, "a b c d e")), "first occurrence untouched")
    assert(out(2L) == ((6L, 4L, "z w")), "shifted copy scrubbed")
    assert(out(3L) == ((8L, 5L, "p q r")), "self-repetition keeps one copy")
    assert(out(4L) == ((2L, 0L, "a b")), "doc shorter than k untouched")
    // corpus-level invariants at k=8: coverage bounded; short docs never
    // scrubbed; a verbatim whole-doc duplicate (>= k tokens) empties —
    // synthesized by appending a copy of an existing long doc
    val long = docs.filter(size(split(col("text"), " ")) >= 8).limit(1)
      .select(col("text")).head.getString(0)
    val plus = docs.select(col("doc_id"), col("text"))
      .unionByName(Seq((900000L, long)).toDF("doc_id", "text"))
    val full = TrainingPrep.exactSubstrScrub(plus, "doc_id", "text", k = 8)
    assert(full.filter(col("n_dup_tokens") > col("n_tokens")).count() == 0)
    assert(full.filter(size(split(col("text_scrubbed"), " ")) >
      col("n_tokens")).count() == 0)
    val copy = full.filter(col("doc_id") === 900000L).head
    assert(copy.getAs[Long]("n_dup_tokens") == copy.getAs[Long]("n_tokens") &&
      copy.getAs[String]("text_scrubbed") == "",
      "a verbatim later copy of a long doc must scrub completely")
  }

  test("spanDedup: first corpus-wide span occurrence survives, documents reassemble in order") {
    implicit val s = spark
    import s.implicits._
    // k=2 spans: doc1 = [a b][c d], doc2 = [a b][x y], doc3 = [c d]
    // doc1 claims [a b] and [c d]; doc2 keeps only [x y]; doc3 empties
    val df = Seq((1L, "a b c d"), (2L, "a b x y"), (3L, "c d"))
      .toDF("doc_id", "text")
    val out = TrainingPrep.spanDedup(df, "doc_id", "text", k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_spans"), r.getAs[Int]("n_kept"),
          r.getAs[String]("text_scrubbed")))).toMap
    assert(out(1L) == ((2, 2, "a b c d")))
    assert(out(2L) == ((2, 1, "x y")))
    assert(out(3L) == ((1, 0, "")))
    // ragged tail: 5 tokens at k=2 → 3 spans, last is 1 token
    val ragged = Seq((7L, "p q r s t")).toDF("doc_id", "text")
    val r7 = TrainingPrep.spanDedup(ragged, "doc_id", "text", k = 2)
      .head()
    assert(r7.getAs[Int]("n_spans") == 3 &&
      r7.getAs[String]("text_scrubbed") == "p q r s t")
    // corpus-level conservation: kept spans never exceed spans, and a
    // re-run of the scrubbed output removes nothing further (idempotent
    // up to the spans the first pass already made unique)
    val full = TrainingPrep.spanDedup(docs, "doc_id", "text", k = 5)
    assert(full.filter(col("n_kept") > col("n_spans")).count() == 0)
    val again = TrainingPrep.spanDedup(
      full.select(col("doc_id"), col("text_scrubbed").as("text"))
        .filter(col("text") =!= ""), "doc_id", "text", k = 5)
    assert(again.filter(col("n_kept") < col("n_spans")).count() == 0,
      "re-scrub removed spans the first pass left — not idempotent")
  }

  test("corpusShard: total deterministic permutation, contiguous in-shard positions, re-seed changes order") {
    val a = TrainingPrep.corpusShard(docs, "doc_id", seed = 7, nShards = 8)
    assert(a.count() == docs.count())
    // every shard's positions are exactly 1..n_shard (dense, no gaps)
    val byShard = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
    assert(byShard.filter(col("mx") =!= col("n") || col("mn") =!= 1)
      .count() == 0)
    // shards are reasonably balanced (hash uniformity, 500 docs / 8 shards)
    val sizes = byShard.select("n").collect().map(_.getLong(0))
    assert(sizes.length == 8 && sizes.min > 30, sizes.mkString(","))
    // deterministic: identical across runs
    val b = TrainingPrep.corpusShard(docs, "doc_id", seed = 7, nShards = 8)
    assert(a.exceptAll(b).count() == 0)
    // a different seed is a different permutation (some doc moves)
    val c = TrainingPrep.corpusShard(docs, "doc_id", seed = 8, nShards = 8)
    assert(a.exceptAll(c).count() > 0)
  }

  test("keepBestOfCluster: exactly one winner per cluster, and it is the most fluent member") {
    implicit val s = spark
    import s.implicits._
    // cluster {1,2,3} (chain), singletons 4, 5; doc 2's text is all
    // high-frequency tokens → strictly lowest surprisal → the keeper
    val tiny = Seq(
      (1L, "a b zzz"), (2L, "a b a"), (3L, "a b qqq"),
      (4L, "a a a"), (5L, "xyzzy"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = TrainingPrep.keepBestOfCluster(tiny, "doc_id", "text", pairs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("comp"), r.getAs[Long]("score"),
          r.getAs[Int]("rank_in_cluster"), r.getAs[Boolean]("kept")))).toMap
    assert(out.size == 5)
    // cluster members share comp 1; singletons are their own comp
    assert(Seq(1L, 2L, 3L).map(out(_)._1).forall(_ == 1L))
    assert(out(4L)._1 == 4L && out(5L)._1 == 5L)
    // one keeper per comp; it has rank 1 and the cluster-min score
    val cluster = Seq(1L, 2L, 3L).map(id => id -> out(id))
    val keepers = cluster.filter(_._2._4)
    assert(keepers.size == 1)
    assert(keepers.head._2._2 == cluster.map(_._2._2).min)
    assert(out(2L)._4, "the common-token doc must win its cluster")
    assert(out(4L)._4 && out(5L)._4, "singletons keep themselves")
    // corpus-level: keepers partition the corpus 1:1 with components
    val full = TrainingPrep.keepBestOfCluster(docs, "doc_id", "text",
      graft.dedup.Dedup.minhashNearDups(docs, "doc_id", "text")
        .select("id_a", "id_b"))
    assert(full.count() == docs.count())
    assert(full.filter(col("kept")).count() ==
      full.select("comp").distinct().count())
  }

  test("bigramSurprisal: hand-computed interpolated bigram scores, short docs omitted") {
    implicit val s = spark
    import s.implicits._
    // corpus: N=8 tokens, V=4; bigrams (a,b)x3, (b,a), (b,c)
    // P(a,b)=0.9*3/3+0.1*4/12  P(b,a)=0.9*1/2+0.1*4/12  P(b,c)=0.9*1/2+0.1*2/12
    // unats: 68993 / 727049 / 762140 (round(-1e6*ln P))
    val tiny = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TrainingPrep.bigramSurprisal(tiny, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("surprisal_unats"), r.getAs[Int]("n_bigrams"),
          r.getAs[Long]("mean_unats")))).toMap
    assert(out.size == 2)
    assert(!out.contains(3L), "single-token docs have no bigram score")
    assert(out(1L) == ((2 * 68993L + 727049L, 3, 288345L)))
    assert(out(2L) == ((68993L + 762140L, 2, 415566L)))
    // fluency ordering on the real corpus: repeating the corpus's most
    // common continuations scores lower (more fluent) than rare ones —
    // sanity that the model half dominates the smoothing half
    val scored = TrainingPrep.bigramSurprisal(docs, "doc_id", "text")
    assert(scored.count() > 0)
    assert(scored.filter(col("mean_unats") <= 0).count() == 0,
      "surprisal is a positive cost")
  }

  test("ccnetBuckets: per-language terciles are balanced and ordered by surprisal") {
    val out = TrainingPrep.ccnetBuckets(docs, "doc_id", "text", "lang")
    assert(out.count() == docs.count())
    // tercile sizes within each language differ by at most 1
    val sizes = out.groupBy("lang", "bucket").count().collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2))).toMap
    sizes.foreach { case (lang, ns) =>
      assert(ns.max - ns.min <= 1, s"$lang terciles: ${ns.mkString(",")}")
    }
    // ordering: every head doc's surprisal <= every tail doc's, per lang
    val agg = out.groupBy("lang").agg(
      max(when(col("bucket") === "head", col("mean_unats"))).as("maxHead"),
      min(when(col("bucket") === "tail", col("mean_unats"))).as("minTail"))
    assert(agg.filter(col("maxHead") > col("minTail")).count() == 0)
  }

  test("mixtureAllocation: hand-computed Hamilton rounding, allocations sum exactly to the budget") {
    import spark.implicits._
    def doc(src: String, n: Int) = (src, ("w " * n).trim)
    // token counts 100/400/2500 → √ weights 10/20/50, Σw = 80
    // budget 1003: floors 125/250/626 (rem 30/60/70), spare 2 → c and b
    val docs = Seq(doc("a", 100), doc("b", 400), doc("c", 2500))
      .toDF("source", "text")
    val out = graft.training.TrainingPrep
      .mixtureAllocation(docs, "source", "text", budget = 1003L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((100L, 10L, 125L)))
    assert(out("b") == ((400L, 20L, 251L)))
    assert(out("c") == ((2500L, 50L, 627L)))
    assert(out.values.map(_._3).sum == 1003L, "must spend the budget exactly")
    // corpus-scale invariant at the gate fixture
    val corpus = graft.training.TrainingPrep.mixtureAllocation(
      Tables.documents(spark, sf("sf0.01")), "source", "text", 100000L)
    assert(corpus.agg(sum("alloc_tokens")).head.getLong(0) == 100000L)
  }

  test("trainingOrder: exact WFQ interleave — every source spread uniformly, total order pinned") {
    import spark.implicits._
    val rows = (1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 50).map(i => ("b", 1000L + i)) ++
      (1 to 10).map(i => ("c", 2000L + i))
    val docs = rows.toDF("source", "doc_id")
    val out = graft.training.TrainingPrep
      .trainingOrder(docs, "source", "doc_id")
      .orderBy("global_pos").collect()
    assert(out.length == 160)
    // the op must equal the hand-computed WFQ order exactly
    val sizes = Map("a" -> 100L, "b" -> 50L, "c" -> 10L)
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.map(_._2).sorted.zipWithIndex.map { case (id, i) =>
        ((i + 1) * 1000000L / sizes(src), src, id)
      }
    }.sorted.map(_._3)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == expected)
    assert(out.map(_.getAs[Long]("global_pos")).toSeq == (1L to 160L))
    // proportional-prefix: after half the order, each source has emitted
    // ~half of itself (the property that makes mid-epoch restarts fair)
    val half = out.take(80).groupBy(_.getAs[String]("source"))
      .view.mapValues(_.length).toMap
    assert(math.abs(half("a") - 50) <= 2, half.toString)
    assert(math.abs(half("b") - 25) <= 2, half.toString)
    assert(math.abs(half("c") - 5) <= 2, half.toString)
  }

  test("charEntropy: hand-computed micro-nats, degenerate and uniform cases") {
    import spark.implicits._
    val docs = Seq((1L, "aabb"), (2L, "aaaa"), (3L, "abcd"))
      .toDF("doc_id", "text")
    val out = graft.training.TrainingPrep.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // H("aabb") = ln 2: per-class term round(1e6*2*(ln4-ln2)) = 1386294,
    // sum 2772588, div 4 = 693147
    assert(out(1L) == ((4L, 2L, 693147L)))
    assert(out(2L) == ((4L, 1L, 0L)))  // constant-char spam -> 0
    // uniform over 4 chars: ln 4 = 1386294 (term per class
    // round(1e6*ln4) = 1386294, x4, div 4)
    assert(out(3L) == ((4L, 4L, 1386294L)))
  }

  test("bitextMarginMine: planted parallel pair mined mutual-best; hub vector suppressed by the margin") {
    import spark.implicits._
    val dims = 64
    // controlled cosine geometry: every vector = 0.5·g + 0.866·idio_i
    // (g = the shared direction), so generic cross-side cos ≈ 0.25,
    // cos(·, hub=g) ≈ 0.5, and the planted pair (shared idio) ≈ 1.0.
    // The hub is every vector's second-best — the classic hubness trap
    // raw-cosine mining falls into.
    val g = (0 until dims).map(_ => 1.0 / math.sqrt(dims))
    def idio(seed: Int): Seq[Double] = {
      val r = new scala.util.Random(seed)
      (0 until dims).map(_ => (if (r.nextBoolean()) 1.0 else -1.0) /
        math.sqrt(dims))
    }
    def mix(seed: Int): Seq[Float] =
      g.zip(idio(seed)).map { case (a, b) => (0.5 * a + 0.866 * b).toFloat }
    val src = Seq(
      (0L, mix(7)), (2L, mix(11)), (4L, mix(23)), (6L, mix(37)),
      (8L, mix(41))).toDF("vec_id", "embedding")
    // tgt 1 shares src 0's idiosyncratic component (the translation);
    // tgt 3 is the hub; 5/7/9 are generic unpartnered targets
    val tgtPlanted = mix(7).zipWithIndex
      .map { case (v, i) => if (i == 0) v + 0.01f else v }
    val tgt = Seq(
      (1L, tgtPlanted), (3L, g.map(_.toFloat)), (5L, mix(53)),
      (7L, mix(61)), (9L, mix(71))).toDF("vec_id", "embedding")
    def mine(thresholdMicro: Long) = graft.similarity.Ann
      .bitextMarginMine(src, tgt, dims = dims, k = 2,
        tables = graft.similarity.Ann.LshTables, bits = 4,
        marginThresholdMicro = thresholdMicro)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // threshold 1.0: everything mutual-best survives, including the
    // hub pairing with the partnerless src — but the MARGIN ORDERING
    // must put the genuine translation pair far above any hub pair
    // (that ordering is what the ratio criterion buys over raw cosine)
    val all = mine(1000000L)
    assert(all.contains((0L, 1L)), s"planted pair not mined: $all")
    val plantedMargin = all((0L, 1L))
    all.collect { case ((_, 3L), m) => m }.foreach { hubMargin =>
      assert(plantedMargin > hubMargin + 200000L,
        s"planted margin $plantedMargin not clear of hub $hubMargin")
    }
    // a production threshold (1.3) keeps the translation, drops the hub
    val strict = mine(1300000L)
    assert(strict.contains((0L, 1L)), s"planted pair lost: $strict")
    assert(!strict.keys.exists(_._2 == 3L), s"hub survived 1.3: $strict")
    // mutual-best: each src and each tgt appears at most once
    assert(all.keys.toSeq.map(_._1).distinct.size == all.size)
    assert(all.keys.toSeq.map(_._2).distinct.size == all.size)
  }

  test("knTrigramSurprisal: continuation counts beat raw frequency (the KN property), repetition scores cheap, short docs omitted") {
    import spark.implicits._
    // manyX and onceX have EQUAL raw frequency (11 each) — but manyX
    // follows 10 distinct contexts while onceX always follows the same
    // one. In a NOVEL context ("z m" / "z o"), KN must prefer manyX:
    // that preference is carried entirely by the continuation count
    // N1+(·w2w3), which raw-frequency interpolation (td74) cannot see.
    val fillers =
      (0 until 10).map(i => (100L + i, s"c$i m manyX")) ++
      (0 until 10).map(i => (200L + i, "d o onceX"))
    val corpus = (fillers ++ Seq(
      (1L, "z m manyX"), (2L, "z o onceX"),
      (3L, "a a a a a a"), (4L, "u v w x y t"),
      (5L, "too short"))).toDF("doc_id", "text")
    val out = TrainingPrep.knTrigramSurprisal(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2),
        r.getLong(3))).toMap
    assert(!out.contains(5L), "a 2-token doc has no trigram evidence")
    assert(out(1L)._2 == 1 && out(2L)._2 == 1)
    assert(out(1L)._1 < out(2L)._1,
      s"continuation diversity ignored: manyX=${out(1L)._1} >= onceX=${out(2L)._1}")
    // a doc made of one repeated trigram reads as cheap; unique-trigram
    // prose is expensive
    assert(out(3L)._3 < out(4L)._3,
      s"repetition not cheaper: ${out(3L)._3} vs ${out(4L)._3}")
    assert(out.values.forall(_._1 > 0L), "surprisal must be positive")
  }

  test("preferenceRatings: block tournament — ratings monotone in strength, floor holds, singleton blocks excluded") {
    import spark.implicits._
    // block 0 = ids 0..2 (blockSize 8): a strict strength order; id 100
    // sits alone in its block — no comparisons, excluded from output
    val items = Seq((0L, 30L), (1L, 20L), (2L, 10L), (100L, 99L))
      .toDF("doc_id", "n_chars")
    val out = TrainingPrep.preferenceRatings(items, "doc_id", "n_chars",
        blockSize = 8, iters = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set(0L, 1L, 2L), s"wrong item set: ${out.keySet}")
    val (w0, n0, r0) = out(0L); val (w1, _, r1) = out(1L)
    val (w2, _, r2) = out(2L)
    assert((w0, w1, w2) == ((2L, 1L, 0L)), s"wins: ${(w0, w1, w2)}")
    assert(n0 == 2L)
    // MM ratings reproduce the strength order strictly
    assert(r0 > r1 && r1 > r2, s"ratings not monotone: $r0 $r1 $r2")
    // the never-winning item floors at 1000 micros, never collapses to 0
    assert(r2 >= 1000L, s"floor violated: $r2")
    // round-1 hand computation: d_i = 2 * (1e12 div 2e6) = 1e6 for all,
    // raw = (2e12 div 1e6, 1e12 div 1e6, floor) = (2e6, 1e6, 1000);
    // the mean renormalization then keeps the AVERAGE rating pinned
    // near 1e6 every round
    val mean = (r0 + r1 + r2) / 3.0
    assert(math.abs(mean - 1e6) < 1e5, s"mean drifted: $mean")
  }

  test("preferenceRatings: ties break to the lower id, corpus run is deterministic") {
    import spark.implicits._
    val items = Seq((10L, 5L), (11L, 5L)).toDF("doc_id", "n_chars")
    val out = TrainingPrep.preferenceRatings(items, "doc_id", "n_chars",
        blockSize = 8, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out(10L)._1 == 1L && out(11L)._1 == 0L, s"tie rule: $out")
    assert(out(10L)._2 > out(11L)._2)
    val real = TrainingPrep.preferenceRatings(docs, "doc_id", "n_chars",
      blockSize = 8, iters = 5)
    val a = real.orderBy("doc_id").collect().toSeq
    val b = TrainingPrep.preferenceRatings(docs, "doc_id", "n_chars",
      blockSize = 8, iters = 5).orderBy("doc_id").collect().toSeq
    assert(a == b, "corpus ratings not deterministic")
  }

  test("similarityPack: exact dups pack adjacent at distance 0; budget bounds hold; ordering beats id-order baseline") {
    import spark.implicits._
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t3 = "completely different subject matter about spark shuffles and joins"
    val hand = Seq((1L, t1), (2L, t1), (3L, t3)).toDF("doc_id", "text")
    val out = TrainingPrep.similarityPack(hand, "doc_id", "text",
        budget = 1024, bucketBits = 2)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(4)) None else Some(r.getInt(4)))).toMap
    // identical texts share a simhash -> same bucket, adjacent, ham 0;
    // doc 1 (lower id) is the pack head
    assert(out(1L).isEmpty && out(2L).contains(0), s"dup adjacency: $out")

    val packed = TrainingPrep.similarityPack(docs, "doc_id", "text",
      budget = 1024, bucketBits = 6)
    // contiguous-model budget bound: a pack exceeds the budget by at
    // most its last member (oversized docs keep their own pack)
    val worst = packed.groupBy("bucket", "pack_idx")
      .agg(sum("n_toks").as("tok"), max("n_toks").as("mx"))
      .filter(col("tok") >= lit(1024) + col("mx")).count()
    assert(worst == 0, s"$worst packs overflow beyond the contiguous bound")
    // every non-head row carries a distance; heads carry null
    val heads = packed.filter(col("ham_prev").isNull).count()
    val nPacks = packed.select("bucket", "pack_idx").distinct().count()
    assert(heads == nPacks, s"heads=$heads packs=$nPacks")
    // the point of the op: within-pack adjacent docs are CLOSER than
    // arbitrary id-order neighbors (the unpacked baseline)
    val meanPacked = packed.agg(avg("ham_prev")).head().getDouble(0)
    val base = graft.dedup.Dedup.withSimhash(docs, "text")
      .select(col("doc_id"), col("simhash"))
      .withColumn("prev", lag("simhash", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
          .orderBy("doc_id")))
      .filter(col("prev").isNotNull)
      .agg(avg(bit_count(col("simhash").bitwiseXOR(col("prev")))))
      .head().getDouble(0)
    assert(meanPacked < base,
      s"similarity ordering no better than id order: $meanPacked vs $base")
  }

  test("dpoPairs: best pairs with worst per block, margins positive, middle of odd blocks unpaired") {
    import spark.implicits._
    // one block of 8 (ids 0-7) with strictly increasing strength, one
    // block of 3 (ids 8-10) to exercise the odd middle
    val hand = (0L to 10L).map(i => (i, (i + 1) * 100L)).toDF("id", "s")
    val out = TrainingPrep.dpoPairs(hand, "id", "s", blockSize = 8,
      iters = 5, marginThresholdMicro = 0L)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(6)))
    // block 0: 4 pairs (7,0) (6,1) (5,2) (4,3); block 1: 1 pair (10,8),
    // id 9 is the odd middle and appears nowhere
    val expect = Set((0L, 1L, 7L, 0L), (0L, 2L, 6L, 1L), (0L, 3L, 5L, 2L),
      (0L, 4L, 4L, 3L), (1L, 1L, 10L, 8L))
    assert(rows.map(t => (t._1, t._2, t._3, t._4)).toSet == expect,
      s"pairing: ${rows.mkString(", ")}")
    assert(rows.forall(_._5 > 0), "every margin strictly positive here")
    assert(!rows.exists(r => r._3 == 9L || r._4 == 9L), "odd middle paired")
    // thresholding drops thin-margin pairs and keeps the rest intact
    val margins = out.select("margin_micro").as[Long].collect().sorted
    val cut = margins(margins.length / 2)
    val kept = TrainingPrep.dpoPairs(hand, "id", "s", blockSize = 8,
      iters = 5, marginThresholdMicro = cut)
    assert(kept.count() == margins.count(_ >= cut).toLong)
    // an item is chosen at most once and rejected at most once
    assert(out.groupBy("chosen_id").count().filter(col("count") > 1)
      .count() == 0)
    assert(out.groupBy("rejected_id").count().filter(col("count") > 1)
      .count() == 0)
  }

  test("cdcChunkDedup: chunks tile the document; shared tail found regardless of prefix shift (the content-defined property)") {
    import spark.implicits._
    val shared = (1 to 40).map(i => s"common sentence $i repeated verbatim")
      .mkString(" ") // ~1.3k chars of identical tail
    val a = "short head. " + shared
    val b = "a completely different and much longer preamble text here. " + shared
    val solo = (1 to 40).map(i => s"unique material $i never repeated")
      .mkString(" ")
    val hand = Seq((1L, a), (2L, b), (3L, solo)).toDF("doc_id", "text")
    val out = TrainingPrep.cdcChunkDedup(hand, "doc_id", "text")
    val byId = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // chunks tile: per-doc chunk chars sum to the doc length
    for ((id, txt) <- Seq(1L -> a, 2L -> b, 3L -> solo))
      assert(byId(id)._2 == txt.length.toLong,
        s"doc $id chunks don't tile: ${byId(id)._2} vs ${txt.length}")
    // the shifted shared tail still lands in identical chunks for BOTH
    // docs (fixed-size chunking would find nothing here) …
    assert(byId(1L)._4 > shared.length / 2,
      s"doc 1 shared chars ${byId(1L)._4} — boundaries didn't resync")
    assert(byId(2L)._4 > shared.length / 2,
      s"doc 2 shared chars ${byId(2L)._4} — boundaries didn't resync")
    // … and the unrelated doc shares nothing
    assert(byId(3L)._3 == 0L, s"solo doc reported shared chunks: ${byId(3L)}")
    // deterministic across runs
    val again = TrainingPrep.cdcChunkDedup(hand, "doc_id", "text")
    assert(out.exceptAll(again).count() == 0 &&
      again.exceptAll(out).count() == 0)
  }

  test("kAnonymityAudit: small classes and sensitive-poor classes flagged, healthy classes absent") {
    import spark.implicits._
    val rows =
      // class A: size 1 -> k-violation (and l)
      Seq(("A", 1L, "u1")) ++
      // class B: size 6, one distinct user -> l-violation only
      (1 to 6).map(i => ("B", 1L, "u9")) ++
      // class C: size 6, 3 distinct users -> healthy
      (1 to 6).map(i => ("C", 1L, s"u${i % 3}"))
    val df = rows.toDF("qi1", "qi2", "user")
    val out = TrainingPrep.kAnonymityAudit(df, Seq("qi1", "qi2"), "user",
      k = 5, l = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5))).toMap
    assert(out.keySet == Set("A", "B"), s"flagged: ${out.keySet}")
    assert(out("A") == ((1L, 1L, true, true)))
    assert(out("B") == ((6L, 1L, false, true)))
  }
}
