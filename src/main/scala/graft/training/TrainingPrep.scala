package graft.training

import graft.functions.Hashing
import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training pipelines: deterministic
  * stratified sampling (data mixing), budgeted sequence packing, and
  * boilerplate-passage removal. (Beyond the reference — the curation
  * stages a 100 TB text pipeline runs after dedup.)
  *
  * All three are shuffle-lean by construction:
  *   - sampling is a pure per-row predicate (pushes into the scan);
  *   - packing windows within the stratum key only — one shuffle, the
  *     same partitioning delivery already uses;
  *   - passage removal shuffles (shingle, doc_id) pairs, never doc text.
  */
object TrainingPrep {

  /** Deterministic stratified sampling — the data-mixing primitive: keep a
    * row iff `portableHash(id) mod 10000 < rate(stratum) * 10000`. Hash-
    * based (not `rand()`) so the sample is reproducible across runs,
    * engines and retries; changing a stratum's rate only adds/removes that
    * stratum's rows (nested samples: rate 0.2 ⊂ rate 0.5).
    *
    * `rates`: stratum value → keep fraction in [0,1]; `defaultRate`
    * applies to unlisted strata.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val bucket = pmod(Hashing.portableHash(col(idCol).cast("string")), lit(10000))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket < (rate * 10000).cast("int"))
  }

  /** Budgeted sequence packing: assign consecutive documents (in `orderCol`
    * order within each `partCol` stratum) to packs of at most `budget`
    * tokens — running `sum(n_toks)` integer-divided by the budget, the
    * contiguous form of greedy first-fit (identical unless one document
    * alone spans a boundary; oversized docs get their own packs).
    * Adds `n_toks` and `pack_idx`.
    */
  def packSequences(df: DataFrame, textCol: String, partCol: String,
      orderCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_toks", TextAnalysis.wsTokenCount(col(textCol)))
      .withColumn("pack_idx",
        ((sum(col("n_toks")).over(w) - lit(1)) / lit(budget)).cast("bigint"))
  }

  /** Packing-efficiency report over [[packSequences]] — the
    * context-window utilization number that sizes a training run: per
    * stratum, documents, packs, total tokens, nominal capacity
    * (packs × budget) and the fill rate in exact integer ppm. Fill can
    * exceed 1e6 when oversized documents overflow their bin under the
    * contiguous model (they keep their tokens in one pack) — that
    * overflow is itself the signal to raise the budget or pre-chunk
    * (td42). One aggregate over the packed frame; |strata| output rows.
    */
  def packingEfficiency(df: DataFrame, textCol: String, partCol: String,
      orderCol: String, budget: Int): DataFrame =
    packSequences(df, textCol, partCol, orderCol, budget)
      .groupBy(col(partCol))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        countDistinct(col("pack_idx")).cast("bigint").as("n_packs"),
        sum(col("n_toks")).cast("bigint").as("total_tokens"))
      .withColumn("capacity", col("n_packs") * budget)
      .withColumn("fill_ppm",
        expr("(1000000 * total_tokens) div capacity"))

  /** Boilerplate passages: word n-gram spans appearing in at least
    * `minDocs` DISTINCT documents (C4-style repeated-span detection —
    * navigation chrome, license headers, templates). Returns
    * (passage, n_docs), the corpus's shared-span table.
    */
  /** The exploded (id, distinct passage) span table both boilerplate ops
    * derive from. Shuffles (shingle, doc_id) pairs, never doc text.
    */
  private def spanTable(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    // fused kernel ≡ array_distinct(shinglesOf(tokens(text), n))
    df.select(col(idCol), explode(graft.functions.VectorExpressions
      .distinct_shingles(col(textCol), n, sorted = false)).as("passage"))

  def boilerplatePassages(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int): DataFrame =
    spanTable(df, idCol, textCol, n)
      .groupBy("passage")
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Per-document boilerplate exposure: how many of the corpus's shared
    * passages each document contains (`n_boiler`; 0 = clean). The
    * downstream filter/cleaner keys off this — kept as a count, not a
    * boolean, so thresholds stay a reader-side choice.
    */
  /** Temperature-balanced sampling — the cross-stratum data-mixing
    * primitive (τ-sampling in multilingual/multi-source pretraining):
    * keep rate per stratum `min(1, baseRate * sqrt(n_max / n_s))`, i.e.
    * rates ∝ n_s^(α−1) with α = 0.5 anchored at the LARGEST stratum —
    * rare strata are up-weighted toward uniform, the head stratum keeps
    * `baseRate`. Anchoring at `max` (order-independent) instead of a
    * normalizing sum keeps every arithmetic step IEEE-exact and
    * engine-reproducible: max, divide, sqrt and multiply are all
    * correctly rounded, where a cross-stratum float SUM would depend on
    * aggregation order. Row selection is the same deterministic
    * hash-mod predicate as [[stratifiedSample]].
    */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
      baseRate: Double): DataFrame = {
    val counts = df.groupBy(stratumCol)
      .agg(count(lit(1)).cast("double").as("n_s"))
    val mx = counts.agg(max(col("n_s")).as("n_max"))
    val rates = counts.crossJoin(broadcast(mx))
      .withColumn("rate",
        least(lit(1.0), lit(baseRate) * sqrt(col("n_max") / col("n_s"))))
      .select(col(stratumCol), col("rate"))
    val bucket = pmod(Hashing.portableHash(col(idCol).cast("string")), lit(10000))
    df.join(broadcast(rates), stratumCol)
      .filter(bucket < floor(col("rate") * 10000).cast("int"))
      .select(df.columns.map(col): _*)
  }

  /** Unigram-LM document quality (CCNet-style): mean token surprisal under
    * the corpus's OWN unigram model with add-one smoothing —
    * `p(tok) = (count(tok)+1) / (N+V)`. High surprisal = rare/garbled
    * vocabulary; low = templated text. The standard cheap LM-quality
    * filter when a real LM is too expensive to run over 100 TB.
    *
    * Output is integer micro-nats rounded PER TOKEN before summing, so the
    * aggregate is exact integer arithmetic — no cross-engine FP
    * accumulation drift (`surprisal_unats` total, `n_toks`, and the
    * integer mean). Two shuffles: the vocab count and the per-doc
    * aggregate; the token→vocab equijoin broadcasts when the vocab fits
    * (AQE decides), and the 1-row totals side is an explicit broadcast.
    */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NOTE (r16 opt): a Tables.spread here measured SLOWER interleaved
    // (td58 0.96→2.20 min) — toks feeds several consumers and the added
    // exchange is not reused across their subtrees; left on scan width
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val tot = vocab.agg(sum("cnt").cast("bigint").as("n_total"),
      count(lit(1)).cast("bigint").as("v_size"))
    toks.join(vocab, "token")
      .crossJoin(broadcast(tot))
      .withColumn("unats", round(lit(1e6) *
        log((col("n_total") + col("v_size")) /
          (col("cnt") + lit(1)).cast("double"))).cast("bigint"))
      .groupBy(idCol)
      .agg(sum("unats").cast("bigint").as("surprisal_unats"),
        count(lit(1)).cast("int").as("n_toks"))
      // integer division (`div`), not `/`+cast: Spark casts double→bigint
      // by truncation but DuckDB CAST rounds — `div` vs `//` agree exactly
      .withColumn("mean_unats", expr("surprisal_unats div n_toks"))
  }

  /** Benchmark decontamination: per-document overlap between the doc's
    * DISTINCT word n-gram shingles and the shingle universe of an
    * evaluation set — the standard pre-training hygiene pass that keeps
    * test benchmarks out of the training corpus.
    *
    * Returns `(id, n_shingles, n_hit, overlap, contaminated)` where
    * `overlap = n_hit / n_shingles` (exact int→double division) and
    * `contaminated = overlap >= threshold`.
    *
    * Scale shape: eval sets are tiny (thousands of docs) against a 100 TB
    * corpus, so the eval shingle UNIVERSE is distinct-reduced and
    * broadcast; the corpus side explodes to (id, shingle) and aggregates
    * per doc — corpus text never shuffles, and the broadcast left-join
    * marks hits without a shuffle of the exploded side beyond the per-doc
    * groupBy the aggregate needs anyway.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double): DataFrame = {
    val evalShingles = evalSet
      .select(explode(graft.functions.VectorExpressions
        .distinct_shingles(col(textCol), n, sorted = false)).as("__sh"))
      .distinct()
      .withColumn("__hit", lit(1L))
    corpus
      .select(col(idCol), explode(graft.functions.VectorExpressions
        .distinct_shingles(col(textCol), n, sorted = false)).as("__sh"))
      .join(broadcast(evalShingles), Seq("__sh"), "left_outer")
      .groupBy(idCol)
      .agg(count(lit(1)).cast("int").as("n_shingles"),
        coalesce(sum(col("__hit")), lit(0L)).cast("int").as("n_hit"))
      .withColumn("overlap",
        col("n_hit").cast("double") / col("n_shingles").cast("double"))
      .withColumn("contaminated", col("overlap") >= lit(threshold))
  }

  /** Vocabulary coverage / OOV rate — the tokenizer-fit signal: build the
    * corpus's own top-`vocabSize` token vocabulary (by frequency, ties
    * broken lexicographically — deterministic), then score each document
    * by the fraction of its token OCCURRENCES outside that vocabulary.
    * High OOV docs are poor fits for a tokenizer trained on this corpus
    * (or mislabeled-language/garbage candidates).
    *
    * Scale shape: the vocabulary is an aggregate + global top-k
    * (tiny by construction — `vocabSize` rows) collapsed to ONE array row
    * and broadcast; per-doc scoring is then a narrow map over the corpus
    * (array membership against the broadcast vocab), no shuffle of doc
    * text. Returns (id, n_toks, n_oov, oov_ratio).
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val vocab = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(vocabSize)
      .agg(collect_set("token").as("__vocab"))
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        size(col("__toks")).as("n_toks"),
        size(filter(col("__toks"),
          t => !array_contains(col("__vocab"), t))).as("n_oov"))
      .withColumn("oov_ratio",
        col("n_oov").cast("double") / col("n_toks").cast("double"))
  }

  /** Adjacent-token-pair frequencies — the first BPE merge table: the
    * corpus-wide count of every consecutive token bigram, top-`k` by
    * frequency (ties broken lexicographically). Iterating this op IS the
    * BPE training loop; one round is the tokenizer-fit diagnostic ("which
    * merges would a tokenizer trained here learn first").
    *
    * Scale shape: pairs explode to (pair) rows but aggregate with map-side
    * partial combine — one shuffle of (pair, partial_count), then a global
    * top-k (TakeOrderedAndProject — never a full sort of the vocab).
    */
  def bigramMerges(df: DataFrame, textCol: String, k: Int): DataFrame =
    // fused TokenPairs kernel: bit-identical to the HOF
    // transform/concat_ws form but one tight pass per row (`DedupSpec`
    // proves the equivalence; the lambda interpretation dominated td35)
    df.select(explode(graft.functions.VectorExpressions
        .token_pairs(col(textCol))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)

  /** Declarative twin of the [[bigramMerges]] pair extraction — the
    * equivalence oracle for the fused TokenPairs kernel.
    */
  private[graft] def tokenPairsDeclarative(textCol: Column): Column = {
    val toks = TextAnalysis.tokens(textCol)
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Character-pair frequencies — the char-level first-round BPE merge
    * table ([[bigramMerges]]'s sibling one level down): corpus-wide
    * counts of adjacent character pairs inside words, top-`k` by
    * frequency (ties lexicographic). The mined ranks drive
    * [[bpeEncode]]. Same scale shape as bigramMerges: explode +
    * map-side-combined count + TakeOrderedAndProject.
    */
  def charPairMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val words = df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
    words.select(explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => concat(col("w").substr(i, lit(1)), lit(" "),
          col("w").substr(i + 1, lit(1))))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)
  }

  /** Apply a learned BPE merge table (greedy lowest-rank-first, the
    * GPT-2 loop) to every document via the fused
    * [[graft.functions.VectorExpressions.BpeEncode]] kernel — the actual
    * token-counting step a training pipeline runs per document. Returns
    * `(id, n_words, n_pieces, pieces_fp)`; the md5 fingerprint pins the
    * exact piece sequence for regression checks. Pure per-row kernel, no
    * shuffle; the merge table rides the closure (tiny — a tokenizer has
    * a fixed vocab).
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[String]): DataFrame =
    df.select(col(idCol),
        size(TextAnalysis.tokens(col(textCol))).as("n_words"),
        graft.functions.VectorExpressions.bpe_encode(col(textCol), merges)
          .as("__pieces"))
      .select(col(idCol), col("n_words"),
        size(col("__pieces")).as("n_pieces"),
        md5(array_join(col("__pieces"), "\u0001").cast("binary"))
          .as("pieces_fp"))

  /** Per-stratum mixture divergence: KL(P_stratum || P_corpus) over unigram
    * token distributions — the data-mixing diagnostic ("how far does each
    * source/language slice sit from the blended corpus"). High-KL strata
    * dominate or starve the mixture; the input to re-weighting decisions.
    *
    * Exactness discipline (the td26 pattern): every count is an exact
    * integer; the only FP step is ONE `ln` per (stratum, token) of a ratio
    * of exact products, rounded to integer micro-nats BEFORE the weighted
    * sum — so aggregation is order-independent integer arithmetic and the
    * result is engine-reproducible. `kl_unats = Σ_t c_st·round(1e6·ln((c_st·N)/(N_s·c_t))) div N_s`.
    *
    * Scale shape: token counts aggregate with map-side combine; the
    * (stratum, token)→token equijoin lets AQE broadcast the smaller side;
    * stratum totals and the corpus total are tiny explicit broadcasts.
    */
  def mixtureDivergence(df: DataFrame, stratumCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(stratumCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val st = toks.groupBy(stratumCol, "token").agg(count(lit(1)).as("c_st"))
    val tok = st.groupBy("token").agg(sum("c_st").as("c_t"))
    val strat = st.groupBy(stratumCol).agg(sum("c_st").as("n_s"))
    val tot = tok.agg(sum("c_t").cast("bigint").as("n_total"))
    st.join(tok, "token")
      .join(broadcast(strat), stratumCol)
      .crossJoin(broadcast(tot))
      .withColumn("unats", round(lit(1e6) *
        log((col("c_st") * col("n_total")).cast("double") /
          (col("n_s") * col("c_t")).cast("double"))).cast("bigint"))
      .groupBy(stratumCol)
      .agg(sum(col("c_st") * col("unats")).cast("bigint").as("kl_total_raw"),
        max(col("n_s")).cast("bigint").as("n_toks"),
        count(lit(1)).cast("int").as("v_size"))
      // KL is non-negative; per-term micro-nat rounding can push the total
      // a hair below zero near KL≈0, where engines' integer-division
      // conventions would disagree by 1 — clamp before dividing
      .withColumn("kl_total_unats", greatest(col("kl_total_raw"), lit(0L)))
      // `div` (integer division), not `/`+cast — see unigramSurprisal
      .withColumn("kl_unats", expr("kl_total_unats div n_toks"))
      .drop("kl_total_raw")
  }

  /** First matching drop reason, else 'kept' — the Dolma/CCNet-style
    * filter-report primitive: every document gets the FIRST rule (in
    * priority order) it violates, so pipeline drop accounting sums to the
    * corpus size and filters can be tuned rule by rule. Pure when-chain —
    * codegen'd, no shuffle; pair with a groupBy(reason) for the report.
    */
  def firstReason(rules: Seq[(String, Column)]): Column =
    rules.foldRight(lit("kept")) { case ((name, cond), acc) =>
      when(cond, name).otherwise(acc)
    }

  def boilerplateExposure(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int): DataFrame = {
    // tokenize+shingle+explode ONCE: both the shared-passage aggregate and
    // the per-doc join consume the same materialized span table
    // (localCheckpoint truncates lineage so the scan isn't re-run)
    val docSpans = spanTable(df, idCol, textCol, n).localCheckpoint()
    val passages = docSpans.groupBy("passage")
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    docSpans.join(passages, Seq("passage"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_boiler"))
  }

  /** Boilerplate REMOVAL (the rewrite half of [[boilerplateExposure]],
    * C4/FineWeb-style corpus cleaning): every token position covered by
    * any occurrence of a shared passage (an n-gram appearing in ≥
    * `minDocs` distinct docs) is deleted, and the survivors reassemble in
    * original order. Emits `(id, text_clean, n_removed)`; a fully-
    * boilerplate doc comes back with empty text, not dropped — the
    * keep/drop threshold stays a reader-side choice.
    *
    * Scale shape: the span table explodes once (≈ one row per token,
    * same volume as [[boilerplateExposure]]); the boiler set is an
    * aggregate over it; covered positions and the reassembly each
    * shuffle by doc id only. Per-doc state is bounded by document
    * length (the `collect_list` is one document's tokens — the same
    * bound any doc-rewrite op carries).
    */
  def scrubBoilerplate(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int): DataFrame = {
    // NOTE (r16 opt): Tables.spread here measured slightly slower
    // interleaved (td41 2.24→2.54 min) — the pass lands in an immediate
    // localCheckpoint, so the spread only added an exchange
    val toks = df.select(col(idCol), col(textCol).as("__text"),
        TextAnalysis.tokens(col(textCol)).as("tk"))
      .withColumn("n_tk", size(col("tk")))
      .localCheckpoint() // consumed by spans, positions, and the final join
    // fused AllShingles ≡ shinglesOf(tokens(text), n) — positional, so
    // posexplode's pos0 stays the shingle's token offset
    val occ = toks.select(col(idCol), col("n_tk"),
      posexplode(graft.functions.VectorExpressions
        .all_shingles(col("__text"), n))
        .as(Seq("pos0", "passage")))
    val boiler = occ.select(col(idCol), col("passage")).distinct()
      .groupBy("passage").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    // covered 1-based token positions: union of [pos0+1, min(pos0+n, n_tk)]
    val covered = occ.join(boiler.select("passage"), Seq("passage"), "left_semi")
      .select(col(idCol), explode(sequence(col("pos0") + 1,
        least(col("pos0") + lit(n), col("n_tk")))).as("p"))
      .distinct()
    val positions = toks.select(col(idCol),
        posexplode(col("tk")).as(Seq("pos0", "tok")))
      .withColumn("p", col("pos0") + 1)
    val kept = positions.join(covered, Seq(idCol, "p"), "left_anti")
    val cleaned = kept.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok")), " ").as("text_clean"),
        count(lit(1)).as("n_kept"))
    toks.select(col(idCol), col("n_tk"))
      .join(cleaned, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        (col("n_tk") - coalesce(col("n_kept"), lit(0L)))
          .cast("bigint").as("n_removed"))
  }

  /** Model-free text vectorization: hashed TF-IDF (the "hashing trick"
    * vectorizer) — the bridge from raw text into the similarity stack
    * when no trained embedding model is available. Each token hashes to
    * one of `dim` buckets (portable md5 hash, oracle-reproducible);
    * per-(doc, bucket) term frequency × a smoothed IDF in integer
    * micro-nats gives an EXACT integer weight, so vectors are
    * engine-reproducible bit-for-bit (the td26 micro-unit discipline).
    * Emits the SPARSE form `(id, bucket, tf, weight_micro)` — densify
    * per consumer (the ANN kernels take a fixed-width array; see the
    * composition spec).
    *
    * Scale shape: one explode (≈ a row per token), two hash aggregates
    * (per-(doc,bucket) tf, per-bucket df), a broadcast of the 1-row
    * total and the `dim`-row IDF table. Nothing quadratic anywhere.
    */
  def hashedTfIdf(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    // spread the tokenize + hash pass off the 1-task narrow scan
    val toks = graft.Tables.spread(df, idCol).select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val tf = toks
      .withColumn("bucket", pmod(Hashing.portableHash(col("token")), lit(dim))
        .cast("int"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
    val dfreq = tf.groupBy("bucket")
      .agg(count(lit(1)).cast("bigint").as("n_df"))
    val nDocs = df.agg(count(lit(1)).cast("bigint").as("n_docs"))
    tf.join(dfreq, "bucket")
      .crossJoin(broadcast(nDocs))
      // smoothed idf = ln((1 + N) / (1 + df)) in integer micro-nats
      .withColumn("idf_micro", round(lit(1e6) *
        log((col("n_docs") + 1) / (col("n_df") + lit(1)).cast("double")))
        .cast("bigint"))
      .select(col(idCol), col("bucket"), col("tf"),
        (col("tf") * col("idf_micro")).as("weight_micro"))
  }

  /** DSIR-style importance resampling (Xie et al. 2023,
    * arXiv:2302.03169): select raw-corpus documents whose hashed n-gram
    * feature distribution looks most like a TARGET slice — the standard
    * data-selection move when curating pre-training data toward a
    * high-quality domain without a trained model.
    *
    * Mechanics, all exact: unigram tokens portable-hash into `dim`
    * feature buckets; each bucket's importance is the add-one-smoothed
    * log-probability ratio `ln((ct+1)/(Tt+dim)) − ln((cr+1)/(Tr+dim))`
    * between the target slice and the raw corpus, rounded ONCE to
    * integer micro-nats (the td26/td36 discipline — per-scalar FP, never
    * order-dependent FP sums); a document's weight sums its token
    * occurrences' bucket ratios as exact integers. The `keep` highest
    * (weight, id)-ranked docs are the selected subset.
    *
    * Scale shape: two map-side-combinable token aggregates build the
    * dim-row ratio table, which BROADCASTS back onto the exploded token
    * stream (corpus text never shuffles; the per-doc aggregate shuffles
    * (id, bucket-sum) partials only); the final top-k is a distributed
    * TakeOrderedAndProject (per-partition heads merged on the driver,
    * k rows), never a global sort.
    */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, dim: Int, keep: Int): DataFrame = {
    require(dim > 0 && keep > 0, s"dim and keep must be positive")
    // toks is consumed three times (raw counts, target counts, totals) —
    // spread the tokenize off the 1-task scan so each pass parallelizes
    val toks = graft.Tables.spread(df, idCol)
      .select(col(idCol), targetPred.as("is_target"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .withColumn("bucket",
        pmod(Hashing.portableHash(col("token")), lit(dim)).cast("int"))
    val rawCounts = toks.groupBy("bucket")
      .agg(count(lit(1)).cast("bigint").as("cr"))
    val tgtCounts = toks.filter(col("is_target")).groupBy("bucket")
      .agg(count(lit(1)).cast("bigint").as("ct"))
    val totals = toks.agg(
      count(lit(1)).cast("bigint").as("tr"),
      sum(when(col("is_target"), 1L).otherwise(0L)).cast("bigint").as("tt"))
    val ratios = rawCounts
      .join(tgtCounts, Seq("bucket"), "left_outer")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .withColumn("ratio_micro", round(lit(1e6) * (
        log((col("ct") + 1).cast("double") / (col("tt") + lit(dim))) -
        log((col("cr") + 1).cast("double") / (col("tr") + lit(dim)))))
        .cast("bigint"))
      .select("bucket", "ratio_micro")
    val weights = toks.join(broadcast(ratios), "bucket")
      .groupBy(idCol)
      .agg(sum("ratio_micro").cast("bigint").as("weight_micro"),
        count(lit(1)).cast("int").as("n_toks"))
    // Top-k via distributed TakeOrderedAndProject (per-partition top-k
    // merged on the driver), THEN a window over only the k survivors —
    // never a global row_number over the whole corpus (the bm25TopK /
    // weightedSample shape; a bare Window.orderBy collapses all docs
    // onto one task).
    weights.orderBy(col("weight_micro").desc, col(idCol).asc)
      .limit(keep)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("weight_micro").desc, col(idCol).asc)).cast("int"))
  }

  /** Cross-source contamination matrix: for every pair of corpus sources,
    * the number of distinct word n-gram shingles they share and the
    * Jaccard overlap of their shingle universes — the corpus-hygiene view
    * that catches one crawl slice republishing another (and the
    * source-level companion to td29's benchmark decontamination).
    *
    * Exactness: shingles reduce to 60-bit portable hashes (the simhash
    * kernel's width — identical on every engine), the per-source universe
    * is a distinct set, and the Jaccard is integer micro-units via `div`
    * (no FP). Scale shape: the (source, hash) distinct is one hash
    * aggregate; the pair join keys on the shingle hash, so pair space is
    * bounded by genuine cross-source co-occurrence — never
    * |sources|² × |universe|. Source count is assumed small (a dimension,
    * not a key space).
    */
  def sourceOverlap(df: DataFrame, textCol: String, srcCol: String,
      n: Int): DataFrame = {
    val sh = df.select(col(srcCol).as("source"),
        explode(graft.functions.VectorExpressions
          .shingle_hashes(col(textCol), n, hexChars = 15)).as("h"))
      .distinct()
      .localCheckpoint() // one corpus pass feeds sizes AND both join sides
    val sizes = sh.groupBy("source").agg(count(lit(1)).cast("bigint").as("n_sh"))
    val a = sh.select(col("source").as("source_a"), col("h"))
    val b = sh.select(col("source").as("source_b"), col("h"))
    a.join(b, Seq("h"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).cast("bigint").as("n_shared"))
      .join(sizes.select(col("source").as("source_a"), col("n_sh").as("n_a")),
        "source_a")
      .join(sizes.select(col("source").as("source_b"), col("n_sh").as("n_b")),
        "source_b")
      .withColumn("jaccard_micro",
        expr("(1000000 * n_shared) div (n_a + n_b - n_shared)"))
      .select("source_a", "source_b", "n_shared", "n_a", "n_b",
        "jaccard_micro")
  }

  /** Dedup survivorship funnel — the curation review's second number
    * (after [[effectiveData]]'s token accounting): per source, how many
    * documents survive each dedup stage in sequence — raw → EXACT
    * (first copy per content fingerprint, earliest id canonical) →
    * NEAR-DUP (cluster canonical among the exact survivors; clusters
    * from the caller's verified pair set, e.g. MinHash-LSH) — with the
    * per-stage drop and overall retention in exact integer ppm. The
    * funnel says WHERE a source loses its data: a mirror-heavy crawl
    * drops at exact, a template-heavy one at near-dup.
    *
    * Policy: stage order matters and is pinned — near-dup canonicals
    * are chosen among EXACT survivors (min id), so a cluster whose
    * minimum member was an exact duplicate still keeps exactly one
    * survivor. Docs in no cluster pass stage 2 untouched.
    *
    * Scale shape: fingerprint canonicalization is one hash agg;
    * cluster membership joins on id; everything that shuffles is
    * narrow (id, fp/comp) rows — document text never moves. The pair
    * set is the caller's (banded/verified — never all-pairs).
    */
  def dedupFunnel(df: DataFrame, idCol: String, srcCol: String,
      textCol: String, nearDupPairs: DataFrame): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(srcCol).as("source"),
      Hashing.fingerprint(col(textCol)).as("fp"))
    val canon = base.groupBy("fp").agg(min(col("id")).as("cid"))
    val s1 = base.join(canon, "fp")
      .withColumn("exact_surv", col("id") === col("cid"))
    val comps = graft.dedup.Dedup.dupClusters(nearDupPairs)
    val withComp = s1.join(comps, Seq("id"), "left_outer")
      .withColumn("comp2", coalesce(col("comp"), col("id")))
    val minSurv = withComp.filter(col("exact_surv"))
      .groupBy("comp2").agg(min(col("id")).as("min_surv"))
    withComp.join(minSurv, Seq("comp2"), "left_outer")
      .withColumn("final_surv",
        col("exact_surv") && col("id") === col("min_surv"))
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("exact_surv").cast("bigint")).cast("bigint").as("n_exact"),
        sum(col("final_surv").cast("bigint")).cast("bigint").as("n_final"))
      .withColumn("drop_exact_ppm",
        expr("(1000000 * (n_docs - n_exact)) div n_docs"))
      .withColumn("drop_neardup_ppm",
        when(col("n_exact") === 0L, 0L)
          .otherwise(expr("(1000000 * (n_exact - n_final)) div n_exact")))
      .withColumn("retained_ppm", expr("(1000000 * n_final) div n_docs"))
  }

  /** N-gram novelty between two corpus snapshots — the refresh-review
    * question "what does the new crawl actually ADD?": per group (e.g.
    * source) in the NEW snapshot, how many distinct word n-gram shingles
    * exist at all, how many never occur anywhere in the OLD snapshot,
    * and the novelty rate in exact integer ppm. A slice whose novelty
    * collapses toward 0 is re-crawling what the corpus already has —
    * the scaling-law input for whether another dump buys anything.
    *
    * Exactness: shingles reduce to 60-bit portable hashes (the td51
    * kernel — identical on every engine); counts are distinct-set sizes;
    * the rate is integer `div`. Scale shape: two distinct hash
    * aggregates (old universe, new per-group universe) and ONE equi-join
    * on the shingle hash — no pair space, no window; both sides shuffle
    * narrow (hash) or (group, hash) rows only, never document text.
    */
  def ngramNovelty(dfOld: DataFrame, dfNew: DataFrame, textCol: String,
      groupCol: String, n: Int): DataFrame = {
    def sh(df: DataFrame, extra: Seq[Column]): DataFrame =
      df.select(extra :+ explode(graft.functions.VectorExpressions
        .shingle_hashes(col(textCol), n, hexChars = 15)).as("h"): _*)
    val oldSh = sh(dfOld, Nil).distinct()
      .withColumn("seen_old", lit(1))
    val newSh = sh(dfNew, Seq(col(groupCol).as("grp"))).distinct()
    newSh.join(oldSh, Seq("h"), "left_outer")
      .groupBy("grp")
      .agg(count(lit(1)).cast("bigint").as("n_shingles"),
        sum(when(col("seen_old").isNull, 1L).otherwise(0L))
          .cast("bigint").as("n_novel"))
      .withColumn("novelty_ppm",
        expr("(1000000 * n_novel) div n_shingles"))
      .select(col("grp").as(groupCol), col("n_shingles"), col("n_novel"),
        col("novelty_ppm"))
  }

  /** Sliding-window chunking for context-window prep: token windows of
    * `chunkSize` advancing by `stride` (overlap = chunkSize − stride),
    * last window partial. Pure per-row explode — embarrassingly parallel,
    * no shuffle; the chunk count is arithmetic (`extra` below), never a
    * loop. `(id, chunk_idx, n_tokens, chunk_text)`.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize: $stride, $chunkSize")
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("tk"))
      .withColumn("n_tk", size(col("tk")))
      // trailing windows beyond the first: positive-int ceil-div, exact
      // and identical in every engine (numerator kept non-negative)
      .withColumn("extra", when(col("n_tk") > chunkSize,
        expr(s"(n_tk - $chunkSize + ${stride - 1}) div $stride"))
        .otherwise(lit(0)).cast("int"))
      .select(col(idCol), col("tk"),
        explode(sequence(lit(0), col("extra"))).as("chunk_idx"))
      .withColumn("ck",
        slice(col("tk"), col("chunk_idx") * stride + 1, lit(chunkSize)))
      .select(col(idCol), col("chunk_idx"),
        size(col("ck")).as("n_tokens"),
        array_join(col("ck"), " ").as("chunk_text"))
  }

  /** Linear quality-classifier scoring — the model-scoring plumbing every
    * curation pipeline runs (a fastText/logreg quality filter applied at
    * corpus scale): score = w · x over the [[hashedTfIdf]] features, then
    * rank and decile the corpus. The weight vector here is deterministic
    * (a seeded per-bucket hash in [-1000, 1000]) so the op is
    * oracle-checkable; production swaps in trained weights — the PLUMBING
    * (sparse features, per-bucket weights as pure arithmetic, map-side-
    * combinable dot product, one range-partitioned distributed ranking
    * pass) is what carries to 100 TB, not the toy weights.
    *
    * Exactness: features are integer micro-units (td43), weights are
    * integer, the dot product is an integer sum — no FP anywhere. The
    * decile is integer arithmetic over the row_number, not ntile, so tie
    * handling is explicit (`score desc, id asc`).
    *
    * Scale shape: weights are ARITHMETIC on the bucket id — no weight
    * table, no join, nothing to broadcast; the dot product is one hash
    * aggregate over the sparse feature rows (map-side partials); only
    * narrow `(id, score)` rows reach the final ranking window. At 100 TB
    * the rank is [[graft.ops.Ordering.globalRank]] — a range-partitioned
    * distributed sort + zipWithIndex, never a single-partition window.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val feats = hashedTfIdf(df, idCol, textCol, dim)
    // seeded weight in [-1000, 1000]: portable hash of "w|<bucket>"
    val w = Hashing.portableHash(
      concat(lit("w|"), col("bucket").cast("string"))) % 2001 - 1000
    val scores = feats
      .withColumn("wt", w)
      .groupBy(idCol)
      .agg(sum(col("weight_micro") * col("wt")).cast("bigint")
          .as("score_units"),
        count(lit(1)).cast("int").as("n_feats"))
      // globalRank's zipWithIndex runs an offset-count job before the
      // real one — materialize the (narrow) score rows once so the
      // TF-IDF aggregation isn't computed twice
      .localCheckpoint()
    val nDocs = scores.agg(count(lit(1)).cast("bigint").as("n_docs"))
    // Output is per-doc, so no limit() can bound it — rank with the
    // range-partitioned distributed sort (Ordering.globalRank, proven
    // ≡ row_number in q70) instead of a single-partition window.
    val ranked = graft.ops.Ordering.globalRank(scores,
      Seq(col("score_units").desc, col(idCol).asc), "rk_l")
    ranked.crossJoin(broadcast(nDocs))
      .withColumn("rk", col("rk_l").cast("int"))
      .withColumn("decile",
        expr("((CAST(rk AS BIGINT) - 1) * 10) div n_docs").cast("int"))
      .select(col(idCol), col("n_feats"), col("score_units"), col("rk"),
        col("decile"))
  }

  /** Mixture/epoch plan — the LLaMA-style sampling table: given a token
    * budget and sqrt-temperature source weighting, how many tokens to
    * draw from each source and the implied repetition factor (epochs).
    * Down-weighted sources get epochs < 1 (subsample); up-weighted small
    * sources get epochs > 1 (repeat) — the thing Bernoulli sampling
    * (td28) cannot express.
    *
    * Exactness: per-source token counts are integers; the only FP op is
    * one IEEE-exact sqrt per source, rounded once to micro-units; budget
    * allocation and epoch factors are integer `div` over those. (Keep
    * `budget * weight_micro` inside 2^63: fine up to ~exabyte corpora at
    * practical budgets; normalize weights first beyond that.)
    *
    * Scale shape: one map-side-combinable aggregate over the corpus
    * (token counts per source), then arithmetic on a |sources|-row table.
    * Source count is a dimension, not a key space.
    */
  def mixturePlan(df: DataFrame, srcCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    val perSrc = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(size(TextAnalysis.tokens(col(textCol))).cast("bigint"))
          .cast("bigint").as("n_toks"))
      .withColumn("weight_micro",
        round(lit(1e6) * sqrt(col("n_toks").cast("double"))).cast("bigint"))
    val totW = perSrc.agg(sum("weight_micro").cast("bigint").as("tot_w"))
    perSrc.crossJoin(broadcast(totW))
      .withColumn("target_toks",
        expr(s"($budgetTokens * weight_micro) div tot_w").cast("bigint"))
      .withColumn("epochs_micro",
        expr("(1000000 * target_toks) div n_toks").cast("bigint"))
      .select(col("source"), col("n_docs"), col("n_toks"),
        col("weight_micro"), col("target_toks"), col("epochs_micro"))
  }

  /** Leakage-free train/valid/test split: hash-assign documents to splits
    * 80/10/10, but force every member of a near-dup cluster into its
    * CLUSTER's split (hash of the canonical id, not the member id) — the
    * eval-hygiene op that stops a train document's near-duplicate from
    * landing in test and inflating benchmark scores. Pairs come from the
    * same verified MinHash near-dup pipeline as td16; singleton documents
    * are their own cluster.
    *
    * Scale shape: clustering is the existing O(log n)-round
    * large-star/small-star; the split map is `(id, comp)` narrow rows
    * joined back on the doc id (one co-partitioned shuffle); the split
    * decision is pure hash arithmetic — no new corpus pass beyond the
    * dedup signatures the pipeline already computes.
    */
  def leakageFreeSplit(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val comps = graft.dedup.Dedup.dupClusters(pairs)
      .withColumnRenamed("id", idCol)
    val assigned = docs.select(col(idCol))
      .join(comps, Seq(idCol), "left_outer")
      .withColumn("comp", coalesce(col("comp"), col(idCol)).cast("bigint"))
      .withColumn("split_bucket",
        pmod(Hashing.portableHash(col("comp").cast("string")), lit(10))
          .cast("int"))
    assigned.withColumn("split",
      when(col("split_bucket") < 8, lit("train"))
        .when(col("split_bucket") === 8, lit("valid"))
        .otherwise(lit("test")))
      .select(col(idCol), col("comp"), col("split_bucket"), col("split"))
  }

  /** Gopher-style quality rule battery (Rae et al. 2021 §A.1): the
    * standard heuristic document filters every web-corpus pipeline runs
    * before model-based scoring. Per document:
    *   - `n_words` and the [minWords, maxWords] bound;
    *   - mean word length in [3, 10] characters;
    *   - fraction of words containing an alphabetic character >= 0.8;
    *   - at least 2 DISTINCT common stopwords present (the "real prose"
    *     probe);
    *   - duplicate-token fraction (1 - distinct/total) <= 0.5 — the
    *     cheap in-document repetition screen (td17 is the windowed one).
    * Emits each metric (ratios as exact integer micro-units — one
    * rounded division per doc, no FP accumulation) plus per-rule
    * booleans and the conjunction `pass`, so downstream can audit WHICH
    * rule fired, not just that one did.
    *
    * Scale shape: pure per-row column arithmetic over the token array —
    * no explode, no shuffle, nothing global; pushes through the scan at
    * 100 TB like any narrow projection. (Array lambdas are interpreted,
    * not codegen'd, but stay per-row; the array is bound once per doc.)
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val stop = Seq("the", "a", "is", "and", "of", "to")
    val toks = TextAnalysis.tokens(col(textCol))
    df.select(col(idCol),
        size(toks).cast("bigint").as("n_words"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("char_sum"),
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("bigint").as("n_alpha"),
        size(array_intersect(array_distinct(toks),
          array(stop.map(lit): _*))).cast("int").as("n_stopwords"),
        size(array_distinct(toks)).cast("bigint").as("n_distinct"))
      // `div` (not `/` + cast): integer division agrees exactly across
      // engines; a double divide truncates in Spark but rounds in DuckDB
      .withColumn("mean_wlen_micro", expr("(1000000 * char_sum) div n_words"))
      .withColumn("alpha_frac_micro", expr("(1000000 * n_alpha) div n_words"))
      .withColumn("dup_frac_micro",
        expr("(1000000 * (n_words - n_distinct)) div n_words"))
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_wlen", col("mean_wlen_micro").between(3000000L, 10000000L))
      .withColumn("ok_alpha", col("alpha_frac_micro") >= 800000L)
      .withColumn("ok_stop", col("n_stopwords") >= 2)
      .withColumn("ok_rep", col("dup_frac_micro") <= 500000L)
      .withColumn("pass", col("ok_words") && col("ok_wlen") &&
        col("ok_alpha") && col("ok_stop") && col("ok_rep"))
      .drop("char_sum", "n_alpha", "n_distinct")
  }

  /** Global exact span dedup (C4 §2.2 shape): chop every document into
    * consecutive non-overlapping `k`-token spans, keep each distinct
    * span's FIRST occurrence corpus-wide (document id, then position —
    * the deterministic stand-in for C4's "keep one of the three-sentence
    * spans"), and reassemble each document from its surviving spans.
    * Catches copy-pasted passages EXACT dedup (whole-doc, td04) misses
    * and boilerplate-frequency scrubbing (td41, needs `minDocs` hits)
    * leaves behind: the second copy of a passage is removed even if it
    * appears only twice.
    *
    * Returns `(id, n_spans, n_kept, text_scrubbed)` — empty string when
    * every span was claimed earlier.
    *
    * Scale shape: only `(span_hash, id, span_idx)` rows shuffle — span
    * TEXT stays columnar until reassembly, and reassembly shuffles each
    * doc's surviving spans once, partitioned by id. First-occurrence is
    * one min-struct aggregate per span hash (map-side combinable) +
    * a broadcast-or-shuffle semi-join back; no windows over the corpus.
    * 64-bit span-hash collisions: two colliding distinct spans would
    * dedup as one — acceptable at p ~ n²/2^64 like every hash-dedup op
    * here (td04's fingerprint caveat applies).
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"span width must be positive: $k")
    val toks = TextAnalysis.tokens(col(textCol))
    val nSpans = ceil(size(toks).cast("double") / k).cast("int")
    // spread the tokenize + span explode off the 1-task narrow scan
    val dfS = graft.Tables.spread(df, idCol)
    val spans = dfS
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), nSpans - 1),
          i => array_join(slice(toks, i * k + 1, lit(k)), " "))
      ).as(Seq("span_idx", "span")))
    val hashed = spans.withColumn("h", Hashing.portableHash(col("span")))
    // first corpus-wide occurrence per span hash: min (id, idx) struct
    val first = hashed.groupBy("h")
      .agg(min(struct(col(idCol), col("span_idx"))).as("f"))
      .select(col("h"), col("f").getField(idCol).as("f_id"),
        col("f").getField("span_idx").as("f_idx"))
    val kept = hashed.join(first, "h")
      .filter(col(idCol) === col("f_id") && col("span_idx") === col("f_idx"))
    kept.groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_kept"),
        array_join(array_sort(collect_list(struct(col("span_idx"), col("span"))))
          .getField("span"), " ").as("text_scrubbed"))
      .join(df.select(col(idCol), nSpans.as("n_spans")), Seq(idCol), "right_outer")
      .select(col(idCol), col("n_spans"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"))
  }

  /** ExactSubstr scrub (Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better", §ExactSubstr — distributed
    * rendition): every OVERLAPPING `k`-token window whose content occurs
    * anywhere else in the corpus — except the globally-first occurrence
    * (min `(doc, position)`) — marks its `k` token positions as
    * duplicated; a document's duplicated positions are scrubbed and the
    * survivors reassembled in order. Sliding windows catch SHIFTED
    * copies the non-overlapping C4 chop ([[spanDedup]]) misses: a
    * passage pasted mid-sentence lands on no span boundary but every one
    * of its k-grams still collides. Within-document repetition dedups
    * too (the second copy of a chorus is scrubbed).
    *
    * Returns `(id, n_tokens, n_dup_tokens, text_scrubbed)`; documents
    * shorter than `k` tokens emit no windows and are never scrubbed.
    *
    * Scale shape (all stages linear in corpus tokens):
    *   1. positional window hashes via the fused
    *      [[graft.functions.VectorExpressions.all_shingle_hashes]]
    *      kernel (one codegen'd pass per doc, no per-gram lambda);
    *      only `(hash, id, pos)` rows shuffle — window TEXT never moves;
    *   2. first-occurrence = one min-struct hash aggregate
    *      (map-side combinable), joined back on the hash — no corpus
    *      window functions, no self-join on text;
    *   3. coverage = the interval trick: duplicate window STARTS and
    *      token positions merge-sorted per doc, a running `max(start)`
    *      marks token `j` covered iff `runmax >= j-k+1` — one window
    *      partitioned by doc id (each doc sorts independently), never a
    *      per-token × per-span product.
    * The suffix-array construction the paper uses is a single-machine
    * algorithm; the k-gram formulation is its corpus-parallel
    * equivalent for duplicates of length ≥ k (every such substring
    * contains a duplicated k-gram, and maximal runs of covered
    * positions reconstruct the spans).
    */
  def exactSubstrScrub(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"window width must be >= 2 tokens: $k")
    val toks = TextAnalysis.tokens(col(textCol))
    // both per-row passes (window hashes, token posexplode) are the
    // op's CPU — spread the 1-task narrow scan once, reuse for both
    val dfS = graft.Tables.spread(df, idCol)
    // (id, pos, window-hash) occurrences; docs < k tokens emit none
    val occ = dfS
      .select(col(idCol), size(toks).cast("int").as("__n"),
        graft.functions.VectorExpressions
          .all_shingle_hashes(col(textCol), k).as("__hs"))
      .filter(col("__n") >= k)
      .select(col(idCol), posexplode(col("__hs")).as(Seq("s", "h")))
    // globally-first occurrence per window content; every other
    // occurrence is a duplicate start
    val first = occ.groupBy("h")
      .agg(min(struct(col(idCol), col("s"))).as("f"))
    val dupStarts = occ.join(first, "h")
      .filter(!(col(idCol) === col("f").getField(idCol) &&
        col("s") === col("f").getField("s")))
      .select(col(idCol), col("s"))
    // merge-sort token rows with duplicate starts; running max start
    // covers token j iff a duplicate window [s, s+k-1] contains it
    val tokRows = dfS.select(col(idCol),
        posexplode(toks).as(Seq("p", "tok")))
      .select(col(idCol), col("p"), lit(1).as("kind"), col("tok"),
        lit(null).cast("int").as("s"))
    val startRows = dupStarts.select(col(idCol), col("s").as("p"),
      lit(0).as("kind"), lit(null).cast("string").as("tok"), col("s"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("p"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokRows.unionByName(startRows)
      .withColumn("__rs", max(col("s")).over(w))
      .filter(col("kind") === 1)
      .withColumn("__cov",
        col("__rs").isNotNull && col("__rs") >= col("p") - (k - 1))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__cov"), 1L).otherwise(0L)).as("n_dup_tokens"),
        coalesce(array_join(array_sort(collect_list(
            when(!col("__cov"), struct(col("p"), col("tok")))))
          .getField("tok"), " "), lit("")).as("text_scrubbed"))
  }

  /** Deterministic corpus shuffle + sharding — the step that turns a
    * curated corpus into training shards: global pseudo-random order from
    * a seeded portable hash (reproducible across runs, engines,
    * retries; re-seeding is a new permutation), shard assignment by hash
    * range, and a position within the shard. Every pretraining pipeline
    * runs exactly this before tokenize-and-pack.
    *
    * Returns `(id, shard, pos)`: `shard = h mod nShards`, `pos` = rank of
    * `(h, id)` within the shard (ties on h broken by id — total and
    * deterministic).
    *
    * Scale shape: the hash is per-row arithmetic; the per-shard ordering
    * is a window PARTITIONED by shard (one hash shuffle into nShards
    * groups — each shard sorts independently, no global sort). At 100 TB
    * writers consume shards independently; a skew-free permutation is
    * guaranteed by the hash's uniformity, not by a planner estimate.
    */
  def corpusShard(df: DataFrame, idCol: String, seed: Int,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val h = Hashing.portableHash(col(idCol).cast("string"), seed)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col(idCol))
    df.select(col(idCol), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("int"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Quality-aware dedup policy — keep the BEST member of every near-dup
    * cluster, not an arbitrary first: clusters from the verified
    * large-star/small-star pipeline (td16), quality from the unigram-LM
    * surprisal score (td26; LOWER = more fluent), winner = (score asc,
    * id asc) within the cluster. This is what production pipelines
    * actually run — td13's "drop all but one" with the kept copy chosen
    * by quality instead of id order.
    *
    * Returns `(id, comp, score, rank_in_cluster, kept)` — every document
    * present, so the decision is auditable (the filter is the caller's
    * one-liner).
    *
    * Scale shape: clustering is O(log n) rounds over pair edges;
    * scoring is the existing two-shuffle surprisal op; the winner pick
    * is ONE min-struct-shaped window per component key (hash-partitioned
    * by comp — components are near-dup clusters, bounded by the dedup
    * radius, so no giant partitions).
    */
  def keepBestOfCluster(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame): DataFrame = {
    val comps = graft.dedup.Dedup.dupClusters(pairs)
      .withColumnRenamed("id", idCol)
    val scored = unigramSurprisal(docs, idCol, textCol)
      .select(col(idCol), col("mean_unats").as("score"))
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("score"), col(idCol))
    docs.select(col(idCol))
      .join(comps, Seq(idCol), "left_outer")
      .withColumn("comp", coalesce(col("comp"), col(idCol)).cast("bigint"))
      .join(scored, Seq(idCol))
      .withColumn("rank_in_cluster", row_number().over(w).cast("int"))
      .withColumn("kept", col("rank_in_cluster") === 1)
      .select(col(idCol), col("comp"), col("score"),
        col("rank_in_cluster"), col("kept"))
  }

  /** CCNet-style quality buckets (Wenzek et al. 2020): rank documents
    * WITHIN each language by unigram-LM surprisal ([[unigramSurprisal]],
    * the cheap perplexity stand-in) and split each language into
    * head / middle / tail terciles — head = most fluent third. The
    * language-relative cut is the point: an absolute threshold would
    * keep only the majority language's idiom.
    *
    * Tercile boundaries are integer arithmetic over the rank
    * (`((rank-1) * 3) div n_lang`), not `ntile`, so tie handling is
    * explicit and engine-exact (`mean_unats` asc, id asc).
    *
    * Scale shape: surprisal is the existing two-shuffle op; the ranking
    * is one window per language partition. At 100 TB replace the exact
    * rank with per-language approximate quantile cuts (td31's shape) —
    * the bucket semantics are unchanged.
    */
  def ccnetBuckets(df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val scored = unigramSurprisal(df, idCol, textCol)
      .join(df.select(col(idCol), col(langCol)), Seq(idCol))
    val n = scored.groupBy(langCol)
      .agg(count(lit(1)).cast("bigint").as("n_lang"))
    val w = Window.partitionBy(col(langCol))
      .orderBy(col("mean_unats"), col(idCol))
    scored.join(broadcast(n), Seq(langCol))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .withColumn("bucket",
        when(expr("((rk - 1) * 3) div n_lang") === 0, "head")
          .when(expr("((rk - 1) * 3) div n_lang") === 1, "middle")
          .otherwise("tail"))
      .select(col(idCol), col(langCol), col("mean_unats"),
        col("rk").cast("int").as("rk"), col("bucket"))
  }

  /** Exact per-group token-length quantiles (percentile_disc semantics):
    * the p-quantile is the value at sorted 1-based index
    * `max(1, ceil(p * n))` with the deterministic tie order
    * (length asc, id asc). No interpolation, no floating percentile — the
    * selected value is an actual corpus length, engine-exact.
    *
    * A curation report reads p50/p90/p99 per source to set chunking and
    * truncation budgets (td42's inputs come from exactly this table).
    *
    * Scale shape: one token-count agg, then one window
    * (row_number + count) per group partition. Exact quantiles need the
    * per-group sort at any scale — that's inherent; at 100 TB you either
    * pay this single range-partitioned sort per group or downgrade to
    * td31's approximate quantiles. Groups are independent, so skew is
    * bounded by the largest group, not the corpus.
    */
  def lengthQuantiles(df: DataFrame, groupCol: String, idCol: String,
      textCol: String): DataFrame = {
    val dl = df.select(col(groupCol), col(idCol),
      size(TextAnalysis.tokens(col(textCol))).cast("bigint").as("dl"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("dl").asc, col(idCol).asc)
    val ranked = dl
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col(groupCol))).cast("bigint"))
    def pick(p: Double) = max(when(
      col("rn") === greatest(lit(1L),
        ceil(lit(p) * col("n").cast("double")).cast("bigint")),
      col("dl")))
    ranked.groupBy(col(groupCol))
      .agg(max(col("n")).cast("bigint").as("n_docs"),
        pick(0.5).cast("bigint").as("p50"),
        pick(0.9).cast("bigint").as("p90"),
        pick(0.99).cast("bigint").as("p99"))
  }

  /** Vocabulary growth curve (Heaps' law report): cumulative distinct
    * vocabulary at 10%..100% token checkpoints of the corpus in doc-id
    * order — the curve that says whether more data keeps buying new
    * vocabulary (sub-linear growth flattening = diminishing corpus
    * returns, the scaling-law input for tokenizer/corpus sizing).
    *
    * Each token's GLOBAL stream position comes from a two-level prefix
    * sum — within-block window (partitioned by `doc_id div 1024`) plus a
    * block-offset window over block TOTALS — so no window ever sees more
    * than max(1024 docs, n_blocks) rows on one task; the naive global
    * `Window.orderBy(doc_id)` would single-task the whole corpus.
    * vocab(n) then = count of tokens whose FIRST position ≤ n (one agg),
    * evaluated at 10 broadcast checkpoints. All integer arithmetic.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val dl = df.select(col(idCol),
      size(TextAnalysis.tokens(col(textCol))).cast("bigint").as("dl"))
      .withColumn("blk", expr(s"$idCol div 1024"))
    val wIn = Window.partitionBy(col("blk")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBlk = dl.withColumn("pre_in",
      coalesce(sum(col("dl")).over(wIn), lit(0L)))
    val wBlk = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkOff = dl.groupBy(col("blk"))
      .agg(sum(col("dl")).as("blk_total"))
      .withColumn("blk_off", coalesce(sum(col("blk_total")).over(wBlk), lit(0L)))
      .select(col("blk"), col("blk_off"))
    val offsets = inBlk.join(broadcast(blkOff), Seq("blk"))
      .select(col(idCol), (col("pre_in") + col("blk_off")).as("doc_off"))
    val firstPos = df
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("p", "t")))
      .join(offsets, Seq(idCol))
      .groupBy(col("t"))
      .agg(min(col("doc_off") + col("p") + 1).as("fp"))
    val total = dl.agg(sum(col("dl")).cast("bigint").as("n_total"))
    val spark = df.sparkSession
    import spark.implicits._
    val cp = (1 to 10).toDF("j").crossJoin(broadcast(total))
      .select(col("j"),
        expr("(j * n_total) div 10").cast("bigint").as("n_cum"))
    firstPos.crossJoin(broadcast(cp))
      .groupBy(col("j"), col("n_cum"))
      .agg(sum(when(col("fp") <= col("n_cum"), 1L).otherwise(0L))
        .cast("bigint").as("vocab"))
      .select(col("j"), col("n_cum"), col("vocab"))
  }

  /** Weighted sampling without replacement, the Efraimidis–Spirakis
    * one-pass form: each row draws a deterministic uniform u from the
    * portable hash of its id and ranks by ln(u)/w — the top `k` keys ARE
    * a weighted sample without replacement (u^(1/w) order, taken in log
    * space so no cross-engine pow). The standard "sample 1M docs
    * proportional to quality weight" curation step.
    *
    * Deterministic end to end: u = (hash(id)+1)/2^32 is seeded by the
    * id, the key is one ln + one divide (per-scalar FP, micro-rounded),
    * ties break by id. Scale shape: a per-row projection + ONE
    * TakeOrdered top-k — no shuffle of the corpus, no global sort; at
    * 100 TB each partition keeps its local top-k and the driver merges
    * k rows per partition.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u = (Hashing.portableHash(col(idCol)) + lit(1L)).cast("double") /
      lit(4294967296.0)
    df.select(col(idCol), col(weightCol).cast("bigint").as("w"))
      .where(col("w") > 0)
      .withColumn("key_micro",
        round(lit(1e9) * log(u) / col("w").cast("double")).cast("bigint"))
      .orderBy(col("key_micro").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("key_micro").desc, col(idCol).asc)).cast("int"))
  }

  /** Collocation mining: adjacent-token pairs ranked by pointwise mutual
    * information — the corpus-analysis op behind phrase detection
    * (word2vec's phrase pass, quality-signal "glued" bigrams).
    *
    * pmi = ln( (c_xy / N_pairs) / ((c_x / N_toks) * (c_y / N_toks)) ),
    * in integer micro-nats (per-scalar FP, rounded once — the td26
    * discipline). A `minCount` floor drops the unstable long tail (PMI
    * of a count-1 pair is noise), then top-k by (pmi desc, x, y).
    *
    * Scale shape: pairs come from a per-row array transform (no
    * self-join on positions), then ONE pair hash agg + a broadcast of
    * the unigram table and the two 1-row totals. Nothing quadratic; the
    * unigram broadcast is vocabulary-sized, which at 100 TB is still
    * MB-scale after the same minCount floor.
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long, k: Int)
      : DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val toks = df.select(TextAnalysis.tokens(col(textCol)).as("tk"))
    val pairs = toks.where(size(col("tk")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("tk")) - 2),
        i => struct(element_at(col("tk"), i + 1).as("x"),
          element_at(col("tk"), i + 2).as("y")))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val cxy = pairs.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).cast("bigint").as("c_xy"))
      .where(col("c_xy") >= minCount)
    val uni = df.select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).cast("bigint").as("c_t"))
    val totals = pairs.agg(count(lit(1)).cast("bigint").as("n_pairs"))
      .crossJoin(uni.agg(sum(col("c_t")).cast("bigint").as("n_toks")))
    cxy
      .join(broadcast(uni.select(col("t").as("x"), col("c_t").as("c_x"))),
        Seq("x"))
      .join(broadcast(uni.select(col("t").as("y"), col("c_t").as("c_y"))),
        Seq("y"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi_micro", round(lit(1e6) *
        log((col("c_xy") / col("n_pairs").cast("double")) /
          ((col("c_x") / col("n_toks").cast("double")) *
           (col("c_y") / col("n_toks").cast("double")))))
        .cast("bigint"))
      .select(col("x"), col("y"), col("c_xy"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("x").asc, col("y").asc)
      .limit(k)
  }

  /** Interpolated bigram LM surprisal — the CCNet/KenLM-shaped fluency
    * score one Markov order up from [[unigramSurprisal]] (td26):
    *
    * `P(w2|w1) = 0.9·c(w1,w2)/c(w1·) + 0.1·(c(w2)+1)/(N+V)`
    *
    * (maximum-likelihood bigram interpolated with the add-one unigram,
    * so unseen continuations never zero out). Per-doc score =
    * Σ round(−1e6·ln P) over consecutive token pairs — the td26
    * micro-nat discipline: ONE `ln` per DISTINCT bigram, rounded to an
    * integer before any aggregation, so sums are order-independent and
    * engine-exact. Docs with fewer than two tokens have no defined
    * bigram surprisal and are omitted (mirrors the oracle's
    * `len >= 2` guard).
    *
    * Scale shape: bigrams come from a per-row array transform (no
    * positional self-join); the model tables (`c12`/`c1`/`c2`)
    * are hash aggs with map-side combine, scored once per DISTINCT
    * bigram and equijoined back (AQE broadcasts the model side when the
    * vocabulary fits); the 1-row totals are an explicit broadcast.
    * Nothing is ever quadratic in corpus size.
    */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // NOTE (r16 opt): Tables.spread here measured slower interleaved
    // (td74 med 1.56→2.26) — multi-consumer tk, exchange not reused
    val tk = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("tk"))
    val bi = tk.where(size(col("tk")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("tk")) - 2),
        i => struct(element_at(col("tk"), i + 1).as("w1"),
          element_at(col("tk"), i + 2).as("w2")))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cxy = bi.groupBy("w1", "w2")
      .agg(count(lit(1)).cast("bigint").as("c12"))
    val ctx = cxy.groupBy("w1").agg(sum("c12").cast("bigint").as("c1"))
    val uni = tk.select(explode(col("tk")).as("w2"))
      .groupBy("w2").agg(count(lit(1)).cast("bigint").as("c2"))
    val tot = uni.agg(sum(col("c2")).cast("bigint").as("n_total"),
      count(lit(1)).cast("bigint").as("v_size"))
    // score each DISTINCT bigram once (model-table-sized), then join the
    // integer score back to the occurrence stream — occurrences never
    // carry doubles, so the per-doc sum is exact integer arithmetic
    val scored = cxy.join(ctx, Seq("w1")).join(uni, Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("unats", round(lit(-1e6) * log(
        (lit(0.9) * col("c12")) / col("c1") +
        (lit(0.1) * (col("c2") + lit(1))) /
          (col("n_total") + col("v_size")))).cast("bigint"))
      .select(col("w1"), col("w2"), col("unats"))
    bi.join(scored, Seq("w1", "w2"))
      .groupBy(idCol)
      .agg(sum("unats").cast("bigint").as("surprisal_unats"),
        count(lit(1)).cast("int").as("n_bigrams"))
      // `div`, not `/`+cast — see unigramSurprisal
      .withColumn("mean_unats", expr("surprisal_unats div n_bigrams"))
  }

  /** Effective-data report: per source, raw vs POST-EXACT-DEDUP volume —
    * the first number a curation review asks for ("how much of this
    * source is actually new data?"). Dedup is corpus-GLOBAL (a doc
    * duplicated across sources credits only the source of its earliest
    * copy — min id survives), duplication expressed as integer ppm of
    * raw tokens. One fingerprint aggregation + one source aggregation,
    * both map-side combinable.
    */
  def effectiveData(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(sourceCol).as("source"),
        size(TextAnalysis.tokens(col(textCol))).cast("bigint").as("n_toks"),
        Hashing.fingerprint(col(textCol)).as("fp"))
    val canon = base.groupBy("fp").agg(min(col("__id")).as("canonical_id"))
    base.join(canon, Seq("fp"))
      .withColumn("survives",
        (col("__id") === col("canonical_id")).cast("bigint"))
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("n_toks")).cast("bigint").as("raw_tokens"),
        sum(col("survives")).cast("bigint").as("n_unique_docs"),
        sum(col("survives") * col("n_toks")).cast("bigint")
          .as("effective_tokens"))
      .withColumn("dup_tokens_ppm",
        expr("(1000000 * (raw_tokens - effective_tokens)) div raw_tokens"))
  }

  /** Pretraining mixture allocation: split a global token `budget`
    * across sources with TEMPERATURE-2 weights (w ∝ √tokens — the
    * standard flattening that keeps small sources represented without
    * letting the largest source dominate) and LARGEST-REMAINDER
    * (Hamilton) rounding so allocations are integers that sum to the
    * budget EXACTLY — floor-only rounding silently under-spends, FP
    * proportions drift cross-engine.
    *
    * Integer end to end: √n floors to bigint (exact in double far past
    * any source's token count), quotas are `(budget·w) div/mod Σw`, the
    * leftover units go one each to the largest remainders (ties by
    * source name). Scale shape: one token-count aggregation over the
    * corpus; the allocation algebra runs on |sources| rows.
    */
  def mixtureAllocation(df: DataFrame, sourceCol: String, textCol: String,
      budget: Long): DataFrame =
    mixtureAllocationFromCounts(
      df.select(col(sourceCol).as("source"),
          size(TextAnalysis.tokens(col(textCol))).as("n"))
        .groupBy("source").agg(sum(col("n")).cast("bigint").as("n_tokens")),
      budget)

  /** The allocation algebra over precomputed `(source, n_tokens)` rows —
    * composes with other counters (e.g. [[effectiveData]]'s post-dedup
    * tokens, so the mixture is weighted by what a source actually
    * contributes, not by its duplicated bulk).
    */
  def mixtureAllocationFromCounts(counts0: DataFrame,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val counts = counts0
      .withColumn("weight", floor(sqrt(col("n_tokens"))).cast("bigint"))
    val tot = counts.agg(sum(col("weight")).cast("bigint").as("w_total"))
    val quotas = counts.crossJoin(broadcast(tot))
      .withColumn("alloc_floor", expr(s"(${budget}L * weight) div w_total"))
      .withColumn("rem", expr(s"(${budget}L * weight) % w_total"))
    val spare = quotas.agg((lit(budget) - sum(col("alloc_floor")))
      .cast("bigint").as("spare"))
    val wr = Window.orderBy(col("rem").desc, col("source"))
    quotas.crossJoin(broadcast(spare))
      .withColumn("rr", row_number().over(wr))
      .withColumn("alloc_tokens",
        col("alloc_floor") + when(col("rr") <= col("spare"), 1L).otherwise(0L))
      .select(col("source"), col("n_tokens"), col("weight"),
        col("alloc_tokens"))
  }

  /** Deterministic training-order interleave — the reproducible "data
    * order file" a training run consumes: every source is spread
    * UNIFORMLY across the global order (weighted fair queueing with
    * weight = source size, so all sources finish together and every
    * prefix of the order is an unbiased sample of the mixture). Doc r of
    * n_s in source s gets virtual time `r·1e6 div n_s`; the global order
    * is (vtime, source, id) — total, integer-exact, identical on every
    * engine and every rerun, which is what makes a training run
    * re-startable mid-epoch.
    *
    * Scale shape: NO per-source window (source is low-cardinality — a
    * `partitionBy(source)` window would funnel the corpus through
    * |sources| tasks, the class `PlanAuditSpec` bans). Per-source ranks
    * come from ONE distributed global rank over (source, id) minus each
    * source's broadcast first-rank offset; the final position is a
    * second global rank. Both are `Ordering.globalRank` — range-
    * partitioned sort + zipWithIndex, the td50/td52 discipline.
    */
  def trainingOrder(df: DataFrame, sourceCol: String,
      idCol: String): DataFrame = {
    val ranked = graft.ops.Ordering.globalRank(
      df.select(col(sourceCol).as("source"), col(idCol).as("doc_id")),
      Seq(col("source"), col("doc_id")), "gr")
    // ranks are contiguous per source in (source, id) order, so each
    // source's min rank is its offset; the counts table is |sources|
    val counts = ranked.groupBy("source")
      .agg(count(lit(1)).as("n_s"), min("gr").as("off"))
    val vt = ranked.join(broadcast(counts), Seq("source"))
      .withColumn("src_rank", col("gr") - col("off") + lit(1L))
      .withColumn("vtime_ppm", expr("(src_rank * 1000000) div n_s"))
      .select(col("doc_id"), col("source"), col("src_rank"),
        col("vtime_ppm"))
    graft.ops.Ordering.globalRank(vt,
      Seq(col("vtime_ppm"), col("source"), col("doc_id")), "global_pos")
  }

  /** Per-document character-distribution entropy in integer micro-nats
    * (a gibberish/boilerplate quality signal: natural prose sits in a
    * narrow entropy band; key-mash, base64 blobs and repeated-char spam
    * fall outside it). H = Σ (c_i/L)·ln(L/c_i) over the doc's char
    * histogram — each class term is rounded to micro-nats FIRST (the
    * td26 surprisal discipline: per-term rounding makes the cross-row
    * aggregation exact-integer, so engines agree bit-for-bit), then the
    * integer sum divides by the length.
    *
    * Scale shape: char explode is linear in corpus bytes (the shingle
    * ops' cost class); the histogram is a hash agg to ≤ alphabet rows
    * per doc, and everything after is per-doc arithmetic.
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col(idCol), col("ch"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col(idCol))
      .agg(sum("c").as("len"), count(lit(1)).as("alphabet"))
    counts.join(totals, Seq(idCol))
      .withColumn("term_micro",
        round(lit(1e6) * col("c").cast("double") *
            (log(col("len").cast("double")) - log(col("c").cast("double"))))
          .cast("bigint"))
      .groupBy(col(idCol))
      .agg(max("len").as("len"), max("alphabet").as("alphabet"),
        sum("term_micro").as("sum_micro"))
      .withColumn("entropy_micro_nats", expr("sum_micro div len"))
      .select(col(idCol), col("len"), col("alphabet"),
        col("entropy_micro_nats"))
  }

  /** Interpolated Kneser–Ney trigram surprisal — the KenLM-shaped
    * quality score CCNet-style filters actually use (td74's bigram model
    * upgraded to the real thing): absolute discount D = 0.75 at every
    * order, CONTINUATION counts for the lower orders (a word following
    * many distinct contexts is likelier in a novel context than its raw
    * frequency says — the KN insight), interpolated down to the
    * continuation unigram.
    *
    *   P(w3|w1w2) = (max(c123−D,0) + D·N1+(w1w2·)·Pkn(w3|w2)) / c12
    *   Pkn(w3|w2) = (max(N1+(·w2w3)−D,0) + D·N1+(w2·)·Pcont(w3)) / N1+(·w2·)
    *   Pcont(w3)  = N1+(·w3) / |distinct bigrams|
    *
    * The td74 exactness discipline: every count is an integer group-by;
    * each DISTINCT trigram is scored ONCE by a single double expression
    * rounded to integer micro-nats, and everything that touches
    * occurrence volume afterward is exact integer arithmetic — so the
    * per-doc sums agree bit-for-bit across engines.
    *
    * Scale shape: model tables are distinct-ngram-sized hash aggs (all
    * map-side combinable); scoring is equi-joins on ngram keys; the only
    * broadcast is the 1-row distinct-bigram total. Docs with fewer than
    * 3 tokens are omitted (no trigram evidence), matching td74's < 2
    * convention.
    */
  def knTrigramSurprisal(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // NOTE (r16 opt): Tables.spread here measured much slower
    // interleaved (td100 2.60→4.43 min) — tk feeds the five KN count
    // tables and the exchange is re-executed per consumer subtree
    val tk = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("tk"))
    val tri = tk.where(size(col("tk")) >= 3)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("tk")) - 3),
        i => struct(element_at(col("tk"), i + 1).as("w1"),
          element_at(col("tk"), i + 2).as("w2"),
          element_at(col("tk"), i + 3).as("w3")))).as("t"))
      .select(col(idCol), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    val c123 = tri.groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).cast("bigint").as("c123"))
    // trigram-consistent context total + fan-out N1+(w1w2·)
    val ctx12 = c123.groupBy("w1", "w2")
      .agg(sum("c123").cast("bigint").as("c12ctx"),
        count(lit(1)).cast("bigint").as("n12dot"))
    // continuation counts: N1+(·w2w3) = distinct left contexts
    val cc23 = c123.groupBy("w2", "w3")
      .agg(count(lit(1)).cast("bigint").as("cc23"))
    val cc2 = cc23.groupBy("w2")
      .agg(sum("cc23").cast("bigint").as("cc2"),
        count(lit(1)).cast("bigint").as("n2dot"))
    val nprec3 = cc23.groupBy("w3")
      .agg(count(lit(1)).cast("bigint").as("nprec3"))
    val tot = cc23.agg(count(lit(1)).cast("bigint").as("nbi"))
    val scored = c123.join(ctx12, Seq("w1", "w2")).join(cc23, Seq("w2", "w3"))
      .join(cc2, Seq("w2")).join(nprec3, Seq("w3"))
      .crossJoin(broadcast(tot))
      // ONE double expression per distinct trigram, identical operation
      // order in the SQL oracle — micro-nat rounding absorbs ulp noise
      .withColumn("pbi",
        (greatest(col("cc23") - lit(0.75), lit(0.0)) +
          lit(0.75) * col("n2dot") * (col("nprec3") / col("nbi"))) /
          col("cc2"))
      .withColumn("unats", round(lit(-1e6) * log(
        (greatest(col("c123") - lit(0.75), lit(0.0)) +
          lit(0.75) * col("n12dot") * col("pbi")) / col("c12ctx")))
        .cast("bigint"))
      .select(col("w1"), col("w2"), col("w3"), col("unats"))
    tri.join(scored, Seq("w1", "w2", "w3"))
      .groupBy(idCol)
      .agg(sum("unats").cast("bigint").as("surprisal_unats"),
        count(lit(1)).cast("int").as("n_trigrams"))
      .withColumn("mean_unats", expr("surprisal_unats div n_trigrams"))
  }

  /** Bradley–Terry preference ratings over block-local pairwise
    * comparisons — the aggregation that turns raw preference judgments
    * (RLHF comparison data, side-by-side evals) into a per-item strength
    * score. Comparisons are derived deterministically: items are blocked
    * into runs of `blockSize` consecutive ids (a bounded "tournament
    * bracket" — pair space is `C(blockSize,2)` per block, LINEAR in
    * items, never corpus²), each in-block pair is one comparison, and
    * the higher `scoreCol` wins (tie → lower id).
    *
    * Ratings come from `iters` rounds of the standard MM update
    * (Hunter 2004): θ_i ← W_i / Σ_{j∈N(i)} n_ij/(θ_i+θ_j), here with
    * n_ij = 1. All arithmetic is exact integer micros — each edge term
    * is `1e12 div (θ_i+θ_j)` (per-term rounding, the td26/td97
    * discipline), the update floors at 1000 micros (a never-winning
    * item's rating underflows to the floor instead of collapsing the
    * next round's divisor), and each round renormalizes to mean 1e6 via
    * the integer mean — so Spark and any ANSI engine agree bit-for-bit.
    *
    * Scale shape: the block self-join shuffles on `blk` (uniform by
    * construction — consecutive-id runs), each MM round is two hash
    * joins + one hash agg on item id, and state is one (item, θ) row per
    * item. Bounds: wins ≤ blockSize−1, so `wins·1e12` and `raw·1e6`
    * stay far inside int64 for any blockSize ≤ 1000.
    */
  def preferenceRatings(df: DataFrame, idCol: String, scoreCol: String,
      blockSize: Int = 8, iters: Int = 5): DataFrame = {
    require(blockSize >= 2 && blockSize <= 1000,
      s"blockSize must be in [2,1000]: $blockSize")
    require(iters >= 1 && iters <= 20, s"iters must be in [1,20]: $iters")
    val blocks = df.select(col(idCol).cast("bigint").as("item"),
        col(scoreCol).cast("bigint").as("score"))
      .withColumn("blk", expr(s"item div $blockSize"))
    val pairs = blocks.select(col("blk"), col("item").as("i"),
        col("score").as("si"))
      .join(blocks.select(col("blk"), col("item").as("j"),
        col("score").as("sj")), Seq("blk"))
      .filter(col("i") < col("j"))
      // i < j always holds, so score tie → lower id wins
      .withColumn("wi", when(col("si") >= col("sj"), 1L).otherwise(0L))
    // direction-expanded edge list: one row per (item, opponent)
    val edges = pairs.select(col("i").as("item"), col("j").as("opp"),
        col("wi").as("w"))
      .unionAll(pairs.select(col("j").as("item"), col("i").as("opp"),
        (lit(1L) - col("wi")).as("w")))
      .localCheckpoint() // reused 2x per MM round — cut the self-join replay
    val items = edges.groupBy("item")
      .agg(sum("w").cast("bigint").as("wins"),
        count(lit(1)).cast("bigint").as("n_cmp"))
      .localCheckpoint()
    var theta = items.select(col("item"), lit(1000000L).as("theta"))
    for (_ <- 1 to iters) {
      val d = edges
        .join(theta.select(col("item"), col("theta").as("ti")), Seq("item"))
        .join(theta.select(col("item").as("opp"), col("theta").as("tj")),
          Seq("opp"))
        .groupBy("item")
        .agg(sum(expr("1000000000000 div (ti + tj)")).cast("bigint").as("d"))
      val raw = items.join(d, Seq("item"))
        .withColumn("raw",
          greatest(expr("(wins * 1000000000000) div greatest(d, 1)"),
            lit(1000L)))
      val mean = raw.agg(expr("sum(raw) div count(1)").as("mean"))
      theta = raw.crossJoin(broadcast(mean))
        .withColumn("theta",
          greatest(expr("(raw * 1000000) div mean"), lit(1000L)))
        .select("item", "theta")
        // θ is consumed 4x next round (both join sides, raw, mean) — an
        // unevaluated plan would copy itself 4^iters times; checkpoint
        // makes each MM round O(edges) instead
        .localCheckpoint()
    }
    items.join(theta, Seq("item"))
      .select(col("item").as(idCol), col("wins"), col("n_cmp"),
        col("theta").as("rating_micro"))
  }

  /** Similarity-chained context packing (in-context-pretraining style,
    * Shi et al. 2023): instead of packing documents into context windows
    * in arbitrary id order, cluster them by simhash bucket and order
    * each bucket by (simhash, id) — near-identical prose lands adjacent,
    * so each packed window reads as RELATED text, which is the whole
    * point of long-context pretraining data. Packing itself is the td21
    * contiguous running-sum model (`(cum−1) div budget`).
    *
    * `ham_prev` is the Hamming distance to the previous document in the
    * SAME pack (null for pack heads) — the per-row relatedness signal; a
    * corpus whose within-pack mean isn't well below the random-pair
    * expectation (~bits/2) isn't being helped by the ordering.
    *
    * Scale shape: simhash is one linear pass (the td06 kernel); the
    * window partitions on `2^bucketBits` simhash-prefix buckets — size
    * bucketBits to the corpus (log₂(docs) − ~8 keeps buckets in the
    * hundreds; the td95 log-scaled-width contract), never a constant at
    * 1000× the data.
    */
  def similarityPack(df: DataFrame, idCol: String, textCol: String,
      budget: Int, bucketBits: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(bucketBits >= 1 && bucketBits <= 30,
      s"bucketBits must be in [1,30]: $bucketBits")
    val hashed = graft.dedup.Dedup
      .withSimhash(df.select(col(idCol), col(textCol)), textCol)
      .withColumn("bucket", shiftright(col("simhash"), 60 - bucketBits))
      .withColumn("n_toks", TextAnalysis.wsTokenCount(col(textCol)))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("simhash"), col(idCol))
    val packed = hashed
      .withColumn("pack_idx",
        ((sum(col("n_toks")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - lit(1)) / lit(budget)).cast("bigint"))
      .withColumn("prev_sim", lag(col("simhash"), 1).over(w))
    packed
      .withColumn("prev_pack", lag(col("pack_idx"), 1).over(w))
      .withColumn("ham_prev",
        when(col("prev_pack") === col("pack_idx"),
          bit_count(col("simhash").bitwiseXOR(col("prev_sim"))).cast("int")))
      .select(col(idCol), col("bucket"), col("n_toks"), col("pack_idx"),
        col("ham_prev"))
  }

  /** DPO/RLHF preference-pair mining on top of [[preferenceRatings]]:
    * within each comparison block (block = prompt: all its items are
    * candidate responses to the same context), pair the best-rated item
    * with the worst, 2nd-best with 2nd-worst, …, and keep a pair iff its
    * rating margin clears `marginThresholdMicro` — the standard
    * chosen/rejected construction for direct-preference-optimization
    * training sets (pairs with a thin margin teach nothing and are
    * dropped).
    *
    * Determinism: ratings are exact integer micros (see
    * [[preferenceRatings]]); within a block, rank ties break on id, so
    * the pairing is total-ordered and engine-independent.
    *
    * Scale shape: the only window partitions by `blk` — cardinality
    * n/blockSize, so no low-cardinality funnel (the PlanAuditSpec
    * discipline); pairing is an equi-join on (blk, pair rank). Nothing
    * touches text.
    */
  def dpoPairs(df: DataFrame, idCol: String, scoreCol: String,
      blockSize: Int = 8, iters: Int = 5,
      marginThresholdMicro: Long = 0L): DataFrame = {
    val rated = preferenceRatings(df, idCol, scoreCol, blockSize, iters)
      .withColumn("blk", expr(s"$idCol div $blockSize"))
    val wTop = Window.partitionBy("blk")
      .orderBy(col("rating_micro").desc, col(idCol).asc)
    val wBot = Window.partitionBy("blk")
      .orderBy(col("rating_micro").asc, col(idCol).desc)
    val ranked = rated
      .withColumn("r_top", row_number().over(wTop))
      .withColumn("r_bot", row_number().over(wBot))
      .withColumn("half", expr(s"count(1) over (partition by blk) div 2"))
    val chosen = ranked.filter(col("r_top") <= col("half"))
      .select(col("blk"), col("r_top").cast("bigint").as("k"),
        col(idCol).as("chosen_id"), col("rating_micro").as("chosen_micro"))
    val rejected = ranked.filter(col("r_bot") <= col("half"))
      .select(col("blk"), col("r_bot").cast("bigint").as("k"),
        col(idCol).as("rejected_id"), col("rating_micro").as("rejected_micro"))
    chosen.join(rejected, Seq("blk", "k"))
      .withColumn("margin_micro", col("chosen_micro") - col("rejected_micro"))
      .filter(col("margin_micro") >= marginThresholdMicro)
      .select(col("blk"), col("k"), col("chosen_id"), col("rejected_id"),
        col("chosen_micro"), col("rejected_micro"), col("margin_micro"))
  }

  /** Content-defined chunking (the FastCDC/rsync family) + chunk-level
    * dedup: split each document at positions where a rolling polynomial
    * hash of the trailing `window` characters hits a boundary pattern
    * (`h mod divisor == 0`), then fingerprint each chunk and report, per
    * document, how much of it is made of chunks that also appear in
    * OTHER documents. Content-defined boundaries survive insertions —
    * editing one sentence shifts at most the chunks it touches, so
    * shared boilerplate lands in identical chunks across documents no
    * matter where it sits. This is the storage-dedup primitive (chunk
    * stores, rsync, LBFS) applied to corpus curation: shingle near-dup
    * (td05/td08) finds similar DOCUMENTS; chunk dedup localizes WHICH
    * SPANS are copies and prices the redundancy in chars.
    *
    * The hash is an exact-integer polynomial over codepoints
    * (base 31, mod 1000003) — engine-portable arithmetic, no float, no
    * platform hash. Boundary at position i (1-based, i ≥ window) iff
    * h(text[i−window+1..i]) ≡ 0 (mod divisor); expected chunk length =
    * divisor.
    *
    * Scale shape: boundary scan is per-row array arithmetic, linear in
    * corpus bytes × window (one `transform` over positions, each
    * aggregating a `window`-char slice — no explode until chunks). The
    * only shuffle is the chunk-hash groupBy (map-side combinable), and
    * the per-doc rollup joins back on the 16-byte hash, never chunk
    * text.
    */
  def cdcChunkDedup(df: DataFrame, idCol: String, textCol: String,
      window: Int = 16, divisor: Int = 64): DataFrame = {
    require(window >= 4 && window <= 256, s"window out of range: $window")
    require(divisor >= 2, s"divisor out of range: $divisor")
    // boundary positions: 1-based char index i where the trailing-window
    // polynomial hash divides; doc end is always a boundary. One O(len)
    // incremental pass per doc (graft.functions.CdcBoundaries) — the
    // declarative aggregate-per-position form re-sliced the window per
    // character (O(len × window) with per-position allocation) and was
    // the whole query's cost at sf0.1
    val bounded = df.select(col(idCol), col(textCol).as("txt"))
      .filter(length(col("txt")) >= window)
      .withColumn("bounds", graft.functions.VectorExpressions
        .cdc_boundaries(col("txt"), window, divisor))
    val chunks = bounded.select(col(idCol),
        expr(
          """explode(transform(sequence(1, size(bounds)),
            |  k -> struct(k AS chunk_idx,
            |    substring(txt,
            |      IF(k = 1, 1, element_at(bounds, k - 1) + 1),
            |      element_at(bounds, k) -
            |        IF(k = 1, 0, element_at(bounds, k - 1))) AS chunk)))"""
            .stripMargin).as("c"))
      .select(col(idCol), col("c.chunk_idx"),
        length(col("c.chunk")).as("chunk_len"),
        md5(to_binary(col("c.chunk"), lit("utf-8"))).as("chunk_hash"))
      .filter(col("chunk_len") > 0)
    // corpus-wide: in how many distinct documents does each chunk occur?
    val occ = chunks.groupBy("chunk_hash")
      .agg(count_distinct(col(idCol)).as("n_docs"))
    chunks.join(occ, Seq("chunk_hash"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum("chunk_len").as("n_chars"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("shared_chunks"),
        sum(when(col("n_docs") > 1, col("chunk_len")).otherwise(0L))
          .as("shared_chars"))
      .withColumn("shared_ppm",
        expr("(shared_chars * 1000000) div greatest(n_chars, 1)"))
      .select(col(idCol), col("n_chunks"), col("n_chars"),
        col("shared_chunks"), col("shared_chars"), col("shared_ppm"))
  }

  /** k-anonymity / l-diversity audit — the privacy gate a training-data
    * release runs before shipping event-level records (Sweeney's
    * k-anonymity; Machanavajjhala's l-diversity): group rows by the
    * quasi-identifier columns and flag every equivalence class that is
    * re-identifiable (fewer than `k` rows) or sensitive-value-poor
    * (fewer than `l` distinct values of `sensitiveCol` — a class where
    * everyone shares the sensitive value leaks it even at size ≥ k).
    * Returns one row per VIOLATING class with its size, diversity, and
    * which rule(s) it breaks — the suppression work-list.
    *
    * Scale shape: one hash aggregation over the QI key (map-side
    * combinable count + distinct-count), a pure filter after. No window,
    * no join, no text.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Int = 5, l: Int = 2): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"k/l must be positive: k=$k l=$l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("k_violation", col("class_size") < k)
      .withColumn("l_violation", col("l_diversity") < l)
      .filter(col("k_violation") || col("l_violation"))
  }
}
