package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus — the lexical complement to
  * the embedding-based similarity stack in [[graft.similarity.Ann]].
  * A curation pipeline uses this to pull topic slices out of a raw corpus
  * ("give me the top-k docs about X") without a trained model, and as the
  * sparse half of hybrid (BM25 + dense) retrieval.
  *
  * Exactness discipline (the td26 pattern): the BM25 term contribution is
  * pure per-scalar IEEE-double arithmetic — identical literal constants,
  * identical expression shape in Spark and the DuckDB oracle — rounded to
  * integer micro-nats PER (doc, term) and only then summed, so document
  * scores are exact bigint sums and rank ties break deterministically.
  *
  * Scale shape: one token explode + hash agg for per-doc term frequencies;
  * the query-term table is tiny and broadcast into a semi-filter; document
  * length and the single-row corpus stats broadcast likewise. Nothing
  * shuffles more than once and nothing is quadratic — at 100 TB this is
  * the same two-hash-agg plan, and the final top-k is a
  * TakeOrderedAndProject, not a global sort.
  */
object Retrieval {

  /** Okapi BM25 top-k: rank documents against a bag of query terms.
    *
    * idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))   (Robertson-
    * Sparck Jones, the Lucene variant — always positive)
    * contrib(d, t) = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    * score(d)      = Σ_t round(1e6 * contrib)               (exact bigint)
    *
    * Returns (doc col, n_terms_hit, score_micro, rk) for the top `k`
    * by (score desc, doc id asc).
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive: $k")
    val spark = df.sparkSession
    import spark.implicits._

    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("t"))
    // per-doc length (every token counts toward dl, query term or not)
    val dl = toks.groupBy(col(idCol))
      .agg(count(lit(1)).cast("bigint").as("dl"))
    // corpus stats: N docs, avgdl — one row, broadcast
    val stats = dl.agg(count(lit(1)).cast("bigint").as("n_docs"),
      sum(col("dl")).cast("bigint").as("sum_dl"))
    // tf restricted to query terms (broadcast semi-filter, then hash agg)
    val terms = queryTerms.toDF("t")
    val tf = toks.join(broadcast(terms), Seq("t"), "left_semi")
      .groupBy(col(idCol), col("t"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
    // df per query term — at most |queryTerms| rows
    val dfreq = tf.groupBy(col("t"))
      .agg(count(lit(1)).cast("bigint").as("n_df"))

    val contrib = tf
      .join(broadcast(dfreq), Seq("t"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("n_df") + lit(0.5)) /
          (col("n_df") + lit(0.5))))
      .withColumn("norm",
        col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / (col("sum_dl") / col("n_docs").cast("double")))))
      .withColumn("c_micro",
        round(lit(1e6) * col("idf") * col("norm")).cast("bigint"))

    contrib.groupBy(col(idCol))
      .agg(count(lit(1)).cast("bigint").as("n_terms_hit"),
        sum(col("c_micro")).cast("bigint").as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("score_micro").desc, col(idCol).asc)).cast("int"))
  }

  /** Hybrid retrieval, the retrieve-then-rerank pattern: BM25 pulls a
    * lexical candidate set (`kLex` docs), dense cosine against a query
    * embedding re-ranks it, top `k` survive. This is the production
    * retrieval shape — sparse recall (cheap over the whole corpus, an
    * inverted-index lookup at scale) followed by dense precision over a
    * candidate set small enough to score exactly.
    *
    * Scale shape: stage 1 is td60's two-hash-agg plan; stage 2 touches
    * only `kLex` rows joined against the embedding table (an id equi-join
    * that prunes to the candidate set) with the 1-row query vector
    * broadcast. The expensive float work never sees the corpus.
    */
  def hybridRerank(docs: DataFrame, emb: DataFrame, idCol: String,
      textCol: String, queryTerms: Seq[String], queryVecId: Long,
      kLex: Int, k: Int): DataFrame = {
    import graft.similarity.Ann
    val lex = bm25TopK(docs, idCol, textCol, queryTerms, kLex)
      .withColumnRenamed("rk", "rk_lex")
    val q = broadcast(emb.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"),
        Ann.norm(col("embedding")).as("q_norm")))
    val cand = lex
      .join(emb.select(col("vec_id"), col("embedding").as("c_emb"),
        Ann.norm(col("embedding")).as("c_norm")),
        col(idCol) === col("vec_id"))
      .crossJoin(q)
      .withColumn("cos", Ann.dot(col("q_emb"), col("c_emb")) /
        (col("q_norm") * col("c_norm")))
    cand.orderBy(col("cos").desc, col(idCol).asc).limit(k)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("cos").desc, col(idCol).asc)).cast("int"))
      .select(col(idCol), col("score_micro"), col("rk_lex"), col("cos"),
        col("rk"))
  }

  /** Positional inverted index — the storage half of the retrieval stack
    * (BM25 above is the scoring half; phrase queries need the positions).
    * One row per (term, doc): term frequency + the 0-based positions as a
    * canonical csv (a flat string, not a nested array, so the parquet
    * output is engine-hash-comparable and row-group friendly).
    *
    * Scale shape: one posexplode (a row per token) and ONE hash agg keyed
    * (term, doc) — collect_list stays inside a single doc's token set, so
    * no partial-agg blowup; the index partitions by term hash downstream
    * (each executor owns a term shard, the classic sharded index build).
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("p", "t")))
      .groupBy(col("t"), col(idCol))
      .agg(count(lit(1)).cast("bigint").as("tf"),
        array_join(sort_array(collect_list(col("p"))), ",").as("pos_csv"))
}
