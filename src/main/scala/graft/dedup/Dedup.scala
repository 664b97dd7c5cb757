package graft.dedup

import graft.functions.Hashing
import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation at 100 TB scale:
  * exact (hash groupBy), MinHash + LSH banding, SimHash, and n-gram
  * Jaccard verification.
  *
  * Scale design:
  *   - Signatures (minhash / simhash / fingerprints) are narrow per-row
  *     expressions — no shuffle, linear scan.
  *   - Candidate generation shuffles only `(band_key, doc_id)` pairs — the
  *     LSH point: the O(n²) pair space is never materialized; only docs
  *     sharing a band bucket meet in a shuffle partition.
  *   - Verification joins re-fetch token sets for candidates only.
  *   - Hashes are engine-portable md5 ([[Hashing.portableHash]]) so every
  *     stage is oracle-checkable; swap in `xxhash64` for ~3× faster pure-
  *     runtime signatures.
  */
object Dedup {

  /** Exact dedup: canonical row per content fingerprint (min id wins),
    * with duplicate count. One hash-partitioned aggregation.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", Hashing.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature: `k` salted-hash minima over the distinct token set.
    * Each permutation is min(portableHash(salt_i ++ token)); per-row HOF,
    * no shuffle. Token hashes are computed once and reused across the k
    * permutations via re-salting the precomputed hash.
    */
  def withMinhashSignature(df: DataFrame, textCol: String, k: Int,
      shingleN: Int = 3): DataFrame =
    df.withColumn("minhash", {
      val toks = array_distinct(TextAnalysis.shingles(col(textCol), shingleN))
      array((0 until k).map { i =>
        array_min(transform(toks, t => Hashing.portableHash(t, i)))
      }: _*)
    })

  /** LSH banding: split the k-length signature into `bands` bands of
    * `k/bands` rows; band key = md5 of the joined slice. Emits one row per
    * (doc, band) — the only exploded data is (id, band_idx, band_key).
    */
  def lshBands(df: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    df.select(col(idCol), posexplode(
        array((0 until bands).map { b =>
          md5(array_join(slice(col("minhash"), b * rowsPerBand + 1, rowsPerBand), ",")
            .cast("binary"))
        }: _*)).as(Seq("band_idx", "band_key")))

  /** Candidate pairs: docs sharing any band bucket, deduplicated, a < b.
    * Self-join on (band_idx, band_key) — shuffle of the banded keys only.
    */
  def candidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.select(col("band_idx"), col("band_key"), col(idCol).as("id_a"))
    val b = bandsDf.select(col("band_idx"), col("band_key"), col(idCol).as("id_b"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Jaccard similarity of two token-set columns (exact verification for
    * LSH candidates): |∩| / |∪| over distinct shingles.
    */
  def jaccard(setA: Column, setB: Column): Column =
    size(array_intersect(setA, setB)).cast("double") /
      size(array_union(setA, setB)).cast("double")

  /** End-to-end MinHash-LSH near-dup pairs: signature → bands → candidate
    * pairs → exact-Jaccard verify ≥ threshold.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      k: Int = 12, bands: Int = 4, threshold: Double = 0.5,
      shingleN: Int = 3): DataFrame = {
    val signed = withMinhashSignature(df, textCol, k, shingleN)
    val cands = candidatePairs(lshBands(signed, idCol, bands, k / bands), idCol)
    val sets = df.select(col(idCol),
      array_distinct(TextAnalysis.shingles(col(textCol), shingleN)).as("toks"))
    cands
      .join(sets.select(col(idCol).as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("jaccard", jaccard(col("toks_a"), col("toks_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash fingerprint (`bits` wide, ≤ 32): majority vote per bit over
    * the distinct tokens' portable hashes. Token hashes computed once per
    * row, then 32 bit-sums — all narrow HOFs, no shuffle.
    */
  def simhash(textCol: Column, bits: Int = 32, shingleN: Int = 3): Column = {
    val hashes = transform(array_distinct(TextAnalysis.shingles(textCol, shingleN)),
      t => Hashing.portableHash(t))
    val bitCols = (0 until bits).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, i) % 2) * 2 - 1)
      when(vote >= 0, lit(1L) * (1L << i)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** SimHash near-dup pairs: candidates share one of `bands` byte-wide
    * bands (pigeonhole: hamming ≤ 3 ⇒ some 8-bit band equal for 32-bit
    * hashes split in 4), verified by exact hamming distance ≤ maxHamming.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol), simhash(col(textCol)).as("simhash"))
    val banded = hashed.select(col(idCol), col("simhash"), posexplode(
      array((0 until bands).map { b =>
        shiftright(col("simhash"), 8 * b) % 256
      }: _*)).as(Seq("band_idx", "band_val")))
    val a = banded.select(col("band_idx"), col("band_val"),
      col(idCol).as("id_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band_idx"), col("band_val"),
      col(idCol).as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Blocked n-gram Jaccard near-dups: exact pairwise Jaccard over word
    * n-gram shingle sets, restricted to blocking groups (same (lang,
    * source) and close length) so the pair space stays tractable — the
    * standard blocking trick when LSH recall must be exact within strata.
    */
  def ngramJaccardNearDups(df: DataFrame, idCol: String, textCol: String,
      n: Int, blockCols: Seq[String], threshold: Double): DataFrame = {
    val sets = df.select(
      (col(idCol) +: blockCols.map(col)) :+
        array_distinct(TextAnalysis.shingles(col(textCol), n)).as("sh"): _*)
    val a = sets.columns.foldLeft(sets)((d, c) => d.withColumnRenamed(c,
      if (blockCols.contains(c)) c else c + "_a"))
    val b = sets.columns.foldLeft(sets)((d, c) => d.withColumnRenamed(c,
      if (blockCols.contains(c)) c else c + "_b"))
    a.join(b, blockCols)
      .filter(col(idCol + "_a") < col(idCol + "_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col(idCol + "_a").as("id_a"), col(idCol + "_b").as("id_b"),
        col("jaccard"))
  }
}
