package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing primitives.
  *
  * Built on md5 (identical across Spark, DuckDB, Postgres) so results are
  * reproducible by any oracle. Spark's native `hash()`/`xxhash64` are faster
  * but engine-specific; use [[portableHash]] where cross-engine determinism
  * matters (dedup fingerprints, LSH bucket keys, partition assignment in
  * oracle-checked queries) and native hashes on pure-runtime paths.
  */
object Hashing {

  /** First 8 hex chars of md5 as an unsigned bigint in [0, 2^32). */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10).cast("bigint")

  /** Salted variant — independent hash families for MinHash permutations. */
  def portableHash(c: Column, salt: Int): Column =
    portableHash(concat(lit(s"$salt|"), c.cast("string")))

  /** Full md5 hex fingerprint (content identity for exact dedup). */
  def fingerprint(c: Column): Column = md5(c.cast("string").cast("binary"))

  /** Mersenne prime 2^31-1: modulus for affine permutation hashing. */
  val AffineP: Long = 2147483647L

  /** Deterministic affine-permutation coefficients (a_i, b_i) for MinHash:
    * `h_i(x) = (a_i * (h(x) mod p) + b_i) mod p`. One expensive md5 per
    * element, then k cheap integer transforms — the textbook universal-
    * hashing trick. Products stay < 2^62 (a < p ≤ 2^31, h mod p < 2^31),
    * so the arithmetic is exact in 64-bit on any engine.
    */
  def affineCoeffs(i: Int): (Long, Long) =
    (((2654435761L * (i + 1)) % AffineP) | 1L, (40503L * (i + 7)) % AffineP)

  /** The i-th affine permutation applied to an already-hashed column. */
  def affinePerm(h: Column, i: Int): Column = {
    val (a, b) = affineCoeffs(i)
    (lit(a) * (h % AffineP) + lit(b)) % AffineP
  }
}
