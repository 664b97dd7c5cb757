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
}
