package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-count: the continuous counterpart of the batch
  * HyperLogLog in [[graft.sketch.Sketches.hllDistinct]] — a live
  * cardinality board ("distinct users/tokens/keys per group so far")
  * over an unbounded stream, in O(m) state per group.
  *
  * The registers are BIT-IDENTICAL to the batch op's (same portable md5
  * hash, same bucket/rank split, same correction formulas), which the
  * spec proves by streaming a corpus through in micro-batches and
  * comparing against the batch result — the merge property (register =
  * elementwise max) is what makes HLL streamable at all.
  *
  * Scale posture: state is 64 bytes per group (the register array),
  * hash-partitioned by group and RocksDB-backed in production; arrivals
  * update registers in place and the emitted row is the group's current
  * estimate. No timeout: a cardinality board is meant to live for the
  * stream's lifetime (bound the group domain upstream if it's unbounded).
  */
object StreamingSketch {

  final case class Reading(group: String, value: String)
  final case class HllRegs(regs: Array[Byte], nSeen: Long)
  final case class HllEstimate(group: String, n_filled: Int, v_empty: Int,
      est: Long, n_seen: Long)

  private val M = 64
  private val RankBits = 26

  /** Scala mirror of [[graft.functions.Hashing.portableHash]]: first 8
    * md5 hex chars of the UTF-8 string as an unsigned 32-bit value.
    */
  def portableHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** rho = 27 - bitlen(w): the batch op's ltrim-binary-string rank. */
  def rho(w: Long): Int =
    (RankBits + 1) - (64 - java.lang.Long.numberOfLeadingZeros(w))

  /** The batch op's estimate formula (identical literals and order). */
  def estimate(regs: Array[Byte]): (Int, Int, Long) = {
    val filled = regs.count(_ > 0)
    val vEmpty = M - filled
    var s = 0L
    var i = 0
    while (i < M) { s += 1L << ((RankBits + 1) - regs(i)); i += 1 }
    val raw = 0.709 * 4096.0 * 134217728.0 / s.toDouble
    val est =
      if (raw <= 2.5 * M && vEmpty > 0) 64.0 * math.log(64.0 / vEmpty)
      else if (raw > 4294967296.0 / 30.0)
        -4294967296.0 * math.log(1.0 - raw / 4294967296.0)
      else raw
    (filled, vEmpty, math.round(est))
  }

  /** `readings` is a STREAMING Dataset; emits each group's updated
    * estimate once per micro-batch that touched it.
    */
  def hllDistinct(readings: Dataset[Reading])(implicit spark: SparkSession)
      : Dataset[HllEstimate] = {
    import spark.implicits._
    readings.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(update)
  }

  private def update(group: String, rows: Iterator[Reading],
      state: GroupState[HllRegs]): Iterator[HllEstimate] = {
    val prior = state.getOption.getOrElse(HllRegs(new Array[Byte](M), 0L))
    val regs = prior.regs.clone()
    var n = prior.nSeen
    rows.foreach { r =>
      val h = portableHash(r.value)
      val bucket = (h % M).toInt
      val rk = rho(h / M)
      if (rk > regs(bucket)) regs(bucket) = rk.toByte
      n += 1
    }
    state.update(HllRegs(regs, n))
    val (filled, vEmpty, est) = estimate(regs)
    Iterator.single(HllEstimate(group, filled, vEmpty, est, n))
  }

  // ---- streaming Count-Min heavy hitters -------------------------------

  /** Live top-k board: the continuous counterpart of the batch Count-Min
    * in [[graft.sketch.Sketches.cmsHeavyHitters]] — "the k hottest
    * tokens per group so far" over an unbounded stream, in O(d·w + C)
    * state per group.
    *
    * The sketch is BIT-IDENTICAL to the batch op's (same portable md5
    * hash, same affine-permutation rows d=4, same width w=1024, same
    * min-cell estimate), so streaming a corpus through in micro-batches
    * lands on the batch sweep's numbers — the merge property (cells
    * sum) is what makes CMS streamable. Alongside the sketch lives a
    * bounded CANDIDATE table (the Misra-Gries-style companion every
    * sketch-based top-k needs): each arrival refreshes its token's
    * current estimate, and the table prunes to `maxCandidates` by
    * estimate — the classic guarantee that anything with count ≥ n/C
    * stays resident.
    *
    * Scale posture: state is d·w longs (32 KB) + ≤ maxCandidates
    * entries per group, hash-partitioned by group, RocksDB-backed in
    * production. Emitted rows are the group's current top-k.
    */
  final case class Tok(group: String, token: String)
  final case class CmsState(cells: Array[Long],
      candidates: Map[String, Long], nSeen: Long)
  final case class HeavyHitter(group: String, token: String, est: Long,
      rk: Int, n_seen: Long)

  private val CmsD = 4
  private val CmsW = 1024
  private val AffineP = 2147483647L

  /** Scala mirror of [[graft.functions.Hashing.affinePerm]] ∘ pmod:
    * the batch op's cell index for permutation row `i`.
    */
  def cmsCell(h: Long, i: Int): Int = {
    val a = ((2654435761L * (i + 1)) % AffineP) | 1L
    val b = (40503L * (i + 7)) % AffineP
    (((a * (h % AffineP) + b) % AffineP) % CmsW).toInt
  }

  /** `toks` is a STREAMING Dataset of (group, token) arrivals; emits
    * each touched group's current top-k once per micro-batch.
    */
  def cmsHeavyHitters(toks: Dataset[Tok], k: Int,
      maxCandidates: Int = 256)(implicit spark: SparkSession)
      : Dataset[HeavyHitter] = {
    import spark.implicits._
    require(k >= 1 && maxCandidates >= k,
      s"need 1 <= k <= maxCandidates: $k, $maxCandidates")
    toks.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (group: String, rows: Iterator[Tok], state: GroupState[CmsState]) =>
          val prior = state.getOption.getOrElse(
            CmsState(new Array[Long](CmsD * CmsW), Map.empty, 0L))
          val cells = prior.cells.clone()
          var cand = prior.candidates
          var n = prior.nSeen
          def estOf(t: String): Long = {
            val h = portableHash(t)
            var e = Long.MaxValue
            var i = 0
            while (i < CmsD) {
              e = math.min(e, cells(i * CmsW + cmsCell(h, i))); i += 1
            }
            e
          }
          rows.foreach { r =>
            val h = portableHash(r.token)
            var i = 0
            while (i < CmsD) { cells(i * CmsW + cmsCell(h, i)) += 1; i += 1 }
            cand = cand.updated(r.token, 0L) // placeholder, refreshed below
            n += 1
          }
          // estimates are ALWAYS re-read from the current cells (never a
          // stale per-arrival snapshot), so the emitted numbers are
          // exactly the batch op's min-cell reads over the same counts
          cand = cand.map { case (t, _) => t -> estOf(t) }
          if (cand.size > maxCandidates)
            cand = cand.toVector.sortBy { case (t, e) => (-e, t) }
              .take(maxCandidates).toMap
          state.update(CmsState(cells, cand, n))
          cand.toVector.sortBy { case (t, e) => (-e, t) }.take(k)
            .zipWithIndex.iterator.map { case ((t, e), idx) =>
              HeavyHitter(group, t, e, idx + 1, n)
            }
      }
  }
}
