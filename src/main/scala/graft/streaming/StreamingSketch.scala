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
}
