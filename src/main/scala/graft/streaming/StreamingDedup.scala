package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous near-duplicate detection for an INGESTED document stream —
  * every arriving document is checked against the whole history, not just
  * its own micro-batch (what the batch LSH pipeline cannot express).
  *
  * Shape: the same MinHash+LSH banding as the batch path
  * ([[graft.dedup.Dedup.withMinhashSignature]]/`lshBands` — md5 once per
  * shingle through the fused kernels), then `flatMapGroupsWithState`
  * keyed by (band_idx, band_key): the state store holds each bucket's
  * seen (doc_id, signature) list, and a new arrival emits an estimated
  * near-dup hit per stored signature agreeing on ≥ `threshold` of the k
  * minhash positions (the standard unbiased Jaccard estimator).
  *
  * Scale posture: state is per-BUCKET, hash-partitioned across executors
  * and RocksDB-backed in production; a bucket stores at most
  * `maxPerBucket` signatures, and a FULL bucket evicts its OLDEST entry
  * to admit a new one — a hot bucket is a sliding recency window, so new
  * arrivals always match against the `maxPerBucket` most recent docs
  * (rather than only the first `maxPerBucket` ever seen). Replays are
  * dropped by doc_id inside the bucket, so at-least-once sources never
  * duplicate pairs while the original is still in the window; a replay
  * arriving after its original was evicted re-matches (bounded
  * at-least-once, the standard recency-window trade). Only (id, band,
  * sig) tuples shuffle — never document text.
  *
  * The same pair can surface from several agreeing bands (each carries
  * its `band_idx`); downstream consumers `dropDuplicates(id_new, id_seen)`
  * per batch if one hit per pair is wanted.
  */
object StreamingDedup {

  final case class BandedDoc(doc_id: Long, band_idx: Int, band_key: String,
      minhash: Seq[Long])

  final case class BucketState(docs: List[(Long, Seq[Long])])

  final case class NearDupHit(id_new: Long, id_seen: Long,
      est_jaccard: Double, band_idx: Int)

  /** Estimated Jaccard: fraction of agreeing minhash positions. */
  private def estimate(a: Seq[Long], b: Seq[Long]): Double = {
    val k = math.min(a.length, b.length)
    if (k == 0) 0.0
    else a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / k
  }

  /** `docs` is a STREAMING DataFrame with `idCol` (long) and `textCol`;
    * emits near-dup hits of each arrival vs all history.
    */
  def nearDups(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, bands: Int = 4, threshold: Double = 0.5,
      maxPerBucket: Int = 64)(implicit spark: SparkSession): Dataset[NearDupHit] = {
    import spark.implicits._
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rowsPerBand = k / bands
    val banded = Dedup.withMinhashSignature(docs, textCol, k)
      .select(col(idCol).cast("long").as("doc_id"), posexplode(
        array((0 until bands).map { b =>
          md5(array_join(slice(col("minhash"), b * rowsPerBand + 1, rowsPerBand), ",")
            .cast("binary"))
        }: _*)).as(Seq("band_idx", "band_key")), col("minhash"))
      .as[BandedDoc]

    banded
      .groupByKey(d => (d.band_idx, d.band_key))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, String), it: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          var seen = state.getOption.map(_.docs).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
          it.foreach { d =>
            if (!seen.exists(_._1 == d.doc_id)) { // replay/duplicate-safe
              seen.foreach { case (sid, ssig) =>
                val est = estimate(d.minhash, ssig)
                if (est >= threshold)
                  out += NearDupHit(d.doc_id, sid, est, d.band_idx)
              }
              // head = newest; a full bucket drops its oldest (last) so
              // the bucket is a sliding recency window, never frozen
              seen = (d.doc_id, d.minhash) ::
                (if (seen.size >= maxPerBucket) seen.init else seen)
            }
          }
          state.update(BucketState(seen))
          out.iterator
      }
  }
}
