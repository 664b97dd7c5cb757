package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata, plus the decode / feature-extract / frame-sample plumbing a
  * training-data pipeline needs.
  *
  * Design for 100 TB: assets are `binary` columns with a small typed
  * metadata struct; decode and feature extraction run per-partition over
  * the typed Dataset (`mapPartitions`, the Scala analog of `mapInPandas`
  * batch UDFs) so a real decoder amortizes model/codec init per partition,
  * not per row. Partitioning stays by asset id; nothing shuffles.
  *
  * Self-contained uncompressed containers (BMP, PPM/PGM, WAV) are decoded
  * with REAL pure-JVM header parsers ([[MediaCodec]]); only compressed
  * formats (JPEG/PNG/MP3/...) fall back to the deterministic stub keyed on
  * the content hash (see [[Decode.stubDecode]]), since this container has
  * no OS codecs. The Spark-side plumbing (schema, Dataset signatures,
  * per-partition batching, binary slicing) is the same for both paths.
  */
object Multimodal {

  final case class Asset(
      asset_id: Long,
      kind: String,           // image | audio | video
      bytes: Array[Byte],
      source: String)

  final case class AssetFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Long,
      content_hash: String,
      width: Int,             // stub-decoded dimensions
      height: Int,
      n_frames: Int,
      mean_byte: Double)

  /** Derive a deterministic binary-asset table from `documents` (the
    * corpus stand-in for real media files): bytes = UTF-8 of the text,
    * kind round-robins by doc id.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      col("source"))

  object Decode {
    /** STUB decode — the fallback for COMPRESSED formats only (no OS
      * codecs in this environment). Self-contained formats decode for
      * real via [[MediaCodec.decode]]; this fake derives dimensions and
      * frame count deterministically from content bytes so downstream
      * plumbing stays testable and oracle-checkable for the rest.
      */
    def stubDecode(a: Asset): AssetFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(a.bytes)
      val hash = md.map("%02x".format(_)).mkString
      val sum = a.bytes.foldLeft(0L)((s, b) => s + (b & 0xFF))
      AssetFeatures(
        asset_id = a.asset_id,
        kind = a.kind,
        n_bytes = a.bytes.length.toLong,
        content_hash = hash,
        width = 64 + (Integer.parseInt(hash.substring(0, 2), 16) % 64),
        height = 64 + (Integer.parseInt(hash.substring(2, 4), 16) % 64),
        n_frames = if (a.kind == "video") 1 + (a.bytes.length % 16) else 1,
        mean_byte = sum.toDouble / a.bytes.length)
    }
  }

  /** Feature extraction over the typed Dataset — per-partition batches so
    * a real decoder initializes once per partition.
    */
  def extractFeatures(assets: Dataset[Asset])(implicit spark: SparkSession): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // real impl: init codec/model here, then stream the partition
      it.map(Decode.stubDecode)
    }
  }

  /** Decoded container metadata — image fields NULL for audio and vice
    * versa; `n_bytes` always the raw payload size. Column names match the
    * td39 oracle.
    */
  final case class MediaFeatures(
      asset_id: Long,
      format: String,
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      bit_depth: Option[Int],
      sample_rate: Option[Int],
      n_samples: Option[Long],
      duration_us: Option[Long],
      n_bytes: Long)

  /** REAL media decode over the typed Dataset: per-partition iteration
    * (decoder state would init once per partition), pure byte arithmetic
    * per row, no shuffle. Unrecognized payloads yield `format = "unknown"`
    * with NULL metadata rather than failing the batch — at 100 TB a crawl
    * always contains garbage.
    */
  def decodeMedia(assets: Dataset[Asset])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        MediaCodec.decode(a.bytes) match {
          case Some(m) =>
            MediaFeatures(a.asset_id, m.format, m.width, m.height,
              Some(m.channels), Some(m.bitDepth), m.sampleRate,
              m.nSamples, m.durationUs, a.bytes.length.toLong)
          case None =>
            MediaFeatures(a.asset_id, "unknown", None, None, None, None,
              None, None, None, a.bytes.length.toLong)
        }
      }
    }
  }

  /** Integer-exact features over DECODED payload values (pixels / PCM
    * samples) — all order-invariant stats plus an order-SENSITIVE
    * position-weighted checksum (`Σ (i+1)·vᵢ` over row-major values), so
    * a bottom-up/padding/interleave bug in the decoder is a value
    * mismatch, not a silent pass. `crossings` counts sign flips between
    * consecutive samples (0 for images — pixel values are non-negative).
    */
  final case class PayloadFeatures(
      asset_id: Long,
      format: String,
      n_values: Long,
      v_sum: Long,
      v_min: Long,
      v_max: Long,
      weighted_sum: Long,
      crossings: Long)

  /** REAL payload feature extraction: decode every pixel/sample via
    * [[MediaCodec.decodeValues]] and reduce to integer-exact stats in one
    * pass. Per-partition iteration, no shuffle; payloads that don't value-
    * decode (compressed, truncated, exotic bit depths) yield
    * `format = "unknown"` with zeroed stats rather than failing the batch.
    */
  def payloadFeatures(assets: Dataset[Asset])(
      implicit spark: SparkSession): Dataset[PayloadFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        MediaCodec.decodeValues(a.bytes) match {
          case Some((fmt, vs)) if vs.nonEmpty =>
            var sum = 0L
            var mn = Long.MaxValue
            var mx = Long.MinValue
            var wsum = 0L
            var crossings = 0L
            var i = 0
            while (i < vs.length) {
              val v = vs(i)
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              wsum += (i + 1).toLong * v
              if (i > 0 && ((vs(i - 1) < 0) != (v < 0))) crossings += 1
              i += 1
            }
            PayloadFeatures(a.asset_id, fmt, vs.length.toLong, sum, mn, mx,
              wsum, crossings)
          case _ =>
            PayloadFeatures(a.asset_id, "unknown", 0L, 0L, 0L, 0L, 0L, 0L)
        }
      }
    }
  }

  /** Perceptual average-hash over DECODED pixels — the image analog of
    * SimHash for near-duplicate image detection: the image is block-
    * averaged onto a `grid`×`grid` plane (integer floor means, so every
    * step is engine-exact), each cell contributes one bit (≥ the global
    * cell mean), bits packed row-major. Identical images hash equal;
    * small perturbations flip few bits (hamming-comparable like td07).
    * Images smaller than the grid are skipped (no defined hash).
    */
  final case class ImageHash(
      asset_id: Long,
      format: String,
      width: Int,
      height: Int,
      ahash: Long)

  def imageAHash(assets: Dataset[Asset], grid: Int = 4)(
      implicit spark: SparkSession): Dataset[ImageHash] = {
    import spark.implicits._
    require(grid >= 1 && grid * grid <= 64, s"grid² must fit 64 bits: $grid")
    assets.mapPartitions { it =>
      it.flatMap { a =>
        cellMeans(a.bytes, grid).map { case (fmt, w, h, means) =>
          ImageHash(a.asset_id, fmt, w, h, ahashOf(means))
        }
      }
    }
  }

  /** Decode + `grid`×`grid` block-average (integer floor means) — the
    * shared first stage of every perceptual image hash. `None` for
    * non-image payloads and images smaller than the grid.
    */
  private[multimodal] val HashableImageFormats =
    Set("bmp", "ppm", "pgm", "jpeg", "png", "gif")

  private[graft] def cellMeans(bytes: Array[Byte], grid: Int = 4)
      : Option[(String, Int, Int, Array[Long])] =
    MediaCodec.decodeValues(bytes) match {
      case Some((fmt, vs)) if HashableImageFormats(fmt) =>
        MediaCodec.decode(bytes).flatMap { m =>
          val w = m.width.get
          val h = m.height.get
          if (w < grid || h < grid || vs.length != w * h) None
          else {
            val cells = grid * grid
            val sums = new Array[Long](cells)
            val counts = new Array[Long](cells)
            var i = 0
            while (i < vs.length) {
              val c = (i / w) * grid / h * grid + (i % w) * grid / w
              sums(c) += vs(i)
              counts(c) += 1
              i += 1
            }
            Some((fmt, w, h,
              Array.tabulate(cells)(c => sums(c) / counts(c))))
          }
        }
      case _ => None
    }

  /** Spatial bit per cell: mean ≥ global cell mean. */
  private[graft] def ahashOf(means: Array[Long]): Long = {
    val cells = means.length
    val global = means.sum / cells
    var hash = 0L
    var c = 0
    while (c < cells) {
      if (means(c) >= global) hash |= (1L << c)
      c += 1
    }
    hash
  }

  /** Frequency sign bit per AC coefficient of the integer 4×4 DCT. */
  private[graft] def phashOf(means: Array[Long]): Long = {
    val grid = 4
    require(means.length == grid * grid, s"pHash needs a 4x4 plane")
    var hash = 0L
    var u = 0
    while (u < grid) {
      var v = 0
      while (v < grid) {
        if (u != 0 || v != 0) {
          var d = 0L
          var r = 0
          while (r < grid) {
            var cc = 0
            while (cc < grid) {
              d += DctBasis(u)(r) * means(r * grid + cc) * DctBasis(v)(cc)
              cc += 1
            }
            r += 1
          }
          if (d > 0) hash |= (1L << (u * grid + v))
        }
        v += 1
      }
      u += 1
    }
    hash
  }

  /** Integer 4×4 DCT-II basis, coefficients `round(1e4·cos(π(2k+1)u/8))`.
    * Fixing the basis to exact integers (instead of runtime cosines)
    * makes the whole pHash pipeline engine-reproducible bit-for-bit —
    * the same constants appear as literals in the DuckDB oracle.
    */
  private[multimodal] val DctBasis: Array[Array[Long]] = Array(
    Array(10000L, 10000L, 10000L, 10000L),
    Array(9239L, 3827L, -3827L, -9239L),
    Array(7071L, -7071L, -7071L, 7071L),
    Array(3827L, -9239L, 9239L, -3827L))

  final case class ImagePHash(
      asset_id: Long,
      format: String,
      width: Int,
      height: Int,
      phash: Long)

  /** Perceptual DCT-hash (pHash) over DECODED pixels — [[imageAHash]]'s
    * frequency-domain sibling, robust to uniform brightness shifts that
    * flip many aHash bits: the image is block-averaged onto a 4×4 plane
    * (integer floor means, exactly as aHash), transformed by the integer
    * DCT basis `D = T·M·Tᵀ`, and each of the 15 AC coefficients
    * contributes one sign bit (`D[u][v] > 0`, bit `u·4+v`; the DC term —
    * always positive — is excluded, so overall luminance cancels).
    * Every step is exact 64-bit integer arithmetic: |T·M·Tᵀ| ≤
    * 1e4·255·1e4·16 ≈ 4.1e11. Images smaller than the grid are skipped.
    */
  def imagePHash(assets: Dataset[Asset])(
      implicit spark: SparkSession): Dataset[ImagePHash] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        cellMeans(a.bytes).map { case (fmt, w, h, means) =>
          ImagePHash(a.asset_id, fmt, w, h, phashOf(means))
        }
      }
    }
  }

  /** Image near-duplicate pairs by perceptual-hash CONSENSUS: two
    * assets are flagged only when BOTH the spatial hash ([[imageAHash]])
    * and the frequency hash ([[imagePHash]]) agree exactly — the
    * ensemble that cuts each single hash's false positives (aHash
    * collides on similar brightness layouts, pHash on similar spectra;
    * agreeing on both is a far stronger match). The analog of td05∧td07
    * consensus for text.
    *
    * Scale shape: one decode pass produces both hashes per asset, then
    * ONE self-equi-join on the composite (ahash, phash) key — pair
    * blow-up is bounded by consensus-bucket sizes, never a cross join.
    */
  def imageNearDupPairs(assets: Dataset[Asset])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // ONE decode pass yields both hashes (cell means are shared)
    val hashed = assets.mapPartitions { it =>
      it.flatMap { a =>
        cellMeans(a.bytes).map { case (_, _, _, means) =>
          (a.asset_id, ahashOf(means), phashOf(means))
        }
      }
    }.toDF("asset_id", "ahash", "phash")
    hashed.as("x").join(hashed.as("y"),
        col("x.ahash") === col("y.ahash") &&
        col("x.phash") === col("y.phash") &&
        col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("id_a"), col("y.asset_id").as("id_b"),
        col("x.ahash").as("ahash"), col("x.phash").as("phash"))
  }

  /** Perceptual near-duplicate CLUSTERS over decoded images: one decode
    * pass yields both hashes, then one groupBy on the consensus key
    * (width, height, ahash, phash) — a RE-ENCODED copy (same pixels,
    * different JPEG quality — zero shared payload bytes, so the td106
    * content fingerprints can't see it) lands in the same cluster
    * because the hashes are computed from DECODED pixels. Dimensions in
    * the key keep the 16-bit hashes from colliding across unrelated
    * images at corpus scale. Scale shape identical to
    * [[compressedNearDupClusters]]: per-row decode + hash,
    * ONE shuffle, cluster cardinality bounded — no pairwise stage.
    */
  def imageNearDupClusters(assets: Dataset[Asset])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hashed = assets.mapPartitions { it =>
      it.flatMap { a =>
        cellMeans(a.bytes).map { case (_, w, h, means) =>
          (a.asset_id, w, h, ahashOf(means), phashOf(means))
        }
      }
    }.toDF("asset_id", "width", "height", "ahash", "phash")
    hashed.groupBy("width", "height", "ahash", "phash")
      .agg(min("asset_id").as("rep_id"),
        count(lit(1)).as("n_members"),
        sum("asset_id").as("sum_ids"))
      .select("rep_id", "width", "height", "n_members", "sum_ids")
  }

  /** Encoder-quality profile of compressed images — the curation signal
    * for crawl filtering: a low-quality re-encode is low-value training
    * data however large the file. Pure header walk per row
    * ([[MediaCodec.jpegQualityEstimate]] inverts the libjpeg quality
    * formula against the parsed DQT — exact for standard encoders,
    * nearest-table otherwise); no pixel decode, no shuffle.
    */
  final case class ImageQuality(
      asset_id: Long,
      format: String,
      width: Int,
      height: Int,
      est_quality: Int)

  def imageQualityProfile(assets: Dataset[Asset])(
      implicit spark: SparkSession): Dataset[ImageQuality] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        for {
          q <- MediaCodec.jpegQualityEstimate(a.bytes)
          m <- MediaCodec.decode(a.bytes)
          if m.format == "jpeg"
        } yield ImageQuality(a.asset_id, m.format,
          m.width.getOrElse(0), m.height.getOrElse(0), q)
      }
    }
  }

  /** Perceptual near-duplicate CLUSTERS over COMPRESSED audio — the
    * td107 discipline for the crawl-dominant audio case: an MP3
    * re-encode of the same audio at another bitrate shares no payload
    * byte (td106's content fingerprints can't cluster it) and has no
    * PCM to hand td49's WAV fingerprint — but its Layer III side info
    * still carries the per-granule global-gain energy envelope, read at
    * fixed bit offsets with no entropy decode
    * ([[MediaCodec.mp3EnergyContour]]). Per-row header walk + ONE
    * groupBy on (n_granules, contour) — no pairwise stage, cluster
    * cardinality bounded; same scale shape as [[imageNearDupClusters]].
    */
  def audioNearDupClusters(assets: Dataset[Asset])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val keyed = assets.mapPartitions { it =>
      it.flatMap { a =>
        MediaCodec.mp3EnergyContour(a.bytes).map { case (n, words) =>
          (a.asset_id, n, words.map(w => f"$w%016x").mkString)
        }
      }
    }.toDF("asset_id", "n_granules", "contour")
    keyed.groupBy("n_granules", "contour")
      .agg(min("asset_id").as("rep_id"),
        count(lit(1)).as("n_members"),
        sum("asset_id").as("sum_ids"))
      .select("rep_id", "n_granules", "n_members", "sum_ids")
  }

  /** Audio energy-contour fingerprint — [[imageAHash]]'s PCM twin (the
    * first stage of Shazam-style audio matching): samples split into
    * `frames` equal time blocks, each block's mean |amplitude| (integer
    * floor) contributes one bit against the global block mean. Exact
    * integer arithmetic throughout; streams shorter than `frames`
    * samples are skipped.
    */
  final case class AudioFingerprint(
      asset_id: Long,
      n_samples: Long,
      afp: Long)

  def audioFingerprint(assets: Dataset[Asset], frames: Int = 16)(
      implicit spark: SparkSession): Dataset[AudioFingerprint] = {
    import spark.implicits._
    require(frames >= 1 && frames <= 64, s"frames must fit 64 bits: $frames")
    assets.mapPartitions { it =>
      it.flatMap { a =>
        MediaCodec.decodeValues(a.bytes) match {
          // companded G.711 variants expand to the same linear-sample
          // contract as PCM16, so they fingerprint identically
          case Some((fmt, vs))
              if fmt.startsWith("wav") && vs.length >= frames =>
            val sums = new Array[Long](frames)
            val counts = new Array[Long](frames)
            var i = 0
            while (i < vs.length) {
              val f = i.toLong * frames / vs.length
              sums(f.toInt) += math.abs(vs(i).toLong)
              counts(f.toInt) += 1
              i += 1
            }
            val means = Array.tabulate(frames)(f => sums(f) / counts(f))
            val global = means.sum / frames
            var fp = 0L
            var f = 0
            while (f < frames) {
              if (means(f) >= global) fp |= (1L << f)
              f += 1
            }
            Some(AudioFingerprint(a.asset_id, vs.length.toLong, fp))
          case _ => None
        }
      }
    }
  }

  /** Order-sensitive COMPRESSED-container content fingerprint
    * ([[MediaCodec.contentFingerprint]]): one 64-bit hash per codec unit
    * (MP3 frame payload / MP4 sample), plus a fold of the whole sequence
    * (`fp_hash`) for cheap equality probes. Re-tagged (ID3), re-muxed
    * (chunk re-layout, free-box padding) and metadata-edited copies of
    * one recording fingerprint identically without decoding a single
    * codec payload — the dedup entry point for compressed crawls where
    * no decoder is available. Per-row work only: embarrassingly
    * parallel, no shuffle.
    */
  final case class CompressedFingerprint(
      asset_id: Long,
      format: String,
      n_units: Long,
      fp: Array[Long],
      fp_hash: Long)

  def compressedFingerprints(assets: Dataset[Asset])(
      implicit spark: SparkSession): Dataset[CompressedFingerprint] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        MediaCodec.contentFingerprint(a.bytes).map { case (fmt, fps) =>
          var h = 0xcbf29ce484222325L
          fps.foreach { v =>
            var x = v
            var k = 0
            while (k < 8) { h = (h ^ (x & 0xFFL)) * 0x100000001b3L
              x >>>= 8; k += 1 }
          }
          CompressedFingerprint(a.asset_id, fmt, fps.length.toLong, fps, h)
        }
      }
    }
  }

  /** Content-duplicate clusters over compressed media: group on the FULL
    * fingerprint sequence (exact, order-sensitive — no hash-collision
    * caveat) and report each cluster's representative (min id), size and
    * id-sum. Scale shape: one shuffle keyed by (format, fp) — cluster
    * cardinality bounded, no pairwise stage.
    */
  def compressedNearDupClusters(assets: Dataset[Asset])(
      implicit spark: SparkSession): DataFrame = {
    compressedFingerprints(assets).toDF()
      .groupBy("format", "fp")
      .agg(min("asset_id").as("rep_id"),
        count(lit(1)).as("n_members"),
        sum("asset_id").as("sum_ids"))
      .select("rep_id", "format", "n_members", "sum_ids")
  }

  final case class ResizedAsset(
      asset_id: Long,
      kind: String,
      width: Int,
      height: Int,
      bytes: Array[Byte])

  /** Resize to `w`×`h` — the batch-UDF plumbing shape of image resizing:
    * per-partition init, explicit micro-batches (`grouped`) so a real
    * vectorized resizer (or GPU kernel) sees arrays of assets, and a
    * fixed-size output payload per row. The STUB "resampler" picks w*h
    * evenly-spaced bytes from the source payload (nearest-neighbor over
    * the byte plane) — deterministic, so downstream stays testable.
    */
  def resizeTo(assets: Dataset[Asset], w: Int, h: Int,
      batchSize: Int = 64)(implicit spark: SparkSession): Dataset[ResizedAsset] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // real impl: init codec / device buffers here, once per partition
      it.grouped(batchSize).flatMap { batch => // vectorized-batch hook
        batch.map { a =>
          val n = w * h
          val src = a.bytes
          val out = new Array[Byte](n)
          if (src.nonEmpty) {
            var i = 0
            while (i < n) {
              out(i) = src((i.toLong * src.length / n).toInt)
              i += 1
            }
          }
          ResizedAsset(a.asset_id, a.kind, w, h, out)
        }
      }
    }
  }

  /** Frame sampling: `n` evenly-spaced fixed-size byte windows from the
    * asset payload (the binary-plumbing shape of video frame extraction).
    * Pure column expression — no shuffle.
    */
  def frameSample(bytes: org.apache.spark.sql.Column, n: Int, frameLen: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(n - 1)), i =>
      bytes.substr(
        (i * greatest(((length(bytes) - lit(frameLen)) / lit(n)), lit(1.0)) + 1).cast("int"),
        lit(frameLen)))
}
