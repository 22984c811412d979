package graft.operators

import graft.core.Span
import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `BINARY` columns with typed metadata structs, the same
  * way the reference carries per-segment images as opaque numpy arrays next
  * to the PAGE tree (reference ocrd_cis/ocropy/binarize.py:123-162,
  * image load/crop in SURVEY.md §2.1).
  *
  * The Spark-side plumbing is real — schemas, encoders, per-partition codec
  * initialization, batch iteration, span lineage — while the actual byte
  * decoding is STUBBED behind [[StubCodec]] (no image/audio libraries ship
  * in this container): every "decoded" value is a deterministic pure
  * function of the payload bytes, so tests are exact and a real codec can
  * be swapped in by replacing one object.
  *
  * Scale notes: all operators here are row-local `mapPartitions` chains —
  * no shuffle, embarrassingly parallel at 10^12 rows. The per-partition
  * codec handle mirrors the reference's load-model-once pattern
  * (recognize.py:94-102) and Spark's broadcast/setup idiom.
  */
object Multimodal {

  /** One media row: url key + opaque payload + declared container type. */
  final case class MediaRow(url: String, media: Array[Byte], mediaType: String)

  /** Typed metadata extracted from an opaque payload. */
  final case class MediaMeta(
      url: String,
      mediaType: String,
      nBytes: Long,
      checksum: Long,
      width: Int,
      height: Int,
      durationMs: Long
  )

  /** One sampled frame: payload slice + byte-span lineage into the parent
    * (the analog of the reference's image_from_segment coord crop,
    * recognize.py:207).
    */
  final case class Frame(url: String, frameIdx: Int, span: Span, bytes: Array[Byte])

  /** Fixed-width feature vector per media row (embedding surrogate). */
  final case class MediaFeatures(url: String, features: Array[Float])

  val featureDim = 16

  /** STUB codec — deterministic fake decode. The interface (open-once per
    * partition, decode per row) is the real contract; the byte math is a
    * placeholder for libjpeg/ffmpeg-style decoding.
    */
  final class StubCodec {
    /** FNV-1a 64-bit over the payload — stands in for a container parse. */
    def checksum(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h
    }

    /** STUB: "header decode" — width/height/duration derived from the
      * checksum, not from a real container header.
      */
    def header(bytes: Array[Byte]): (Int, Int, Long) = {
      val h = checksum(bytes)
      val w = 160 + (Math.floorMod(h, 8L) * 80L).toInt
      val ht = 120 + (Math.floorMod(h >>> 8, 8L) * 60L).toInt
      val dur = 1000L + Math.floorMod(h >>> 16, 60000L)
      (w, ht, dur)
    }
  }

  /** Decode typed metadata for each payload. Codec opened once per
    * partition; rows stream through it (the batch shape a vectorized
    * decode would use).
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new StubCodec // one handle per partition, reused across the batch
      rows.map { r =>
        val (w, h, dur) = codec.header(r.media)
        MediaMeta(r.url, r.mediaType, r.media.length.toLong, codec.checksum(r.media), w, h, dur)
      }
    }
  }

  /** Sample up to `k` evenly-spaced frames as byte slices with exact span
    * lineage. A real video codec would seek keyframes; the slicing, span
    * arithmetic and output schema are the production shape.
    */
  def frameSample(media: Dataset[MediaRow], k: Int, frameBytes: Int = 64): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = r.media.length
      if (n == 0) Iterator.empty
      else {
        val frames = math.min(k, math.max(1, n / frameBytes))
        (0 until frames).iterator.map { i =>
          val start = (n.toLong - frameBytes).max(0L) * i / math.max(1, frames - 1).toLong
          val stop = math.min(n.toLong, start + frameBytes)
          // in-memory Array[Byte] payloads are < 2 GiB by JVM construction,
          // so the Int narrowing is safe; keep the invariant explicit in
          // case a future chunked-payload type flows through here
          require(stop <= Int.MaxValue.toLong,
            s"frame span [$start,$stop) exceeds in-memory byte-array bounds")
          Frame(r.url, i, Span(start, stop),
            java.util.Arrays.copyOfRange(r.media, start.toInt, stop.toInt))
        }
      }
    }
  }

  /** A resized media payload: original + target geometry, the downsampled
    * byte payload's size and checksum.
    */
  final case class ResizedMedia(
      url: String,
      origWidth: Int,
      origHeight: Int,
      width: Int,
      height: Int,
      nBytes: Long,
      checksum: Long
  )

  /** STUB resize: decode the (stub) header, downsample the payload to the
    * target geometry by stride-sampling bytes proportionally to the area
    * ratio, and emit the resized payload's stats. A real implementation
    * swaps the byte math for libvips/ffmpeg scaling; the per-partition
    * codec reuse, the area-ratio size contract and the output schema are
    * the production shape (the pixel pipeline's image_from_segment +
    * scale-to-height role, div/cutter.py:57-114 resize h=48).
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new StubCodec
      rows.map { r =>
        val (w, h, _) = codec.header(r.media)
        val n = r.media.length
        val outLen = math.max(16L,
          n.toLong * (targetW.toLong * targetH) / math.max(1L, w.toLong * h))
          .min(n.toLong).toInt
        val out = new Array[Byte](outLen)
        var j = 0
        while (j < outLen) { out(j) = r.media((j.toLong * n / outLen).toInt); j += 1 }
        ResizedMedia(r.url, w, h, targetW, targetH, outLen.toLong, codec.checksum(out))
      }
    }
  }

  /** STUB feature extraction: fixed-dim deterministic float vector from
    * byte n-gram hashes (a real model would run batched inference here;
    * the fixed-width Array[Float] schema and partition batching are real).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new StubCodec
      rows.map { r =>
        val v = new Array[Float](featureDim)
        var i = 0
        while (i < r.media.length) {
          val d = (codec.checksum(java.util.Arrays.copyOfRange(
            r.media, i, math.min(r.media.length, i + 8))) >>> 16).toInt
          v(Math.floorMod(d, featureDim)) += 1.0f
          i += 8
        }
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
        MediaFeatures(r.url, if (norm == 0f) v else v.map(_ / norm))
      }
    }
  }

  /** Treat the synthetic corpus' html payloads as opaque media — the test
    * harness input (no real image/audio bytes exist in this sandbox).
    */
  def fromPages(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    graft.pipeline.Pipeline.generate(spark, n)
      .map(p => MediaRow(p.url, p.html, "text/html"))
  }
}
