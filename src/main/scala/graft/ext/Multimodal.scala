package graft.ext

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media payload: opaque bytes + typed metadata (BASELINE.json north
  * star — multimodal columns as opaque `binary` with typed metadata). */
case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

/** Decoded/extracted features for one media payload. */
case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long, digest: String,
                     width: Int, height: Int, n_frames: Int)

/** One extracted feature vector (the image/audio-embedding shape every
  * similarity/dedup op in [[Similarity]] consumes). */
case class MediaFeature(doc_id: Long, kind: String, embedding: Array[Float])

/** One resized image payload + the dims the resize decided on. */
case class ResizedMedia(doc_id: Long, kind: String, width: Int, height: Int,
                        out_w: Int, out_h: Int, n_bytes_out: Long,
                        media: Array[Byte])

/** One sampled frame of a video payload. */
case class MediaFrame(doc_id: Long, frame_idx: Int, offset: Long,
                      frame_len: Long, frame: Array[Byte])

/** Multimodal column plumbing: image/audio/video as opaque binary columns,
  * decode/feature-extract as a per-partition batch stage.
  *
  * The Spark side is real and tested — schema (`binary` + typed metadata),
  * partition-parallel batch decode via `mapPartitions` (the Scala analogue
  * of `mapInPandas`: one decoder instance per partition, streamed
  * iterator-to-iterator, no per-row setup cost, no driver collect). The
  * decode step itself is STUBBED deterministically because no image/audio
  * codec libraries ship in this environment — swap [[StubDecoder]] for a
  * real codec binding (e.g. javax.imageio / ffmpeg JNI) without touching
  * the pipeline.
  *
  * Scale: decode is the textbook mapPartitions stage — embarrassingly
  * parallel, no shuffle; co-locate by storage partition and let the scan's
  * split size (`spark.sql.files.maxPartitionBytes`) govern batch shape.
  */
object Multimodal {

  /** Pluggable per-partition decoder. Implementations must be
    * `Serializable` (shipped to executors) and deterministic. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow): MediaMeta
  }

  /** Deterministic stand-in for the real codec: metadata derived
    * arithmetically from the payload (mirrors what a real decoder would
    * emit: dimensions, frame counts, digest). */
  object StubDecoder extends Decoder {
    override def decode(r: MediaRow): MediaMeta = {
      val n = r.media.length.toLong
      val md = MessageDigest.getInstance("MD5").digest(r.media)
      val hex = md.map("%02x".format(_)).mkString
      MediaMeta(r.doc_id, r.kind, n, hex,
        width = (n % 1024).toInt, height = ((n * 31) % 768).toInt,
        n_frames = (n % 16).toInt)
    }
  }

  /** Build the media table from `documents`: payload = UTF-8 bytes of the
    * text (a deterministic stand-in for real image/audio blobs), kind
    * assigned round-robin by id. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("media"))

  /** Partition-parallel metadata extraction (the mapInPandas analogue). */
  def extractMeta(media: DataFrame, decoder: Decoder): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(decoder.decode))
  }

  /** Pluggable per-partition feature extractor (the "run the vision/audio
    * model over a batch" stage). Must be `Serializable` + deterministic. */
  trait FeatureExtractor extends Serializable {
    def embed(row: MediaRow): Array[Float]
  }

  /** Deterministic stand-in for a real embedding model: 8 dims, each the
    * next unsigned 16-bit word of the payload's MD5 scaled into [0, 1].
    * 65535 (not 65536) as the divisor: x/65535·10⁶ can never be an exact
    * half-integer, so 6-dp round-trips never hit the half-up-vs-half-even
    * divergence between engines. */
  object StubExtractor extends FeatureExtractor {
    val Dim = 8
    override def embed(r: MediaRow): Array[Float] = {
      val md = MessageDigest.getInstance("MD5").digest(r.media)
      Array.tabulate(Dim) { i =>
        ((((md(2 * i) & 0xff) << 8) | (md(2 * i + 1) & 0xff)) / 65535.0).toFloat
      }
    }
  }

  /** Partition-parallel embedding extraction → the `(id, embedding)` shape
    * [[Similarity]] consumes. One extractor per partition, streamed
    * iterator-to-iterator: the mapInPandas batch shape, no shuffle. */
  def extractFeatures(media: DataFrame, fe: FeatureExtractor): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(r => MediaFeature(r.doc_id, r.kind, fe.embed(r))))
  }

  /** Aspect-preserving fit of (w, h) into (maxW, maxH) in pure integer
    * arithmetic (so an external SQL engine can replicate it bit-for-bit):
    * the larger relative overhang picks the bound axis; the other axis
    * scales by the same integer-floor ratio, min 1 px. Degenerate 0×N
    * sources stay 0×0. */
  private[graft] def fitDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= 0 || h <= 0) (0, 0)
    else if (w.toLong * maxH >= h.toLong * maxW) // wider than the box
      (maxW, math.max(1, (h.toLong * maxW / w).toInt))
    else
      (math.max(1, (w.toLong * maxH / h).toInt), maxH)

  /** Partition-parallel resize: decode dims, fit into (maxW, maxH), emit a
    * stub payload truncated to one byte per 8 output pixels (a real codec
    * binding would re-encode; the schema/batch plumbing is what's real).
    * No shuffle — same mapPartitions shape as [[extractMeta]]. */
  def resize(media: DataFrame, decoder: Decoder, maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      val m = decoder.decode(r)
      val (ow, oh) = fitDims(m.width, m.height, maxW, maxH)
      val nOut = math.min(m.n_bytes, ow.toLong * oh / 8)
      ResizedMedia(r.doc_id, r.kind, m.width, m.height, ow, oh, nOut,
        r.media.take(nOut.toInt))
    })
  }

  /** Partition-parallel frame sampling: every `stride`-th frame of each
    * video payload, exploded one row per frame via an iterator-to-iterator
    * flatMap (rows-out ≠ rows-in is the part mapInPandas adds over a scalar
    * UDF). Frame bytes are the payload sliced into `n_frames` equal chunks
    * — the stand-in for an ffmpeg seek+decode. Zero-frame payloads vanish,
    * like an empty pandas batch. */
  def sampleFrames(media: DataFrame, decoder: Decoder, stride: Int): Dataset[MediaFrame] = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      val m = decoder.decode(r)
      if (m.n_frames <= 0) Iterator.empty
      else {
        val frameLen = m.n_bytes / m.n_frames
        Iterator.range(0, m.n_frames, stride).map { i =>
          val off = i * frameLen
          MediaFrame(r.doc_id, i, off, frameLen,
            r.media.slice(off.toInt, (off + frameLen).toInt))
        }
      }
    })
  }
}
