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

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString

  /** ImageIO's stream cache is DISK-backed by default: every
    * `createImageInputStream` / `ImageIO.read` over an in-memory payload
    * writes (and deletes) a temp cache file — one file per decoded ROW,
    * including rows that immediately fall back because no reader claims
    * them. Our sources are always `ByteArrayInputStream`s, so the memory
    * cache is strictly better; decode output is byte-identical (the
    * cache is I/O plumbing, not codec behaviour). Class-initialization
    * order guarantees this runs on any JVM before the first decode,
    * since every decoder below lives in this object. */
  private val _useMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic stand-in for the real codec: metadata derived
    * arithmetically from the payload (mirrors what a real decoder would
    * emit: dimensions, frame counts, digest). */
  object StubDecoder extends Decoder {
    override def decode(r: MediaRow): MediaMeta = {
      val n = r.media.length.toLong
      MediaMeta(r.doc_id, r.kind, n, md5Hex(r.media),
        width = (n % 1024).toInt, height = ((n * 31) % 768).toInt,
        n_frames = (n % 16).toInt)
    }
  }

  /** REAL image decoder on the JDK's built-in codecs (PNG/JPEG/GIF/BMP via
    * `javax.imageio` — zero external dependencies). Reads header-only
    * dimensions through an `ImageReader` (no pixel decode on the metadata
    * path — the right cost for a 100 TB metadata sweep); payloads no
    * registered reader claims (audio, video, synthetic fixtures) fall back
    * to `fallback`, so one mixed-corpus stage handles everything. The
    * class holds no codec state — `ImageReader`s are created per row on
    * the executor — so it serializes cleanly into `mapPartitions`. */
  class ImageIoDecoder(fallback: Decoder = StubDecoder) extends Decoder {
    override def decode(r: MediaRow): MediaMeta = {
      val parsed: Option[MediaMeta] =
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.media))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) None
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                // getNumImages(false) avoids an exhaustive scan; -1 =
                // "unknown without searching" → treat as single-image
                val n = reader.getNumImages(false)
                Some(MediaMeta(r.doc_id, r.kind, r.media.length.toLong,
                  md5Hex(r.media), reader.getWidth(0), reader.getHeight(0),
                  math.max(1, n)))
              } finally reader.dispose()
            }
          } finally if (iis != null) iis.close()
        } catch { case _: Exception => None } // corrupt image → fallback
      parsed.getOrElse(fallback.decode(r))
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

  /** Pluggable payload rescaler for [[resize]]. Given the source row, its
    * decoded metadata and the fitted output dims, produce the resized
    * payload bytes. `Serializable` + deterministic, like [[Decoder]]. */
  trait Resizer extends Serializable {
    def apply(row: MediaRow, meta: MediaMeta, outW: Int, outH: Int): Array[Byte]
  }

  /** Stand-in rescale: payload truncated to one byte per 8 output pixels
    * (what a codec's re-encode roughly costs in bytes). */
  object TruncateResizer extends Resizer {
    override def apply(r: MediaRow, m: MediaMeta, ow: Int, oh: Int): Array[Byte] =
      r.media.take(math.min(m.n_bytes, ow.toLong * oh / 8).toInt)
  }

  /** REAL pixel rescale for decodable images: `ImageIO.read` → bilinear
    * `Graphics2D` draw into an RGB buffer at (outW, outH) → PNG re-encode.
    * Non-image payloads fall back. Deterministic for a fixed JDK (pure
    * software raster, no platform codecs). */
  class ImageIoResizer(fallback: Resizer = TruncateResizer) extends Resizer {
    override def apply(r: MediaRow, m: MediaMeta, ow: Int, oh: Int): Array[Byte] = {
      val scaled: Option[Array[Byte]] =
        try {
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.media))).filter(_ => ow > 0 && oh > 0)
            .map { src =>
              val dst = new java.awt.image.BufferedImage(ow, oh,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(src, 0, 0, ow, oh, null)
              } finally g.dispose()
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", out)
              out.toByteArray
            }
        } catch { case _: Exception => None }
      scaled.getOrElse(fallback(r, m, ow, oh))
    }
  }

  /** Partition-parallel resize: decode dims, fit into (maxW, maxH), emit
    * the rescaled payload via `resizer` (default: the deterministic
    * truncation stub; pass `new ImageIoResizer()` for a real PNG
    * re-encode). No shuffle — same mapPartitions shape as
    * [[extractMeta]]. */
  def resize(media: DataFrame, decoder: Decoder, maxW: Int, maxH: Int,
             resizer: Resizer = TruncateResizer): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      val m = decoder.decode(r)
      val (ow, oh) = fitDims(m.width, m.height, maxW, maxH)
      val bytes = resizer(r, m, ow, oh)
      ResizedMedia(r.doc_id, r.kind, m.width, m.height, ow, oh,
        bytes.length.toLong, bytes)
    })
  }

  /** Partition-parallel frame sampling: every `stride`-th frame of each
    * video payload, exploded one row per frame via an iterator-to-iterator
    * flatMap (rows-out ≠ rows-in is the part mapInPandas adds over a scalar
    * UDF). Frame bytes are the payload sliced into `n_frames` equal chunks
    * — the stand-in for an ffmpeg seek+decode. Zero-frame payloads vanish,
    * like an empty pandas batch. */
  /** Pluggable 64-bit PERCEPTUAL hash — the locality fingerprint for
    * media near-dup (aHash/pHash family): visually-close payloads map to
    * small Hamming distances, so dedup rides the same banded-Hamming
    * kernel as text SimHash ([[graft.ext.Dedup.fingerprintPairs]]).
    * Must be `Serializable` + deterministic. */
  trait PerceptualHasher extends Serializable {
    def hash(row: MediaRow): Long
  }

  /** Deterministic fallback for payloads no codec claims: the first 8
    * bytes of the payload's MD5 as a big-endian long. NOT perceptual —
    * only byte-identical payloads collide (Hamming 0), which is exactly
    * the honest semantics for opaque bytes: exact-duplicate detection,
    * never a false visual match. Replicable in SQL, so the driver
    * fixture (synthetic payloads → all fallback) stays oracle-exact. */
  object StubPerceptualHasher extends PerceptualHasher {
    override def hash(r: MediaRow): Long = {
      val d = MessageDigest.getInstance("MD5").digest(r.media)
      java.nio.ByteBuffer.wrap(d, 0, 8).getLong
    }
  }

  /** REAL average-hash (aHash) on the JDK codecs: decode, average-pool
    * to an 8×8 grayscale grid, threshold each cell at the grid mean —
    * bit i (row-major, MSB first) set iff cell ≥ mean. The classic
    * perceptual fingerprint: brightness-scale-invariant-ish, robust to
    * resizing and small edits (MultimodalSpec pins a one-pixel edit at
    * small Hamming and an inverted image far away). Payloads imageio
    * can't decode fall back (mixed-corpus contract of
    * [[ImageIoDecoder]]). */
  class ImageIoAHash(fallback: PerceptualHasher = StubPerceptualHasher)
      extends PerceptualHasher {
    override def hash(r: MediaRow): Long = {
      val img =
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.media)))
        catch { case _: Exception => None }
      img match {
        case None => fallback.hash(r)
        case Some(im) =>
          val (w, h) = (im.getWidth, im.getHeight)
          if (w <= 0 || h <= 0) fallback.hash(r)
          else {
            val cell = new Array[Double](64)
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 8) {
                // average grayscale over this cell's pixel block
                val (x0, x1) = (gx * w / 8, math.max(gx * w / 8 + 1, (gx + 1) * w / 8))
                val (y0, y1) = (gy * h / 8, math.max(gy * h / 8 + 1, (gy + 1) * h / 8))
                var sum = 0.0; var n = 0
                var y = y0
                while (y < y1) {
                  var x = x0
                  while (x < x1) {
                    val rgb = im.getRGB(x, y)
                    sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                      (rgb & 0xff)) / 3.0
                    n += 1; x += 1
                  }
                  y += 1
                }
                cell(gy * 8 + gx) = sum / n
                gx += 1
              }
              gy += 1
            }
            val mean = cell.sum / 64
            var bits = 0L
            var i = 0
            while (i < 64) {
              if (cell(i) >= mean) bits |= (1L << (63 - i))
              i += 1
            }
            bits
          }
      }
    }
  }

  /** Partition-parallel perceptual hashing (the [[extractMeta]] shape);
    * pair the output with [[graft.ext.Dedup.fingerprintPairs]] for
    * banded near-dup candidates — the multimodal member of the dedup
    * family. */
  def perceptualHash(media: DataFrame, hasher: PerceptualHasher): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.map(r => (r.doc_id, r.kind, hasher.hash(r))))
      .toDF("doc_id", "kind", "phash")
  }

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
