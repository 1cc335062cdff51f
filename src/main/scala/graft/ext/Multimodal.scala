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
}
