package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.C): media as opaque `binary`
  * columns travelling next to typed metadata, with decode / feature-extract
  * as partition-local batch functions.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment): [[decodeStub]] derives deterministic fake features from the
  * raw bytes. Everything around it — the schema contract, the typed
  * `Dataset[MediaRecord]` boundary, the mapPartitions batching (one codec
  * init per partition, not per row), and the feature schema — is the real
  * production shape: swap `decodeStub` for a JNI/codec call and nothing else
  * changes. On a real cluster the binary column stays columnar-compressed in
  * parquet and is only materialized per-partition, never on the driver.
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, mime: String, n_bytes: Long,
                         payload: Array[Byte])

  /** Extracted features; `width`/`n_frames` are what a real decoder would
    * emit (fake-derived here, deterministically, from payload length).
    */
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           checksum: Long)

  /** Pack documents into media records: utf-8 bytes as the opaque payload.
    * Stand-in for reading image/audio blobs from parquet binary columns.
    */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"),
      octet_length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"),
      encode(col("text"), "utf-8").as("payload"))

  /** Deterministic fake decode: features from byte length + a rolling
    * checksum over the payload. ??? -> replace with the real codec.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    var cs = 1125899906842597L
    var i = 0
    while (i < r.payload.length) { cs = cs * 31 + (r.payload(i) & 0xFF); i += 1 }
    MediaFeatures(
      media_id = r.media_id, mime = r.mime, n_bytes = r.n_bytes,
      width = (r.n_bytes % 640).toInt,
      height = (r.n_bytes % 480).toInt,
      n_frames = (r.n_bytes / 100).toInt,
      checksum = cs)
  }

  /** The batch feature-extraction pass: partition-local, codec initialized
    * once per partition (the `iter => ...` closure is where a real pipeline
    * opens its decoder), rows streamed — constant memory per partition.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      // real pipeline: val codec = Codec.open() — once per partition
      iter.map(decodeStub)
    }
  }

  /** Resize stub: aspect-fit the decoded dimensions into maxW×maxH (never
    * upscale). Pure column arithmetic — a real resize would keep exactly
    * this metadata path and add a payload re-encode inside mapPartitions.
    */
  def resizeFit(feats: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / greatest(col("width"), lit(1)),
      lit(maxH.toDouble) / greatest(col("height"), lit(1)),
      lit(1.0))
    feats
      .withColumn("out_w", floor(col("width") * scale).cast("int"))
      .withColumn("out_h", floor(col("height") * scale).cast("int"))
  }

  /** One sampled frame: payload slice + index. */
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: every `everyN`-th 100-byte "frame" of the payload
    * becomes its own row — the fan-out a video pipeline does before
    * per-frame models. Partition-local and streamed (flatMap over the
    * row iterator): the full frame set of one media item never
    * materializes at once, and output rows inherit the input
    * partitioning — no shuffle until a downstream op asks for one.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyN: Int): Dataset[Frame] = {
    import spark.implicits._
    require(everyN >= 1, s"sampleFrames: everyN must be >= 1, got $everyN")
    media.as[MediaRecord].mapPartitions { iter =>
      iter.flatMap { r =>
        // frame count comes from the PAYLOAD, the ground truth — trusting
        // the n_bytes metadata would read past (or zero-pad) the buffer on
        // any record whose metadata drifted from its bytes
        val nFrames = r.payload.length / 100
        (0 until nFrames by everyN).iterator.map { f =>
          val start = f * 100
          Frame(r.media_id, f,
            java.util.Arrays.copyOfRange(r.payload, start, start + 100))
        }
      }
    }
  }
}
