package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.hashing.MurmurHash3

/** Multimodal column plumbing (§2.C): image/audio/video handled as opaque
  * `binary` columns with typed metadata, processed per partition in batches.
  *
  * The DECODE step is a deterministic stub — the actual image/audio codecs
  * are not available in this container (and were external services in the
  * reference too: OCR via Azure Vision, embedding_utils.py:53-100). What IS
  * real and tested: the binaryFile source wiring (A1), the media schema, the
  * per-partition batch shape, and the partitioning behavior — swap
  * `StubDecoder` for a codec-backed `MediaDecoder` and nothing else changes.
  *
  * Scale notes: binary payloads dominate row size — `media` frames should be
  * stored in their own table keyed by content hash, feature extraction is a
  * narrow map (no shuffle), and column pruning means metadata-only queries
  * never read the bytes (parquet column split).
  */
object Multimodal {

  /** One media row: provenance + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video | text
    StructField("content", BinaryType, nullable = true),
    StructField("byte_len", LongType, nullable = false),
    StructField("content_hash", StringType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("format", StringType))), nullable = true)))

  /** A1: directory of binary files → media rows.
    * `spark.read.format("binaryFile")` gives (path, modificationTime, length,
    * content); we project to the media schema. Streaming variant: the same
    * options on `readStream` (file-arrival ingestion).
    */
  def readBinaryDir(spark: SparkSession, path: String, glob: String,
                    modality: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        regexp_replace(regexp_extract(col("path"), "([^/]+)$", 1), "[^a-zA-Z0-9_\\-=]", "_").as("media_id"),
        lit(modality).as("modality"),
        col("content"),
        col("length").as("byte_len"),
        md5(col("content")).as("content_hash"),
        lit(null).cast(mediaSchema("meta").dataType).as("meta"))

  /** Decoder contract: bytes → (feature vector, width, height). Real
    * implementations wrap an image codec / resampler; the stub is a
    * deterministic pure function of the bytes so tests and oracles hold.
    */
  trait MediaDecoder extends Serializable {
    def dims: Int
    def decodeFeatures(bytes: Array[Byte]): (Array[Float], Int, Int)
  }

  /** STUB decode (clearly marked): byte-window hashing stands in for real
    * pixel decoding. Deterministic; same batch shape as a real codec.
    */
  final class StubDecoder(val dims: Int = 64) extends MediaDecoder {
    def decodeFeatures(bytes: Array[Byte]): (Array[Float], Int, Int) = {
      val v = new Array[Float](dims)
      if (bytes != null && bytes.nonEmpty) {
        var i = 0
        while (i < bytes.length) {
          val h = MurmurHash3.bytesHash(java.util.Arrays.copyOfRange(
            bytes, i, math.min(i + 16, bytes.length)), 42)
          v(math.floorMod(h, dims)) += (if (((h >>> 16) & 1) == 0) 1f else -1f)
          i += 16
        }
      }
      val fakeW = if (bytes == null) 0 else 64 + (bytes.length % 64)
      val fakeH = if (bytes == null) 0 else 64 + ((bytes.length / 64) % 64)
      (v, fakeW, fakeH)
    }
  }

  /** Feature extraction over the media table: per-partition batch map (the
    * Scala analog of a vectorized/Arrow UDF — one decoder instance per
    * partition, rows processed in a tight loop, no shuffle).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      decoder: MediaDecoder = new StubDecoder()): DataFrame = {
    import spark.implicits._
    val projected: Dataset[(String, String, Array[Byte])] = media
      .select(col("media_id"), col("modality"), col("content"))
      .as[(String, String, Array[Byte])]
    projected.mapPartitions { it =>
      // decoder setup amortized per partition (the batching fix the
      // reference lacks, SURVEY.md §4)
      it.map { case (id, modality, bytes) =>
        val (features, w, h) = decoder.decodeFeatures(bytes)
        (id, modality, features, w, h)
      }
    }.toDF("media_id", "modality", "features", "width", "height")
  }

  /** Resize stub: a real implementation decodes, resamples to (targetW,
    * targetH), and re-encodes; the stub deterministically truncates/pads the
    * payload to the target pixel budget and records the new dimensions in
    * the typed metadata. Same narrow-map batch shape as a codec-backed
    * resize.
    */
  def resize(spark: SparkSession, media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    val budget = math.max(1, targetW * targetH / 16)
    media.select(col("media_id"), col("modality"), col("content"))
      .as[(String, String, Array[Byte])]
      .map { case (id, modality, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val out = java.util.Arrays.copyOf(b, budget) // truncate or zero-pad
        (id, modality, out, targetW, targetH)
      }
      .toDF("media_id", "modality", "content", "width", "height")
  }

  /** Frame/window sampling stub: pick every k-th 16-byte window as a "frame"
    * payload — the partition/batch plumbing of video frame-sampling with the
    * codec stubbed out.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyK: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else bytes.grouped(16).zipWithIndex
          .filter { case (_, i) => i % everyK == 0 }
          .map { case (frame, i) => (id, i, frame) }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }
}
