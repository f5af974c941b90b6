package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct,
  * exactly the pattern a 100 TB training-data pipeline needs — the
  * relational layer filters/joins/dedups on cheap typed metadata and
  * only the final consumer touches the bytes.
  *
  * Decode / resize / frame-sample run as `mapPartitions` over a typed
  * `Dataset` — the Scala analog of batch-UDF execution: one iterator
  * per partition, so a real decoder would amortize native-library init
  * across the whole batch, and partition sizing
  * (`spark.sql.files.maxPartitionBytes`) bounds peak decode memory.
  *
  * The actual codec calls are STUBS (this container has no image/audio
  * libraries): `decodeStub` derives deterministic fake features from
  * the bytes. The Spark-side plumbing — schemas, encoders, partition
  * iteration, batch shape — is real and tested; swapping the stub body
  * for JNI/javacpp codec calls changes nothing structural.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  case class MediaMeta(
      mediaType: String,
      byteLen: Long,
      contentHash: String,
      width: Int,
      height: Int,
      nFrames: Int)

  case class MediaRecord(docId: Long, payload: Array[Byte], meta: MediaMeta)

  /** Decoded-image features (stub: derived from bytes, not pixels). */
  case class DecodedImage(
      docId: Long,
      width: Int,
      height: Int,
      meanLuma: Double,
      histogram: Array[Long])

  case class Frame(docId: Long, frameIdx: Int, byteOffset: Long, luma: Double)

  /** Attach a payload + metadata to a text corpus — the fixture path
    * for exercising the plumbing (payload = UTF-8 bytes of the text;
    * width/height/frames derived deterministically from byte length).
    * Pure Column expressions, so the DuckDB oracle can verify it.
    */
  def attachPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("docId"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("image").as("mediaType"),
        octet_length(col(textCol)).cast("long").as("byteLen"),
        md5(col(textCol)).as("contentHash"),
        (octet_length(col(textCol)) % 64 + 16).cast("int").as("width"),
        // floor(x/64): Column `/` is double division; exact for these
        // magnitudes and mirrors DuckDB's integer `// 64`.
        (floor(octet_length(col(textCol)) / 64).cast("int") % 64 + 16).cast("int").as("height"),
        (octet_length(col(textCol)) % 7 + 1).cast("int").as("nFrames")).as("meta"))

  /** STUB decode: a real implementation would hand `payload` to an
    * image codec here; the fake derives a luma proxy and a 16-bin byte
    * histogram so downstream operators (filtering on luma, histogram
    * dedup) are exercised end-to-end with deterministic values.
    */
  private def decodeStub(r: MediaRecord): DecodedImage = {
    val bytes = r.payload
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val u = bytes(i) & 0xff
      hist(u / 16) += 1
      sum += u
      i += 1
    }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    DecodedImage(r.docId, r.meta.width, r.meta.height, mean, hist)
  }

  /** Decode a partition at a time. `mapPartitions` (not `map`) is the
    * load-bearing choice: codec/library init happens once per
    * partition, and the iterator keeps memory at one record per step.
    */
  def decodeImages(records: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[DecodedImage] = {
    import spark.implicits._
    records.mapPartitions(_.map(decodeStub))
  }

  /** STUB resize: recomputes target dims preserving aspect; a real
    * implementation would resample pixels.
    */
  def resize(images: Dataset[DecodedImage], maxSide: Int)(implicit spark: SparkSession): Dataset[DecodedImage] = {
    import spark.implicits._
    images.map { im =>
      val scale = maxSide.toDouble / math.max(im.width, im.height)
      if (scale >= 1.0) im
      else
        im.copy(
          width = math.max(1, math.round(im.width * scale).toInt),
          height = math.max(1, math.round(im.height * scale).toInt))
    }
  }

  /** STUB frame sampling for video payloads: every `stride`-th "frame"
    * (fixed-size byte window) becomes one row — the explode shape a
    * real video pipeline has, with deterministic fake luma per frame.
    */
  def sampleFrames(records: Dataset[MediaRecord], stride: Int)(implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    records.flatMap { r =>
      val n = r.meta.nFrames
      (0 until n by stride).map { f =>
        val off = (f.toLong * 37) % math.max(1, r.payload.length)
        val luma = (r.payload(off.toInt) & 0xff).toDouble
        Frame(r.docId, f, off, luma)
      }
    }
  }
}
