package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines (BASELINE.json
  * north-star): media travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extract / resize / frame-sample run as
  * partition-local transforms over the bytes.
  *
  * ==== STUB BOUNDARY ====
  * No image/audio codecs exist in this environment, so the byte-level
  * decode below is a DETERMINISTIC FAKE (metadata derived arithmetically
  * from the byte stream). Everything around it — schema, batch shape,
  * partition-local execution, pruning-friendly metadata columns — is the
  * real Spark plumbing a codec would drop into: replace `decodeStub`'s
  * body with the actual library call and nothing else changes. */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long, frames: Int)
  case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)

  /** Pack a text table into binary media records (the ingest shape: id +
    * opaque bytes; here bytes are the utf-8 text — a stand-in payload). */
  def pack(df: DataFrame, idCol: String = "doc_id", payloadCol: String = "text"): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(payloadCol), "UTF-8").as("content"))

  /** Deterministic fake header parse — REPLACE WITH REAL CODEC.
    * Metadata is pure arithmetic on byte length so oracle SQL can verify
    * the plumbing end-to-end. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0L else bytes.length.toLong
    val format = (n % 3) match {
      case 0 => "png"
      case 1 => "jpg"
      case _ => "webp"
    }
    MediaMeta(format, (64 + n % 640).toInt, (64 + n % 480).toInt, n, (1 + n % 7).toInt)
  }

  /** Decode a packed frame: partition-local (mapPartitions — the Scala
    * analogue of mapInPandas batch decoding: one iterator per partition,
    * codecs initialized once per partition, not per row). */
  def decode(packed: DataFrame): Dataset[MediaRecord] = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes) => MediaRecord(id, bytes, decodeStub(bytes)) }
      }
  }

  /** Resize stub: deterministic byte subsampling to ≤ maxBytes (stands in
    * for a pixel resize; keeps every k-th byte). */
  def resizeStub(bytes: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (bytes == null || bytes.length <= maxBytes) bytes
    else {
      val step = math.ceil(bytes.length.toDouble / maxBytes).toInt
      bytes.indices.collect { case i if i % step == 0 => bytes(i) }.toArray
    }
  }

  /** Frame-sample stub: split the payload into `meta.frames` equal chunks
    * and keep every `stride`-th chunk (stands in for video frame sampling).
    * Output: one row per sampled frame — the explode shape a real frame
    * extractor produces. */
  def sampleFrames(decoded: Dataset[MediaRecord], stride: Int): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.flatMap { rec =>
      val n = rec.meta.frames
      val len = math.max(rec.content.length / math.max(n, 1), 1)
      (0 until n by stride).map { f =>
        val from = f * len
        val until = math.min(from + len, rec.content.length)
        (rec.media_id, f, rec.content.slice(from, until))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
