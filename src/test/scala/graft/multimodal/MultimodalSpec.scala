package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    import spark.implicits._
    Seq((1L, "x" * 100), (2L, "y" * 641), (3L, "z")).toDF("doc_id", "text")
  }

  test("pack produces (media_id, binary content)") {
    val packed = Multimodal.pack(media)
    assert(packed.schema.fieldNames.toSeq == Seq("media_id", "content"))
    assert(packed.schema("content").dataType.typeName == "binary")
    val sizes = packed.select(col("media_id"), length(col("content")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sizes == Map(1L -> 100, 2L -> 641, 3L -> 1))
  }

  test("decode emits typed metadata derived from the bytes (stubbed codec)") {
    val decoded = Multimodal.decode(Multimodal.pack(media))
    val metas = decoded.collect().map(r => r.media_id -> r.meta).toMap
    assert(metas(1L).nBytes == 100 && metas(1L).format == "jpg") // 100 % 3 == 1
    assert(metas(2L).width == 64 + 641 % 640 && metas(2L).height == 64 + 641 % 480)
    assert(metas(3L).frames == 1 + 1 % 7)
  }

  test("decodeMedia reads real PNG dimensions through the JDK codec") {
    val bytes = Multimodal.pngBytes(37, 21, 0xabcdef)
    assert(Multimodal.sniffFormat(bytes).contains("png"))
    val meta = Multimodal.decodeMedia(bytes)
    assert(meta == Multimodal.MediaMeta("png", 37, 21, bytes.length.toLong, 1))
    // and through the Spark decode path (mapPartitions dispatch)
    import spark.implicits._
    val df = Seq((9L, bytes)).toDF("media_id", "content")
    val rec = Multimodal.decode(df).collect().head
    assert(rec.meta.width == 37 && rec.meta.height == 21 && rec.meta.format == "png")
  }

  test("decodeMedia falls back to the deterministic stub on unknown magic") {
    val opaque = "not an image".getBytes("UTF-8")
    assert(Multimodal.sniffFormat(opaque).isEmpty)
    assert(Multimodal.decodeMedia(opaque) == Multimodal.decodeStub(opaque))
    assert(Multimodal.decodeMedia(null) == Multimodal.decodeStub(null))
  }

  test("decodeMedia degrades to the stub on corrupt headers instead of throwing") {
    // valid PNG magic, truncated before IHDR — the reader claims it, then
    // hits EOF; a bad upload must not kill the partition's task
    val truncated = Multimodal.pngBytes(8, 8, 1).take(12)
    assert(Multimodal.decodeMedia(truncated) == Multimodal.decodeStub(truncated))
  }

  test("decode with a pinned decoder never content-sniffs text payloads") {
    import spark.implicits._
    // ASCII text starting with a GIF magic: the sniffing path would hand it
    // to the JDK GIF reader; the pinned-stub path must use byte arithmetic
    val trap = Seq((1L, "GIF89a is a fun image format")).toDF("doc_id", "text")
    val rec = Multimodal.decode(Multimodal.pack(trap), Multimodal.decodeStub)
      .collect().head
    assert(rec.meta == Multimodal.decodeStub(rec.content))
  }

  test("resize stub bounds payload size deterministically") {
    val big = Array.fill[Byte](1000)(7)
    val small = Multimodal.resizeStub(big, 100)
    assert(small.length <= 100)
    assert(Multimodal.resizeStub(small, 100).toSeq == small.toSeq) // idempotent
    assert(Multimodal.resizeStub(null, 10) == null)
  }

  test("aHash recovers the pattern mask and is invariant to image scale") {
    // the 8×8 grid pattern's aHash must equal the bright-cell mask at any
    // multiple-of-8 size — unless the mask is near-degenerate (≤1 bright
    // or ≤1 dark cell, where mean-thresholding can't separate), which the
    // md5-derived masks for these seeds are not
    for (seed <- 0L until 12L) {
      val bits = Multimodal.patternBits(seed)
      val pop = java.lang.Long.bitCount(bits)
      assert(pop > 1 && pop < 63, s"seed $seed mask degenerate")
      val small = Multimodal.aHash(Multimodal.pngPattern(16, 16, seed))
      val big = Multimodal.aHash(Multimodal.pngPattern(48, 24, seed))
      assert(small.contains(bits), s"seed $seed: hash != mask at 16x16")
      assert(small == big, s"seed $seed: hash not scale-invariant")
    }
    // 12 seeds → 12 distinct hashes (md5 masks don't collide here)
    val hashes = (0L until 12L).map(s => Multimodal.aHash(Multimodal.pngPattern(8, 8, s)))
    assert(hashes.distinct.size == 12)
  }

  test("aHash degrades to None on undecodable bytes") {
    assert(Multimodal.aHash("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.aHash(Array.emptyByteArray).isEmpty)
  }

  test("frame sampling explodes one row per sampled frame") {
    val frames = Multimodal.sampleFrames(Multimodal.decode(Multimodal.pack(media)), stride = 1)
    assert(frames.schema.fieldNames.toSeq == Seq("media_id", "frame_idx", "frame_bytes"))
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // frames count = 1 + nBytes % 7
    assert(byId(1L) == 1 + 100 % 7)
    assert(byId(2L) == 1 + 641 % 7)
    // stride 2 halves (rounded up)
    val strided = Multimodal.sampleFrames(Multimodal.decode(Multimodal.pack(media)), stride = 2)
    assert(strided.filter(col("media_id") === 1L).count() == (1 + 100 % 7 + 1) / 2)
  }
}
