package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines (BASELINE.json
  * north-star): media travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extract / resize / frame-sample run as
  * partition-local transforms over the bytes.
  *
  * ==== CODEC BOUNDARY ====
  * Image headers decode through the REAL JDK codec ([[decodeMedia]] sniffs
  * the magic bytes and reads dimensions via `javax.imageio` without
  * decoding pixels). Payloads with no known magic — and media types whose
  * codecs don't ship in the JDK (audio/video) — fall back to
  * [[decodeStub]], a DETERMINISTIC FAKE (metadata derived arithmetically
  * from the byte stream) that keeps the plumbing oracle-verifiable: swap
  * the fallback for the real library call and nothing else changes. */
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

  /** Magic-byte container sniff — the cheap dispatch a decode pipeline
    * runs before handing bytes to a codec. */
  def sniffFormat(b: Array[Byte]): Option[String] =
    if (b == null) None
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some("png")
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)
      Some("jpg")
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      Some("gif")
    else None

  /** REAL header decode for image payloads: dimensions come from the JDK's
    * `javax.imageio` reader — header parse only, pixels are never decoded
    * (`ImageReader.getWidth` reads IHDR/SOF, not the image data). Unknown
    * magics AND undecodable payloads (matching magic, corrupt/truncated
    * header) fall back to [[decodeStub]] — a bad upload must degrade to
    * fake metadata, not kill the partition's task. */
  def decodeMedia(bytes: Array[Byte]): MediaMeta = sniffFormat(bytes) match {
    case Some(fmt) =>
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) decodeStub(bytes)
          else {
            val r = readers.next()
            try {
              r.setInput(iis, false, true)
              val frames = try math.max(r.getNumImages(true), 1) catch { case _: Exception => 1 }
              MediaMeta(fmt, r.getWidth(0), r.getHeight(0), bytes.length.toLong, frames)
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => decodeStub(bytes) }
    case None => decodeStub(bytes)
  }

  /** Deterministic real-PNG fixture: a `width`×`height` single-color image
    * encoded by the JDK PNG writer — real bytes for exercising the codec
    * path end-to-end without external media files. */
  def pngBytes(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb & 0xffffff)); g.fillRect(0, 0, width, height) }
    finally g.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** md5-derived 64-bit cell mask for [[pngPattern]] — which of the 8×8
    * grid cells render bright. Salted so the mask is independent of any
    * other md5 use of the seed. */
  def patternBits(seed: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(("ph|" + seed).getBytes("UTF-8"))
    d.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
  }

  /** Deterministic real-PNG pattern fixture: the image is an 8×8 grid of
    * dark(32)/bright(224) gray cells, bright iff the cell's bit is set in
    * [[patternBits]](seed). Width/height must be multiples of 8 so every
    * pixel lies strictly inside one grid cell — then [[aHash]] recovers
    * exactly the bright mask at ANY encoded size, which is the
    * scale-invariance the perceptual-dedup query relies on. */
  def pngPattern(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0 && width > 0 && height > 0,
      s"pngPattern: dimensions must be positive multiples of 8, got ${width}x$height")
    val bits = patternBits(seed)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      val cw = width / 8
      val ch = height / 8
      for (cy <- 0 until 8; cx <- 0 until 8) {
        val v = if ((bits >>> (cy * 8 + cx) & 1L) == 1L) 224 else 32
        g.setColor(new java.awt.Color(v, v, v))
        g.fillRect(cx * cw, cy * ch, cw, ch)
      }
    } finally g.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit average-hash over REAL decoded pixels (the perceptual-dedup
    * primitive): full `ImageIO` decode → 8×8 area-average grayscale → bit i
    * set iff cell i's mean exceeds the global mean. All-integer arithmetic
    * (the mean comparison cross-multiplies instead of dividing), so the
    * hash is bit-stable across partitions/JVMs — scaled or re-encoded
    * copies of the same image collide, which is the point. `None` for
    * undecodable payloads; callers choose the degrade policy. */
  def aHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val cy = y * 8 / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val gray = ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3
          val i = cy * 8 + x * 8 / w
          sums(i) += gray
          cnts(i) += 1
          x += 1
        }
        y += 1
      }
      val total = sums.sum
      val n = w.toLong * h
      var hash = 0L
      var i = 0
      // cell_mean > global_mean  ⇔  sums(i)·n > total·cnts(i): exact in
      // Long for any image up to ~100 megapixels (255·(wh)²/64 < 2^63)
      while (i < 64) {
        if (cnts(i) > 0 && sums(i) * n > total * cnts(i)) hash |= 1L << i
        i += 1
      }
      Some(hash)
    }
  }

  /** Decode a packed frame: partition-local (mapPartitions — the Scala
    * analogue of mapInPandas batch decoding: one iterator per partition,
    * codecs initialized once per partition, not per row). Dispatches
    * through [[decodeMedia]] by default: real codec for image magics,
    * deterministic fake for opaque payloads. Pass an explicit `decoder`
    * to pin one path — e.g. [[decodeStub]] when the payloads are KNOWN to
    * be non-media bytes (arbitrary text can start with an ASCII image
    * magic like "GIF89a" and must not be content-sniffed). */
  def decode(packed: DataFrame,
             decoder: Array[Byte] => MediaMeta): Dataset[MediaRecord] = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes) => MediaRecord(id, bytes, decoder(bytes)) }
      }
  }

  def decode(packed: DataFrame): Dataset[MediaRecord] = decode(packed, decodeMedia)

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
    // driver-side: stride = 0 would throw inside an executor task
    // ("step cannot be 0"), a negative stride would silently return zero
    // frames for every record
    require(stride > 0, s"frame-sampling stride must be positive, got $stride")
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
