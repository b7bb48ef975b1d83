package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL audio codec path for the multimodal column family — WAV (RIFF) is
  * a pure-byte container, so unlike image codecs nothing beyond the JVM is
  * needed: [[wavBytes]] emits canonical 16-bit PCM files and [[parseWav]]
  * is a genuine chunk walker (magic validation, chunk traversal with pad
  * bytes, fmt/data extraction) — the audio twin of the `javax.imageio`
  * PNG path (q67).
  *
  * Scale design mirrors the image family: payloads are opaque binary
  * columns, encode/parse run partition-locally inside `mapPartitions`
  * (never on the driver), and downstream analysis (framing, energy) is
  * declarative — posexplode + integer aggregation, replayable in SQL. */
object Audio {

  final case class WavMeta(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, samples: Array[Short])

  /** Deterministic integer triangle wave — the audio fixture generator:
    * period and amplitude derive from the seed, every sample is exact
    * integer arithmetic (no trig, no floats), so any engine can recompute
    * the frame energies from the persisted samples bit-for-bit. */
  def triangleSamples(seed: Long, n: Int): Array[Short] = {
    val p = (64 + math.floorMod(seed, 192L)).toInt // period ∈ [64, 256)
    val a = (8000 + math.floorMod(seed, 7L) * 1000).toInt // amplitude
    Array.tabulate(n) { i =>
      val phase = i % p
      val v =
        if (phase < p / 2) -a + 4 * a * phase / p
        else 3 * a - 4 * a * phase / p
      // odd periods floor-divide asymmetrically and can overshoot the
      // peak by up to 2a/p — clamp so |v| ≤ a holds exactly
      math.max(-a, math.min(a, v)).toShort
    }
  }

  /** Canonical 44-byte-header mono 16-bit PCM WAV file. */
  def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Real RIFF walker: validates RIFF/WAVE magic, traverses chunks (odd
    * sizes are pad-aligned per spec), reads `fmt ` and `data`, and rejects
    * anything that is not mono 16-bit PCM — truncated or malformed input
    * throws rather than returning garbage. */
  def parseWav(bytes: Array[Byte]): WavMeta = {
    require(bytes.length >= 12, s"WAV too short: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF container")
    val riffLen = bb.getInt
    require(riffLen >= 4 && riffLen <= bytes.length - 8,
      s"RIFF size $riffLen inconsistent with ${bytes.length} bytes")
    require(tag() == "WAVE", "RIFF payload is not WAVE")
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[Array[Byte]] = None
    // the walk is bounded by the RIFF payload, NOT the byte array: files
    // carry trailers after the container (ID3 etc.) whose bytes must not
    // parse as chunks — garbage there would spuriously reject a valid
    // file, and a trailing 'data' spelling would REPLACE the real samples
    val riffEnd = 8L + riffLen
    while (bb.position() + 8 <= riffEnd && bb.remaining() >= 8) {
      val id = tag()
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining(), s"chunk '$id' overruns: $len")
      val body = new Array[Byte](len); bb.get(body)
      if (len % 2 == 1 && bb.hasRemaining) bb.get() // RIFF pad byte
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          val fb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
          val audioFormat = fb.getShort
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          val channels = fb.getShort.toInt
          val rate = fb.getInt
          fb.getInt // byte rate
          fb.getShort // block align
          val bits = fb.getShort.toInt
          fmt = Some((channels, rate, bits))
        case "data" => data = Some(body)
        case _ => // LIST/INFO/etc — skipped, as a real parser must
      }
    }
    val (channels, rate, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("missing fmt chunk"))
    val payload = data.getOrElse(
      throw new IllegalArgumentException("missing data chunk"))
    require(channels == 1 && bits == 16,
      s"only mono 16-bit PCM supported (got $channels ch / $bits bit)")
    val sb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val samples = Array.fill(payload.length / 2)(sb.getShort)
    WavMeta(rate, channels, bits, samples)
  }
}
