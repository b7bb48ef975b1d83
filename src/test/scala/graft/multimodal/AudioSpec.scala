package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}

class AudioSpec extends AnyFunSuite {

  test("encode → parse round-trips samples, rate, and format exactly") {
    val s = Audio.triangleSamples(seed = 7L, n = 1001) // odd data length path
    val m = Audio.parseWav(Audio.wavBytes(s, sampleRate = 16000))
    assert(m.sampleRate == 16000 && m.channels == 1 && m.bitsPerSample == 16)
    assert(m.samples.toSeq == s.toSeq)
  }

  test("triangle fixture is deterministic and bounded by its amplitude") {
    val a = Audio.triangleSamples(5L, 500)
    val b = Audio.triangleSamples(5L, 500)
    assert(a.toSeq == b.toSeq)
    val amp = 8000 + (5L % 7) * 1000
    assert(a.forall(v => math.abs(v.toInt) <= amp))
    assert(a.distinct.length > 10) // it actually oscillates
  }

  test("chunk walker skips unknown chunks (LIST before data)") {
    val s = Audio.triangleSamples(3L, 64)
    val plain = Audio.wavBytes(s, 8000)
    // splice a LIST chunk with an odd body (exercises the pad byte)
    // between fmt and data
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes, odd
    val bb = ByteBuffer.allocate(plain.length + 8 + listBody.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(plain, 0, 36) // RIFF header + fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody).put(0.toByte)
    bb.put(plain, 36, plain.length - 36) // data chunk
    val spliced = bb.array()
    // patch the RIFF size for the inserted chunk
    ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val m = Audio.parseWav(spliced)
    assert(m.samples.toSeq == s.toSeq && m.sampleRate == 8000)
  }

  test("bytes after the RIFF payload (trailers) are ignored, not parsed as chunks") {
    val s = Audio.triangleSamples(5L, 48)
    val plain = Audio.wavBytes(s, 8000)
    // append garbage that would fail chunk parsing — and worse, a fake
    // 'data' chunk that would have REPLACED the real samples when the
    // walker ran past the RIFF end
    val fakeBody = Array.fill[Byte](4)(0x7f.toByte)
    val bb = ByteBuffer.allocate(plain.length + 8 + fakeBody.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(plain)
    bb.put("data".getBytes("US-ASCII")).putInt(fakeBody.length).put(fakeBody)
    // RIFF size deliberately NOT patched: the trailer is outside the payload
    val m = Audio.parseWav(bb.array())
    assert(m.samples.toSeq == s.toSeq && m.sampleRate == 8000)
  }

  test("malformed input is rejected, not garbage-decoded") {
    val good = Audio.wavBytes(Audio.triangleSamples(1L, 32), 8000)
    assert(intercept[IllegalArgumentException](
      Audio.parseWav("JUNKJUNKJUNKJUNK".getBytes)).getMessage.contains("RIFF"))
    assert(intercept[IllegalArgumentException](
      Audio.parseWav(good.take(10))).getMessage.nonEmpty)
    // flip the fmt audioFormat to non-PCM
    val nonPcm = good.clone(); nonPcm(20) = 2
    assert(intercept[IllegalArgumentException](
      Audio.parseWav(nonPcm)).getMessage.contains("PCM"))
    // truncate mid-data: declared chunk length overruns the buffer
    assert(intercept[IllegalArgumentException](
      Audio.parseWav(good.dropRight(7))).getMessage.nonEmpty)
  }
}
