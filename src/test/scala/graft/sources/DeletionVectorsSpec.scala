package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import java.nio.{ByteBuffer, ByteOrder}

/** Format laws for the Delta deletion-vector codec: z85 against the
  * ZeroMQ spec vector, roaring portable round-trips across container
  * kinds and 2^32 key boundaries, run-container decode of a hand-built
  * spelling the serializer never emits, and the framing's tamper
  * refusals. */
class DeletionVectorsSpec extends AnyFunSuite {

  test("z85 matches the ZeroMQ RFC 32 test vector both ways") {
    // the spec's published vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7
    // 0x5B encodes to "HelloWorld"
    val bytes = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DeletionVectors.z85Encode(bytes) == "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").sameElements(bytes))
    // padded spelling trims back via the declared length
    val odd = Array[Byte](1, 2, 3, 4, 5)
    val enc = DeletionVectors.z85EncodePad(odd)
    assert(enc.length == 10) // 5 bytes -> 8 padded -> 2 blocks
    assert(DeletionVectors.z85Decode(enc).take(5).sameElements(odd))
  }

  test("roaring round-trip: array, bitmap containers, multi-key, 2^32 spans") {
    def rt(pos: Array[Long]): Unit = {
      val back = DeletionVectors.deserialize(DeletionVectors.serialize(pos))
      assert(back.sameElements(pos.distinct.sorted), s"for ${pos.take(5).toSeq}…")
    }
    rt(Array.empty[Long])
    rt(Array(0L))
    rt(Array(7L, 3L, 3L, 65535L, 65536L)) // dup + container-key boundary
    // >4096 in one 2^16 container → bitmap container spelling
    rt((0L until 5000L).map(_ * 13 % 60000).distinct.toArray)
    // positions straddling two 32-bit bitmaps (hi key 0 and 1)
    rt(Array(5L, (1L << 32) + 17L, (1L << 32) + 900000L))
  }

  test("run-container spelling (which the serializer never emits) decodes") {
    // hand-assemble: magic, 1 bitmap, SERIAL_COOKIE with 1 container,
    // run flag set, key 0, cardinality 3, 1 run [5, len 3] -> {5,6,7}
    val bb = ByteBuffer.allocate(12 + 4 + 1 + 4 + 2 + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377).putLong(1L)
    bb.putInt(12347 | (0 << 16)) // containerCount-1 = 0 in the high bits
    bb.put(1.toByte) // run-flag bitset: container 0 is a run container
    bb.putShort(0.toShort).putShort(2.toShort) // key 0, card-1 = 2
    // < NoOffsetThreshold containers → no offset header in this spelling
    bb.putShort(1.toShort) // one run
    bb.putShort(5.toShort).putShort(2.toShort) // start 5, length-1 = 2
    assert(DeletionVectors.deserialize(bb.array()).sameElements(Array(5L, 6L, 7L)))
  }

  test("wrong magic, trailing garbage, and truncation refuse") {
    val good = DeletionVectors.serialize(Array(1L, 2L))
    val badMagic = good.clone(); badMagic(0) = 9
    intercept[IllegalArgumentException](DeletionVectors.deserialize(badMagic))
    intercept[IllegalArgumentException](
      DeletionVectors.deserialize(good :+ 0.toByte))
    intercept[Exception](DeletionVectors.deserialize(good.dropRight(3)))
  }

  test("file framing: slice verifies version, size, and crc; positions verify cardinality") {
    val d = DeletionVectors.Descriptor("u", "x" * 20, Some(1),
      DeletionVectors.serialize(Array(3L, 9L)).length, 2L)
    val bm = DeletionVectors.serialize(Array(3L, 9L))
    val crc = new java.util.zip.CRC32; crc.update(bm)
    val file = ByteBuffer.allocate(1 + 8 + bm.length)
    file.put(1.toByte).putInt(bm.length).put(bm).putInt(crc.getValue.toInt)
    val bytes = file.array()
    assert(DeletionVectors.sliceBlob(bytes, d, "t").sameElements(bm))
    assert(DeletionVectors.positions(bm, d, "t").sameElements(Array(3L, 9L)))
    // wrong version byte
    val badV = bytes.clone(); badV(0) = 2
    intercept[IllegalArgumentException](DeletionVectors.sliceBlob(badV, d, "t"))
    // flipped bitmap byte → crc mismatch
    val badCrc = bytes.clone(); badCrc(6) = (badCrc(6) ^ 0x40).toByte
    intercept[IllegalArgumentException](DeletionVectors.sliceBlob(badCrc, d, "t"))
    // size word disagreeing with the descriptor
    intercept[IllegalArgumentException](
      DeletionVectors.sliceBlob(bytes, d.copy(sizeInBytes = d.sizeInBytes - 1), "t"))
    // descriptor claiming one more deleted row than the bitmap holds
    intercept[IllegalArgumentException](
      DeletionVectors.positions(bm, d.copy(cardinality = 3L), "t"))
  }

  test("'u' path resolution: z85 uuid, optional prefix dir; junk refuses") {
    val uuid = java.util.UUID.fromString("0d9a2b00-3f5e-4a41-8a7c-0123456789ab")
    val json = DeletionVectors.uDescriptorJson(uuid, 1, 10, 1L)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val d = DeletionVectors.parseDescriptor(node)
    assert(DeletionVectors.resolveFile("/tab", d).toString ==
      s"/tab/deletion_vector_$uuid.bin")
    val pref = DeletionVectors.parseDescriptor(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        DeletionVectors.uDescriptorJson(uuid, 1, 10, 1L, prefix = "ab/")))
    assert(DeletionVectors.resolveFile("/tab", pref).toString ==
      s"/tab/ab/deletion_vector_$uuid.bin")
    intercept[IllegalArgumentException](
      DeletionVectors.resolveFile("/tab", d.copy(storageType = "z")))
    intercept[IllegalArgumentException](
      DeletionVectors.resolveFile("/tab", d.copy(pathOrInlineDv = "short")))
  }
}
