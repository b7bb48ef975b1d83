package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32
import scala.collection.mutable.ArrayBuffer

/** Codec for the PUBLIC Delta Lake deletion-vector format (delta-io
  * PROTOCOL.md "Deletion Vectors"): a per-file bitmap of deleted 0-based
  * row indexes, stored either inline in the `add` action or in a sidecar
  * `deletion_vector_<uuid>.bin` file, addressed by a descriptor struct
  * `{storageType, pathOrInlineDv, offset?, sizeInBytes, cardinality}`.
  *
  * Three public encodings compose here, all implemented from their specs:
  *  - **Z85** (ZeroMQ RFC 32): 4 bytes → 5 chars, big-endian base-85 —
  *    encodes the sidecar file's UUID (`u` storage, last 20 chars) and
  *    the whole bitmap for inline DVs (`i` storage);
  *  - **RoaringBitmapArray "portable"** (the format the descriptor's
  *    bytes hold): little-endian `[magic 1681511377][numBitmaps: i64]`
  *    then one STANDARD 32-bit roaring bitmap per 2^32 key range
  *    (RoaringFormatSpec: cookie 12346/12347, array / bitmap / run
  *    containers) — bitmap `i` holds the low 32 bits of positions whose
  *    high 32 bits equal `i`;
  *  - **DV file framing**: 1-byte format version (=1), then per stored
  *    DV `[dataSize: i32 BE][bitmap bytes][CRC-32 of the bytes: i32 BE]`
  *    with the descriptor's `offset` pointing at the size word.
  *
  * Every layer verifies what the layer above promised — magic, version
  * byte, declared vs stored size, checksum, declared vs decoded
  * cardinality — and refuses loudly on mismatch: a DV misread does not
  * "degrade", it resurrects deleted rows or deletes live ones.
  *
  * The serializer side exists for fixtures and tests (this repo's Delta
  * write path, [[DeltaLogWriter]], does not emit DVs — rewriting parquet
  * parts is its deletion story); it emits the no-run-container spelling
  * (cookie 12346, array containers ≤4096 entries, bitmap containers
  * above — exactly the reader's container-type rule, so round-trips
  * cover both container kinds).
  */
object DeletionVectors {

  // ---------------------------------------------------------------- z85
  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** ZeroMQ Z85: every 4 input bytes become 5 output chars (big-endian
    * base-85). Length must be a multiple of 4 — the spec has no padding. */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85 encodes whole 4-byte blocks; got ${bytes.length} bytes")
    val sb = new java.lang.StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      val block = new Array[Char](5)
      var k = 4
      while (k >= 0) { block(k) = Z85Alphabet((v % 85).toInt); v /= 85; k -= 1 }
      sb.append(block)
      i += 4
    }
    sb.toString
  }

  /** Z85 for arbitrary-length payloads (inline DVs): the input is
    * zero-padded up to a 4-byte block — the descriptor's `sizeInBytes`
    * is what lets the decoder trim the pad back off. */
  def z85EncodePad(bytes: Array[Byte]): String = {
    val pad = (4 - bytes.length % 4) % 4
    z85Encode(if (pad == 0) bytes else bytes ++ Array.fill(pad)(0.toByte))
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"z85 decodes whole 5-char blocks; got ${s.length} chars")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        require(c < 128 && Z85Decode(c) >= 0, s"invalid z85 character '$c'")
        v = v * 85 + Z85Decode(c)
        j += 1
      }
      require(v <= 0xffffffffL, "z85 block overflows 32 bits — not valid z85")
      out(o) = ((v >>> 24) & 0xff).toByte
      out(o + 1) = ((v >>> 16) & 0xff).toByte
      out(o + 2) = ((v >>> 8) & 0xff).toByte
      out(o + 3) = (v & 0xff).toByte
      o += 4
      i += 5
    }
    out
  }

  // ------------------------------------------- roaring bitmap (portable)
  /** RoaringBitmapArray portable-format magic (the Delta protocol's
    * published constant). */
  private val Magic = 1681511377
  private val SerialCookie = 12347 // has run containers; count in hi 16 bits
  private val SerialCookieNoRun = 12346 // count follows; no run containers
  private val NoOffsetThreshold = 4 // run spelling omits offsets below this
  private val ArrayMaxCard = 4096 // array container above this → bitmap

  /** Decode a serialized RoaringBitmapArray into sorted 0-based row
    * positions. Refuses on a wrong magic or a malformed container layout
    * rather than returning a partial set. */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.remaining >= 12,
      s"deletion vector bitmap truncated: ${bytes.length} bytes")
    val magic = bb.getInt
    require(magic == Magic,
      s"deletion vector bitmap magic $magic != $Magic — not a " +
        "RoaringBitmapArray portable serialization; refusing")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue,
      s"deletion vector declares $n 32-bit bitmaps — malformed")
    val out = new ArrayBuffer[Long]
    var hi = 0L
    while (hi < n) {
      readBitmap32(bb, hi << 32, out)
      hi += 1
    }
    require(!bb.hasRemaining,
      s"deletion vector bitmap has ${bb.remaining} trailing bytes after " +
        s"$n bitmaps — malformed")
    out.toArray
  }

  /** One standard-format 32-bit roaring bitmap starting at the buffer's
    * position; decoded values are offset by `base` (the 64-bit key). */
  private def readBitmap32(bb: ByteBuffer, base: Long,
                           out: ArrayBuffer[Long]): Unit = {
    val start = bb.position()
    val cookie = bb.getInt
    val (nCont, runFlags) =
      if ((cookie & 0xffff) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        bb.get(flags)
        (n, Some(flags))
      } else {
        require(cookie == SerialCookieNoRun,
          s"roaring bitmap cookie $cookie is neither $SerialCookie nor " +
            s"$SerialCookieNoRun — refusing")
        (bb.getInt, None)
      }
    require(nCont >= 0 && nCont <= 65536, s"roaring container count $nCont")
    val keys = new Array[Int](nCont)
    val cards = new Array[Int](nCont)
    var i = 0
    while (i < nCont) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    // the offset header is present always in the no-run spelling, and in
    // the run spelling only at >= NoOffsetThreshold containers; offsets
    // are relative to this bitmap's own start — verified as we decode
    val offsets: Option[Array[Int]] =
      if (runFlags.isEmpty || nCont >= NoOffsetThreshold) {
        val a = new Array[Int](nCont)
        var j = 0
        while (j < nCont) { a(j) = bb.getInt; j += 1 }
        Some(a)
      } else None
    i = 0
    while (i < nCont) {
      offsets.foreach { offs =>
        require(start + offs(i) == bb.position(),
          s"roaring container $i declared at offset ${offs(i)} but decode " +
            s"reached ${bb.position() - start} — malformed layout")
      }
      val keyBase = base | (keys(i).toLong << 16)
      val isRun = runFlags.exists(f => (f(i / 8) & (1 << (i % 8))) != 0)
      if (isRun) {
        val nRuns = bb.getShort & 0xffff
        var r = 0
        var card = 0
        while (r < nRuns) {
          val runStart = bb.getShort & 0xffff
          val runLen = (bb.getShort & 0xffff) + 1
          var v = 0
          while (v < runLen) { out += keyBase | (runStart + v); v += 1 }
          card += runLen
          r += 1
        }
        require(card == cards(i),
          s"roaring run container $i: header cardinality ${cards(i)} != " +
            s"decoded $card — malformed")
      } else if (cards(i) <= ArrayMaxCard) {
        var v = 0
        while (v < cards(i)) { out += keyBase | (bb.getShort & 0xffff); v += 1 }
      } else {
        var card = 0
        var w = 0
        while (w < 1024) {
          val word = bb.getLong
          var bit = 0
          while (bit < 64) {
            if ((word & (1L << bit)) != 0) {
              out += keyBase | ((w << 6) | bit)
              card += 1
            }
            bit += 1
          }
          w += 1
        }
        require(card == cards(i),
          s"roaring bitmap container $i: header cardinality ${cards(i)} " +
            s"!= decoded $card — malformed")
      }
      i += 1
    }
  }

  /** Serialize sorted-or-not positions into the portable format the
    * reader accepts (no-run spelling; array or bitmap containers by the
    * ≤4096 rule). Fixture/test writer — see the object scaladoc. */
  def serialize(positions: Array[Long]): Array[Byte] = {
    positions.foreach(p => require(p >= 0, s"negative row position $p"))
    val sorted = positions.distinct.sorted
    val nBitmaps: Long =
      if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    require(nBitmaps <= (1L << 20),
      s"positions span $nBitmaps 2^32 ranges — a row index that large is " +
        "not a parquet row position; refusing")
    val byHi = sorted.groupBy(_ >>> 32)
    val parts = (0L until nBitmaps).map { hi =>
      serializeBitmap32(byHi.getOrElse(hi, Array.empty).map(p => (p & 0xffffffffL).toInt))
    }
    val bb = ByteBuffer.allocate(12 + parts.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic)
    bb.putLong(nBitmaps)
    parts.foreach(bb.put)
    bb.array()
  }

  private def serializeBitmap32(values: Array[Int]): Array[Byte] = {
    val byKey = values.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
    val nCont = byKey.size
    val contBytes = byKey.map { case (_, vs) =>
      if (vs.length <= ArrayMaxCard) {
        val b = ByteBuffer.allocate(vs.length * 2).order(ByteOrder.LITTLE_ENDIAN)
        vs.sorted.foreach(v => b.putShort((v & 0xffff).toShort))
        b.array()
      } else {
        val words = new Array[Long](1024)
        vs.foreach { v =>
          val lo = v & 0xffff
          words(lo >>> 6) |= (1L << (lo & 63))
        }
        val b = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        words.foreach(b.putLong)
        b.array()
      }
    }
    val headerLen = 8 + nCont * 4 + nCont * 4 // cookie+count, desc, offsets
    val bb = ByteBuffer.allocate(headerLen + contBytes.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(SerialCookieNoRun)
    bb.putInt(nCont)
    byKey.foreach { case (k, vs) =>
      bb.putShort((k & 0xffff).toShort)
      bb.putShort(((vs.length - 1) & 0xffff).toShort)
    }
    var off = headerLen
    contBytes.foreach { c => bb.putInt(off); off += c.length }
    contBytes.foreach(bb.put)
    bb.array()
  }

  /** Scheme-normalize a path for the delete join — the [[Iceberg]]
    * `normPath` rule, usable on executors: drop `scheme:/+`, keep the
    * authority as the leading segment so same-named keys in different
    * buckets never collide. */
  def normalizePath(p: String): String =
    p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")

  // ------------------------------------------------ descriptor + framing
  /** The `add.deletionVector` struct, one field per protocol key. */
  case class Descriptor(storageType: String, pathOrInlineDv: String,
                        offset: Option[Int], sizeInBytes: Int,
                        cardinality: Long)

  def parseDescriptor(node: JsonNode): Descriptor = {
    def req(k: String): JsonNode = {
      val v = node.get(k)
      require(v != null && !v.isNull,
        s"deletionVector descriptor missing '$k': $node")
      v
    }
    Descriptor(
      storageType = req("storageType").asText(),
      pathOrInlineDv = req("pathOrInlineDv").asText(),
      offset = Option(node.get("offset")).filterNot(_.isNull).map(_.asInt()),
      sizeInBytes = req("sizeInBytes").asInt(),
      cardinality = req("cardinality").asLong())
  }

  /** On-disk location of a sidecar DV ('u': relative, table root +
    * optional random-prefix dir + `deletion_vector_<uuid>.bin`, uuid
    * z85-packed in the descriptor's last 20 chars; 'p': the absolute
    * path verbatim). Inline ('i') has no path — callers branch first. */
  def resolveFile(tableRoot: String, d: Descriptor): Path = d.storageType match {
    case "p" => new Path(d.pathOrInlineDv)
    case "u" =>
      require(d.pathOrInlineDv.length >= 20,
        s"storageType 'u' pathOrInlineDv '${d.pathOrInlineDv}' is shorter " +
          "than a z85 uuid — malformed descriptor")
      val prefix = d.pathOrInlineDv.dropRight(20)
      val uuidBytes = z85Decode(d.pathOrInlineDv.takeRight(20))
      val bb = ByteBuffer.wrap(uuidBytes) // big-endian: uuid msb, lsb
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(tableRoot, name)
      else new Path(new Path(tableRoot, prefix), name)
    case other => throw new IllegalArgumentException(
      s"deletionVector storageType '$other' is not u/i/p — refusing")
  }

  /** Slice one DV's bitmap bytes out of a sidecar file's content,
    * verifying the format version byte, the descriptor's declared size
    * against the stored size word, and the stored CRC-32. */
  def sliceBlob(fileBytes: Array[Byte], d: Descriptor, where: String): Array[Byte] = {
    require(fileBytes.nonEmpty && fileBytes(0) == 1,
      s"DV file $where: format version ${if (fileBytes.isEmpty) "<empty>"
        else fileBytes(0)} != 1 — refusing")
    val off = d.offset.getOrElse(throw new IllegalArgumentException(
      s"DV descriptor for $where stores in a file but has no offset — " +
        "malformed"))
    require(off >= 1 && off.toLong + 8 + d.sizeInBytes <= fileBytes.length,
      s"DV file $where: descriptor [offset=$off size=${d.sizeInBytes}] " +
        s"does not fit in ${fileBytes.length} bytes — refusing")
    val bb = ByteBuffer.wrap(fileBytes) // framing words are big-endian
    val storedSize = bb.getInt(off)
    require(storedSize == d.sizeInBytes,
      s"DV file $where: stored size $storedSize != descriptor " +
        s"sizeInBytes ${d.sizeInBytes} — refusing")
    val data = java.util.Arrays.copyOfRange(fileBytes, off + 4, off + 4 + storedSize)
    val crc = new CRC32
    crc.update(data)
    val storedCrc = bb.getInt(off + 4 + storedSize)
    require(storedCrc == crc.getValue.toInt,
      s"DV file $where: checksum mismatch (stored $storedCrc, computed " +
        s"${crc.getValue.toInt}) — refusing a corrupt deletion vector")
    data
  }

  /** Decode a DV's positions and hold the descriptor to its declared
    * cardinality — the one cross-check that catches a wrong-offset read
    * that still passes the CRC of a DIFFERENT valid DV in the same file. */
  def positions(bitmapBytes: Array[Byte], d: Descriptor,
                where: String): Array[Long] = {
    val p = deserialize(bitmapBytes)
    require(p.length == d.cardinality,
      s"DV for $where: decoded ${p.length} positions but descriptor " +
        s"declares cardinality ${d.cardinality} — refusing")
    p
  }

  // -------------------------------------------------- fixture-side write
  /** Write one sidecar DV file holding the given bitmaps ('u' layout:
    * version byte, then [size|data|crc32] per DV) and return each DV's
    * descriptor offset. Fixture/test writer. */
  def writeDvFile(fs: FileSystem, file: Path,
                  bitmaps: Seq[Array[Byte]]): Seq[Int] = {
    val offsets = new ArrayBuffer[Int]
    val out = fs.create(file, true)
    try {
      out.write(1) // format version
      var pos = 1
      bitmaps.foreach { data =>
        offsets += pos
        val crc = new CRC32
        crc.update(data)
        val bb = ByteBuffer.allocate(8 + data.length) // big-endian framing
        bb.putInt(data.length)
        bb.put(data)
        bb.putInt(crc.getValue.toInt)
        out.write(bb.array())
        pos += 8 + data.length
      }
    } finally out.close()
    offsets.toSeq
  }

  /** Descriptor JSON for an 'u'-stored DV whose file was named from
    * `uuid` (fixture-side twin of [[resolveFile]]). */
  def uDescriptorJson(uuid: java.util.UUID, offset: Int, sizeInBytes: Int,
                      cardinality: Long, prefix: String = ""): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val packed = prefix + z85Encode(bb.array())
    s"""{"storageType":"u","pathOrInlineDv":"$packed","offset":$offset,""" +
      s""""sizeInBytes":$sizeInBytes,"cardinality":$cardinality}"""
  }
}
