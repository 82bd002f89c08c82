package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** The deletion-vector BINARY format from the public Delta protocol
  * (PROTOCOL.md "Deletion Vector Format" + the RoaringFormatSpec it
  * references): 64-bit positions as a "RoaringBitmapArray" in portable
  * serialization —
  *
  *   magic 1681511377 (4B LE) · number of 32-bit bitmaps (8B LE) · each
  *   bitmap in the standard 32-bit roaring portable format, keyed by the
  *   position's high 32 bits in ascending order.
  *
  * 32-bit portable format written here: no-run cookie 12346 (4B LE),
  * container count (4B LE), descriptive headers (key 2B, cardinality-1
  * 2B), offsets (4B each), then containers — sorted uint16 arrays up to
  * 4096 values, 8 KiB bitsets above. The reader ALSO accepts the
  * run-container cookie (12347) so foreign writers' vectors parse.
  *
  * DV FILES (storageType 'p'/'u') frame one or more serialized vectors:
  * a format-version byte (1), then per vector
  *
  *   dataSize (4B BIG-endian) · data = magic + bitmaps · CRC-32 of data
  *   (4B big-endian)
  *
  * with the descriptor's `offset` pointing at the dataSize word and
  * `sizeInBytes` = dataSize. Byte-level fixtures in RoaringDvSpec pin
  * the exact layout.
  */
object RoaringDv {

  val Magic = 1681511377
  private val NoRunCookie = 12346
  private val RunCookie = 12347
  private val ArrayMax = 4096

  // ---- 64-bit RoaringBitmapArray ----

  /** Serialize sorted distinct non-negative positions. The array index
    * IS the high word (protocol), so absent high words up to the max key
    * are written as EMPTY 32-bit bitmaps — a gap (or any position >=
    * 2^32) must serialize, matching the reference RoaringBitmapArray. */
  def serialize(positions: Array[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "DV positions are non-negative")
    val sorted = positions.distinct.sorted
    val byHigh = sorted.groupBy(p => (p >>> 32).toInt)
    val nHigh = if (sorted.isEmpty) 0 else (sorted.last >>> 32).toInt + 1
    val out = new ByteArrayOutputStream()
    def le32(v: Int): Unit =
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v).array())
    le32(Magic)
    out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(nHigh.toLong).array())
    (0 until nHigh).foreach { hi =>
      val ps = byHigh.getOrElse(hi, Array.empty[Long])
      out.write(serialize32(ps.map(p => (p & 0xffffffffL).toInt)))
    }
    out.toByteArray
  }

  /** Parse a serialized RoaringBitmapArray back to sorted positions. */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic, s"bad RoaringBitmapArray magic $magic")
    val n = bb.getLong
    val out = Array.newBuilder[Long]
    var hi = 0L
    while (hi < n) {
      deserialize32(bb).foreach(v => out += (hi << 32) | (v & 0xffffffffL))
      hi += 1
    }
    out.result()
  }

  // ---- 32-bit roaring portable ----

  private def serialize32(values: Array[Int]): Array[Byte] = {
    val byKey = values.map(v => v & 0xffffffff)
      .groupBy(v => (v >>> 16) & 0xffff).toSeq.sortBy(_._1)
      .map { case (k, vs) => k -> vs.map(_ & 0xffff).distinct.sorted }
    val out = new ByteArrayOutputStream()
    val header = ByteBuffer.allocate(8 + byKey.size * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    header.putInt(NoRunCookie).putInt(byKey.size)
    byKey.foreach { case (k, vs) =>
      header.putShort(k.toShort).putShort((vs.length - 1).toShort)
    }
    out.write(header.array())
    // offsets: absolute byte positions of each container's data
    val offBuf = ByteBuffer.allocate(byKey.size * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    var off = 8 + byKey.size * 4 + byKey.size * 4
    val containers = byKey.map { case (_, vs) =>
      val c =
        if (vs.length <= ArrayMax) {
          val b = ByteBuffer.allocate(vs.length * 2)
            .order(ByteOrder.LITTLE_ENDIAN)
          vs.foreach(v => b.putShort(v.toShort))
          b.array()
        } else {
          val bits = new Array[Long](1024)
          vs.foreach(v => bits(v >>> 6) |= (1L << (v & 63)))
          val b = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
          bits.foreach(b.putLong)
          b.array()
        }
      offBuf.putInt(off)
      off += c.length
      c
    }
    out.write(offBuf.array())
    containers.foreach(out.write)
    out.toByteArray
  }

  /** Parse one 32-bit roaring bitmap starting at the buffer position;
    * advances the buffer past it. Accepts array, bitmap, and (for
    * foreign writers) run containers under either cookie. */
  private def deserialize32(bb: ByteBuffer): Array[Int] = {
    val start = bb.position()
    val cookieWord = bb.getInt
    val cookie = cookieWord & 0xffff
    val (nContainers, runBitmap) = cookie match {
      case NoRunCookie => (bb.getInt, Array.empty[Byte])
      case RunCookie =>
        val n = ((cookieWord >>> 16) & 0xffff) + 1
        val rb = new Array[Byte]((n + 7) / 8)
        bb.get(rb)
        (n, rb)
      case c => throw new IllegalStateException(s"bad roaring cookie $c")
    }
    def isRun(i: Int): Boolean =
      runBitmap.nonEmpty && (runBitmap(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    (0 until nContainers).foreach { i =>
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
    }
    // offsets present: always for the no-run cookie, and for the run
    // cookie once there are >= 4 containers
    val hasOffsets = cookie == NoRunCookie ||
      (cookie == RunCookie && nContainers >= 4)
    val offsets =
      if (hasOffsets) (0 until nContainers).map(_ => bb.getInt).toArray
      else Array.empty[Int]
    val out = Array.newBuilder[Int]
    (0 until nContainers).foreach { i =>
      if (hasOffsets) bb.position(start + offsets(i))
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = bb.getShort & 0xffff
        (0 until nRuns).foreach { _ =>
          val s = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff
          (s to s + len).foreach(v => out += (base | v))
        }
      } else if (cards(i) <= ArrayMax) {
        (0 until cards(i)).foreach(_ => out += (base | (bb.getShort & 0xffff)))
      } else {
        (0 until 1024).foreach { w =>
          val bits = bb.getLong
          (0 until 64).foreach(b =>
            if ((bits & (1L << b)) != 0) out += (base | (w * 64 + b)))
        }
      }
    }
    out.result()
  }

  // ---- DV file framing ----

  /** Frame one or more vectors into DV-file bytes. Returns the file
    * bytes plus each vector's (offset, sizeInBytes, cardinality) in
    * input order. */
  def frame(vectors: Seq[Array[Long]]): (Array[Byte], Seq[(Long, Long, Long)]) =
    frameSerialized(vectors.map(ps => serialize(ps) -> ps.distinct.length.toLong))

  /** [[frame]] over ALREADY-serialized vectors (data, cardinality) —
    * callers that split small vectors off for inline storage serialize
    * each vector exactly once. */
  def frameSerialized(vectors: Seq[(Array[Byte], Long)])
      : (Array[Byte], Seq[(Long, Long, Long)]) = {
    val out = new ByteArrayOutputStream()
    out.write(1) // format version
    val descs = vectors.map { case (data, card) =>
      val offset = out.size().toLong
      out.write(ByteBuffer.allocate(4).putInt(data.length).array()) // BE
      out.write(data)
      val crc = new CRC32(); crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      (offset, data.length.toLong, card)
    }
    (out.toByteArray, descs)
  }

  // ---- storageType 'u' path derivation ----

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Index: Map[Char, Int] =
    Z85Alphabet.zipWithIndex.toMap

  /** z85-encode (ZeroMQ base85: 4 bytes → 5 chars, big-endian). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "z85 input must be a multiple of 4 bytes")
    bytes.grouped(4).map { g =>
      var v = g.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      val out = new Array[Char](5)
      (4 to 0 by -1).foreach { i => out(i) = Z85Alphabet((v % 85).toInt); v /= 85 }
      new String(out)
    }.mkString
  }

  /** z85-decode (ZeroMQ base85: 5 chars → 4 bytes, big-endian). */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length must be a multiple of 5: $s")
    s.grouped(5).flatMap { g =>
      val v = g.foldLeft(0L)((acc, c) => acc * 85 +
        Z85Index.getOrElse(c,
          throw new IllegalArgumentException(s"bad z85 char '$c' in $s")))
      Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    }.toArray
  }

  /** z85-encode arbitrary-length bytes: the last 4-byte group is
    * zero-padded (standard writers' base85 codec does the same for
    * inline DV payloads); the true length travels in the descriptor's
    * `sizeInBytes`, so [[z85DecodeTo]] can truncate the padding away. */
  def z85EncodePadded(bytes: Array[Byte]): String = {
    val rem = bytes.length % 4
    z85Encode(if (rem == 0) bytes else bytes ++ new Array[Byte](4 - rem))
  }

  /** z85-decode to EXACTLY `outLen` bytes (an inline descriptor's
    * `sizeInBytes`), dropping the encoder's zero padding. */
  def z85DecodeTo(s: String, outLen: Int): Array[Byte] = {
    val all = z85Decode(s)
    require(outLen <= all.length && all.length - outLen < 4,
      s"inline DV length mismatch: descriptor says $outLen bytes, " +
        s"payload decodes to ${all.length}")
    all.take(outLen)
  }

  /** Resolve a storageType-'u' `pathOrInlineDv` (an optional random
    * prefix followed by the z85-encoded 16-byte UUID — the protocol's
    * RELATIVE, relocatable DV reference, the form standard Delta
    * writers emit) to its file under the table root:
    * `<tablePath>/<prefix>/deletion_vector_<uuid>.bin`. */
  def relativeDvPath(pathOrInlineDv: String): String = {
    require(pathOrInlineDv.length >= 20,
      s"storageType 'u' value too short: $pathOrInlineDv")
    val (prefix, enc) = pathOrInlineDv.splitAt(pathOrInlineDv.length - 20)
    val bytes = z85Decode(enc)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    (if (prefix.nonEmpty) s"$prefix/" else "") + s"deletion_vector_$uuid.bin"
  }

  /** Read one vector out of DV-file bytes at `offset` (checksum
    * verified — a corrupt vector must fail loudly, never read as
    * fewer deletions). */
  def unframe(file: Array[Byte], offset: Long, sizeInBytes: Long): Array[Long] = {
    val bb = ByteBuffer.wrap(file)
    bb.position(offset.toInt)
    val size = bb.getInt // big-endian
    require(size == sizeInBytes.toInt,
      s"DV size mismatch at offset $offset: file says $size, descriptor $sizeInBytes")
    val data = new Array[Byte](size)
    bb.get(data)
    val crcWant = bb.getInt
    val crc = new CRC32(); crc.update(data)
    require(crc.getValue.toInt == crcWant,
      s"DV checksum mismatch at offset $offset")
    deserialize(data)
  }
}
