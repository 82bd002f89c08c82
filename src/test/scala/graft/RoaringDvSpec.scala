package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.RoaringDv

/** Byte-level fixtures for the protocol's deletion-vector binary format
  * (roaring portable + DV file framing) plus roundtrips across the
  * array/bitmap container boundary and the 32-bit key split. */
class RoaringDvSpec extends AnyFunSuite {

  test("serialize pins the exact portable layout for a tiny vector") {
    val bytes = RoaringDv.serialize(Array(1L, 3L, 70000L))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt == 1681511377, "magic")
    assert(bb.getLong == 1L, "one 32-bit bitmap (all positions < 2^32)")
    assert(bb.getInt == 12346, "no-run cookie")
    assert(bb.getInt == 2, "two containers: keys 0 and 1 (70000 = 1<<16 + 4464)")
    assert((bb.getShort & 0xffff) == 0 && (bb.getShort & 0xffff) == 1,
      "key 0 holds {1,3} (cardinality-1 = 1)")
    assert((bb.getShort & 0xffff) == 1 && (bb.getShort & 0xffff) == 0,
      "key 1 holds {4464} (cardinality-1 = 0)")
    val off0 = bb.getInt; val off1 = bb.getInt
    assert(off0 == 8 + 2 * 4 + 2 * 4, "first container right after offsets")
    assert(off1 == off0 + 4, "two uint16 values later")
    assert((bb.getShort & 0xffff) == 1 && (bb.getShort & 0xffff) == 3)
    assert((bb.getShort & 0xffff) == 70000 - 65536)
    assert(!bb.hasRemaining)
  }

  test("roundtrip across container types and the high-32 split") {
    val cases = Seq(
      Array(0L),
      Array(5L, 7L, 65535L, 65536L, 131071L),
      (0L until 5000L).toArray, // > 4096 -> bitmap container
      Array.tabulate(6000)(i => i * 11L), // bitmap container, sparse
      (0L until 3L).toArray ++ Array(1L << 32, (1L << 32) + 9L)) // two bitmaps
    cases.foreach { ps =>
      val got = RoaringDv.deserialize(RoaringDv.serialize(ps))
      assert(got.toSeq == ps.distinct.sorted.toSeq, s"case ${ps.take(5).toSeq}...")
    }
  }

  test("sparse high words serialize as empty bitmaps, not an error") {
    // gap: positions only in high words 0 and 2 — word 1 must be
    // written as an EMPTY 32-bit bitmap (array index IS the high word)
    val ps = Array(3L, (2L << 32) | 7L)
    val bytes = RoaringDv.serialize(ps)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt == 1681511377)
    assert(bb.getLong == 3L, "three 32-bit bitmaps: words 0, 1 (empty), 2")
    assert(RoaringDv.deserialize(bytes).toSeq == ps.toSeq)
    // also a vector starting above 2^32 entirely
    val high = Array((1L << 32) + 5L)
    assert(RoaringDv.deserialize(RoaringDv.serialize(high)).toSeq == high.toSeq)
  }

  test("padded z85 for inline payloads truncates to the descriptor size") {
    val data = RoaringDv.serialize(Array(1L, 3L, 70000L))
    val enc = RoaringDv.z85EncodePadded(data)
    assert(enc.length % 5 == 0)
    assert(RoaringDv.z85DecodeTo(enc, data.length).toSeq == data.toSeq)
    // wrong declared size fails loudly
    intercept[IllegalArgumentException](RoaringDv.z85DecodeTo(enc, data.length + 8))
  }

  test("run-container input parses (foreign-writer compatibility)") {
    // hand-build: run cookie, 1 container (card 5), runs [(10, len 4)]
    val bb = ByteBuffer.allocate(4 + 1 + 4 + 2 + 6).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(12347 | (0 << 16)) // 1 container -> size-1 = 0 in high bits
    bb.put(1.toByte) // run bitmap: container 0 is a run container
    bb.putShort(0.toShort).putShort(4.toShort) // key 0, cardinality-1 = 4
    // < 4 containers -> no offsets
    bb.putShort(1.toShort) // 1 run
    bb.putShort(10.toShort).putShort(4.toShort) // values 10..14
    val header = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    header.putInt(1681511377).putLong(1L)
    val got = RoaringDv.deserialize(header.array() ++ bb.array())
    assert(got.toSeq == Seq(10L, 11L, 12L, 13L, 14L))
  }

  test("z85 roundtrip and uuid-relative path derivation") {
    val uuid = java.util.UUID.fromString("0f5c6c16-9a6f-4c32-8e9f-1a2b3c4d5e6f")
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val enc = RoaringDv.z85Encode(bb.array())
    assert(enc.length == 20)
    assert(RoaringDv.z85Decode(enc).toSeq == bb.array().toSeq)
    assert(RoaringDv.relativeDvPath(enc) == s"deletion_vector_$uuid.bin")
    assert(RoaringDv.relativeDvPath("ab" + enc) ==
      s"ab/deletion_vector_$uuid.bin", "leading chars are the random prefix")
  }

  test("framing: version byte, big-endian sizes, checksum enforced") {
    val (file, descs) = RoaringDv.frame(Seq(Array(2L, 4L), Array(9L)))
    assert(file(0) == 1, "format version byte")
    assert(descs.size == 2 && descs.head._1 == 1L, "first DV right after version")
    assert(descs.map(_._3) == Seq(2L, 1L), "cardinalities")
    assert(RoaringDv.unframe(file, descs(0)._1, descs(0)._2).toSeq == Seq(2L, 4L))
    assert(RoaringDv.unframe(file, descs(1)._1, descs(1)._2).toSeq == Seq(9L))
    // flip one data byte -> checksum failure, never a silent misread
    val corrupt = file.clone(); corrupt(7) = (corrupt(7) ^ 0x1).toByte
    intercept[IllegalArgumentException](
      RoaringDv.unframe(corrupt, descs(0)._1, descs(0)._2))
  }
}
