package graft.index

import java.io.ByteArrayOutputStream

/** Varint + delta codec for posting lists.
  *
  * The reference delegates posting compression to Lucene (public knowledge:
  * FOR/varint blocks with skip data). We use unsigned LEB128 varints over
  * docId deltas — simple, compact for dense sorted ids, and cheap to decode
  * a block at a time. Block structure lives in
  * [[graft.index.PostingBlock]]: one row per ≤[[Codec.BlockSize]] postings,
  * carrying absolute `firstDocId` so blocks concatenate without re-encoding
  * (that property is what makes docId-range salting mergeable by
  * concatenation — SURVEY.md §7.4 item 3).
  */
object Codec {
  val BlockSize = 128

  def writeVarLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"varint requires non-negative, got $v0")
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode deltas of a strictly increasing long sequence (first value is
    * delta from `base`).
    */
  def encodeDeltas(xs: Array[Long], base: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(xs.length * 2)
    var prev = base
    var i = 0
    while (i < xs.length) {
      val d = xs(i) - prev
      require(d >= (if (i == 0) 0 else 1), s"sequence not increasing at $i")
      writeVarLong(out, d)
      prev = xs(i)
      i += 1
    }
    out.toByteArray
  }

  def decodeDeltas(bytes: Array[Byte], n: Int, base: Long): Array[Long] = {
    val out = new Array[Long](n)
    var prev = base
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      prev += v
      out(i) = prev
      i += 1
    }
    out
  }

  /** Plain varint array (for tf / dl values, no delta). */
  def encodeInts(xs: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream(xs.length)
    var i = 0
    while (i < xs.length) { writeVarLong(out, xs(i).toLong); i += 1 }
    out.toByteArray
  }

  def decodeInts(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      out(i) = v.toInt
      i += 1
    }
    out
  }
}
