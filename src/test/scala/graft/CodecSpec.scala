package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.Codec

class CodecSpec extends AnyFunSuite {

  test("property: delta encode/decode round-trips sorted distinct longs (300 seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 300) {
      val xs = Array.fill(1 + rnd.nextInt(400))(rnd.nextLong(1L << 40))
        .distinct.sorted
      val enc = Codec.encodeDeltas(xs, xs(0))
      assert(Codec.decodeDeltas(enc, xs.length, xs(0)).toSeq == xs.toSeq)
    }
  }

  test("property: int varint round-trip (300 seeded)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val xs = Array.fill(rnd.nextInt(300))(rnd.nextInt(Int.MaxValue))
      assert(Codec.decodeInts(Codec.encodeInts(xs), xs.length).toSeq == xs.toSeq)
    }
  }

  test("dense ids compress to ~1 byte per posting") {
    val xs = Array.tabulate(1000)(i => i.toLong * 2)
    val enc = Codec.encodeDeltas(xs, xs(0))
    assert(enc.length <= 1001)
  }

  test("encode rejects non-increasing input") {
    intercept[IllegalArgumentException] {
      Codec.encodeDeltas(Array(5L, 5L), 5L)
    }
  }
}
