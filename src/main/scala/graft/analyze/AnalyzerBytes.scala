package graft.analyze

import org.apache.spark.unsafe.types.UTF8String

/** Byte-level tokenizer over UTF8String's UTF-8 bytes — the zero-copy twin
  * of [[Analyzer]] used by the `token_stats` codegen expression.
  *
  * Exact equivalence argument: [[Analyzer]] tokenizes maximal ASCII
  * alphanumeric runs (non-ASCII characters are separators). ASCII chars are
  * 1:1 with UTF-8 bytes; every byte of a non-ASCII character is ≥ 0x80 and
  * thus a separator byte. So byte-run tokenization produces exactly the
  * same tokens, without materializing the content as a java String (1 KB
  * copy per document) or the tokens as Strings (~100 objects per document).
  * Equivalence is property-tested in AnalyzerSpec.
  */
object AnalyzerBytes {

  /** (sorted unique terms, matching tfs, dl). Term order is UTF8String
    * binary order == Analyzer's String order for ASCII-only tokens.
    */
  def termFreqs(s: UTF8String, mode: String): (Array[UTF8String], Array[Int], Int) = {
    val tokens = tokenize(s, mode)
    val dl = tokens.length
    if (dl == 0) return (Array.empty, Array.empty, 0)
    java.util.Arrays.sort(tokens.asInstanceOf[Array[AnyRef]])
    var distinct = 1
    var i = 1
    while (i < dl) { if (!tokens(i).equals(tokens(i - 1))) distinct += 1; i += 1 }
    val terms = new Array[UTF8String](distinct)
    val tfs = new Array[Int](distinct)
    var j = 0
    var runStart = 0
    i = 1
    while (i <= dl) {
      if (i == dl || !tokens(i).equals(tokens(runStart))) {
        terms(j) = tokens(runStart)
        tfs(j) = i - runStart
        j += 1
        runStart = i
      }
      i += 1
    }
    (terms, tfs, dl)
  }

  def tokenize(s: UTF8String, mode: String): Array[UTF8String] = mode match {
    case "code" => code(s)
    case "tri-simple" => trigrams(simple(s))
    case "tri-code" => trigrams(code(s))
    case _ => simple(s)
  }

  private def utf8(buf: Array[Byte], len: Int): UTF8String =
    UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))

  /** Maximal [a-z0-9] runs after ASCII lowercasing; every other byte
    * (incl. all bytes of multi-byte chars) is a separator.
    */
  def simple(s: UTF8String): Array[UTF8String] = {
    val bytes = s.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var buf = new Array[Byte](16)
    var bl = 0
    def push(b: Byte): Unit = {
      if (bl == buf.length) buf = java.util.Arrays.copyOf(buf, bl * 2)
      buf(bl) = b
      bl += 1
    }
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z' || b >= '0' && b <= '9') push(b)
      else if (b >= 'A' && b <= 'Z') push((b + 32).toByte)
      else if (bl > 0) { out += utf8(buf, bl); bl = 0 }
      i += 1
    }
    if (bl > 0) out += utf8(buf, bl)
    out.toArray
  }

  /** camelCase/acronym/digit boundaries — byte-class twin of Analyzer.code. */
  def code(s: UTF8String): Array[UTF8String] = {
    val bytes = s.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var buf = new Array[Byte](16)
    var bl = 0
    def push(b: Byte): Unit = {
      if (bl == buf.length) buf = java.util.Arrays.copyOf(buf, bl * 2)
      buf(bl) = b
      bl += 1
    }
    def flush(): Unit = if (bl > 0) { out += utf8(buf, bl); bl = 0 }
    var prev = 0 // 0 sep, 1 lower, 2 upper, 3 digit
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val cls =
        if (b >= 'a' && b <= 'z') 1
        else if (b >= 'A' && b <= 'Z') 2
        else if (b >= '0' && b <= '9') 3
        else 0
      cls match {
        case 0 => flush()
        case 1 =>
          if (prev == 2 && bl > 1) {
            val last = buf(bl - 1)
            bl -= 1
            flush()
            push(last)
          } else if (prev == 3) flush()
          push(b)
        case 2 =>
          if (prev == 1 || prev == 3) flush()
          push((b + 32).toByte)
        case 3 =>
          if (prev == 1 || prev == 2) flush()
          push(b)
      }
      prev = cls
      i += 1
    }
    flush()
    out.toArray
  }

  /** Byte 3-grams per token (ASCII tokens → byte slices are char slices). */
  def trigrams(tokens: Array[UTF8String]): Array[UTF8String] =
    tokens.flatMap { t =>
      val b = t.getBytes
      if (b.length <= 3) Array(t)
      else Array.tabulate(b.length - 2)(i =>
        UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, i, i + 3)))
    }
}
