package graft.analyze

/** Code-aware tokenizer.
  *
  * The reference delegates analysis to Elasticsearch's Lucene analyzers
  * (es/indices.go declares `keyword`/`text` mappings; go.mod:8 pins ES 7.x).
  * We implement the analyzer natively. Two modes:
  *
  *  - [[Analyzer.Simple]]: lowercase + split on non-alphanumeric runs.
  *    Exactly expressible in ANSI SQL
  *    (`regexp_split_to_array(lower(text), '[^a-z0-9]+')`), so every
  *    oracle-checked query uses it — the DuckDB oracle and the engine
  *    tokenize identically.
  *  - [[Analyzer.Code]]: Simple plus camelCase / digit-boundary splitting
  *    (snake_case falls out of the non-alnum split). Mirrors what a
  *    source-code search analyzer does; used on the synthetic
  *    (repo, path, commit, lang, content) corpus.
  *  - [[Analyzer.trigrams]]: character 3-grams over tokens, the substring
  *    match path (reference analog: ES ngram filters, public Lucene
  *    behavior).
  *
  * All functions are pure and deterministic — they run identically in the
  * index build, the WAND query engine, and the naive oracle, which is a
  * precondition for rank-identity (SURVEY.md §7.4).
  */
object Analyzer extends Serializable {

  sealed trait Mode extends Serializable { def name: String }
  case object Simple extends Mode { val name = "simple" }
  case object Code extends Mode { val name = "code" }
  /** Character trigrams layered over a base token mode. */
  final case class Trigram(base: Mode) extends Mode { val name = s"tri-${base.name}" }

  /** Inverse of Mode.name (used to read a persisted index's analyzer back).
    * An unrecognized PERSISTED name fails loudly: silently defaulting to
    * Simple would search an index written by a newer build with the wrong
    * tokenizer — wrong results, no error (the exact failure class the
    * analyzer_mode file exists to prevent). Only a MISSING file defaults to
    * Simple (legacy indexes; IndexBuilder.openHandle).
    */
  def modeOf(name: String): Mode = name match {
    case "simple" => Simple
    case "code" => Code
    case "tri-simple" => Trigram(Simple)
    case "tri-code" => Trigram(Code)
    case other => throw new IllegalArgumentException(
      s"unrecognized analyzer mode '$other' — index written by a newer/incompatible build?")
  }

  /** Simple mode: `lower(text)` split on `[^a-z0-9]+`, empties dropped —
    * exactly the SQL tokenizer in SparkEntry.oracleSql, implemented as a
    * single char scan (the hot path runs per document per stage; regex
    * splitting measured ~4× slower). Non-ASCII characters are separators
    * (they are not [a-z0-9] after lowering; exotic case-folding exceptions
    * like U+212A are ignored — not representable in the corpus contract).
    */
  def simple(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Code mode: simple + camelCase/acronym/letter-digit boundaries, single
    * pass. Boundary rules (ASCII; non-ASCII = separator):
    *   fooBar → foo|bar;  HTTPServer → http|server (upper-run keeps its
    *   last char for the next token when a lower follows);  foo2 → foo|2;
    *   2bar → 2|bar;  snake_case splits at '_' (separator).
    */
  def code(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder(16)
    def flush(): Unit = if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
    var i = 0
    val n = text.length
    // char classes: 0 = separator, 1 = lower, 2 = upper, 3 = digit
    var prev = 0
    while (i < n) {
      val c = text.charAt(i)
      val cls =
        if (c >= 'a' && c <= 'z') 1
        else if (c >= 'A' && c <= 'Z') 2
        else if (c >= '0' && c <= '9') 3
        else 0
      cls match {
        case 0 => flush()
        case 1 =>
          // upper-run followed by lower: last upper starts this token
          if (prev == 2 && sb.length > 1) {
            val last = sb.charAt(sb.length - 1)
            sb.setLength(sb.length - 1)
            flush()
            sb.append(last)
          } else if (prev == 3) flush()
          sb.append(c)
        case 2 =>
          if (prev == 1 || prev == 3) flush()
          sb.append((c + 32).toChar)
        case 3 =>
          if (prev == 1 || prev == 2) flush()
          sb.append(c)
      }
      prev = cls
      i += 1
    }
    flush()
    out.toArray
  }

  /** Character 3-grams per token; tokens shorter than 3 pass through whole. */
  def trigrams(tokens: Array[String]): Array[String] =
    tokens.flatMap { t =>
      if (t.length <= 3) Array(t)
      else Array.tabulate(t.length - 2)(i => t.substring(i, i + 3))
    }

  def tokens(text: String, mode: Mode): Array[String] = mode match {
    case Simple => simple(text)
    case Code => code(text)
    case Trigram(base) => trigrams(tokens(text, base))
  }

  /** Per-document term frequencies, single local pass (map-side combine —
    * no (term, doc) shuffle rows beyond distinct terms). Returns
    * (termFreqs sorted by term, docLength). Sorted order makes downstream
    * iteration deterministic.
    */
  def termFreqs(text: String, mode: Mode): (Array[(String, Int)], Int) = {
    val ts = tokens(text, mode)
    val dl = ts.length
    if (dl == 0) return (Array.empty, 0)
    // sort + run-length count: no hash map, no boxed entries — this path
    // runs twice per document per build and dominates the allocation profile
    java.util.Arrays.sort(ts.asInstanceOf[Array[AnyRef]])
    var distinct = 1
    var i = 1
    while (i < dl) { if (ts(i) != ts(i - 1)) distinct += 1; i += 1 }
    val arr = new Array[(String, Int)](distinct)
    var j = 0
    var runStart = 0
    i = 1
    while (i <= dl) {
      if (i == dl || ts(i) != ts(runStart)) {
        arr(j) = (ts(runStart), i - runStart)
        j += 1
        runStart = i
      }
      i += 1
    }
    (arr, dl)
  }
}
