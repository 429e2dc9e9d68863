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

  // Precompiled patterns; `\p{...}` classes keep unicode letters sane before
  // the ascii-ish final split.
  private val camelLowerUpper = "(\\p{Ll}|\\p{Nd})(\\p{Lu})".r // fooBar -> foo Bar
  private val camelAcronym = "(\\p{Lu}+)(\\p{Lu}\\p{Ll})".r // HTTPServer -> HTTP Server
  private val letterDigit = "(\\p{L})(\\p{Nd})".r // foo2 -> foo 2
  private val digitLetter = "(\\p{Nd})(\\p{L})".r // 2bar -> 2 bar
  private val nonAlnum = "[^a-z0-9]+"

  /** Simple mode: exactly `lower(text)` split on `[^a-z0-9]+`, empties
    * dropped. Must stay in lockstep with the SQL tokenizer in
    * SparkEntry.oracleSql.
    */
  def simple(text: String): Array[String] =
    text.toLowerCase.split(nonAlnum).filter(_.nonEmpty)

  /** Code mode: camelCase + acronym + letter/digit boundaries, then simple. */
  def code(text: String): Array[String] = {
    var s = camelAcronym.replaceAllIn(text, "$1 $2")
    s = camelLowerUpper.replaceAllIn(s, "$1 $2")
    s = letterDigit.replaceAllIn(s, "$1 $2")
    s = digitLetter.replaceAllIn(s, "$1 $2")
    simple(s)
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
    val m = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < ts.length) { m.merge(ts(i), 1, (a, b) => a + b); i += 1 }
    val arr = new Array[(String, Int)](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) { val e = it.next(); arr(j) = (e.getKey, e.getValue); j += 1 }
    java.util.Arrays.sort(arr, Ordering.by((p: (String, Int)) => p._1))
    (arr, ts.length)
  }
}
