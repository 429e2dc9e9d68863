package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.query.{Aggs, Lexicon, Searcher}

/** Term-dictionary query surface (Lexicon): SymSpell deletion-neighborhood
  * completeness vs brute-force Levenshtein, fuzzy search ≡ BM25 over the
  * hand-expanded term set, prefix-suggest pruning, more-like-this term
  * selection determinism, and the approximate-cardinality parity bound.
  */
class LexiconSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def vocab(): Array[(String, Long)] = {
    val h = Engine.indexFor(spark, sfDir)
    Lexicon.termDictionary(spark, h.snapshot)
      .collect().map(r => (r.getString(0), r.getLong(1)))
  }

  test("deletion neighborhood: d=1 and d=2 contents, including the empty key for 1-char strings") {
    assert(Lexicon.deletions("abc", 1).toSet == Set("abc", "bc", "ac", "ab"))
    assert(Lexicon.deletions("ab", 2).toSet == Set("ab", "a", "b", ""))
    assert(Lexicon.deletions("abcd", 2).toSet ==
      Set("abcd", "bcd", "acd", "abd", "abc", "cd", "bd", "bc", "ad", "ac", "ab"))
    // "" is REQUIRED: probe "b" must reach 1-char vocab term "a" (lev 1)
    // through the shared empty deletion key
    assert(Lexicon.deletions("a", 1).toSet == Set("a", ""))
  }

  test("SymSpell expansion == brute-force Levenshtein scan over the vocabulary (d=1 and d=2)") {
    val h = Engine.indexFor(spark, sfDir)
    val terms = vocab().map(_._1)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    // 1-char probes exercise the empty-deletion-key path (vocab contains
    // the 1-char term "a"); longer probes the general one
    for (d <- Seq(1, 2); probe <- Seq("spork", "strean", "scan", "windo", "xyzzy", "a", "b", "ab")) {
      val got = Lexicon.expandTerms(spark, h.snapshot, Seq(probe), maxDist = d,
        maxExpansions = 10000).getOrElse(probe, Seq.empty).toSet
      val want = terms.filter(t => lev(probe, t) <= d).toSet
      assert(got == want, s"probe=$probe d=$d: missed ${want -- got}, extra ${got -- want}")
    }
  }

  test("fuzzy search ≡ multi-term BM25 over the hand-expanded term set (bit-exact)") {
    val h = Engine.indexFor(spark, sfDir)
    val v = h.snapshot
    val expanded = Lexicon.expandTerms(spark, v, Seq("spork", "strean"), 1, 1000)
      .values.flatten.toSeq.distinct
    assert(expanded.nonEmpty, "probe typos should expand to vocab terms")
    val viaFuzzy = Lexicon.fuzzySearch(spark, h, "spork strean", Int.MaxValue)
      .collect().map(hh => (hh.docId, hh.score)).sorted.toSeq
    val viaTerms = Searcher.topKTermsSnap(spark, v, expanded, Int.MaxValue)
      .collect().map(hh => (hh.docId, hh.score)).sorted.toSeq
    assert(viaFuzzy == viaTerms)
  }

  test("conjunctive fuzzy: every ORIGINAL token matches via its own expansions (grouped bool-must)") {
    val h = Engine.indexFor(spark, sfDir)
    // singleton expansion groups: grouped conj ≡ literal conjunctive query
    val viaFuzzy = Lexicon.fuzzySearch(spark, h, "spork strean", Int.MaxValue,
        conjunctive = true)
      .collect().map(x => (x.docId, x.score)).sorted.toSeq
    val viaLit = Searcher.topK(spark, h, "spark stream", Int.MaxValue,
        conjunctive = true)
      .collect().map(x => (x.docId, x.score)).sorted.toSeq
    assert(viaFuzzy == viaLit && viaFuzzy.nonEmpty)
    // multi-expansion group: ground truth from the raw text — docs whose
    // token set intersects EVERY group; a flat conjunction over the union
    // must be a (typically strict) subset
    val v = h.snapshot
    val groups = Lexicon.expandTerms(spark, v, Seq("ort", "spork"), maxDist = 2,
      maxExpansions = 1000)
    assert(groups("ort").size > 1, s"need a multi-expansion group, got ${groups}")
    val g1 = groups("ort").toSet
    val g2 = groups("spork").toSet
    val gotIds = Engine.hitsAsDocIds(spark, h,
        Lexicon.fuzzySearch(spark, h, "ort spork", Int.MaxValue, maxDist = 2,
          maxExpansions = 1000, conjunctive = true).toDF(), ranked = false)
      .collect().map(_.getLong(0)).toSet
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().flatMap { r =>
        val toks = graft.analyze.Analyzer.tokens(r.getString(1),
          graft.analyze.Analyzer.Simple).toSet
        if (toks.exists(g1.contains) && toks.exists(g2.contains)) Some(r.getLong(0)) else None
      }.toSet
    assert(gotIds == want, s"missed ${want -- gotIds}, extra ${gotIds -- want}")
    val flat = Engine.hitsAsDocIds(spark, h,
        Searcher.topKTermsSnap(spark, v, (g1 ++ g2).toSeq, Int.MaxValue,
          conjunctive = true).toDF(), ranked = false)
      .collect().map(_.getLong(0)).toSet
    assert(flat.subsetOf(gotIds))
  }

  test("fuzzy expansion caps at maxExpansions by (df desc, term asc)") {
    val h = Engine.indexFor(spark, sfDir)
    val v = h.snapshot
    val all = Lexicon.expandTerms(spark, v, Seq("scan"), 2, 10000)("scan")
    if (all.size > 1) {
      val dfOf = vocab().toMap
      val top1 = Lexicon.expandTerms(spark, v, Seq("scan"), 2, 1)("scan")
      val want = all.sortBy(t => (-dfOf(t), t)).head // df desc, ties term asc
      assert(top1 == Seq(want), s"got $top1, want $want (of $all, dfs ${all.map(dfOf)})")
    }
  }

  test("wildcard: expansion ≡ brute regex over vocab, search ≡ expanded BM25, leading-* refused") {
    val h = Engine.indexFor(spark, sfDir)
    val v = h.snapshot
    val dict = vocab()
    for (pat <- Seq("s*", "f*r", "s?an", "stream", "s*x*")) {
      val re = pat.flatMap {
        case '*' => ".*"; case '?' => "."; case c => java.util.regex.Pattern.quote(c.toString)
      }
      val want = dict.map(_._1).filter(_.matches(re)).toSeq.sorted
      assert(Lexicon.wildcardTermsSnap(spark, v, pat) == want, s"pattern $pat")
    }
    // cap orders by (df desc, term asc) — same contract as fuzzy
    val byDf = dict.filter(_._1.startsWith("s")).sortBy { case (t, df) => (-df, t) }
    assert(byDf.length > 2)
    assert(Lexicon.wildcardTermsSnap(spark, v, "s*", maxExpansions = 2) ==
      byDf.take(2).map(_._1).toSeq.sorted)
    // search ≡ disjunctive BM25 over the hand-expanded set, bit-exact
    val xp = Lexicon.wildcardTermsSnap(spark, v, "s*")
    val got = Lexicon.wildcardSearch(spark, h, "s*", 10).collect()
    val want = Searcher.topKTermsSnap(spark, v, xp, 10).collect()
    assert(got.map(x => (x.docId, x.score)).toSeq ==
      want.map(x => (x.docId, x.score)).toSeq)
    intercept[IllegalArgumentException] {
      Lexicon.wildcardTermsSnap(spark, v, "*eam")
    }
    // a pattern matching nothing searches to empty, loudly not wrongly
    assert(Lexicon.wildcardSearch(spark, h, "zz*", 10).collect().isEmpty)
  }

  test("synonym search: OR-rewrite ≡ expanded BM25 bit-exact; AND = grouped membership; directional no-ops") {
    val h = Engine.indexFor(spark, sfDir)
    val v = h.snapshot
    val syn = Map("spark" -> Seq("stream"))
    // disjunctive ≡ multi-term BM25 over the expansion union
    val got = Lexicon.synonymSearch(spark, h, "spark merge", syn, Int.MaxValue)
      .collect().map(x => (x.docId, x.score)).sorted.toSeq
    val want = Searcher.topKTermsSnap(spark, v,
        Seq("spark", "stream", "merge"), Int.MaxValue)
      .collect().map(x => (x.docId, x.score)).sorted.toSeq
    assert(got == want && got.nonEmpty)
    // operator AND: membership ground truth from the raw text —
    // (spark OR stream) AND merge, scored over all matched expansions
    val gotIds = Engine.hitsAsDocIds(spark, h,
        Lexicon.synonymSearch(spark, h, "spark merge", syn, Int.MaxValue,
          conjunctive = true).toDF(), ranked = false)
      .collect().map(_.getLong(0)).toSet
    val wantIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect().flatMap { r =>
        val t = graft.analyze.Analyzer.tokens(r.getString(1),
          graft.analyze.Analyzer.Simple).toSet
        if ((t("spark") || t("stream")) && t("merge")) Some(r.getLong(0)) else None
      }.toSet
    assert(gotIds == wantIds && gotIds.nonEmpty)
    // directional: a synonym entry for a token NOT in the query is inert,
    // and an out-of-vocabulary synonym contributes nothing (df=0)
    val plain = Searcher.topK(spark, h, "merge", Int.MaxValue)
      .collect().map(x => (x.docId, x.score)).sorted.toSeq
    assert(Lexicon.synonymSearch(spark, h, "merge",
      Map("window" -> Seq("spark")), Int.MaxValue)
      .collect().map(x => (x.docId, x.score)).sorted.toSeq == plain)
    assert(Lexicon.synonymSearch(spark, h, "merge",
      Map("merge" -> Seq("zzzq")), Int.MaxValue)
      .collect().map(x => (x.docId, x.score)).sorted.toSeq == plain)
  }

  test("regexp: prefix plan, expansion ≡ brute anchored regex over vocab, unsound patterns refused") {
    val h = Engine.indexFor(spark, sfDir)
    val v = h.snapshot
    // mandatory-prefix extraction: quantified literals are NOT mandatory,
    // metachars end the prefix, escapes/classes don't open groups
    assert(Lexicon.regexpPlan("stream")._1 == "stream")
    assert(Lexicon.regexpPlan("s(p|t)[a-z]*")._1 == "s")
    assert(Lexicon.regexpPlan("ab*c")._1 == "a") // `ab*c` matches "ac"
    assert(Lexicon.regexpPlan("ab?c")._1 == "a")
    assert(Lexicon.regexpPlan("ab{0,2}c")._1 == "a")
    assert(Lexicon.regexpPlan("fil.er")._1 == "fil")
    assert(Lexicon.regexpPlan("a[bc]d")._1 == "a")
    // top-level alternation: arms need not share the prefix — refused
    intercept[IllegalArgumentException] { Lexicon.regexpPlan("spark|merge") }
    // parenthesized alternation is fine; class-embedded | is literal
    Lexicon.regexpPlan("s(park|tream)")
    val dict = vocab()
    for (pat <- Seq("s(p|t)[a-z]*", "st.*", "fil.er", "s(park|tream)", "merge")) {
      val want = dict.map(_._1)
        .filter(t => java.util.regex.Pattern.matches(s"(?:$pat)", t)).toSeq.sorted
      assert(Lexicon.regexpTermsSnap(spark, v, pat, 10000) == want,
        s"pattern $pat")
    }
    // no mandatory literal prefix = full dictionary scan — refused
    intercept[IllegalArgumentException] {
      Lexicon.regexpTermsSnap(spark, v, "[st]am")
    }
    intercept[IllegalArgumentException] {
      Lexicon.regexpTermsSnap(spark, v, ".*eam")
    }
    // search ≡ disjunctive BM25 over the hand-expanded set, bit-exact
    val xp = Lexicon.regexpTermsSnap(spark, v, "s(p|t)[a-z]*")
    assert(xp.nonEmpty)
    val got = Lexicon.regexpSearch(spark, h, "s(p|t)[a-z]*", 10).collect()
    val want = Searcher.topKTermsSnap(spark, v, xp, 10).collect()
    assert(got.map(x => (x.docId, x.score)).toSeq ==
      want.map(x => (x.docId, x.score)).toSeq)
    // cap orders by (df desc, term asc) — same contract as wildcard/fuzzy
    val byDf = dict.filter(t => t._1.matches("s(p|t)[a-z]*"))
      .sortBy { case (t, df) => (-df, t) }
    if (byDf.length > 1)
      assert(Lexicon.regexpTermsSnap(spark, v, "s(p|t)[a-z]*", maxExpansions = 1) ==
        byDf.take(1).map(_._1).toSeq)
    // a pattern matching nothing searches to empty, loudly not wrongly
    assert(Lexicon.regexpSearch(spark, h, "zz.*", 10).collect().isEmpty)
  }

  test("prefix suggest matches dictionary df and orders (df desc, term asc)") {
    val h = Engine.indexFor(spark, sfDir)
    val got = Lexicon.suggest(spark, h, "s", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = vocab().filter(_._1.startsWith("s"))
      .sortBy { case (t, df) => (-df, t) }.take(10).toSeq
    assert(got == want)
    // the scan is pruned: the pushed filter reaches the parquet source
    val plan = Lexicon.suggest(spark, h, "s", 10).queryExecution.executedPlan.toString
    assert(plan.contains("StartsWith"), s"prefix filter not pushed:\n$plan")
  }

  test("more-like-this terms: deterministic, quantized tf·idf ranking, source doc excluded by caller") {
    val h = Engine.indexFor(spark, sfDir)
    val v = h.snapshot
    val text = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") === 0L).select(col("text")).head().getString(0)
    val t1 = Lexicon.moreLikeThisTerms(spark, v, text, 5)
    val t2 = Lexicon.moreLikeThisTerms(spark, v, text, 5)
    assert(t1 == t2 && t1.size == 5 && t1.distinct.size == 5)
    // every selected term occurs in the source text's token stream
    val toks = graft.analyze.Analyzer.tokens(text, v.mode).toSet
    assert(t1.forall(toks.contains))
    // hits = BM25 over exactly those terms
    val viaMlt = Lexicon.moreLikeThis(spark, h, text, 5)
      .collect().map(hh => (hh.docId, hh.score)).sorted.toSeq
    val viaTerms = Searcher.topKTermsSnap(spark, v, t1, Int.MaxValue)
      .collect().map(hh => (hh.docId, hh.score)).sorted.toSeq
    assert(viaMlt == viaTerms)
  }

  test("fuzzy dict is fingerprint-stamped: a new index state mints a fresh dict dir") {
    val h = Engine.indexFor(spark, sfDir)
    val v = h.snapshot
    val dir = Lexicon.buildFuzzyDict(spark, v, 1)
    assert(graft.index.Fs.exists(s"$dir/_DONE"))
    assert(graft.index.Fs.readString(s"$dir/fingerprint").map(_.trim).contains(v.fingerprint))
    // same snapshot → same dir (no rebuild); the dir name carries the stamp
    assert(Lexicon.buildFuzzyDict(spark, v, 1) == dir)
    val v2 = v.copy(state = v.state.copy(fingerprint = v.fingerprint + ":other"))
    assert(Lexicon.fuzzyDictDir(v2, 1) != dir)
  }

  test("highlight snippets: fragment starts at first query-term occurrence, window-bounded, all hits covered") {
    import org.apache.spark.sql.functions.col
    val h = Engine.indexFor(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = graft.query.Highlight.snippets(spark, h, docs, "merge stream", window = 6)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    // ground truth driver-side
    val terms = Set("merge", "stream")
    val want = docs.select(col("doc_id"), col("text")).collect().flatMap { r =>
      val toks = graft.analyze.Analyzer.tokens(r.getString(1), graft.analyze.Analyzer.Simple)
      val p0 = toks.indexWhere(terms.contains)
      if (p0 < 0) None
      else Some(r.getLong(0) -> toks.slice(p0, math.min(p0 + 6, toks.length)).mkString(" "))
    }.toMap
    assert(got == want)
    assert(got.nonEmpty)
    got.values.foreach { s =>
      assert(s.nonEmpty && s.split(" ").length <= 6)
      assert(terms.contains(s.split(" ").head), s"fragment must start at a query term: '$s'")
    }
    // finite k: top-3 snippets are the exhaustive top-3
    val top3 = graft.query.Highlight.snippets(spark, h, docs, "merge stream", k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top3.length == 3 && top3.forall(got.contains))
  }

  test("approx cardinality within rsd bound of exact (HLL++ parity)") {
    val exact = Aggs.cardinality(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val approx = Aggs.cardinalityApprox(spark, sfDir, rsd = 0.02)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.10, s"group $k: exact $n approx $a")
    }
  }

  test("exact-rank percentiles: p0-style invariants against a driver-side sort") {
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val got = Aggs.percentiles(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got.foreach { case (flag, p25, p50, p75, p95) =>
      val vals = rows.filter(_._1 == flag).map(_._2).sorted
      def at(p: Int) = math.floor(vals(math.floor((vals.length - 1) * p / 100.0).toInt) * 10000 + 0.5).toLong
      assert((p25, p50, p75, p95) == (at(25), at(50), at(75), at(95)), s"group $flag")
    }
    assert(got.nonEmpty)
  }

  test("numeric histogram buckets match a driver-side recompute") {
    val vals = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("value")).collect().map(_.getDouble(0))
    val want = vals.groupBy(v => math.floor(v / 10.0).toLong * 10)
      .map { case (b, vs) =>
        (b, vs.length.toLong, math.floor(vs.sum / vs.length * 10000 + 0.5).toLong) }
      .toSeq.sorted
    val got = Aggs.histogram(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // buckets and counts are exact; the quantized avg tolerates ±1 — the
    // driver recompute sums linearly while Spark merges per-partition
    // partials, and a last-ulp difference can straddle the floor(+0.5)
    // boundary (the driver oracle's ORDER OF SUMMATION is not the spec)
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)))
    got.zip(want).foreach { case ((b, _, ga), (_, _, wa)) =>
      assert(math.abs(ga - wa) <= 1L, s"bucket $b avg_q $ga vs $wa")
    }
  }

  test("top_hits: per-bucket top-3 matches driver-side sort; window is hash-partitioned") {
    val rows = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 10000 + 0.5).toLong))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (et, vs) =>
      vs.sortBy(v => (-v._3, v._2)).take(3).zipWithIndex
        .map { case ((_, id, vq), i) => (et, (i + 1).toLong, id, vq) }
    }.sortBy(t => (t._1, t._2))
    val df = Aggs.topHits(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // the per-group cut must ride a hash exchange on the bucket key, not a
    // single global sort partition (the 100 TB shape claim)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(event_type"), plan.take(2000))
  }
}
