package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.Analyzer
import graft.index.IndexBuilder

/** Snippet extraction for search hits — the ES `highlight` analog (every
  * search UI over the reference's index shows the matching fragment, and
  * ES's plain highlighter re-analyzes the stored `_source` of just the
  * returned hits to find it).
  *
  * Same architecture choice as ES: the snippet comes from RE-ANALYZING the
  * hit documents' source text, not from inverting positional postings — a
  * token window needs the doc's full token SEQUENCE, which the positional
  * index stores shattered across every term's posting list; reconstructing
  * it would read ~dl postings per doc, while the source row is one pruned
  * join away and the analyzer pass is O(dl) either way. Cost therefore
  * scales with the HITS RETURNED (k source rows joined + analyzed), never
  * with the corpus; the join is an equi-join on doc_id that AQE broadcasts
  * for top-k hit sets.
  *
  * Semantics (deterministic, oracle-checkable): the fragment starts at the
  * FIRST occurrence (min token position) of any query term present in the
  * doc and spans `window` tokens of the analyzed stream, joined by a single
  * space. Docs matching the query but whose text yields no analyzed token
  * hit cannot occur (a hit means some term occurred).
  */
object Highlight {

  /** (doc_id, score_q, snippet) for every hit of `query` over the corpus
    * table `docs` ((doc_id, text)-shaped), ordered by (score_q desc,
    * doc_id). `k` bounds the hit set (Int.MaxValue = all matching docs —
    * the exhaustive oracle-compared form; production UIs pass page-sized
    * k, making the text join k rows).
    */
  def snippets(spark: SparkSession, h: IndexBuilder.Handle, docs: DataFrame,
               query: String, k: Int = Int.MaxValue, window: Int = 6): DataFrame = {
    import spark.implicits._
    val v = h.snapshot
    val terms: Set[String] = Analyzer.tokens(query, v.mode).toSet
    val hits = graft.Engine.hitsAsDocIds(spark, h,
      Searcher.topKSnap(spark, v, query, k, ranked = false).toDF(),
      ranked = false)
    val mode = v.mode
    val w = window
    hits.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("score_q"), col("text"))
      .as[(Long, Long, String)]
      .map { case (id, scoreQ, text) =>
        val toks = Analyzer.tokens(text, mode)
        var p0 = toks.length
        var i = 0
        while (i < toks.length && i < p0) {
          if (terms.contains(toks(i))) p0 = i
          i += 1
        }
        val snippet =
          if (p0 >= toks.length) "" // unreachable for true hits; loud-safe
          else toks.slice(p0, math.min(p0 + w, toks.length)).mkString(" ")
        (id, scoreQ, snippet)
      }
      .toDF("doc_id", "score_q", "snippet")
      .orderBy(desc("score_q"), col("doc_id"))
  }
}
