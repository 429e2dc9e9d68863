package graft.query

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.Analyzer
import graft.index.{Hit, IndexBuilder, PostingBlock}

/** Distributed BM25 top-k over the segmented index (SURVEY.md §3.3 Spark
  * restatement): broadcast term stats → per-salt-range DAAT/WAND inside
  * `flatMapGroups` → tiny global top-k merge.
  *
  * Why this scales: salts are disjoint docId ranges, so each group is a
  * self-contained sub-index — per-group top-k results are globally mergeable
  * without re-scoring, and the shuffle moving posting blocks to groups only
  * moves the query terms' blocks (the `term isin` filter is pushed to the
  * parquet scan, which prunes row groups via min/max stats on the sorted
  * `term` column). At 1000 executors this is: k small broadcasts + one
  * pruned scan + S-way parallel WAND + a k·S-row merge on the driver side
  * of a TakeOrderedAndProject.
  */
object Searcher {

  final case class QueryTermStat(term: String, idf: Double)

  // (N, avgdl) per index dir — constant once built; memoized to avoid one
  // Spark job per query
  private val statsCache = scala.collection.concurrent.TrieMap.empty[String, graft.index.IndexStats]

  /** Per-(term,salt) scorer construction from that group's blocks. */
  private def scorersFor(blocks: Seq[PostingBlock], stats: Map[String, Double],
                         avgdl: Double): Array[Wand.TermScorer] =
    blocks.groupBy(_.term).iterator.map { case (t, bs) =>
      new Wand.TermScorer(t, bs.sortBy(_.blockIdx).toArray, stats(t), avgdl)
    }.toArray.sortBy(_.term)

  /** Disjunctive (OR, the Lucene `match` default) BM25 top-k.
    * k = Int.MaxValue ⇒ exhaustive: every matching doc, ranked.
    */
  def topK(spark: SparkSession, h: IndexBuilder.Handle, query: String, k: Int,
           conjunctive: Boolean = false): Dataset[Hit] = {
    import spark.implicits._
    val terms = Analyzer.tokens(query, h.mode).distinct.sorted
    val st = statsCache.getOrElseUpdate(h.dir, h.stats(spark))
    val n = st.n
    val avgdl = st.avgdl
    if (terms.isEmpty) return spark.emptyDataset[Hit]
    // df per query term — collected (tiny: |q| rows) then broadcast to tasks
    val dfs: Map[String, Long] = h.termstats(spark)
      .filter($"term".isin(terms: _*))
      .collect().map(ts => ts.term -> ts.df).toMap
    val idfs: Map[String, Double] =
      terms.iterator.map(t => t -> Bm25.idf(n, dfs.getOrElse(t, 0L))).toMap
    val bIdfs = spark.sparkContext.broadcast(idfs)
    val conj = conjunctive
    val nTerms = terms.length

    val perSalt: Dataset[Hit] = h.postings(spark)
      .filter($"term".isin(terms: _*))
      .groupByKey(_.salt)
      .flatMapGroups { (_, it) =>
        val blocks = it.toSeq
        val scorers = scorersFor(blocks, bIdfs.value, avgdl)
        val hits =
          if (conj) {
            if (scorers.length < nTerms) Array.empty[(Long, Double)]
            else {
              val all = Wand.intersectAnd(scorers)
              if (k == Int.MaxValue) all
              else { val t = new Wand.TopK(k); all.foreach { case (d, s) => t.insert(s, d) }; t.result }
            }
          } else Wand.topKOr(scorers, k)
        hits.iterator.map { case (d, s) => Hit(d, s) }
      }
    // global merge: (score desc, docId asc); Catalyst plans this as
    // TakeOrderedAndProject when k is finite.
    if (k == Int.MaxValue) perSalt.orderBy($"score".desc, $"docId".asc)
    else perSalt.orderBy($"score".desc, $"docId".asc).limit(k)
  }

  /** Exact boolean term lookup (F1/F11): docIds containing `term`. */
  def termLookup(spark: SparkSession, h: IndexBuilder.Handle, term: String): DataFrame = {
    import spark.implicits._
    h.postings(spark)
      .filter($"term" === term)
      .flatMap { b =>
        graft.index.Codec.decodeDeltas(b.docDeltas, b.n, b.firstDocId).iterator
      }
      .toDF("docId")
      .orderBy($"docId")
  }
}
