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

  // Caches are keyed per SparkSession (graft.SessionCache — sweeps stopped
  // sessions, since Dataset values pin their session and defeat plain weak
  // keying) and per (dir, segment fingerprint): a newly ingested segment
  // changes the fingerprint and invalidates; stale same-dir entries are
  // evicted, not leaked.
  private val statsCache = new graft.SessionCache[(graft.index.IndexStats, Double)]
  private val postingsCache = new graft.SessionCache[Dataset[PostingBlock]]

  private def evictStale[T](m: scala.collection.concurrent.TrieMap[String, T],
                            dir: String, key: String)(clean: T => Unit): Unit =
    m.keys.filter(k => k.startsWith(s"$dir|") && k != key).foreach { stale =>
      m.remove(stale).foreach(clean)
    }

  // postings (batch ∪ completed streamed segments) kept hot per index —
  // a search engine keeps its index resident; repeated queries then pay
  // only the filter + WAND, not the parquet scan
  private def hotPostings(spark: SparkSession, h: IndexBuilder.Handle,
                          fp: String): Dataset[PostingBlock] = {
    val m = postingsCache(spark)
    val key = s"${h.dir}|$fp"
    m.getOrElseUpdate(key, {
      evictStale(m, h.dir, key)(_.unpersist(blocking = false))
      h.postingsAll(spark).cache()
    })
  }

  private def liveStats(spark: SparkSession, h: IndexBuilder.Handle,
                        fp: String): (graft.index.IndexStats, Double) = {
    val m = statsCache(spark)
    val key = s"${h.dir}|$fp"
    m.getOrElseUpdate(key, {
      evictStale(m, h.dir, key)(_ => ())
      h.liveStats(spark)
    })
  }

  /** Per-(term,salt) scorer construction from that group's blocks. */
  private def scorersFor(blocks: Seq[PostingBlock], stats: Map[String, Double],
                         avgdl: Double, boundFactor: Double): Array[Wand.TermScorer] =
    blocks.groupBy(_.term).iterator.map { case (t, bs) =>
      new Wand.TermScorer(t, bs.sortBy(_.blockIdx).toArray, stats(t), avgdl, boundFactor)
    }.toArray.sortBy(_.term)

  /** Σdf below which the coordinator executes the query itself over
    * collected blocks (one pruned-scan job, no shuffle) — the ES
    * coordinating-node analog. Above it, per-salt distributed WAND.
    */
  val DriverPathMaxPostings = 500000L

  /** Per-salt WAND over a block collection (salts are disjoint docId
    * ranges, so per-salt results merge without re-scoring).
    */
  private def saltWand(blocks: Iterable[PostingBlock], idfs: Map[String, Double],
                       avgdl: Double, k: Int, conj: Boolean, nTerms: Int,
                       boundFactor: Double = 1.0): Iterator[(Long, Double)] =
    blocks.groupBy(_.salt).iterator.flatMap { case (_, bs) =>
      val scorers = scorersFor(bs.toSeq, idfs, avgdl, boundFactor)
      if (conj) {
        if (scorers.length < nTerms) Iterator.empty
        else {
          val all = Wand.intersectAnd(scorers)
          if (k == Int.MaxValue) all.iterator
          else {
            val t = new Wand.TopK(k)
            all.foreach { case (d, s) => t.insert(s, d) }
            t.result.iterator
          }
        }
      } else Wand.topKOr(scorers, k).iterator
    }

  /** Disjunctive (OR, the Lucene `match` default) BM25 top-k.
    * k = Int.MaxValue ⇒ exhaustive: every matching doc, ranked.
    *
    * Execution is adaptive: small posting volume (Σdf over query terms) →
    * coordinator-side WAND over collected blocks (one job: pruned parquet
    * scan + collect); large → distributed per-salt WAND + global
    * TakeOrderedAndProject merge. Results are identical — salts are
    * disjoint sub-indexes either way.
    */
  def topK(spark: SparkSession, h: IndexBuilder.Handle, query: String, k: Int,
           conjunctive: Boolean = false,
           driverPathMaxPostings: Long = DriverPathMaxPostings): Dataset[Hit] = {
    import spark.implicits._
    val terms = Analyzer.tokens(query, h.mode).distinct.sorted
    val fp = h.segmentFingerprint
    val (st, boundFactor) = liveStats(spark, h, fp)
    val n = st.n
    val avgdl = st.avgdl
    if (terms.isEmpty) return spark.emptyDataset[Hit]
    // df per query term over batch ∪ segments — collected (tiny) then
    // broadcast to tasks
    val dfs: Map[String, Long] = h.dfFor(spark, terms)
    val idfs: Map[String, Double] =
      terms.iterator.map(t => t -> Bm25.idf(n, dfs.getOrElse(t, 0L))).toMap
    val conj = conjunctive
    val nTerms = terms.length
    val matching = hotPostings(spark, h, fp).filter($"term".isin(terms: _*))

    if (dfs.values.sum <= driverPathMaxPostings) {
      val hits = saltWand(matching.collect(), idfs, avgdl, k, conj, nTerms, boundFactor)
        .toArray.sortBy { case (d, s) => (-s, d) }
      val top = if (k == Int.MaxValue) hits else hits.take(k)
      spark.createDataset(top.toSeq.map { case (d, s) => Hit(d, s) })
    } else {
      val bIdfs = spark.sparkContext.broadcast(idfs)
      val perSalt: Dataset[Hit] = matching
        .groupByKey(_.salt)
        .flatMapGroups { (_, it) =>
          // one group = one salt = one disjoint docId range; materializing
          // it holds ≤ |query terms| · docsPerSalt postings (salt count
          // scales with N via IndexBuilder.effectiveSalts, so this bound —
          // and the query's parallelism — is set by config, not corpus size)
          saltWand(it.toSeq, bIdfs.value, avgdl, k, conj, nTerms, boundFactor)
            .map { case (d, s) => Hit(d, s) }
        }
      // global merge: (score desc, docId asc); Catalyst plans this as
      // TakeOrderedAndProject when k is finite.
      if (k == Int.MaxValue) perSalt.orderBy($"score".desc, $"docId".asc)
      else perSalt.orderBy($"score".desc, $"docId".asc).limit(k)
    }
  }

  /** Exact boolean term lookup (F1/F11): docIds containing `term`, over
    * batch ∪ streamed segments.
    */
  def termLookup(spark: SparkSession, h: IndexBuilder.Handle, term: String): DataFrame = {
    import spark.implicits._
    h.postingsAll(spark)
      .filter($"term" === term)
      .flatMap { b =>
        graft.index.Codec.decodeDeltas(b.docDeltas, b.n, b.firstDocId).iterator
      }
      .toDF("docId")
      .orderBy($"docId")
  }
}
