package graft.query

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.Analyzer
import graft.index.{CorpusDoc, Hit, IndexBuilder}

/** Naive reference BM25 (SURVEY.md §5 item 2): tokenize → tf/df/dl/stats →
  * score — no index, no pruning. This is the rank oracle the WAND engine
  * must match **rank-identically** ((docId, score), score desc / docId asc),
  * and it is transliterated 1:1 into the DuckDB oracle SQL the driver runs.
  *
  * Summation per doc is in ascending term order (same as Wand.scoreDoc), so
  * scores are bit-identical doubles, not just approximately equal.
  */
object Oracle {

  def topK(spark: SparkSession, corpus: Dataset[CorpusDoc], query: String, k: Int,
           mode: Analyzer.Mode = Analyzer.Simple, conjunctive: Boolean = false): Dataset[Hit] = {
    import spark.implicits._
    val qTerms: Array[String] = Analyzer.tokens(query, mode).distinct.sorted
    if (qTerms.isEmpty) return spark.emptyDataset[Hit]

    val assigned = IndexBuilder.assignDocIds(spark, corpus,
      spark.sessionState.conf.numShufflePartitions)
    // (docId, term, tf, dl) — tf computed locally per doc (map-side combine)
    val tf = assigned.df.select($"docId", $"content").as[(Long, String)]
      .flatMap { case (id, content) =>
        val (tfs, dl) = Analyzer.termFreqs(content, mode)
        tfs.iterator.map { case (t, c) => (id, t, c, dl) }
      }.toDF("docId", "term", "tf", "dl").cache()
    try {
      val dlAgg = tf.select($"docId", $"dl").distinct()
        .agg(count(lit(1)), sum($"dl")).head()
      val n = dlAgg.getLong(0)
      val avgdl = dlAgg.getLong(1).toDouble / n.toDouble

      val dfMap: Map[String, Long] = tf.filter($"term".isin(qTerms: _*))
        .groupBy($"term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

      val nTerms = qTerms.length
      val hits = tf.filter($"term".isin(qTerms: _*))
        .as[(Long, String, Int, Int)]
        .groupByKey(_._1)
        .mapGroups { (docId, rows) =>
          val rs = rows.toArray.sortBy(_._2) // ascending term order
          var s = 0.0
          rs.foreach { case (_, t, c, dl) =>
            s += Bm25.idf(n, dfMap(t)) * Bm25.impact(c, dl, avgdl)
          }
          (docId, s, rs.length)
        }
        .filter(r => !conjunctive || r._3 == nTerms)
        .map(r => Hit(r._1, r._2))
      val ordered =
        if (k == Int.MaxValue) hits.orderBy($"score".desc, $"docId".asc)
        else hits.orderBy($"score".desc, $"docId".asc).limit(k)
      // materialize before unpersisting the scratch tf table
      ordered.cache().count()
      ordered
    } finally { tf.unpersist(); assigned.release() }
  }
}
