package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.query.Searcher

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry runs the engine on `sfDir`'s parquet tables; the
  * matching `oracleSql` entry is ANSI SQL DuckDB runs on the same tables.
  * Column names and ordering are aligned pairwise; float outputs are
  * quantized (see Engine.quantized) so cross-engine hashing is stable.
  */
object SparkEntry {

  /** Flagship (SURVEY.md §7.5): build the inverted index over the sf0.001
    * corpus, answer a BM25 top-10, map hits back to doc ids.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val h = Engine.indexFor(spark, sfDir)
    Engine.hitsAsDocIds(spark, h,
      Searcher.topK(spark, h, "spark merge", 10).toDF())
  }

  // ---- shared SQL fragments (DuckDB dialect) ------------------------------

  /** The Simple-mode tokenizer, transliterated (Analyzer.simple ≡ this). */
  private val toksCte =
    """toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
      |  FROM documents
      |), t2 AS (SELECT doc_id, term FROM toks WHERE term <> '')""".stripMargin

  /** Full BM25 pipeline over `documents` (Bm25.scala transliterated). */
  private def bm25Sql(terms: Seq[String], conjunctive: Boolean): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val having = if (conjunctive) s"HAVING count(*) = ${terms.distinct.size}" else ""
    s"""WITH $toksCte,
       |tft AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM t2 GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM t2 GROUP BY 1),
       |stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
       |                 (SELECT sum(dl) FROM dl) / (SELECT count(*) FROM documents)::DOUBLE AS avgdl),
       |dft AS (SELECT term, count(*)::DOUBLE AS df FROM tft GROUP BY 1),
       |scores AS (
       |  SELECT tft.doc_id AS doc_id,
       |         sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |              * tft.tf / (tft.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)) ) AS score
       |  FROM tft
       |  JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
       |  WHERE tft.term IN ($termList)
       |  GROUP BY 1 $having)
       |SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
       |FROM scores ORDER BY score_q DESC, doc_id""".stripMargin
  }

  // ---- engine-side query helpers ------------------------------------------

  private def bm25(spark: SparkSession, sfDir: String, q: String,
                   conjunctive: Boolean = false): DataFrame = {
    val h = Engine.indexFor(spark, sfDir)
    // exhaustive mode (k = ∞): membership is complete, so the DuckDB compare
    // is robust — rank-identity of true top-k is asserted in ScalaTest
    // against the naive oracle instead.
    Engine.hitsAsDocIds(spark, h,
      Searcher.topK(spark, h, q, Int.MaxValue, conjunctive).toDF())
  }

  // ---- driver contract ------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F10: full-text BM25 relevance, single term (postman "Filter … By Term" analog)
    "ft_bm25_single" -> ((s, dir) => bm25(s, dir, "spark")),
    // F10: multi-term disjunctive BM25 (Lucene `match` OR semantics)
    "ft_bm25_multi" -> ((s, dir) => bm25(s, dir, "spark merge window")),
    // F11: boolean conjunction (bool.must) with BM25 ranking
    "ft_bm25_and" -> ((s, dir) => bm25(s, dir, "join filter", conjunctive = true)),
    // F1/F11: exact term lookup → posting-list docIds
    "ft_term_lookup" -> { (s, dir) =>
      val h = Engine.indexFor(s, dir)
      val dm = h.docmeta(s).toDF()
      Searcher.termLookup(s, h, "customer")
        .join(dm.select(col("docId"),
          element_at(split(col("path"), "/"), 2).cast("long").as("doc_id")), "docId")
        .select(col("doc_id")).orderBy(col("doc_id"))
    },
    // docmeta invariants: N docs, token counts, sha256 ingest invariant
    "ft_docmeta" -> { (s, dir) =>
      val h = Engine.indexFor(s, dir)
      h.docmeta(s).toDF()
        .select(element_at(split(col("path"), "/"), 2).cast("long").as("doc_id"),
          col("dl").cast("long").as("dl"), col("sha256"))
        .orderBy(col("doc_id"))
    },
    // termstats: df per term (the broadcast side of every query)
    "ft_termstats" -> { (s, dir) =>
      val h = Engine.indexFor(s, dir)
      h.termstats(s).toDF().select(col("term"), col("df"))
        .orderBy(col("term"))
    },
  )

  def oracleSql: Map[String, String] = Map(
    "ft_bm25_single" -> bm25Sql(Seq("spark"), conjunctive = false),
    "ft_bm25_multi" -> bm25Sql(Seq("merge", "spark", "window"), conjunctive = false),
    "ft_bm25_and" -> bm25Sql(Seq("filter", "join"), conjunctive = true),
    "ft_term_lookup" ->
      s"""WITH $toksCte
         |SELECT DISTINCT doc_id FROM t2 WHERE term = 'customer' ORDER BY doc_id""".stripMargin,
    "ft_docmeta" ->
      s"""WITH $toksCte
         |SELECT d.doc_id AS doc_id, count(t2.term) AS dl, sha256(d.text) AS sha256
         |FROM documents d LEFT JOIN t2 ON d.doc_id = t2.doc_id
         |GROUP BY d.doc_id, d.text ORDER BY d.doc_id""".stripMargin,
    "ft_termstats" ->
      s"""WITH $toksCte
         |SELECT term, count(DISTINCT doc_id) AS df FROM t2 GROUP BY term ORDER BY term""".stripMargin,
  )
}
