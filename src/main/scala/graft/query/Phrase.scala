package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.Analyzer
import graft.index.{Codec, IndexBuilder}

/** Index-backed phrase search over the OPTIONAL positional postings
  * (IndexBuilder.buildPositions): conjunctive block-max WAND produces the
  * scored candidates, and adjacency is verified against the per-(term, doc)
  * position lists — the source text is never re-read (the production
  * upgrade over the candidate-then-`contains` path, which remains as
  * `ft_phrase_search`). Reference analog: Lucene match_phrase over
  * positional postings (public behavior; the reference itself issues no
  * phrase queries).
  *
  * Scale shape: the positions scan is filter-pushed to the phrase's terms;
  * the adjacency check groups only those terms' rows by docId (each group
  * is |phrase| rows), so the shuffle is proportional to the phrase terms'
  * df — the same volume the conjunctive WAND already touched.
  */
object Phrase {

  def search(spark: SparkSession, h: IndexBuilder.Handle, phrase: String,
             k: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    // ONE snapshot for the whole query: the WAND candidates and the
    // positional verify must read the same (epoch, segment) state — a
    // compaction committing between the two would pair re-ranked candidate
    // docIds with the other state's position lists (ADVICE r3 item 1)
    val v = h.snapshot
    // token order matters for adjacency (topK internally dedupes for WAND)
    val terms: Array[String] = Analyzer.tokens(phrase, v.mode)
    // candidates must be exhaustive: limiting before the adjacency filter
    // would under-fill a finite k (the filter only removes rows)
    val scored = Searcher.topKSnap(spark, v, phrase, Int.MaxValue, conjunctive = true).toDF()
    if (terms.isEmpty) return scored
    val bTerms = spark.sparkContext.broadcast(terms)
    val matches = v.positionsAll(spark)
      .filter($"term".isin(terms.distinct.toSeq: _*))
      .groupByKey(_.docId)
      .flatMapGroups { (docId, it) =>
        val ts = bTerms.value
        val posOf = scala.collection.mutable.Map.empty[String, Array[Long]]
        it.foreach(r => posOf(r.term) = Codec.decodeDeltas(r.posDeltas, r.n, 0L))
        val ok = ts.forall(posOf.contains) && {
          val starts = posOf(ts.head)
          starts.exists { p =>
            var i = 1
            var all = true
            while (all && i < ts.length) {
              if (java.util.Arrays.binarySearch(posOf(ts(i)), p + i) < 0) all = false
              i += 1
            }
            all
          }
        }
        if (ok) Iterator.single(docId) else Iterator.empty
      }
      .toDF("docId")
    val out = scored.join(matches, "docId")
      .select(col("docId"), col("score"))
      .orderBy(desc("score"), col("docId"))
    if (k == Int.MaxValue) out else out.limit(k)
  }
}
