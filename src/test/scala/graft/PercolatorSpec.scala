package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Percolator

/** ES-percolator analog: matched (stored query, doc) pairs vs a
  * brute-force distinct-term-overlap scan, degenerate-query refusal, and
  * the broadcast join shape (the saved-search side must broadcast — the
  * doc side is the 100 TB side and must not shuffle into the join).
  */
class PercolatorSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("percolate ≡ brute-force distinct-term overlap; all/any/m-of-n/dup/unmatchable shapes") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val qs = Seq(
      ("q_all", Seq("spark", "merge"), 2),
      ("q_any", Seq("stream", "filter"), 1),
      ("q_mofn", Seq("spark", "window", "scan", "sort"), 2),
      ("q_dup", Seq("spark", "spark"), 1), // duplicate terms count ONCE
      ("q_nohit", Seq("spark", "zzz"), 2)) // zzz absent → 2 never reached
    val queries = qs.toDF("query_id", "terms", "min_match")
    val out = Percolator.percolate(spark, queries, docs)
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = docs.select("doc_id", "text").collect().flatMap { r =>
      val toks = r.getString(1).toLowerCase.split("[^a-z0-9]+")
        .filter(_.nonEmpty).toSet
      qs.collect { case (qid, terms, mm)
        if terms.distinct.count(toks.contains) >= mm => (qid, r.getLong(0)) }
    }.toSet
    assert(got == want && got.nonEmpty)
    assert(!got.exists(_._1 == "q_nohit"))
    assert(got.exists(_._1 == "q_dup"))
    // the stored-query side broadcasts; the doc side joins without an
    // exchange of its token stream into the join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("degenerate stored queries are refused loudly") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    intercept[IllegalArgumentException] {
      Percolator.percolate(spark,
        Seq(("bad", Seq("spark"), 0)).toDF("query_id", "terms", "min_match"),
        docs)
    }
    intercept[IllegalArgumentException] {
      // min_match over the DISTINCT term count is unsatisfiable
      Percolator.percolate(spark,
        Seq(("bad2", Seq("spark", "spark"), 2))
          .toDF("query_id", "terms", "min_match"),
        docs)
    }
  }
}
