package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.streaming.StreamingIngest

/** Streaming ingest (SURVEY.md §2 G): file-source micro-batches append
  * posting segments with checkpointed offsets; restart resumes without
  * duplicating (the failure mode the reference exhibits — no `_id` on
  * bulk, SURVEY.md §1.2).
  */
class StreamingSpec extends AnyFunSuite with SparkSuite {

  private def writeBatch(dir: String, docs: Seq[graft.index.CorpusDoc], name: String): Unit = {
    import spark.implicits._
    docs.toDS().coalesce(1).write.mode("append").parquet(dir)
    val _ = name
  }

  test("micro-batches append queryable posting segments; checkpoint resumes without duplicates") {
    import spark.implicits._
    val src = tmpDir("graft-stream-src")
    val idx = tmpDir("graft-stream-idx")
    val ckp = tmpDir("graft-stream-ckp")
    val docs = (0 until 60).map(i => Corpus.synthDoc(i, 7L))

    writeBatch(src, docs.slice(0, 30), "b0")
    val q1 = StreamingIngest.startIndexAppend(spark, src, idx, ckp, avgdl = 80.0)
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = spark.read.parquet(s"$idx/ingest_segments").count()
    assert(afterFirst > 0)

    // restart with one more file: only the new file is processed
    writeBatch(src, docs.slice(30, 60), "b1")
    val q2 = StreamingIngest.startIndexAppend(spark, src, idx, ckp, avgdl = 80.0)
    q2.processAllAvailable()
    q2.stop()

    val segs = spark.read.parquet(s"$idx/ingest_segments")
    // every streamed docId appears exactly once across all segments
    val docIds = segs.as[graft.index.PostingBlock].collect()
      .flatMap(b => graft.index.Codec.decodeDeltas(b.docDeltas, b.n, b.firstDocId))
    val perDocTerms = docIds.groupBy(identity)
    assert(perDocTerms.size == 60, s"expected 60 distinct streamed docs, got ${perDocTerms.size}")
    // restart without new data: nothing reprocessed
    val before = segs.count()
    val q3 = StreamingIngest.startIndexAppend(spark, src, idx, ckp, avgdl = 80.0)
    q3.processAllAvailable()
    q3.stop()
    assert(spark.read.parquet(s"$idx/ingest_segments").count() == before)
  }

  test("live windowed metrics stream with watermark produces per-lang counts") {
    val src = tmpDir("graft-stream-src2")
    writeBatch(src, (0 until 40).map(i => Corpus.synthDoc(i, 9L)), "b0")
    val q = StreamingIngest.liveMetrics(spark, src).writeStream
      .outputMode("update").format("memory").queryName("live_metrics").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT lang, sum(docs) AS docs FROM live_metrics GROUP BY lang")
      .collect()
    assert(rows.map(_.getLong(1)).sum == 40)
  }
}
