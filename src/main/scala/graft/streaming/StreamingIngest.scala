package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.analyze.Analyzer
import graft.index.{Codec, CorpusDoc, PostingBlock}
import graft.query.Bm25

/** Live ingest (reference: `ingest` command, commands/ingest.go:22-54) —
  * the Go side is a 1-second poll loop with no checkpoint, no watermark,
  * and at-least-once duplicates on restart (its bulk path drops `_id`,
  * SURVEY.md §1.2). Re-expressed Spark-first as Structured Streaming:
  *
  *   readStream(corpus dir) → tokenize → per-batch posting-segment append
  *   with checkpointed offsets (exactly-once per micro-batch file source),
  *   plus a windowed-aggregation live metrics stream (the `stats` analog).
  *
  * Segment model: each micro-batch appends `postings/ingest=<batchId>/`
  * blocks keyed by (term, salt) — the same PostingBlock format the batch
  * index uses, so the query engine reads batch + streamed segments
  * uniformly. docIds for streamed docs are offset into a reserved range
  * per batch (baseDocId + batchId·capacity) — deterministic given the
  * batch contents, and disjoint from the batch index's dense ranks.
  */
object StreamingIngest {

  /** Streamed corpus source: parquet files arriving under `srcDir` with the
    * corpus schema. maxFilesPerTrigger=1 mirrors the reference's
    * one-ledger-per-iteration cadence (ingest.go:44-52).
    */
  def source(spark: SparkSession, srcDir: String): Dataset[CorpusDoc] = {
    import spark.implicits._
    spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[CorpusDoc].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .as[CorpusDoc]
  }

  /** Start the incremental index-append stream. Each micro-batch builds
    * posting blocks for its documents and appends them as a new segment;
    * offsets checkpoint to `checkpointDir`, so restart resumes exactly
    * where it left off — strictly stronger than the reference's
    * start-at-last-ledger heuristic (ingest.go:56-78, INGEST_GAP).
    */
  def startIndexAppend(spark: SparkSession, srcDir: String, indexDir: String,
                       checkpointDir: String, avgdl: Double, salts: Int = 4,
                       baseDocId: Long = 1L << 40): StreamingQuery = {
    import spark.implicits._
    source(spark, srcDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second")) // reference poll cadence
      .foreachBatch { (batch: Dataset[CorpusDoc], batchId: Long) =>
        appendSegment(spark, batch, batchId, indexDir, avgdl, salts, baseDocId)
        ()
      }
      .start()
  }

  /** One micro-batch → one posting segment. Deterministic within a batch:
    * docIds are the dense rank of (repo, path, commit) inside the batch,
    * offset into the batch's reserved id range.
    */
  private[streaming] def appendSegment(spark: SparkSession, batch: Dataset[CorpusDoc],
                                       batchId: Long, indexDir: String, avgdl: Double,
                                       salts: Int, baseDocId: Long): Unit = {
    import spark.implicits._
    if (batch.isEmpty) return
    val base = baseDocId + batchId * (1L << 20)
    val ranked = batch
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"repo", $"path", $"commit")) - 1)
      .as[(String, String, String, String, String, Int)]
    val tokens = ranked.flatMap { case (repo, path, commit, _, content, rk) =>
      val (tfs, dl) = Analyzer.termFreqs(content, Analyzer.Simple)
      val docId = base + rk
      val salt = (math.abs((repo + path + commit).hashCode) % salts)
      tfs.iterator.map { case (t, tf) => (t, salt, docId, tf, dl) }
    }.toDF("term", "salt", "docId", "tf", "dl")
    val blocks = tokens
      .repartition($"term", $"salt")
      .sortWithinPartitions($"term", $"salt", $"docId")
      .as[(String, Int, Long, Int, Int)]
      .mapPartitions { it =>
        buildStreamBlocks(it, avgdl)
      }
    blocks.write.mode("append").parquet(s"$indexDir/ingest_segments/batch=$batchId")
  }

  private def buildStreamBlocks(it: Iterator[(String, Int, Long, Int, Int)],
                                avgdl: Double): Iterator[PostingBlock] = {
    val grouped = it.toSeq.groupBy(t => (t._1, t._2))
    grouped.iterator.flatMap { case ((term, salt), rows) =>
      rows.sortBy(_._3).grouped(Codec.BlockSize).zipWithIndex.map { case (chunk, bi) =>
        val docs = chunk.map(_._3).toArray
        val tfs = chunk.map(_._4).toArray
        val dls = chunk.map(_._5).toArray
        val maxImp = tfs.zip(dls).map { case (tf, dl) => Bm25.impact(tf, dl, avgdl) }.max
        PostingBlock(term, salt, bi, docs.head, docs.last, docs.length,
          Codec.encodeDeltas(docs, docs.head), Codec.encodeInts(tfs),
          Codec.encodeInts(dls), maxImp)
      }
    }
  }

  /** Live metrics stream (the reference's `stats`/`es-stats` loop as a
    * real streaming agg): tumbling-window doc counts + byte volume with a
    * watermark for late data — none of which the reference has (SURVEY.md
    * §2 G: no watermark, no windows).
    */
  def liveMetrics(spark: SparkSession, srcDir: String): DataFrame = {
    import spark.implicits._
    source(spark, srcDir)
      .withColumn("arrival", current_timestamp())
      .withWatermark("arrival", "10 seconds")
      .groupBy(window($"arrival", "5 seconds"), $"lang")
      .agg(count(lit(1)).as("docs"), sum(length($"content")).as("bytes"))
  }
}
