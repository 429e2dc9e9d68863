package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.Analyzer
import graft.query.Bm25

/** Inverted-index build pipeline (SURVEY.md §7.2 M2–M4, north rule).
  *
  * Stages (each a checkpointed table under `indexDir/` with lineage rows —
  * a failed/killed build resumes at the first incomplete stage):
  *
  *   corpus ──► docmeta  (docId assignment + dl + sha256)
  *          ──► stats    (N, avgdl — needed before postings: maxImpact)
  *          ──► postings (salted repartition → sortWithinPartitions →
  *                        one-pass block build in mapPartitions)
  *          ──► termstats(df per term + global term max impact)
  *
  * Scale design notes (the 100 TB story):
  *  - docIds are a global dense rank over the unique key
  *    (repo, path, commit): one range-shuffle sort + a count-per-partition
  *    pass (`zipWithIndex`) — the standard two-pass scalable pattern. Never
  *    partition-derived → identical ids at any parallelism (§7.4 item 1).
  *  - tokenization computes per-doc tf locally (map-side combine): shuffle
  *    rows = distinct (term, doc) pairs, not token occurrences.
  *  - salt = docId-range bucket: a hot term ("the") is split across S
  *    contiguous docId ranges, so no reducer owns a whole Zipfian list, and
  *    the per-(term,salt) partials concatenate into the global list with
  *    zero re-encoding (blocks carry absolute firstDocId). Query-side, the
  *    same salt ranges are independent sub-indexes → per-salt WAND + tiny
  *    global top-k merge.
  *  - postings write is sorted by (term, salt, blockIdx) → parquet min/max
  *    column stats prune term lookups at scan time (the built-in analog of a
  *    term dictionary; at real scale this is an Iceberg table sorted on
  *    `term` with the same effect).
  */
object IndexBuilder {

  /** Tuning knobs. `salts` bounds per-reducer hot-term list size;
    * `partitions` is the shuffle width (set ≈ cluster cores).
    */
  final case class Config(salts: Int = 8, partitions: Int = 0,
                          mode: Analyzer.Mode = Analyzer.Simple)

  final case class Handle(dir: String, mode: Analyzer.Mode) {
    def docmeta(spark: SparkSession): Dataset[DocMeta] = {
      import spark.implicits._
      spark.read.parquet(s"$dir/docmeta").as[DocMeta]
    }
    def postings(spark: SparkSession): Dataset[PostingBlock] = {
      import spark.implicits._
      spark.read.parquet(s"$dir/postings").as[PostingBlock]
    }
    def termstats(spark: SparkSession): Dataset[TermStat] = {
      import spark.implicits._
      spark.read.parquet(s"$dir/termstats").as[TermStat]
    }
    def stats(spark: SparkSession): IndexStats = {
      import spark.implicits._
      spark.read.parquet(s"$dir/stats").as[IndexStats].head()
    }
    def lineage(spark: SparkSession): Dataset[LineageRow] = {
      import spark.implicits._
      spark.read.parquet(s"$dir/lineage/*").as[LineageRow]
    }
  }

  /** Deterministic docId assignment: dense rank over the unique sort key.
    * Two jobs sharing one shuffle (zipWithIndex = count pass + index pass on
    * the same RDD, shuffle files reused). RDD is justified here: Spark has
    * no global-rank primitive that avoids a single-partition window.
    */
  def assignDocIds(spark: SparkSession, corpus: Dataset[CorpusDoc], partitions: Int): Dataset[(Long, CorpusDoc)] = {
    import spark.implicits._
    val sorted = corpus
      .repartitionByRange(partitions, $"repo", $"path", $"commit")
      .sortWithinPartitions($"repo", $"path", $"commit")
    sorted.rdd.zipWithIndex().map { case (d, i) => (i, d) }.toDS()
  }

  private def hashRow(parts: Any*): Long =
    scala.util.hashing.MurmurHash3.orderedHash(parts).toLong

  /** Build (or resume) the full index at `dir`. Idempotent: stages whose
    * lineage validates are skipped; otherwise recomputed and atomically
    * replaced (parquet overwrite = write-then-swap per directory).
    */
  def build(spark: SparkSession, corpus: Dataset[CorpusDoc], dir: String,
            cfg: Config = Config()): Handle = {
    import spark.implicits._
    val parts = if (cfg.partitions > 0) cfg.partitions
      else spark.sessionState.conf.numShufflePartitions
    val mode = cfg.mode
    val fs = new java.io.File(dir)
    fs.mkdirs()

    // ---- stage 1: docmeta -------------------------------------------------
    val docmetaDone = stageComplete(spark, dir, "docmeta")
    if (!docmetaDone) {
      val withIds = assignDocIds(spark, corpus, parts)
      val meta = withIds.map { case (id, d) =>
        val (_, dl) = Analyzer.termFreqs(d.content, mode)
        DocMeta(id, d.repo, d.path, d.commit, d.lang,
          dl, sha256Hex(d.content))
      }
      meta.write.mode("overwrite").parquet(s"$dir/docmeta")
      writeLineage(spark, dir, "docmeta",
        spark.read.parquet(s"$dir/docmeta")
          .select($"docId", $"docId".as("docIdMax"), lit(1L).as("terms"),
            xxhash64($"docId", $"commit", $"sha256").as("h"), lit(8L).as("bytes")))
    }

    // ---- stage 2: stats ---------------------------------------------------
    if (!stageComplete(spark, dir, "stats")) {
      val dm = spark.read.parquet(s"$dir/docmeta")
      val row = dm.agg(count(lit(1)), sum($"dl"), avg($"dl".cast("double"))).head()
      val n = row.getLong(0)
      val tot = row.getLong(1)
      // avgdl defined as sum/count in double — transliterated identically in
      // the oracle SQL (DuckDB avg over ints computes the same).
      val st = IndexStats(n, tot.toDouble / n.toDouble, tot)
      Seq(st).toDS().write.mode("overwrite").parquet(s"$dir/stats")
      writeLineage(spark, dir, "stats",
        Seq((0L, n - 1, 1L, n ^ tot, 24L)).toDF("docId", "docIdMax", "terms", "h", "bytes"))
    }
    val st = spark.read.parquet(s"$dir/stats").as[IndexStats].head()
    val n = st.n
    val avgdl = st.avgdl
    val salts = cfg.salts

    // ---- stage 3: postings ------------------------------------------------
    if (!stageComplete(spark, dir, "postings")) {
      // docIds are deterministic (data-derived), so re-running the
      // assignment here yields exactly the ids persisted in docmeta —
      // cheaper than a 3-string-key shuffle join of docmeta back to corpus.
      val withIds = assignDocIds(spark, corpus, parts)
      val tokens: Dataset[TermDoc] = withIds.flatMap { case (id, d) =>
        val (tfs, dl) = Analyzer.termFreqs(d.content, mode)
        val salt = saltOf(id, n, salts)
        tfs.iterator.map { case (t, tf) => TermDoc(t, salt, id, tf, dl) }
      }
      val blocks = tokens
        .repartition(parts, $"term", $"salt")
        .sortWithinPartitions($"term", $"salt", $"docId")
        .mapPartitions(buildBlocks(_, avgdl))
      blocks.write.mode("overwrite").parquet(s"$dir/postings")
      writeLineage(spark, dir, "postings",
        spark.read.parquet(s"$dir/postings")
          .select($"firstDocId".as("docId"), $"lastDocId".as("docIdMax"),
            lit(1L).as("terms"), xxhash64($"term", $"salt", $"blockIdx", $"docDeltas").as("h"),
            (length($"docDeltas") + length($"tfs") + length($"dls")).cast("long").as("bytes")))
    }

    // ---- stage 4: termstats ----------------------------------------------
    if (!stageComplete(spark, dir, "termstats")) {
      val po = spark.read.parquet(s"$dir/postings")
      po.groupBy($"term")
        .agg(sum($"n").cast("long").as("df"), max($"maxImpact").as("maxImpact"))
        .as[TermStat]
        .write.mode("overwrite").parquet(s"$dir/termstats")
      writeLineage(spark, dir, "termstats",
        spark.read.parquet(s"$dir/termstats")
          .select(lit(0L).as("docId"), lit(0L).as("docIdMax"), lit(1L).as("terms"),
            xxhash64($"term", $"df").as("h"), lit(16L).as("bytes")))
    }

    Handle(dir, mode)
  }

  def saltOf(docId: Long, n: Long, salts: Int): Int =
    math.min(((docId * salts) / math.max(n, 1L)).toInt, salts - 1)

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** One-pass block builder over a (term, salt, docId)-sorted partition.
    * Pure streaming: holds at most one block (128 postings) in memory.
    */
  private def buildBlocks(it: Iterator[TermDoc], avgdl: Double): Iterator[PostingBlock] =
    new Iterator[PostingBlock] {
      private val in = it.buffered
      private var blockIdxFor: (String, Int) = null
      private var blockIdx = 0
      def hasNext: Boolean = in.hasNext
      def next(): PostingBlock = {
        val head = in.head
        val key = (head.term, head.salt)
        if (key != blockIdxFor) { blockIdxFor = key; blockIdx = 0 }
        val docs = new Array[Long](Codec.BlockSize)
        val tfs = new Array[Int](Codec.BlockSize)
        val dls = new Array[Int](Codec.BlockSize)
        var m = 0
        var maxImp = 0.0
        while (m < Codec.BlockSize && in.hasNext &&
               in.head.term == key._1 && in.head.salt == key._2) {
          val td = in.next()
          docs(m) = td.docId; tfs(m) = td.tf; dls(m) = td.dl
          val imp = Bm25.impact(td.tf, td.dl, avgdl)
          if (imp > maxImp) maxImp = imp
          m += 1
        }
        val d = java.util.Arrays.copyOf(docs, m)
        val t = java.util.Arrays.copyOf(tfs, m)
        val l = java.util.Arrays.copyOf(dls, m)
        val out = PostingBlock(key._1, key._2, blockIdx, d(0), d(m - 1), m,
          Codec.encodeDeltas(d, d(0)), Codec.encodeInts(t), Codec.encodeInts(l), maxImp)
        blockIdx += 1
        out
      }
    }

  // ---- lineage / resume ----------------------------------------------------

  /** Lineage rows are derived from the *written* table (not the in-flight
    * job), so a validated stage is provably on disk; the marker file is
    * written last → crash between data and marker ⇒ stage recomputes
    * (SURVEY.md §7.4 item 5: never trust file existence alone).
    */
  private def writeLineage(spark: SparkSession, dir: String, stage: String,
                           perRow: DataFrame): Unit = {
    import spark.implicits._
    val agg = perRow
      .withColumn("pid", spark_partition_id())
      .groupBy($"pid")
      .agg(min($"docId").as("docIdMin"), max($"docIdMax").as("docIdMax"),
        sum($"terms").cast("long").as("termCount"), count(lit(1)).as("rows"),
        sum($"bytes").cast("long").as("bytes"),
        expr("bit_xor(h)").as("contentHash"))
      .select(lit(stage).as("stage"), $"pid".as("partitionId"), $"docIdMin",
        $"docIdMax", $"termCount", $"rows", $"bytes", $"contentHash")
      .as[LineageRow]
    // One lineage directory per stage, overwritten on recompute — so a
    // retried stage never leaves stale lineage that would break validation.
    agg.write.mode("overwrite").parquet(s"$dir/lineage/$stage")
    touch(s"$dir/_STAGE_$stage")
  }

  private def touch(path: String): Unit = {
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, Array.emptyByteArray)
  }

  /** A stage is complete iff its marker exists AND its lineage rows exist
    * AND the written table's row count matches the lineage row count — the
    * stats-command reconciliation analog (commands/stats.go:44-64).
    */
  def stageComplete(spark: SparkSession, dir: String, stage: String): Boolean = {
    if (!new java.io.File(s"$dir/_STAGE_$stage").exists()) return false
    try {
      import spark.implicits._
      val lin = spark.read.parquet(s"$dir/lineage/$stage").as[LineageRow]
      val expected = lin.map(_.rows).reduce(_ + _)
      val table = stage match {
        case "stats" => spark.read.parquet(s"$dir/stats")
        case s => spark.read.parquet(s"$dir/$s")
      }
      table.count() == expected
    } catch { case _: Throwable => false }
  }
}
