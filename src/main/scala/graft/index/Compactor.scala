package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder.{Config, Handle}

/** Streamed-segment compaction: folds every completed `ingest_segments`
  * entry back into the batch index, producing a new EPOCH whose tables are
  * bit-identical to a fresh `IndexBuilder.build` over the union corpus —
  * without re-tokenizing anything (tokenization dominates build cost; the
  * fold re-uses the stored dl/sha256/tf and only re-ranks, re-salts and
  * re-blocks). Reference analog: the ES/Lucene background segment merge the
  * reference delegates to (SURVEY.md §3.1); without it a long-running
  * 1 s-trigger ingest accumulates one segment per micro-batch forever and
  * per-query listing/union cost grows with uptime, while the WAND bound
  * factor (liveStats) only degrades.
  *
  * What the fold restores:
  *  - ONE postings/docmeta/termstats table again (no per-query multi-path
  *    unions, no per-segment stats collection);
  *  - docIds re-densified to [0, n): the dense rank over
  *    (repo, path, commit) of the union — exactly what a fresh build over
  *    the union assigns, so salts return to the main docId-range scheme;
  *  - maxImpact recomputed at the union's (sampled) buildAvgdl ⇒ the WAND
  *    bound factor returns to exactly what a fresh build over the union
  *    would have (≈1; the segment-accumulation degradation is gone).
  *
  * Commit protocol (LevelDB CURRENT / Lucene segments_N analog): all new
  * tables + lineage are written under `dir/epoch-N/`, the epoch records
  * which segments it folded (`folded_segments`), and ONE atomic rename of
  * the `CURRENT` pointer makes the epoch active and the folded segments
  * invisible together (Catalog.load reads both from the same pointer).
  * Crash before the flip: the half-written epoch dir is inert garbage,
  * overwritten by the next attempt. Crash after: consistent; folded segment
  * directories are deleted lazily on the next compact/cleanup. The genesis
  * tables (`dir/docmeta` etc.) are retained as the resume base for
  * `IndexBuilder.build`'s stage markers; prior epoch dirs are deleted.
  */
object Compactor {

  private def epochName(k: Int): String = f"epoch-$k%06d"

  private def parseEpoch(name: String): Int =
    name.stripPrefix("epoch-").toInt

  // ---- deferred GC --------------------------------------------------------
  // Dirs made invisible by a commit are NOT deleted in the same call: an
  // in-flight query (or a TTL-stale catalog, ≤2 s) may still be scanning
  // them. Their dir-relative paths are recorded in `$dir/_gc` and physically
  // deleted at the START of the NEXT maintenance op — a full maintenance
  // cycle of grace, which is the practical analog of Lucene's
  // reader-refcounted deletes without distributed reference counting.

  /** Minimum age before a deferred dir is physically deleted — must exceed
    * the Catalog TTL plus a generous query runtime, so even a reader
    * holding TTL-stale state never loses files mid-scan (back-to-back
    * auto-merges would otherwise sweep a dir deferred moments earlier).
    */
  def gcGraceMs: Long = sys.props.getOrElse("graft.gc.grace.ms", "10000").toLong

  private def gcDefer(dir: String, relPaths: Seq[String]): Unit = {
    val prior = Fs.readString(s"$dir/_gc").toSeq
      .flatMap(_.split('\n').map(_.trim).filter(_.nonEmpty))
    val now = System.currentTimeMillis()
    val entries = prior ++ relPaths.map(p => s"$p|$now")
    Fs.writeString(s"$dir/_gc", entries.distinct.mkString("\n"))
  }

  private def gcSweep(dir: String): Unit =
    Fs.readString(s"$dir/_gc").foreach { c =>
      val now = System.currentTimeMillis()
      val (ripe, young) = c.split('\n').map(_.trim).filter(_.nonEmpty).toSeq
        .partition { e =>
          val at = e.split('|') match {
            case Array(_, ts) => ts.toLongOption.getOrElse(0L)
            case _ => 0L
          }
          now - at >= gcGraceMs
        }
      ripe.foreach(e => Fs.delete(s"$dir/${e.split('|').head}"))
      if (young.isEmpty) Fs.delete(s"$dir/_gc")
      else Fs.writeString(s"$dir/_gc", young.mkString("\n"))
    }

  private def segRel(segPath: String): String =
    s"ingest_segments/${Fs.name(segPath)}"

  /** MINOR compaction (the Lucene tiered-merge analog): concatenate all
    * live streamed segments into ONE consolidated segment — no re-rank, no
    * re-block, no touch of the batch index. Correct by construction:
    * per-segment docId ranges and salt namespaces are disjoint, so
    * docmeta/blocks/positions are pure unions copied as-is; termstats
    * re-aggregates (sum df, max bound) and stats record the MIN source
    * build-avgdl, which preserves the exact WAND bound factor. Visibility
    * flips with one marker: the merged segment's `replaces` file names its
    * sources, and Catalog hides them the instant `_DONE` lands. This is the
    * op a 1 s-cadence ingest runs continuously (see
    * StreamingIngest.startIndexAppend's mergeAtSegments) — it bounds
    * per-query listing/union cost at a handful of segments forever, while
    * the expensive full fold (`compact`) stays an occasional maintenance
    * job.
    */
  def mergeSegments(spark: SparkSession, dir: String, minSegments: Int = 2): Handle = {
    import spark.implicits._
    gcSweep(dir) // previously deferred dirs have had a full cycle of grace
    val h = IndexBuilder.openHandle(dir)
    val segs = h.segmentDirs
    if (segs.size < minSegments) return h
    // the new name must never collide with a LIVE dir name OR a name some
    // folded/replaces list still hides (a full compact deletes merged dirs
    // but their names persist in folded_segments forever — recycling one
    // would make the new segment, and everything its replaces list names,
    // permanently invisible)
    val taken = Fs.listDirs(s"$dir/ingest_segments").map(Fs.name) ++
      Catalog.of(dir).hidden
    val k = taken.flatMap(n =>
      if (n.startsWith("merged=")) n.stripPrefix("merged=").toLongOption else None)
      .foldLeft(0L)(math.max) + 1
    val out = s"$dir/ingest_segments/merged=$k"
    Fs.delete(out) // stale crashed attempt
    // small unions of small files — coalesce keeps the merged segment at a
    // few files per table (the whole point: fewer paths per query); the
    // five tables are independent, so the copies run concurrently (this op
    // rides the 1 s ingest cadence — wall time matters)
    val copies: Seq[() => Unit] = Seq("docmeta", "blocks", "positions").map(t =>
      () => spark.read.parquet(segs.map(_ + s"/$t"): _*)
        .coalesce(4).write.mode("overwrite").parquet(s"$out/$t")) ++ Seq(
      () => spark.read.parquet(segs.map(_ + "/termstats"): _*)
        .groupBy($"term")
        .agg(sum($"df").cast("long").as("df"), max($"maxImpact").as("maxImpact"))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/termstats"),
      () => {
        val srcStats = IndexBuilder.readStatsCompat(spark, segs.map(_ + "/stats"))
        val mergedN = srcStats.map(_.n).sum
        val mergedTok = srcStats.map(_.totalTokens).sum
        // buildAvgdl = min over sources: liveStats' min-aggregation sees the
        // same minimum before and after the merge, so the WAND bound factor
        // is unchanged exactly
        Seq(IndexStats(mergedN, mergedTok.toDouble / mergedN.toDouble, mergedTok,
            srcStats.map(_.buildAvgdl).min)).toDS()
          .coalesce(1).write.mode("overwrite").parquet(s"$out/stats")
      })
    IndexBuilder.runConcurrently(copies)
    // replaces BEFORE the marker: a reader either sees no merged segment
    // (sources still live) or a completed one (sources hidden) — never
    // both. Carried TRANSITIVELY: if a source is itself a merged segment
    // whose lazy deletion of ITS sources failed, those names must stay
    // hidden after the source (and its replaces file) is deleted.
    val transitive = segs.flatMap(d => Fs.readString(s"$d/replaces").toSeq
      .flatMap(_.split('\n').map(_.trim).filter(_.nonEmpty)))
    Fs.writeString(s"$out/replaces",
      (segs.map(Fs.name) ++ transitive).distinct.sorted.mkString("\n"))
    Fs.touch(s"$out/_DONE")
    Catalog.invalidate(dir)
    // deferred cleanup; already invisible via `replaces` (see gcDefer)
    gcDefer(dir, segs.map(segRel))
    IndexBuilder.openHandle(dir)
  }

  /** Fold all live streamed segments into a new epoch. No-op (returns the
    * handle unchanged) when there is nothing to fold. `cfg` supplies the
    * salt scheme — pass the same values the batch build used so the folded
    * epoch is bit-identical to a fresh build over the union.
    */
  def compact(spark: SparkSession, dir: String, cfg: Config = Config()): Handle = {
    import spark.implicits._
    gcSweep(dir) // previously deferred dirs have had a full cycle of grace
    val h = IndexBuilder.openHandle(dir)
    val segs = h.segmentDirs
    if (segs.isEmpty) return h
    val state = Catalog.of(dir)
    val oldRoot = h.root
    val newEpoch = epochName(state.epoch.map(parseEpoch).getOrElse(0) + 1)
    val newRoot = s"$dir/$newEpoch"
    Fs.delete(newRoot) // stale crashed attempt, if any
    val parts = if (cfg.partitions > 0) cfg.partitions
      else spark.sessionState.conf.numShufflePartitions

    // ---- docmeta: union → re-rank to dense [0, n) ------------------------
    // Same two-pass dense-id primitive as the build, over the stored keys —
    // content is never read, dl/sha256 ride along.
    val union = spark.read
      .parquet((s"$oldRoot/docmeta" +: segs.map(_ + "/docmeta")): _*)
      .withColumnRenamed("docId", "oldDocId")
    val assigned = IndexBuilder.withDenseIds(spark, union, parts,
      Seq("repo", "path", "commit"), "docId")
    try {
      val n = assigned.n
      // the SAME deterministic sampled buildAvgdl a fresh build over the
      // union would compute (the sample is a pure function of the re-ranked
      // (docId, dl) pairs and the mean a long-sum/long-count) — this is what
      // makes the folded epoch bit-identical to a fresh build, block maxima
      // included. Derived from the id-assigned frame directly so the three
      // table folds below have no ordering dependency and run CONCURRENTLY
      // (same overlap pattern as the build and the ingest writes).
      val est = IndexBuilder.estimateBuildAvgdl(
        assigned.df.select($"docId", $"dl"))
      val salts = IndexBuilder.effectiveSalts(cfg, n)
      val remap = assigned.df.select($"oldDocId", $"docId")
      val dmAcc = IndexBuilder.newLineageAcc(spark, "docmeta")
      val poAcc = IndexBuilder.newLineageAcc(spark, "postings")

      val foldDocmeta = () => {
        assigned.df
          .select($"docId", $"repo", $"path", $"commit", $"lang", $"dl", $"sha256")
          .as[DocMeta]
          .mapPartitions(IndexBuilder.tally(dmAcc, "docmeta")(
            m => m.docId, m => m.docId, m => m.dl.toLong,
            m => 48L + m.repo.length + m.path.length,
            m => IndexBuilder.mix3(m.docId,
              java.lang.Long.parseLong(m.sha256.substring(0, 15), 16),
              m.commit.hashCode.toLong)))
          .write.mode("overwrite").parquet(s"$newRoot/docmeta")
        IndexBuilder.writeLineageRows(spark, newRoot, "docmeta", dmAcc.value)
      }

      // postings fold: decode → remap docIds → re-salt → re-block. The
      // remap (oldDocId → docId, two longs per doc) is the only join; AQE
      // broadcasts it while it fits and falls back to a shuffle join on
      // docId at scale. Shuffle volume = distinct (term, doc) pairs — the
      // same as the build's postings stage, minus tokenization.
      val foldPostings = () => {
        val decoded = spark.read
          .parquet((s"$oldRoot/postings" +: segs.map(_ + "/blocks")): _*)
          .as[PostingBlock]
          .flatMap { b =>
            val ds = Codec.decodeDeltas(b.docDeltas, b.n, b.firstDocId)
            val tfs = Codec.decodeInts(b.tfs, b.n)
            val dls = Codec.decodeInts(b.dls, b.n)
            Iterator.tabulate(b.n)(i => (b.term, ds(i), tfs(i), dls(i)))
          }.toDF("term", "oldDocId", "tf", "dl")
        decoded.join(remap, "oldDocId")
          .select($"term",
            least(floor($"docId" * salts / math.max(n, 1L)), lit(salts - 1))
              .cast("int").as("salt"),
            $"docId", $"tf", $"dl")
          .repartition(parts, $"term", $"salt")
          .sortWithinPartitions($"term", $"salt", $"docId")
          .as[TermDoc]
          .mapPartitions(IndexBuilder.buildBlocks(_, est))
          .mapPartitions(IndexBuilder.tally(poAcc, "postings")(
            b => b.firstDocId, b => b.lastDocId, _ => 1L,
            b => b.docDeltas.length.toLong + b.tfs.length + b.dls.length,
            b => IndexBuilder.mix3(b.term.hashCode.toLong,
              b.salt.toLong * 31 + b.blockIdx,
              java.util.Arrays.hashCode(b.docDeltas).toLong)))
          .write.mode("overwrite").parquet(s"$newRoot/postings")
        IndexBuilder.writeLineageRows(spark, newRoot, "postings", poAcc.value)
      }

      // positions fold (only if the batch stage was explicitly built):
      // segments always carry positions; the fold preserves the positional
      // tier iff the batch index has it (positionsAll requires the batch
      // stage anyway, so phrase-search capability is unchanged either way).
      val foldPositions = () =>
        if (Fs.exists(s"$oldRoot/positions")) {
          spark.read
            .parquet((s"$oldRoot/positions" +: segs.map(_ + "/positions")): _*)
            .withColumnRenamed("docId", "oldDocId")
            .join(remap, "oldDocId")
            .select($"term", $"docId", $"n", $"posDeltas")
            .repartition(parts, $"term", pmod($"docId", lit(64)))
            .sortWithinPartitions($"term", $"docId")
            .write.mode("overwrite").parquet(s"$newRoot/positions")
          Fs.touch(s"$newRoot/_STAGE_positions")
        }

      IndexBuilder.runConcurrently(Seq(foldDocmeta, foldPostings, foldPositions))

      // ---- stats (docmeta lineage tallies) + termstats (pruned read-back
      // of the fresh postings) — independent of each other too ------------
      import scala.jdk.CollectionConverters._
      val tot = dmAcc.value.asScala.groupBy(_.partitionId)
        .map(_._2.head.termCount).sum
      val avgdl = tot.toDouble / n.toDouble
      val writeStats = () => {
        Seq(IndexStats(n, avgdl, tot, est)).toDS()
          .write.mode("overwrite").parquet(s"$newRoot/stats")
        IndexBuilder.writeLineageRows(spark, newRoot, "stats",
          java.util.List.of(LineageRow("stats", 0, 0L, n - 1, 1L, 1L, 24L, n ^ tot)))
      }
      val writeTermstats = () => {
        val tsAcc = IndexBuilder.newLineageAcc(spark, "termstats")
        spark.read.parquet(s"$newRoot/postings")
          .groupBy($"term")
          .agg(sum($"n").cast("long").as("df"), max($"maxImpact").as("maxImpact"))
          .as[TermStat]
          .mapPartitions(IndexBuilder.tally(tsAcc, "termstats")(
            _ => 0L, _ => 0L, _ => 1L, t => 16L + t.term.length,
            t => IndexBuilder.mix3(t.term.hashCode.toLong, t.df, 0L)))
          .write.mode("overwrite").parquet(s"$newRoot/termstats")
        IndexBuilder.writeLineageRows(spark, newRoot, "termstats", tsAcc.value)
      }
      IndexBuilder.runConcurrently(Seq(writeStats, writeTermstats))

      // ---- commit: folded list + ONE atomic pointer flip ------------------
      val priorFolded = Fs.readString(s"$oldRoot/folded_segments")
        .map(_.split('\n').map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty[String])
      // also fold the names a merged source segment was hiding (its
      // `replaces` file dies with it; a failed lazy delete must not
      // resurrect its sources)
      val replacedBySegs = segs.flatMap(d => Fs.readString(s"$d/replaces").toSeq
        .flatMap(_.split('\n').map(_.trim).filter(_.nonEmpty)))
      val folded = (priorFolded ++ segs.map(Fs.name) ++ replacedBySegs).toSeq.sorted
      Fs.writeString(s"$newRoot/folded_segments", folded.mkString("\n"))
      Fs.atomicWrite(s"$dir/CURRENT", newEpoch)
      Catalog.invalidate(dir)

      // ---- deferred cleanup (readers already ignore these; deleted by the
      // next maintenance op — see gcDefer) ---------------------------------
      gcDefer(dir, segs.map(segRel) ++
        (if (oldRoot != dir) Seq(Fs.name(oldRoot)) else Seq.empty))
    } finally assigned.release()
    IndexBuilder.openHandle(dir)
  }
}
