package graft

import org.apache.spark.sql.SparkSession
import graft.analyze.Analyzer
import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.query.Searcher

/** Optimization-round measurement harness (guide §1) — NOT the frozen
  * driver bench: replicates Bench's QUERY phase (same fixtures, same warm
  * protocol, same timings) without the ~15-minute scaling section, so
  * before/after numbers for individual optimizations can be taken in ~2
  * minutes. Emits one JSON line like Bench. Jobs are labelled
  * (setJobDescription) per guide §1.5.
  */
object BenchExtra {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def rmrf(p: String): Unit = {
    val f = new java.io.File(p)
    if (f.isDirectory) f.listFiles().foreach(c => rmrf(c.getPath))
    f.delete()
  }

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1).max(0))
  }

  private def j(d: Double): String = "%.4f".format(d)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only: Set[String] = args.toSet // section filter; empty = all

    def on(section: String): Boolean = only.isEmpty || only.contains(section)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def desc(s: String): Unit = spark.sparkContext.setJobDescription(s)
    try {
      if (on("bm25")) {
        desc("bm25: index build sf")
        val (h, buildSecs) = timed {
          val dir = s"${sys.props("java.io.tmpdir")}/graft-bench-sf"
          rmrf(dir)
          IndexBuilder.build(spark, Corpus.fromDocuments(spark, sfDir), dir,
            IndexBuilder.Config(salts = 8, partitions = cpus, mode = Analyzer.Simple))
        }
        results += "index_build_sf" -> buildSecs
        val querySet = Seq("spark", "merge window", "join filter table scan",
          "the batch", "customer line value", "group query row", "hash join sort",
          "stream data", "filter small key", "big slow merge part")
        desc("bm25: cold latencies")
        Searcher.topK(spark, h, querySet.head, 10).collect()
        val lat = querySet.map { q => timed(Searcher.topK(spark, h, q, 10).collect())._2 }
        results += "bm25_p50" -> pct(lat, 0.50)
        results += "bm25_p95" -> pct(lat, 0.95)
        desc("bm25: warm latencies")
        val warm = querySet.map { q => timed(Searcher.topK(spark, h, q, 10).collect())._2 }
        results += "bm25_warm_p50" -> pct(warm, 0.50)
        desc("bm25: distributed")
        val (_, dist) = timed(
          Searcher.topK(spark, h, "the batch", 10, driverPathMaxPostings = 0L).collect())
        results += "bm25_distributed" -> dist
        desc("lex: fuzzy dict build")
        import graft.query.Lexicon
        rmrf(Lexicon.fuzzyDictDir(h.snapshot, 1))
        val (_, dictSecs) = timed(Lexicon.buildFuzzyDict(spark, h.snapshot, 1))
        results += "fuzzy_dict_build" -> dictSecs
        Lexicon.fuzzySearch(spark, h, "spork strean", 10).collect()
        val (_, fz) = timed(Lexicon.fuzzySearch(spark, h, "spork strean", 10).collect())
        results += "bm25_fuzzy" -> fz
        desc("snapshot/restore")
        val snapDir = s"${sys.props("java.io.tmpdir")}/graft-bench-snap"
        val restDir = s"${sys.props("java.io.tmpdir")}/graft-bench-restore"
        rmrf(snapDir); rmrf(restDir)
        val (_, snapSecs) = timed(graft.index.Snapshotter.snapshot(spark, h.dir, snapDir))
        results += "snapshot_sf" -> snapSecs
        val (_, restSecs) = timed(graft.index.Snapshotter.restore(spark, snapDir, restDir))
        results += "restore_verified_sf" -> restSecs
      }

      if (on("compact")) {
        desc("compact: fixture build + 6 segments")
        val ingIdx = s"${sys.props("java.io.tmpdir")}/graft-bench-ingest"
        rmrf(ingIdx)
        val h = IndexBuilder.build(spark, Corpus.synth(spark, 20000, seed = 11L,
          parallelism = cpus), ingIdx, IndexBuilder.Config(salts = 8, partitions = cpus))
        val avgdl = h.stats(spark).avgdl
        import spark.implicits._
        for (b <- 0 until 6) {
          val docs = spark.createDataset((0 until 500).map(i =>
            Corpus.synthDoc(100000 + b * 500 + i, 11L)))
          graft.streaming.StreamingIngest.appendSegment(spark, docs, b.toLong,
            ingIdx, avgdl, salts = 4, baseDocId = 1L << 40)
        }
        desc("compact: fold")
        val (_, fold) = timed(graft.index.Compactor.compact(spark, ingIdx,
          IndexBuilder.Config(salts = 8, partitions = cpus)))
        results += "compact_fold" -> fold
      }

      if (on("ann")) {
        desc("ann: lsh build sf")
        rmrf(graft.ops.Similarity.lshBucketsDir(sfDir, 24, 10))
        val (_, annBuild) = timed(graft.ops.Similarity.buildLshBuckets(spark, sfDir))
        results += "ann_lsh_build" -> annBuild
        val annDir = s"${sys.props("java.io.tmpdir")}/graft-bench-annx"
        val (xT, xP, xL) = (4, 12, 256)
        rmrf(annDir)
        rmrf(graft.ops.Similarity.lshBucketsDir(annDir, xT, xP))
        rmrf(graft.ops.Similarity.ivfDir(annDir, xL))
        desc("annx: synth 1.5M")
        graft.ops.Similarity.synthEmbeddings(spark, annDir, 1500000L, 64, centers = 10000)
        desc("annx: lsh build")
        val (_, xLshBuild) = timed(
          graft.ops.Similarity.buildLshBuckets(spark, annDir, xT, xP))
        results += "annx_lsh_build_1m5" -> xLshBuild
        desc("annx: ivf build")
        val (_, xIvfBuild) = timed(graft.ops.Similarity.buildIvf(spark, annDir, lists = xL))
        results += "annx_ivf_build_1m5" -> xIvfBuild
        desc("annx: brute")
        graft.ops.Similarity.cosineTopK(spark, annDir).collect()
        val (_, xBrute) = timed(graft.ops.Similarity.cosineTopK(spark, annDir).collect())
        results += "annx_brute_1m5" -> xBrute
        desc("annx: lsh query")
        graft.ops.Similarity.lshTopK(spark, annDir, tables = xT, planes = xP).collect()
        val (_, xLsh) = timed(
          graft.ops.Similarity.lshTopK(spark, annDir, tables = xT, planes = xP).collect())
        results += "annx_lsh_1m5" -> xLsh
        desc("annx: ivf query")
        graft.ops.Similarity.ivfTopK(spark, annDir, lists = xL, nprobe = 8).collect()
        val (_, xIvf) = timed(
          graft.ops.Similarity.ivfTopK(spark, annDir, lists = xL, nprobe = 8).collect())
        results += "annx_ivf_1m5" -> xIvf
      }

      if (on("headline")) {
        val headline = Seq("agg_date_histogram", "agg_sig_terms", "join_revenue",
          "win_gap_detect", "dedup_minhash_lsh", "ann_cosine_topk", "ann_lsh_topk",
          "text_quality")
        for (name <- headline) {
          desc(s"headline cold: $name")
          val (_, cold) = timed(SparkEntry.queries(name)(spark, sfDir).collect())
          results += s"${name}_cold" -> cold
        }
        for (name <- headline) {
          desc(s"headline warm: $name")
          val (_, secs) = timed(SparkEntry.queries(name)(spark, sfDir).collect())
          results += name -> secs
        }
      }
    } finally spark.stop()
    val qs = results.map { case (k, v) => s""""$k":${j(v)}""" }.mkString("{", ",", "}")
    val total = results.filterNot(_._1.endsWith("_cold")).values.sum
    println(s"""{"metric":"extra","value":${j(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
