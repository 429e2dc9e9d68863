package graft

import org.apache.spark.sql.SparkSession

/** Dev-only perf probe (test classpath): times named driver queries at an
  * SF dir without the full Bench protocol. Usage:
  *   sbt "Test/runMain graft.Probe [sfDir] [rounds] [q1 q2 ...]"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val qs = if (args.length > 2) args.drop(2).toSeq
      else Seq("agg_sig_terms", "win_gap_detect", "dedup_minhash_lsh",
        "ann_cosine_topk", "ann_lsh_topk")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(r: Int, name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] r$r $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (r <- 1 to rounds; q <- qs) q match {
      case "bandwidth" =>
        if (r == 1) bandwidthProbe(spark)
      case "scaleconf" =>
        // A/B shuffle-conf variants for the secondary scaling pair: same
        // 300k-doc build at local[8] vs local[32] per variant, one warm lap
        // + best-of-2 measured. Run exclusively (host noise!) and ALONE:
        // this mode stops the shared outer session — getOrCreate would
        // otherwise return it and silently ignore the per-variant
        // master/conf (the first published run of this probe did exactly
        // that; its numbers were bogus).
        if (r == 1) {
          spark.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
          def build(cores: Int, extra: Map[String, String]): Double = {
            val b = SparkSession.builder()
              .master(s"local[$cores]").appName(s"scaleconf-$cores")
              .config("spark.sql.shuffle.partitions", (cores * 2).toString)
              .config("spark.sql.adaptive.enabled", "true")
              .config("spark.ui.enabled", "false")
            extra.foreach { case (k, v) => b.config(k, v) }
            val s = b.getOrCreate()
            s.sparkContext.setLogLevel("ERROR")
            try {
              val dir = s"${sys.props("java.io.tmpdir")}/graft-scaleconf"
              def rmrf(p: String): Unit = {
                val f = new java.io.File(p)
                if (f.isDirectory) f.listFiles().foreach(c => rmrf(c.getPath))
                f.delete()
              }
              def lap(n: Long): Double = {
                rmrf(dir)
                val t0 = System.nanoTime()
                graft.index.IndexBuilder.build(s,
                  graft.corpus.Corpus.synth(s, n, seed = 42L, parallelism = cores * 2),
                  dir, graft.index.IndexBuilder.Config(salts = 8,
                    partitions = cores * 2, mode = graft.analyze.Analyzer.Code))
                n / ((System.nanoTime() - t0) / 1e9)
              }
              lap(100000) // warm
              math.max(lap(300000), lap(300000))
            } finally s.stop()
          }
          val variants = Seq(
            "baseline" -> Map.empty[String, String],
            "no-shuffle-compress" -> Map("spark.shuffle.compress" -> "false",
              "spark.shuffle.spill.compress" -> "false"),
            "lz4-big-buffer" -> Map("spark.shuffle.file.buffer" -> "1m",
              "spark.io.compression.codec" -> "lz4"))
          for ((name, conf) <- variants) {
            val t8 = build(8, conf)
            val t32 = build(32, conf)
            println(f"[scaleconf] $name%-22s 8c=${t8}%.0f 32c=${t32}%.0f docs/s eff_8_32=${t32 / t8 / 4.0}%.2f")
          }
        }
      case "withids" =>
        // A/B the shared-sort cache storage level (withDenseIds): columnar
        // cache build is the worst 2→8 scaler in the stage decomposition
        if (r == 1) {
          spark.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
          def rmrf(p: String): Unit = {
            val f = new java.io.File(p)
            if (f.isDirectory) f.listFiles().foreach(c => rmrf(c.getPath))
            f.delete()
          }
          def build(cores: Int, level: String): Double = {
            sys.props("graft.build.cacheLevel") = level
            val s = SparkSession.builder()
              .master(s"local[$cores]").appName(s"withids-$cores-$level")
              .config("spark.sql.shuffle.partitions", (cores * 2).toString)
              .config("spark.sql.adaptive.enabled", "true")
              .config("spark.ui.enabled", "false")
              .getOrCreate()
            s.sparkContext.setLogLevel("ERROR")
            try {
              val dir = s"${sys.props("java.io.tmpdir")}/graft-withids"
              def lap(n: Long): Double = {
                rmrf(dir)
                val t0 = System.nanoTime()
                graft.index.IndexBuilder.build(s,
                  graft.corpus.Corpus.synth(s, n, seed = 42L, parallelism = cores * 2),
                  dir, graft.index.IndexBuilder.Config(salts = 8,
                    partitions = cores * 2, mode = graft.analyze.Analyzer.Code))
                n / ((System.nanoTime() - t0) / 1e9)
              }
              lap(150000) // warm
              math.max(lap(600000), lap(600000))
            } finally {
              s.stop()
              SparkSession.clearActiveSession()
              SparkSession.clearDefaultSession()
              sys.props.remove("graft.build.cacheLevel")
              ()
            }
          }
          for (level <- Seq("MEMORY_AND_DISK", "DISK_ONLY")) {
            val t2 = build(2, level)
            val t8 = build(8, level)
            println(f"[withids] $level%-16s 2c=${t2}%.0f 8c=${t8}%.0f docs/s eff_2_8=${t8 / t2 / 4.0}%.3f")
          }
        }
      case "stagetime" =>
        // per-stage wall time of the Bench build at local[2] vs local[8]
        // (GRAFT_TIMING breakdown): separates the fixed driver-side cost F
        // (small single-task jobs, commit protocol) from the parallel work
        // W — the 2→8 efficiency is (F + W/2) / (4(F + W/8)).
        if (r == 1) {
          spark.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
          sys.props("graft.timing") = "1"
          def rmrf(p: String): Unit = {
            val f = new java.io.File(p)
            if (f.isDirectory) f.listFiles().foreach(c => rmrf(c.getPath))
            f.delete()
          }
          for (cores <- Seq(2, 8); lap <- 1 to 3) {
            val s = SparkSession.builder()
              .master(s"local[$cores]").appName(s"stagetime-$cores")
              .config("spark.sql.shuffle.partitions", (cores * 2).toString)
              .config("spark.sql.adaptive.enabled", "true")
              .config("spark.ui.enabled", "false")
              .getOrCreate()
            s.sparkContext.setLogLevel("ERROR")
            try {
              val dir = s"${sys.props("java.io.tmpdir")}/graft-stagetime"
              rmrf(dir)
              val t0 = System.nanoTime()
              graft.index.IndexBuilder.build(s,
                graft.corpus.Corpus.synth(s, 600000, seed = 42L, parallelism = cores * 2),
                dir, graft.index.IndexBuilder.Config(salts = 8,
                  partitions = cores * 2, mode = graft.analyze.Analyzer.Code))
              System.err.println(f"[stagetime] cores=$cores lap=$lap total=${(System.nanoTime() - t0) / 1e9}%.2f s")
            } finally {
              s.stop()
              SparkSession.clearActiveSession()
              SparkSession.clearDefaultSession()
            }
          }
          sys.props.remove("graft.timing")
        }
      case "ingest" =>
        // steady-state micro-batch latency (the 1 s trigger budget): one
        // warm-up batch, then per-append wall time for 12 batches of 100
        if (r == 1) {
          import spark.implicits._
          val idx = s"${sys.props("java.io.tmpdir")}/graft-probe-ingest-${System.nanoTime()}"
          val base = (0 until 500).map(i => graft.corpus.Corpus.synthDoc(i, 3L)).toDS()
          val h = graft.index.IndexBuilder.build(spark, base, idx,
            graft.index.IndexBuilder.Config(salts = 4))
          val avgdl = h.stats(spark).avgdl
          for (b <- 0 until 12) {
            val docs = (0 until 100).map(i => graft.corpus.Corpus.synthDoc(1000 + b * 100 + i, 3L)).toDS()
            timed(r, s"append-b$b")(graft.streaming.StreamingIngest.appendSegment(
              spark, docs, b.toLong, idx, avgdl, 4, 1L << 40))
          }
          // query latency vs segment count, then flat after compaction
          timed(r, "query-12segs")(graft.query.Searcher.topK(spark,
            graft.index.IndexBuilder.openHandle(idx), "the import", 10).collect())
          timed(r, "compact")(graft.index.Compactor.compact(spark, idx,
            graft.index.IndexBuilder.Config(salts = 4)))
          timed(r, "query-0segs")(graft.query.Searcher.topK(spark,
            graft.index.IndexBuilder.openHandle(idx), "the import", 10).collect())
        }
      case "minhash_phases" =>
        import spark.implicits._
        import org.apache.spark.sql.functions._
        val docs = spark.read.parquet(s"$sf/documents.parquet")
        timed(r, "mh:sigs") {
          docs.select(col("doc_id"), col("text")).as[(Long, String)]
            .map { case (id, text) =>
              val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
              val mins = Array.fill(graft.ops.Dedup.NumHashes)(Long.MaxValue)
              var i = 0
              while (i + 2 < ws.length) {
                val b = graft.ops.Dedup.hBase(ws(i) + " " + ws(i + 1) + " " + ws(i + 2))
                var k = 0
                while (k < graft.ops.Dedup.NumHashes) {
                  val h = graft.ops.Dedup.hSeeded(b, k); if (h < mins(k)) mins(k) = h; k += 1
                }
                i += 1
              }
              (id, mins.sum)
            }.write.format("noop").mode("overwrite").save()
        }
      case "annx" =>
        val n = sys.env.getOrElse("GRAFT_ANNX_N", "1500000").toLong
        val annDir = s"${sys.props("java.io.tmpdir")}/graft-bench-annx-$n"
        if (r == 1 && !new java.io.File(s"$annDir/embeddings.parquet").exists()) {
          timed(r, "annx:synth")(
            graft.ops.Similarity.synthEmbeddings(spark, annDir, n, 64, centers = (n / 150).toInt))
        }
        if (r == 1) {
          timed(r, "annx:lsh-build")(graft.ops.Similarity.buildLshBuckets(spark, annDir, 4, 12))
          timed(r, "annx:ivf-build")(graft.ops.Similarity.buildIvf(spark, annDir, lists = 256))
        }
        timed(r, "annx:brute")(graft.ops.Similarity.cosineTopK(spark, annDir).collect())
        timed(r, "annx:lsh")(graft.ops.Similarity.lshTopK(spark, annDir, tables = 4, planes = 12).collect())
        timed(r, "annx:ivf")(graft.ops.Similarity.ivfTopK(spark, annDir, lists = 256, nprobe = 8).collect())
      case "explain" =>
        for (name <- Seq("win_gap_detect", "agg_sig_terms", "ann_lsh_topk")) {
          println(s"==== $name ====")
          println(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString.take(4000))
        }
      case q =>
        timed(r, q)(SparkEntry.queries(q)(spark, sf).collect())
    }
    spark.stop()
  }

  /** The committed memory-bandwidth evidence behind BENCH/BASELINE.md's
    * secondary scaling pair (local[8]→local[32]): a zero-Spark thread probe
    * runs the SAME tokenizer hot path at 1/2/8/32 threads in two flavors —
    * pure-CPU (read-only char scan, no allocation) and alloc-heavy (the
    * build's real `Analyzer.termFreqs` path: token Strings, sort, tuples).
    * Pure-CPU scales near-linearly to 32 threads while alloc-heavy hits the
    * single-socket memory/GC wall between 8 and 32 — demonstrating the
    * <0.8 secondary-pair efficiency is a one-JVM bandwidth artifact, not a
    * Spark-plan defect (4N cluster EXECUTORS bring 4N memory controllers;
    * 4N threads in one JVM don't). A Spark-build occupancy line (Σ task
    * runtime / wall / cores) shows the cores are busy, not starved.
    * Re-run: sbt "Test/runMain graft.Probe - 1 bandwidth"
    */
  private def bandwidthProbe(spark: SparkSession): Unit = {
    import graft.analyze.Analyzer
    val docs = Array.tabulate(8000)(i => graft.corpus.Corpus.synthDoc(i, 5L).content)
    val sink = new java.util.concurrent.atomic.AtomicLong()
    def pureCpu(s: String): Long = {
      var h = 1469598103934665603L
      var i = 0
      while (i < s.length) { h = (h ^ s.charAt(i)) * 1099511628211L; i += 1 }
      h
    }
    def allocHeavy(s: String): Long = {
      val (tfs, dl) = Analyzer.termFreqs(s, Analyzer.Code)
      tfs.length.toLong + dl
    }
    def pass(threads: Int, repeats: Int, fn: String => Long): Double = {
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var acc = 0L
          var r = 0
          while (r < repeats) {
            var i = 0
            while (i < docs.length) { acc += fn(docs(i)); i += 1 }
            r += 1
          }
          sink.addAndGet(acc)
          ()
        })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start())
      ts.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      threads.toLong * repeats * docs.length / wall // docs/sec (weak scaling)
    }
    for ((name, fn, reps) <- Seq(("pure-cpu", pureCpu _, 40), ("alloc-heavy", allocHeavy _, 8))) {
      pass(4, reps, fn) // JIT warm-up
      val thr = Seq(1, 2, 8, 32).map(t => t -> pass(t, reps, fn)).toMap
      println(f"[bandwidth] $name%-12s 1t=${thr(1)}%.0f 2t=${thr(2)}%.0f 8t=${thr(8)}%.0f 32t=${thr(32)}%.0f docs/s" +
        f"  speedup32=${thr(32) / thr(1)}%.1fx  eff_8_32=${thr(32) / thr(8) / 4.0}%.2f")
    }
    // Spark build occupancy at local[32]: are the cores busy during the
    // real index build? (busy-but-slow ⇒ bandwidth-bound, not scheduling)
    var taskTime = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          taskTime += e.taskMetrics.executorRunTime + e.taskMetrics.executorDeserializeTime
    }
    spark.sparkContext.addSparkListener(listener)
    val dir = s"${sys.props("java.io.tmpdir")}/graft-probe-bw"
    def rmrf(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles().foreach(c => rmrf(c.getPath))
      f.delete()
    }
    for (lap <- 1 to 3) {
      rmrf(dir); taskTime = 0L
      val t0 = System.nanoTime()
      graft.index.IndexBuilder.build(spark,
        graft.corpus.Corpus.synth(spark, 150000L, seed = 42L, parallelism = 64), dir,
        graft.index.IndexBuilder.Config(salts = 8, partitions = 32,
          mode = graft.analyze.Analyzer.Code))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain task-end events
      println(f"[bandwidth] spark-build lap$lap wall=$wall%.2fs busy-cores=${taskTime / 1000.0 / wall}%.1f/32")
    }
    spark.sparkContext.removeSparkListener(listener)
    println(s"[bandwidth] sink=${sink.get()}") // defeat dead-code elimination
  }
}
