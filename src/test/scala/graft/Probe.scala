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
}
