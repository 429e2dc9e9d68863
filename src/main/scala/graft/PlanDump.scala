package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool (NOT part of the frozen bench harness):
  * dumps `.explain("formatted")` for declared queries to
  * `plans/r06/<name>_<tag>.txt` so plan-shape claims in OPTIMIZATION_r06.md
  * are checkable without running Spark.
  *
  * Usage: sbt "runMain graft.PlanDump <tag> [query ...]"
  *   tag   = file suffix ("before" / "after")
  *   query = SparkEntry.queries names (default: the set touched this round)
  */
object PlanDump {

  val DefaultQueries: Seq[String] = Seq(
    "agg_sig_terms", "agg_date_histogram", "join_revenue", "win_gap_detect",
    "text_quality", "text_langid", "text_fingerprint",
    "dedup_minhash_lsh", "dedup_clusters",
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk")

  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = if (args.length > 1) args.drop(1).toSeq else DefaultQueries
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File("plans/r06").mkdirs()
    try {
      for (name <- names) {
        spark.sparkContext.setJobDescription(s"plandump: $name")
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt =
          try df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case t: Throwable => s"explain failed: $t" }
        val out = new java.io.FileWriter(s"plans/r06/${name}_$tag.txt")
        out.write(txt)
        out.close()
        System.err.println(s"[plandump] $name -> plans/r06/${name}_$tag.txt")
      }
    } finally spark.stop()
  }
}
