package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch A/B harness - NOT committed; deleted before the round ends
object ScratchAB {
  def timed(f: => Unit): Double = { val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("scratch-ab")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val annDir = s"${sys.props("java.io.tmpdir")}/graft-bench-annx"
    val e = spark.read.parquet(s"$annDir/embeddings.parquet")
    val q: Array[Float] = e.filter(col("vec_id") === 0L).select(col("embedding")).as[Array[Float]].head()
    val bq = spark.sparkContext.broadcast(q)
    def bruteOld(): Unit = {
      e.filter(col("vec_id") =!= 0L)
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
        .map { case (id, v) => (id, graft.ops.Similarity.cosine(bq.value, v)) }
        .toDF("vec_id", "cos")
        .select(col("vec_id"), graft.Engine.quantized(col("cos")).as("cos_q"))
        .orderBy(desc("cos_q"), col("vec_id")).limit(20).collect(); ()
    }
    def bruteNew(): Unit = { graft.ops.Similarity.cosineTopK(spark, annDir).collect(); () }
    class LazyScorer(b: org.apache.spark.broadcast.Broadcast[Array[Float]]) extends Serializable {
      @transient lazy val f: Array[Float] => Double = graft.ops.Similarity.cosineFrom(b.value)
    }
    def bruteLazy(): Unit = {
      val sc = new LazyScorer(bq)
      e.filter(col("vec_id") =!= 0L)
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
        .map { case (id, v) => (id, sc.f(v)) }
        .toDF("vec_id", "cos")
        .select(col("vec_id"), graft.Engine.quantized(col("cos")).as("cos_q"))
        .orderBy(desc("cos_q"), col("vec_id")).limit(20).collect(); ()
    }
    val variants: Seq[(String, () => Unit)] = Seq("old" -> (() => bruteOld()), "new" -> (() => bruteNew()), "lzy" -> (() => bruteLazy()))
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    variants.foreach { case (_, f) => f() }
    for (_ <- 1 to 5; (n, f) <- variants) times(n) = timed(f()) :: times(n)
    variants.foreach { case (n, _) =>
      val xs = times(n)
      println(f"brute_$n min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f") }
    spark.stop()
  }
}
