package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine.quantized

/** Approximate-nearest-neighbor / similarity search over the embedding
  * column (`embeddings.parquet`: vec_id, embedding Array[Float], label).
  *
  * Baseline: brute-force cosine top-k — one narrow map over all vectors +
  * TakeOrderedAndProject; at scale this is the exact re-scorer. Scale path:
  * random-hyperplane LSH bucketing — each vector lands in a few buckets,
  * candidate generation is an equi-join on (bucket), and only candidates
  * get exact scoring. Both are deterministic (seeded hyperplanes).
  */
object Similarity {

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Exact cosine in double precision, strict left-to-right summation —
    * matches the transliterated oracle SQL arithmetic.
    */
  private[graft] def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Brute-force cosine top-k against the query vector `qId`. */
  def cosineTopK(spark: SparkSession, sfDir: String, qId: Long = 0L, k: Int = 20): DataFrame = {
    import spark.implicits._
    val e = emb(spark, sfDir)
    val q: Array[Float] = e.filter(col("vec_id") === qId)
      .select(col("embedding")).as[Array[Float]].head()
    val bq = spark.sparkContext.broadcast(q)
    e.filter(col("vec_id") =!= qId)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) => (id, cosine(bq.value, v)) }
      .toDF("vec_id", "cos")
      .select(col("vec_id"), quantized(col("cos")).as("cos_q"))
      .orderBy(desc("cos_q"), col("vec_id"))
      .limit(k)
  }

  /** All pairs with cosine ≥ threshold — embedding near-dup detection.
    * Brute at test scale (the exact verifier); LSH variant below is the
    * candidate generator at scale.
    */
  def cosinePairs(spark: SparkSession, sfDir: String, threshold: Double = 0.45): DataFrame = {
    import spark.implicits._
    val e = emb(spark, sfDir).select(col("vec_id"), col("embedding"))
    e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("x.embedding").as("va"),
        col("y.vec_id").as("b"), col("y.embedding").as("vb"))
      .as[(Long, Array[Float], Long, Array[Float])]
      .map { case (a, va, b, vb) => (a, b, cosine(va, vb)) }
      .toDF("a", "b", "cos")
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), quantized(col("cos")).as("cos_q"))
      .orderBy(col("a"), col("b"))
  }

  /** Deterministic random hyperplane, seeded per (plane, dim). */
  private[graft] def hyperplane(plane: Int, dim: Int): Array[Double] = {
    val rnd = new scala.util.Random(0x5eed0000L + plane)
    Array.fill(dim)(rnd.nextGaussian())
  }

  /** Sign-LSH bucket key: `planes` bits from random hyperplanes. */
  private[graft] def lshKey(v: Array[Float], planes: Array[Array[Double]]): Int = {
    var key = 0
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * planes(p)(i); i += 1 }
      if (dot >= 0) key |= (1 << p)
      p += 1
    }
    key
  }

  /** LSH-bucketed ANN: `tables` independent hash tables of `planes`-bit
    * sign hashes; candidates = bucket collisions in any table; exact
    * cosine re-score → top-k. Recall < 1 by construction (approximate);
    * tests assert recall against brute force on the test set.
    */
  def lshTopK(spark: SparkSession, sfDir: String, qId: Long = 0L, k: Int = 20,
              tables: Int = 24, planes: Int = 5): DataFrame = {
    // planes/tables sized for near-uniform vectors at this n: P(bucket
    // collision | cos≈0.3) ≈ 0.58^5 ≈ 0.066 per table → ≈0.8 recall over 24
    // tables. At larger n, raise `planes` ∝ log n to keep buckets small.
    import spark.implicits._
    val e = emb(spark, sfDir)
    val dim = e.select(col("embedding")).as[Array[Float]].head().length
    val allPlanes: Array[Array[Array[Double]]] =
      Array.tabulate(tables)(t => Array.tabulate(planes)(p => hyperplane(t * 1000 + p, dim)))
    val bPlanes = spark.sparkContext.broadcast(allPlanes)
    val q: Array[Float] = e.filter(col("vec_id") === qId)
      .select(col("embedding")).as[Array[Float]].head()
    val qKeys: Set[(Int, Int)] =
      (0 until tables).map(t => (t, lshKey(q, bPlanes.value(t)))).toSet
    val bq = spark.sparkContext.broadcast(q)
    val bqk = spark.sparkContext.broadcast(qKeys)
    e.filter(col("vec_id") =!= qId)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val hit = (0 until bPlanes.value.length).exists { t =>
          bqk.value.contains((t, lshKey(v, bPlanes.value(t))))
        }
        if (hit) Iterator.single((id, cosine(bq.value, v))) else Iterator.empty
      }
      .toDF("vec_id", "cos")
      .select(col("vec_id"), quantized(col("cos")).as("cos_q"))
      .orderBy(desc("cos_q"), col("vec_id"))
      .limit(k)
  }

  /** Per-label centroid then nearest-centroid assignment — the IVF
    * coarse-quantizer building block (here over the provided labels).
    */
  def centroidAssign(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, sfDir).select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)].cache()
    val centroids: Array[(Int, Array[Double])] = e
      .groupByKey(_._3)
      .mapGroups { (label, it) =>
        var n = 0
        var acc: Array[Double] = null
        it.foreach { case (_, v, _) =>
          if (acc == null) acc = new Array[Double](v.length)
          var i = 0
          while (i < v.length) { acc(i) += v(i); i += 1 }
          n += 1
        }
        (label, acc.map(_ / n))
      }.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(centroids)
    e.map { case (id, v, label) =>
      var best = -1
      var bestCos = Double.NegativeInfinity
      bc.value.foreach { case (cl, c) =>
        var dot = 0.0; var na = 0.0; var nc = 0.0
        var i = 0
        while (i < v.length) {
          dot += v(i) * c(i); na += v(i).toDouble * v(i); nc += c(i) * c(i); i += 1
        }
        val cos = dot / (math.sqrt(na) * math.sqrt(nc))
        if (cos > bestCos) { bestCos = cos; best = cl }
      }
      (id, label, best)
    }.toDF("vec_id", "label", "assigned")
      .orderBy(col("vec_id"))
  }
}
