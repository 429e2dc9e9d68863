package graft.query

/** BM25 scoring, Lucene/ES 7.x parameterization (k1=1.2, b=0.75 — the stack
  * the reference runs on: go.mod:8 pins go-elasticsearch/v7,
  * charts/astrologer/requirements.yaml pins elasticsearch 7.5.2).
  *
  *   idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))        (Lucene BM25)
  *   impact(tf,dl) = tf / (tf + k1 * (1 - b + b * dl / avgdl))
  *   score(d, q)   = Σ_{t ∈ q} idf(t) * impact(tf_{t,d}, dl_d)
  *
  * The exact same double-precision expressions run in the index build
  * (block-max metadata), the WAND engine, the naive oracle, and — textually
  * transliterated — the DuckDB oracle SQL. Per-document summation happens in
  * ascending term order everywhere, so scores are bit-identical across
  * engines and parallelism levels (SURVEY.md §7.4 item 2).
  */
object Bm25 extends Serializable {
  val K1 = 1.2
  val B = 0.75

  def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5))

  def impact(tf: Int, dl: Int, avgdl: Double): Double = {
    val tfd = tf.toDouble
    tfd / (tfd + K1 * (1.0 - B + B * dl.toDouble / avgdl))
  }

  def contribution(tf: Int, dl: Int, avgdl: Double, n: Long, df: Long): Double =
    idf(n, df) * impact(tf, dl, avgdl)
}
