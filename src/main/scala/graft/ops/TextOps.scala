package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine.quantized

/** Text analysis operators for training-data pipelines: language ID
  * heuristic, quality scoring, token counting, document fingerprinting.
  * All pure column expressions (whole-stage codegen; no UDFs), each with a
  * transliterated DuckDB oracle.
  */
object TextOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private def toks(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")

  /** n-gram/stopword language-ID heuristic: fraction of tokens in an
    * English function-word set; threshold rule. (Real pipelines use
    * fastText-style models; the Spark plumbing — tokenize, ratio, rule —
    * is identical.)
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val markers = Seq("the", "a", "of", "to", "and", "in", "is")
    val d = docs(spark, sfDir)
    toks(d)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(when(col("term").isin(markers: _*), 1).otherwise(0)).cast("double").as("m"))
      .select(col("doc_id"),
        quantized(col("m") / col("n")).as("ratio_q"),
        when(col("m") / col("n") > 0.02, "en").otherwise("other").as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean word
    * length → composite score. Pure column math; quantized outputs.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val stop = Seq("the", "a", "of", "to", "and")
    val tok = toks(d).groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("ntok"),
        avg(length(col("term")).cast("double")).as("wlen"),
        sum(when(col("term").isin(stop: _*), 1).otherwise(0)).cast("double").as("nstop"))
    d.select(col("doc_id"), col("n_chars"),
        (length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double") /
          length(col("text")).cast("double")).as("punct_ratio"))
      .join(tok, "doc_id")
      .select(col("doc_id"),
        col("ntok").cast("long").as("ntok"),
        quantized(col("wlen")).as("wlen_q"),
        quantized(col("nstop") / col("ntok")).as("stop_q"),
        quantized(col("punct_ratio")).as("punct_q"),
        quantized(
          least(col("ntok") / lit(100.0), lit(1.0)) * lit(0.5)
            + (lit(1.0) - col("punct_ratio")) * lit(0.3)
            + (col("nstop") / col("ntok")) * lit(0.2)).as("quality_q"))
      .orderBy(col("doc_id"))
  }

  /** The GPT-2-style pre-tokenizer pattern: contraction suffixes, then
    * space-prefixed letter runs / digit runs / punctuation runs, then bare
    * whitespace. Leftmost-first alternation behaves identically in Java
    * regex (Spark) and RE2 (DuckDB) on this ASCII corpus — parity verified
    * empirically across every doc before the oracle was added.
    */
  val BpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (word pieces + digits + punctuation marks each count).
    */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"),
        size(filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= ""))
          .cast("long").as("word_tokens"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
          .cast("long").as("bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Winnowing document fingerprint (the MOSS rolling-hash scheme): hash
    * every k-char gram, slide a w-gram window, keep each window's minimum —
    * guaranteed to share fingerprints with any copy of length ≥ k+w-1.
    * Pure column expressions (transform over an index sequence + slice +
    * array_min), so it whole-stage-codegens and transliterated DuckDB
    * (window min over the gram rows) computes the identical set.
    */
  def winnowFingerprint(spark: SparkSession, sfDir: String,
                        k: Int = 8, w: Int = 4): DataFrame = {
    val s = col("text")
    val grams = transform(sequence(lit(1), length(s) - (k - 1)),
      i => md5(s.substr(i, lit(k))))
    val mins = when(size(col("grams")) >= w,
        transform(sequence(lit(1), size(col("grams")) - (w - 1)),
          j => array_min(slice(col("grams"), j, lit(w)))))
      .otherwise(col("grams"))
    docs(spark, sfDir)
      .filter(length(s) >= k)
      .select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"), array_sort(array_distinct(mins)).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        md5(concat_ws(",", col("fps"))).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: digest of the sorted distinct token set — the
    * canonical-form rolling-hash family (order-insensitive variant so it is
    * exactly SQL-transliterable).
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    toks(docs(spark, sfDir)).distinct()
      .groupBy(col("doc_id"))
      .agg(md5(concat_ws(" ", array_sort(collect_set(col("term"))))).as("fp"))
      .orderBy(col("doc_id"))
}
