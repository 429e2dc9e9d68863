package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched per-partition passes.
  *
  * The decode step is STUBBED (deterministic fake — no image/audio libs in
  * this container): `fakeDecode` derives "pixels" from the bytes
  * deterministically. Everything around it is the real Spark shape —
  * binary column schema, partition-batched processing (`mapPartitions`, the
  * Scala analog of `mapInPandas` batches), metadata struct output, and
  * pushdown-friendly projections.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, byte_len: Long, width: Int, height: Int,
                             first_byte: Int, frame_checksum: Long)

  /** documents.text → a binary "media blob" (UTF-8 bytes stand in for an
    * encoded image; at scale this column arrives as real parquet BINARY).
    */
  def asBinary(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))

  /** STUB decoder: deterministic fake dimensions + a frame-sample checksum
    * (every 10th byte — the frame-sampling access pattern).
    */
  private[graft] def fakeDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length
    val width = 16 + (len % 640)
    val height = 16 + (len % 480)
    var checksum = 0L
    var i = 0
    while (i < len) { checksum += (bytes(i) & 0xff).toLong; i += 10 }
    MediaMeta(docId, len.toLong, width, height,
      if (len > 0) bytes(0) & 0xff else 0, checksum)
  }

  /** Batched decode/feature-extract over the binary column: one partition =
    * one batch (the `mapInPandas` shape); output is a typed metadata table.
    */
  def extractMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    asBinary(spark, sfDir)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => fakeDecode(id, b) })
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Metadata-only projection expressible as pure column ops — the
    * DuckDB-checkable subset (byte length, first byte, fake dims).
    */
  def metaColumns(spark: SparkSession, sfDir: String): DataFrame =
    asBinary(spark, sfDir)
      .select(col("doc_id"),
        length(col("blob")).cast("long").as("byte_len"),
        (lit(16) + length(col("blob")) % 640).cast("long").as("width"),
        (lit(16) + length(col("blob")) % 480).cast("long").as("height"))
      .orderBy(col("doc_id"))
}
