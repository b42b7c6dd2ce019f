package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` content plus typed metadata.
  *
  * The container has no codec libraries, so the DECODE step is a
  * clearly-marked deterministic STUB (`fakeDecode`) — the Spark-side
  * plumbing (schema, binary columns, per-partition batch processing,
  * feature extraction shape) is real and tested. Swap `fakeDecode` for
  * a JNI/codec call in production; nothing else changes.
  *
  * Scale notes: content stays binary end-to-end (no base64 round trip);
  * decode runs in mapPartitions so a real decoder amortizes setup per
  * partition, exactly how a Pandas-UDF batch would on PySpark.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Fabricate a media table from text documents (test stand-in for
    * reading real image/audio bytes: `spark.read.format("binaryFile")`).
    */
  def fabricate(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder: deterministic pseudo-dimensions from the byte length.
    * A real implementation would parse the container header here.
    */
  private[multimodal] def fakeDecode(content: Array[Byte]): (Long, Int, Int) = {
    val n = content.length.toLong
    (n, (64 + n % 577).toInt, (64 + (n * 31) % 343).toInt)
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Per-partition decode + feature extraction over binary content. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "content").rdd.mapPartitions { it =>
      // real decoders initialize per-partition state here (codec ctx)
      it.map { r =>
        val (n, w, h) = fakeDecode(r.getAs[Array[Byte]]("content"))
        Row(r.getAs[Long]("doc_id"), n, w, h)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling: n evenly spaced byte offsets per media item (the
    * video-frame-sample shape: one row per sampled frame).
    */
  def frameSample(media: DataFrame, frames: Int): DataFrame =
    media.select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      posexplode(expr(
        // integer division (div) so the oracle's `//` matches exactly
        s"transform(sequence(0, ${frames - 1}), i -> (cast(i as bigint) * meta.n_bytes) div $frames)"))
        .as(Seq("frame_idx", "byte_offset")))
}
