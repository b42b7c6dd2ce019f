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

  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false))), nullable = false)))

  /** Resize plumbing: decode → scale → re-encode, per partition. The
    * scale kernel is the STUB (deterministic byte subsampling standing
    * in for a pixel resampler); the surrounding shape — binary in,
    * binary out, metadata updated to the target dims, per-partition
    * batch loop — is the real contract a codec-backed implementation
    * drops into.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val spark = media.sparkSession
    // long area: 46341² already overflows Int, which would silently
    // collapse every item to 1 byte
    val targetArea = targetW.toLong * targetH
    val rdd = media.select("doc_id", "content", "meta.mime").rdd.mapPartitions { it =>
      // real resizers initialize codec/scaler state once per partition
      it.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        // STUB kernel: proportional byte subsample to the target "area";
        // empty content (truncated/corrupt media is in-domain — that is
        // what byteEntropy screens for) stays empty
        val outLen = math.min(content.length.toLong, targetArea / 64).toInt
        val out = Array.tabulate(outLen)(i =>
          content((i.toLong * content.length / outLen).toInt))
        Row(r.getAs[Long]("doc_id"), out,
          Row(r.getAs[String]("mime"), out.length.toLong, targetW, targetH))
      }
    }
    spark.createDataFrame(rdd, resizeSchema)
  }

  private val entropySchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = false)))

  /** Shannon byte entropy per media item — a REAL feature (no codec
    * needed): compressed/encrypted content sits near 8 bits/byte,
    * text-like payloads well below, truncated or zero-padded files
    * collapse toward 0 — the cheap corruption/mislabel screen for a
    * binary-column corpus. One pass per item over a 256-cell local
    * histogram in mapPartitions; nothing but (id, long, double) rows
    * come back.
    */
  def byteEntropy(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val ln2 = math.log(2.0)
    val rdd = media.select("doc_id", "content").rdd.mapPartitions { it =>
      val hist = new Array[Long](256)
      it.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        java.util.Arrays.fill(hist, 0L)
        var i = 0
        while (i < content.length) { hist(content(i) & 0xff) += 1; i += 1 }
        var h = 0.0
        var b = 0
        while (b < 256) {
          if (hist(b) > 0) {
            val p = hist(b).toDouble / content.length
            h -= p * (math.log(p) / ln2)
          }
          b += 1
        }
        Row(r.getAs[Long]("doc_id"), content.length.toLong, h)
      }
    }
    spark.createDataFrame(rdd, entropySchema)
  }

  /** Perceptual-hash signatures over binary content: the codegen'd
    * [[graft.functions.AHash64]] average-hash as a row-local projection
    * — (doc_id, n_bytes, ahash). The image-dedup primitive (aHash over
    * the 8×8 grayscale grid; here the raw bytes stand in for the
    * decoded luma plane, so the kernel itself is REAL and the codec is
    * the only stub). Near-dup pairs come from banded hamming over
    * these signatures — rename `ahash` to `simhash` and reuse
    * [[graft.operators.Dedup.simhashPairs]]'s band equi-join, the
    * image-scale path (never all-pairs).
    */
  def aHash(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      octet_length(col("content")).cast("long").as("n_bytes"),
      graft.functions.MediaExpressions.ahash64(col("content")).as("ahash"))

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
