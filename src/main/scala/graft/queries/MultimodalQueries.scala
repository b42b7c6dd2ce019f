package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing queries: binary content fabricated from document
  * text (no codecs in the container — see Multimodal scaladoc), decode
  * stub + frame sampling over real binary columns. The oracle recomputes
  * the deterministic features from octet_length.
  */
object MultimodalQueries extends QueryModule {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.fabricate(Tables(s, dir, "documents"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode" -> ((s, dir) => Multimodal.decodeFeatures(media(s, dir))),
    "multimodal_frames" -> ((s, dir) => Multimodal.frameSample(media(s, dir), 4)),
    // byte-entropy screen over binary content — a REAL feature (no
    // codec): float-log accumulation has no exact SQL replay, so the
    // driver records rows-only. Three SENTINEL items with analytically
    // known entropies ride every run (doc_id < 0: constant bytes -> 0
    // bits, two-symbol -> 1, uniform -> 8), so the kernel's exactness
    // is visible in the row output the driver records; the same values
    // are asserted on this query in OperatorSpec.
    "multimodal_entropy" -> ((s, dir) => {
      import s.implicits._
      val sent = Seq(
        (-1L, Array.fill[Byte](128)(7)),
        (-2L, Array.tabulate[Byte](64)(i => (i % 2).toByte)),
        (-3L, Array.tabulate[Byte](256)(i => i.toByte)))
        .toDF("doc_id", "content")
      Multimodal.byteEntropy(
        media(s, dir).select("doc_id", "content").unionByName(sent))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(64 + octet_length(encode(text)) % 577 AS INTEGER) AS width,
        |  CAST(64 + (octet_length(encode(text)) * 31) % 343 AS INTEGER) AS height
        |FROM documents""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(i AS INTEGER) AS frame_idx,
        |  CAST((i * octet_length(encode(text))) // 4 AS BIGINT) AS byte_offset
        |FROM documents, (SELECT unnest(range(0, 4)) AS i)""".stripMargin
  )
}
