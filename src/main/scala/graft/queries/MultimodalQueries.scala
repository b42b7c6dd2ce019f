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
    // driver records rows-only; exact values on known byte patterns
    // are spec'd (uniform=8 bits, constant=0, two-symbol=1)
    "multimodal_entropy" -> ((s, dir) => Multimodal.byteEntropy(media(s, dir)))
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
