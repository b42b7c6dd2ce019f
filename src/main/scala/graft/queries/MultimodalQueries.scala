package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    // perceptual-hash signatures (codegen'd ahash64, row-local): the
    // image near-dup primitive; oracle replays the byte sampling via
    // hex(blob) indexing and the exact 64·v > Σv threshold
    "multimodal_ahash" -> ((s, dir) => Multimodal.aHash(media(s, dir))),

    // banded hamming near-dup pairs over the aHash signatures — the
    // SAME band equi-join machinery as simhash_pairs (never all-pairs).
    // The fixture has no natural byte-near-dup items, so re-encoded
    // variants are planted deterministically (the script_profile damage
    // discipline): every 25th item recurs with 3 bytes overwritten
    // length-preservingly — sample positions stay aligned, so the
    // variant lands within the hamming threshold of its original and
    // the check is non-vacuous at every fixture scale. Empty items
    // (all-zeros sentinel hash, no signal) never pair on either engine.
    "multimodal_ahash_pairs" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val variants = d
        .filter(col("doc_id") % 25 === 0 && length(col("text")) >= 12)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(substring(col("text"), 1, 9), lit("zzz"),
            expr("substring(text, 13, length(text))")).as("text"))
      val items = d.select(col("doc_id"), col("text")).unionByName(variants)
      graft.operators.Dedup.simhashPairs(
        Multimodal.aHash(Multimodal.fabricate(items))
          .filter(col("n_bytes") > 0)
          .select(col("doc_id"), col("ahash").as("simhash")),
        "doc_id", maxDist = 3, maxBucket = 1000)
    }),

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

  // The aHash replay: byte k of the blob is hex-pair k of hex(blob);
  // sample positions, the integer mean threshold (64·v > Σv), and the
  // '0'/'1' string all mirror functions.AHash64 exactly. No leading
  // WITH so consumers extend the chain; `src` is the (doc_id, text)
  // item source the chain hashes.
  private def ahashChain(src: String): String =
    s"""m AS (
      |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      |  FROM $src
      |), sb AS (
      |  SELECT doc_id, i,
      |         ('0x' || substring(hx, 2*(1 + (i*n)//64) - 1, 2))::BIGINT AS v
      |  FROM m, (SELECT unnest(range(0, 64)) AS i)
      |  WHERE n > 0
      |), tt AS (
      |  SELECT doc_id, SUM(v) AS tot FROM sb GROUP BY doc_id
      |), sigs AS (
      |  SELECT sb.doc_id,
      |         string_agg(CASE WHEN v*64 > tt.tot THEN '1' ELSE '0' END, '' ORDER BY i) AS ahash
      |  FROM sb JOIN tt USING (doc_id) GROUP BY sb.doc_id
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "multimodal_ahash" ->
      s"""WITH ${ahashChain("documents")}
        |SELECT m.doc_id, CAST(m.n AS BIGINT) AS n_bytes,
        |       COALESCE(s.ahash, repeat('0', 64)) AS ahash
        |FROM m LEFT JOIN sigs s USING (doc_id)""".stripMargin,
    "multimodal_ahash_pairs" ->
      s"""WITH items AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         substring(text, 1, 9) || 'zzz' || substring(text, 13, length(text))
        |  FROM documents WHERE doc_id % 25 = 0 AND length(text) >= 12
        |), ${ahashChain("items")}, banded AS (
        |  SELECT doc_id, ahash AS simhash, b AS band,
        |         substring(ahash, 1 + 16*b, 16) AS bits
        |  FROM sigs, (SELECT unnest(range(0, 4)) AS b)
        |), bkept AS (
        |  SELECT x.* FROM banded x
        |  JOIN (SELECT band, bits FROM banded GROUP BY band, bits HAVING COUNT(*) <= 1000) ok
        |    USING (band, bits)
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |                  x.simhash AS sig_a, y.simhash AS sig_b
        |  FROM bkept x JOIN bkept y
        |    ON x.band = y.band AND x.bits = y.bits AND x.doc_id < y.doc_id
        |)
        |SELECT doc_a, doc_b,
        |       CAST(bit_count(xor(sig_a::BIT, sig_b::BIT)) AS BIGINT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(sig_a::BIT, sig_b::BIT)) <= 3""".stripMargin,
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
