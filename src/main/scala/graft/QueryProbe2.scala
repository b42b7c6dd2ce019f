package graft

import org.apache.spark.sql.functions._

/** Dev-only probe: band-bucket membership distribution at sf0.1, to pick
  * a maxBucket cap comfortably above anything real data produces.
  */
object QueryProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d = Tables(spark, dir, "documents")
    println("docs=" + d.count())

    // simhash band buckets
    val sig = operators.Dedup.simhash(d, "doc_id", "text")
    val width = 16
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"), substring(col("simhash"), 1 + width * b, width).as("bits"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bits").as("bits"))
    banded.groupBy("band", "bits").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc).show(10, false)

    // minhash band buckets
    val hs = operators.Dedup.shingleHashes(
      operators.Dedup.shingleTable(d, "doc_id", "text", 3), "doc_id")
    val mh = operators.Dedup.minhashSignaturesFromHashes(hs, "doc_id", 16)
    val bands2 = (0 until 4).map { b =>
      val slots = (b * 4 until (b + 1) * 4).map(i => col(s"s$i").cast("string"))
      struct(lit(b).as("band"), md5(concat_ws(",", slots: _*)).as("bh"))
    }
    mh.select(col("doc_id"), explode(array(bands2: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bh").as("bh"))
      .groupBy("band", "bh").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc).show(10, false)
    spark.stop()
  }
}
