package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join: membership filtering of a huge fact
  * table against a key set too large to broadcast-hash-join but small
  * enough for a Bloom filter (~10 bits/key at 1% fpp vs ~100 bytes/key
  * for a hash relation — the regime between "broadcast it" and "shuffle
  * everything").
  *
  * Two phases: (1) build a Bloom filter over the key side — one
  * aggregation, a bounded driver artifact sized by `expectedKeys`;
  * (2) filter the big side AGAINST THE BROADCAST FILTER BEFORE ITS
  * SHUFFLE, then close with an exact left-semi join so false positives
  * never reach the result. At 100 TB the win is phase 2's placement:
  * a selective key set drops most fact rows ahead of the semi-join
  * exchange, so the shuffle carries the survivors only — the manual
  * form of Spark's runtime row-level bloom injection
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), for when the
  * pattern is KNOWN and the build side should be computed once and
  * reused across queries.
  *
  * The result is exactly `big LEFT SEMI JOIN keys` (the oracle): the
  * bloom can only pass extra rows, and the closing join removes them.
  */
object BloomJoin {

  def bloomSemiJoin(big: DataFrame, keys: DataFrame, keyCol: String,
                    expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1,
      s"bad bloom parameters: n=$expectedKeys fpp=$fpp")
    val bf = keys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    // Scala UDF, deliberately: the filter must evaluate on the scan
    // side pre-shuffle; the per-row mightContain cost is noise against
    // the shuffled bytes it saves. (Spark's own injected version uses
    // an internal BloomFilterMightContain expression — not constructible
    // from the public Column API.)
    import org.apache.spark.sql.types._
    val pred = big.schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
          .apply(col(keyCol).cast("long"))
      case StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
          .apply(col(keyCol))
      case dt => throw new IllegalArgumentException(
        s"bloomSemiJoin supports integral/string keys, got $dt")
    }
    big.filter(pred).join(keys, Seq(keyCol), "left_semi")
  }
}
