package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed training and map-only
  * application — the subword tokenization stage of a training-data
  * pipeline.
  *
  * Scale architecture: BPE training state is VOCABULARY-sized, not
  * corpus-sized — the classic trainers operate on the word-frequency
  * table. So the one distributed step is a `groupBy(word).sum(freq)`
  * over the token stream (shuffling (word, count) longs only); the
  * top-`maxVocab` table collects to the driver (bounded, the codebook
  * discipline) and the merge loop runs locally. Application is a pure
  * map over documents with the merge ranks broadcast — no shuffle at
  * any corpus size.
  *
  * Determinism: pair selection breaks frequency ties lexicographically,
  * so the merge list is a pure function of the word-frequency table
  * (itself a pure function of the corpus) — any cluster, partitioning,
  * or retry trains the identical tokenizer.
  */
object Bpe {

  type Merge = (String, String)

  /** End-of-word sentinel appended to each word's symbol sequence
    * (merges never cross word boundaries; a trailing-subword token is
    * distinguishable from a word-internal one).
    */
  val EndMark = "</w>"

  /** The corpus word-frequency table: (word, freq), descending-freq
    * deterministic top-`maxVocab` (ties by word) — one shuffle of
    * (word, count) pairs, then a bounded driver collect.
    */
  def wordFreqs(df: DataFrame, text: String, maxVocab: Int): Seq[(String, Long)] =
    df.select(explode(Dedup.tokens(col(text))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Train `nMerges` merges from the corpus (stops early when no
    * adjacent pair reaches `minCount`). Local loop over the collected
    * word-frequency table — O(vocab · avgWordLen) per merge.
    */
  def train(df: DataFrame, text: String, nMerges: Int,
            maxVocab: Int = 50000, minCount: Long = 2L): Seq[Merge] =
    trainLocal(wordFreqs(df, text, maxVocab), nMerges, minCount)

  /** MD5 of the merge list (pair-and-order sensitive): a bounded
    * fingerprint of the trained tokenizer that rides query output, so
    * any nondeterminism in training (partitioning, retries) is visible
    * as a checksum change rather than silently different tokenizations.
    */
  def mergesChecksum(merges: Seq[Merge]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // non-printing separators: ("ab","c") and ("a","bc") must not
    // collide in the digest input
    val s = merges.map { case (a, b) => a + "\u0001" + b }.mkString("\u0002")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The driver-side merge loop, exposed for spec-level verification
    * against hand-computed merges.
    */
  def trainLocal(freqs: Seq[(String, Long)], nMerges: Int,
                 minCount: Long = 2L): Seq[Merge] = {
    var vocab: Map[Vector[String], Long] =
      freqs.groupMapReduce { case (w, _) =>
        w.map(_.toString).toVector :+ EndMark }(_._2)(_ + _)
    val merges = Vector.newBuilder[Merge]
    var done = false
    var m = 0
    while (m < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[Merge, Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      // max count; ties break toward the lexicographically smallest
      // pair — deterministic regardless of map iteration order
      val best = pairCounts.foldLeft(Option.empty[(Merge, Long)]) {
        case (acc, (p, c)) => acc match {
          case Some((bp, bc)) if c < bc || (c == bc &&
            (bp._1 < p._1 || (bp._1 == p._1 && bp._2 <= p._2))) => acc
          case _ => Some((p, c))
        }
      }
      best match {
        case Some((p, c)) if c >= minCount =>
          merges += p
          vocab = vocab.groupMapReduce { case (syms, _) =>
            mergeOnce(syms, p) }(_._2)(_ + _)
          m += 1
        case _ => done = true
      }
    }
    merges.result()
  }

  private def mergeOnce(syms: Vector[String], p: Merge): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word with a trained merge list (lowest-rank adjacent
    * pair merges first — the standard BPE apply order).
    */
  def encodeWord(word: String, ranks: Map[Merge, Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ EndMark
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Subword-token column for a text column: whitespace-split, each
    * word BPE-encoded. The merge ranks ride to executors once
    * (broadcast by the UDF closure); per-partition encoding memoizes
    * word → subwords, so each DISTINCT word per partition encodes once
    * (Zipfian corpora re-encode almost nothing).
    */
  def tokenize(df: DataFrame, text: String, merges: Seq[Merge]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val b = df.sparkSession.sparkContext.broadcast(ranks)
    // memo capped at 2^20 distinct words PER TASK (the closure-captured
    // map deserializes fresh with each task): Zipf means even a
    // task-scoped memo covers essentially all occurrences within its
    // partition, and an adversarial all-unique-words corpus can't grow
    // executor memory unboundedly. NULL text yields NULL tokens —
    // the same propagation as Dedup.tokens and the other Column
    // operators, so size()/IS NULL consumers see symmetric semantics.
    val memo = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
    val enc = udf { s: String =>
      if (s == null) null
      else graft.operators.Dedup.tokensLocal(s).flatMap { w =>
        val hit = memo.get(w)
        if (hit != null) hit
        else {
          val e = encodeWord(w, b.value)
          if (memo.size < (1 << 20)) memo.putIfAbsent(w, e)
          e
        }
      }
    }
    df.withColumn("bpe_tokens", enc(col(text)))
  }
}
