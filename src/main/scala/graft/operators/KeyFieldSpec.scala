package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** unix-sort `-k` key specs over delimited text lines.
  *
  * Reference: KeyFieldBasedComparator
  * (mapreduce/lib/partition/KeyFieldBasedComparator.java:25-54, grammar
  * documented at :37-49; parser KeyFieldHelper.java:1-296) supports
  * `-k pos1[,pos2]` with `n` (numeric) and `r` (reverse) flags, where
  * pos = field[.char], 1-based. KeyFieldBasedPartitioner
  * (KeyFieldBasedPartitioner.java:1-158) partitions on the same subkey.
  *
  * Spark-first: a spec compiles to ordinary sort/partition expressions —
  * Catalyst handles codegen'd comparison; there is no custom comparator
  * object at runtime.
  */
object KeyFieldSpec {

  /** One `-k` group: fields f1..f2 (inclusive; f2 None = f1 only),
    * starting char offset c1 within f1, numeric and reverse flags.
    */
  final case class KeySpec(f1: Int, c1: Int, f2: Option[Int],
                           numeric: Boolean, reverse: Boolean)

  /** Parse `"-k2,2nr -k1"` / `"2,2nr 1"` style specs. */
  def parse(spec: String): Seq[KeySpec] =
    spec.trim.split("\\s+").toIndexedSeq.filter(_.nonEmpty).map { tokRaw =>
      val tok = tokRaw.stripPrefix("-k")
      val flags = tok.reverse.takeWhile(c => c == 'n' || c == 'r').reverse
      val body = tok.dropRight(flags.length)
      val parts = body.split(",", -1)
      def posOf(p: String): (Int, Int) = p.split("\\.", -1) match {
        case Array(f)    => (f.toInt, 1)
        case Array(f, c) => (f.toInt, c.toInt)
      }
      val (f1, c1) = posOf(parts(0))
      val f2 = if (parts.length > 1) Some(posOf(parts(1))._1) else None
      KeySpec(f1, c1, f2, flags.contains('n'), flags.contains('r'))
    }

  /** The value column one KeySpec selects from a split-line array. */
  def keyValue(arr: Column, k: KeySpec, sep: String): Column = {
    val raw = k.f2 match {
      case None | Some(k.`f1`) =>
        val f = try_element_at(arr, lit(k.f1))
        if (k.c1 > 1) substring(f, k.c1, Int.MaxValue) else f
      case Some(f2) =>
        array_join(slice(arr, lit(k.f1), lit(f2 - k.f1 + 1)), sep)
    }
    if (k.numeric) raw.cast("double") else raw
  }

  /** Sort columns for `df.orderBy`/`sortWithinPartitions`.
    *
    * NOTE: these are computed expressions — for large sorts prefer
    * [[keyColumns]] + `TotalOrderSort.withRankKeyed`, which materializes
    * the keys once instead of re-evaluating the split per comparison.
    */
  def sortColumns(arr: Column, spec: String, sep: String): Seq[Column] =
    parse(spec).map { k =>
      val v = keyValue(arr, k, sep)
      if (k.reverse) v.desc else v.asc
    }

  /** (key expression, descending?) pairs for materialized-key sorting. */
  def keyColumns(arr: Column, spec: String, sep: String): Seq[(Column, Boolean)] =
    parse(spec).map(k => (keyValue(arr, k, sep), k.reverse))

  /** Partition expression (the KeyFieldBasedPartitioner subkey). */
  def partitionKey(arr: Column, spec: String, sep: String): Column =
    concat_ws("", parse(spec).map(k => keyValue(arr, k, sep).cast("string")): _*)
}
