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

  /** One `-k` group, mirroring KeyFieldHelper.KeyDescription
    * (KeyFieldHelper.java:43-56): fields f1..f2 inclusive (f2 None ≙
    * endFieldIdx 0 = through END OF LINE, the unix-sort default), char
    * offsets c1 within f1 and c2 within f2 (c2 = 0 ≙ end of field f2),
    * numeric and reverse flags.
    */
  final case class KeySpec(f1: Int, c1: Int, f2: Option[Int], c2: Int,
                           numeric: Boolean, reverse: Boolean)

  /** Parse `"-k2,2nr -k1 -nr -k1.2n,3.4"` / `"2,2nr 1"` style specs.
    *
    * Grammar fidelity (KeyFieldHelper.java:160-280 + its jobclient test
    * matrix): flags may follow the begin pos, the end pos, or both
    * (union); standalone `-n`/`-r`/`-nr` set GLOBAL flags applied to
    * every key that carries none of its own; `-k <arg>` may be two
    * tokens.
    */
  def parse(spec: String): Seq[KeySpec] = {
    val toks = spec.trim.split("\\s+").filter(_.nonEmpty)
    var (gNum, gRev) = (false, false)
    val keys = scala.collection.mutable.Buffer[KeySpec]()
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case "-n"          => gNum = true
        case "-r"          => gRev = true
        case "-nr" | "-rn" => gNum = true; gRev = true
        case t if t.startsWith("-k") || t.headOption.exists(_.isDigit) =>
          val body = if (t.startsWith("-k")) t.stripPrefix("-k") else t
          val keyArgs = if (body.nonEmpty) body else { i += 1; toks(i) }
          keys += parseKey(keyArgs)
        case other =>
          throw new IllegalArgumentException(s"bad key spec token: $other")
      }
      i += 1
    }
    keys.map(k =>
      if (!k.numeric && !k.reverse) k.copy(numeric = gNum, reverse = gRev)
      else k).toSeq
  }

  /** `1[.3][nr][,1[.5][nr]]` — the exact KeyFieldHelper.parseKey state
    * machine (KeyFieldHelper.java:196-280).
    */
  private def parseKey(s: String): KeySpec = {
    val st = new java.util.StringTokenizer(s, "nr.,", true)
    var c1 = 1; var f2: Option[Int] = None; var c2 = 0
    var num = false; var rev = false
    val f1 = st.nextToken().toInt

    def flags(tok: String): Option[String] = {  // consume n/r run, return next non-flag
      var t = tok
      while (t == "n" || t == "r") {
        if (t == "n") num = true else rev = true
        if (!st.hasMoreTokens) return None
        t = st.nextToken()
      }
      Some(t)
    }

    if (st.hasMoreTokens) {
      var tok = st.nextToken()
      var cont = true
      if (tok == ".") {
        c1 = st.nextToken().toInt
        if (st.hasMoreTokens) tok = st.nextToken() else cont = false
      }
      if (cont) flags(tok) match {
        case Some(",") =>
          f2 = Some(st.nextToken().toInt)
          if (st.hasMoreTokens) {
            var t2 = st.nextToken()
            var cont2 = true
            if (t2 == ".") {
              c2 = st.nextToken().toInt
              if (st.hasMoreTokens) t2 = st.nextToken() else cont2 = false
            }
            if (cont2) flags(t2)      // trailing flags after the end pos
          }
        case _ => ()                  // trailing junk breaks, like the reference
      }
    }
    KeySpec(f1, c1, f2, c2, num, rev)
  }

  /** The value column one KeySpec selects from a split-line array. */
  def keyValue(arr: Column, k: KeySpec, sep: String): Column = {
    val raw = k.f2 match {
      case None =>
        // endFieldIdx 0: from field f1 char c1 through end of line
        val joined = array_join(
          slice(arr, lit(k.f1), greatest(size(arr) - (k.f1 - 1), lit(0))), sep)
        if (k.c1 > 1) substring(joined, k.c1, Int.MaxValue) else joined
      case Some(f2) if f2 == k.f1 =>
        val f = try_element_at(arr, lit(k.f1))
        val upTo = if (k.c2 > 0) substring(f, 1, k.c2) else f
        if (k.c1 > 1) substring(upTo, k.c1, Int.MaxValue) else upTo
      case Some(f2) =>
        val first = {
          val f = try_element_at(arr, lit(k.f1))
          if (k.c1 > 1) substring(f, k.c1, Int.MaxValue) else f
        }
        val mids = slice(arr, lit(k.f1 + 1), lit(f2 - k.f1 - 1))
        val last = {
          val f = try_element_at(arr, lit(f2))
          if (k.c2 > 0) substring(f, 1, k.c2) else f
        }
        array_join(concat(array(first), mids, array(last)), sep)
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
