package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** unix-`cut`-style field projection over delimited text lines.
  *
  * Reference: FieldSelectionHelper
  * (hadoop-mapreduce-client-core/.../mapreduce/lib/fieldsel/FieldSelectionHelper.java:25-60,79,148):
  * a spec like `"4,3,0,1:6,5,1-3,7-"` means key = fields 4,3,0,1 and
  * value = fields 6,5,1..3,7..last (0-based, `a-b` inclusive range, `a-`
  * open-ended), re-joined with the field separator. Missing fields are
  * skipped (emit nothing for them).
  *
  * Spark-first: this is a pure projection — `split` + `slice`/`element_at`
  * + `concat_ws` — so it stays inside whole-stage codegen and the scan
  * only reads the one string column.
  */
object FieldSelection {

  /** One element of a field spec: a single index or an inclusive range. */
  sealed trait Part
  final case class Single(i: Int) extends Part
  final case class Range(from: Int, to: Option[Int]) extends Part

  /** Parse one side of a spec (comma-separated list of `i`, `a-b`, `a-`). */
  def parseList(spec: String): Seq[Part] =
    spec.split(",").toIndexedSeq.filter(_.nonEmpty).map { s =>
      if (s.contains("-")) {
        val Array(a, b) = s.split("-", -1)
        Range(a.toInt, if (b.isEmpty) None else Some(b.toInt))
      } else Single(s.toInt)
    }

  /** Parse a full `keySpec:valueSpec` pair. */
  def parseSpec(spec: String): (Seq[Part], Seq[Part]) = {
    val Array(k, v) = spec.split(":", -1)
    (parseList(k), parseList(v))
  }

  /** Column of re-joined selected fields (NULL-safe: out-of-range indices
    * contribute nothing, matching the reference's silent skip).
    * concat_ws flattens array arguments and skips NULLs natively and is
    * whole-stage-codegen'd — no interpreted filter/flatten HOF chain.
    */
  def selectFields(arr: Column, parts: Seq[Part], sep: String): Column = {
    val pieces: Seq[Column] = parts.map {
      case Single(i)            => try_element_at(arr, lit(i + 1))
      case Range(a, Some(b))    => slice(arr, a + 1, math.max(b - a + 1, 0))
      case Range(a, None)       =>
        slice(arr, lit(a + 1), greatest(size(arr) - a, lit(0)))
    }
    concat_ws(sep, pieces: _*)
  }

  /** Apply spec to a line column: returns (sel_key, sel_value) strings. */
  def apply(df: DataFrame, line: Column, spec: String, sep: String): DataFrame = {
    val (kParts, vParts) = parseSpec(spec)
    val arr = split(line, java.util.regex.Pattern.quote(sep))
    df.select(
      selectFields(arr, kParts, sep).as("sel_key"),
      selectFields(arr, vParts, sep).as("sel_value"))
  }
}
