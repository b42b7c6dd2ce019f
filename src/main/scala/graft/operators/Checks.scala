package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the dbt-test / Deequ-shape
  * capability): a rule set evaluated over a table in bulk, reporting
  * one (check, n_bad) row per rule. Every rule compiles to the
  * scale-correct plan for its class — no generic row-by-row validator:
  *
  *  - notNull / inRange / satisfies: a filter + count riding ONE scan
  *    (all such rules share it via a single multi-aggregate projection)
  *  - unique: groupBy the key, count rows beyond the first per
  *    duplicate group (map-side combined; the shuffle carries key +
  *    partial counts, never rows)
  *  - refIntegrity: LEFT ANTI join against the dimension's key column
  *    (broadcast when small) counting orphans
  *
  * At 100 TB an audit is a first-class batch job — these are the same
  * shapes the TPC-H queries pin, so the report costs one scan per
  * table plus one narrow shuffle per unique/FK rule.
  */
object Checks {

  sealed trait Check { def name: String }
  /** `col` must never be null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null:$col"
  }
  /** `cols` combination must be unique; n_bad counts the surplus rows
    * (total members minus one per duplicated key).
    */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique:${cols.mkString("+")}"
  }
  /** Closed numeric bounds. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range:$col"
  }
  /** Arbitrary row predicate that must hold. */
  final case class Satisfies(label: String, pred: Column) extends Check {
    def name = s"satisfies:$label"
  }
  /** Every non-null `col` value must exist in `dim`'s `dimCol`. */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String)
      extends Check {
    def name = s"ref_integrity:$col"
  }

  /** Evaluate `checks` over `df`: one (check, n_bad) row each, row-rule
    * counts fused into a single scan.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check list")
    // the fused row-rule lane keys a map literal by check name, and
    // Spark's default mapKeyDedupPolicy=EXCEPTION makes a duplicate
    // name (two NotNulls on one column, two Satisfies with one label)
    // a runtime failure — fail fast at build time instead
    locally {
      val dup = checks.map(_.name).groupBy(identity).collect {
        case (n, occ) if occ.size > 1 => n
      }
      require(dup.isEmpty, s"duplicate check names: ${dup.mkString(", ")}")
    }
    val spark = df.sparkSession
    // all row-local rules fused: one scan, one aggregate row
    val rowRules: Seq[(String, Column)] = checks.collect {
      case c @ NotNull(col0) => c.name -> col(col0).isNull
      case c @ InRange(col0, lo, hi) =>
        c.name -> !(col(col0) >= lo && col(col0) <= hi)
      case c @ Satisfies(_, pred) => c.name -> !pred
    }
    val fused: Option[DataFrame] = Option.when(rowRules.nonEmpty) {
      val agg = df.agg(
        sum(when(rowRules.head._2, 1L).otherwise(0L)).as("c0"),
        rowRules.tail.zipWithIndex.map { case ((_, bad), i) =>
          sum(when(bad, 1L).otherwise(0L)).as(s"c${i + 1}")
        }: _*)
      agg.select(explode(map(
        rowRules.zipWithIndex.flatMap { case ((n, _), i) =>
          Seq(lit(n), coalesce(col(s"c$i"), lit(0L))) }: _*))
        .as(Seq("check", "n_bad")))
    }
    val keyed: Seq[DataFrame] = checks.collect {
      case c @ Unique(cols) =>
        val surplus = df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("n")).filter(col("n") > 1)
          .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_bad"))
        surplus.select(lit(c.name).as("check"), col("n_bad"))
      case c @ RefIntegrity(col0, dim, dimCol) =>
        df.filter(col(col0).isNotNull)
          .join(dim.select(col(dimCol).as(col0)).distinct(), Seq(col0), "left_anti")
          .agg(count(lit(1)).as("n_bad"))
          .select(lit(c.name).as("check"), col("n_bad"))
    }
    (fused.toSeq ++ keyed).reduce(_ unionByName _)
  }
}
