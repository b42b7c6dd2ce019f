package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sudoku as exact cover — the reference's dancing/Sudoku.java reduced
  * to the same DLX engine Pentomino uses (examples/dancing/Sudoku.java:
  * 236-299 builds identical constraint columns: cell filled, digit per
  * row, digit per column, digit per sub-square; a puzzle is solved when
  * every column is covered exactly once).
  *
  * The reference solves one puzzle per process invocation. The Spark
  * form is the embarrassingly-parallel shape a puzzle BATCH wants: one
  * task per puzzle row, solver runs where the row lives, only the
  * solved grid string comes back — no shuffle at all (the per-puzzle
  * search is indivisible and tiny; Pentomino covers the
  * one-giant-search-tree case with prefix splitting).
  *
  * Board format = the reference's: one line per row, whitespace-
  * separated tokens, digits or `?` for open cells; sub-square geometry
  * derived as squareY = floor(sqrt(n)), squareX = n / squareY
  * (Sudoku.java:159-162 — so 6×6 boards get 3×2 boxes).
  */
object Sudoku {

  /** Parse the reference board format to a row-major grid, -1 = open.
    * Presets outside 1..n are rejected here — an out-of-range digit
    * would otherwise alias into a DIFFERENT constraint column block
    * (the encoding is positional) and corrupt the model silently.
    */
  def parse(puzzle: String): Array[Array[Int]] = {
    val grid = puzzle.split("\n").map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+").map(t => if (t == "?") -1 else t.toInt))
    require(grid.nonEmpty && grid.forall(_.length == grid.length),
      "board must be square (n lines of n tokens)")
    require(grid.forall(_.forall(v => v == -1 || (v >= 1 && v <= grid.length))),
      s"preset values must be ? or 1..${grid.length}")
    grid
  }

  /** Solve one puzzle; the solved grid in the same line format, or
    * None for an unsolvable board.
    */
  def solve(puzzle: String): Option[String] = {
    val grid = parse(puzzle)
    val n = grid.length
    val sy = math.sqrt(n).toInt
    val sx = n / sy
    require(sx * sy == n, s"no integer sub-square split for size $n")
    // columns (Sudoku.java:257-282 order): digit-in-column (x,d),
    // digit-in-row (y,d), digit-in-square (box,d), cell-filled (x,y)
    def rowCols(x: Int, y: Int, d: Int): Seq[Int] = {
      val box = (x / sx) * sx + (y / sy)
      Seq(x * n + d - 1, n * n + y * n + d - 1, 2 * n * n + box * n + d - 1,
        3 * n * n + n * x + y)
    }
    // candidate rows: rowId encodes (x, y, d) so solutions decode
    // without a side table
    val rows = IndexedSeq.newBuilder[Seq[Int]]
    val rowIds = IndexedSeq.newBuilder[(Int, Int, Int)]
    for (x <- 0 until n; y <- 0 until n) {
      val ds = if (grid(y)(x) == -1) 1 to n else Seq(grid(y)(x))
      for (d <- ds) { rows += rowCols(x, y, d); rowIds += ((x, y, d)) }
    }
    val ids = rowIds.result()
    new Pentomino.Dlx(4 * n * n, rows.result()).solveOne().map { chosen =>
      val out = Array.ofDim[Int](n, n)
      chosen.foreach { r => val (x, y, d) = ids(r); out(y)(x) = d }
      out.map(_.mkString(" ")).mkString("\n")
    }
  }

  /** Batch lane: solve every puzzle in `(id, puzzle)` rows, one task
    * per puzzle, NULL solution for unsolvable, malformed, or NULL
    * boards (one bad row among millions must not abort the batch —
    * the SkipBadRecords contract). Pure map — no shuffle, scales to
    * any batch size.
    */
  def solveAll(puzzles: DataFrame, idCol: String, puzzleCol: String): DataFrame = {
    val solver = udf { p: String =>
      if (p == null) null
      else scala.util.Try(solve(p)).toOption.flatten.orNull
    }
    puzzles.select(col(idCol), solver(col(puzzleCol)).as("solution"))
  }
}
