package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels (the SURVEY §7 "custom Expression" tier:
  * a native Catalyst Expression with doGenCode beats a Scala UDF, and
  * both beat the interpreted higher-order-function fold —
  * `aggregate(zip_with(...))` allocates an intermediate array and calls
  * a lambda per element; this compiles to a tight primitive loop).
  *
  * Semantics are IDENTICAL to the fold it replaces: per-element upcast
  * to double, sequential left-to-right accumulation — so results stay
  * bit-equal to the DuckDB oracle's DOUBLE[] inner product.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - double-precision dot product of two float/double arrays")
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs float/double arrays, got ${left.dataType}, ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemIsFloat(left)
    val yf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getX = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getX * $getY;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Row-local nearest-codebook-cells assignment: the 0-based indices of
  * the `n` codebook rows with the highest dot products against the input
  * vector, best first (first-max-wins on score ties — lowest index). The
  * codebook rides along as a reference object, so cell assignment is a
  * pure projection: NO join, NO explode, NO shuffle between the scan and
  * the assignment — the fix for the window-argmax anti-pattern (base ×
  * nCells explode + full shuffle) that cannot survive a 100× scale-up.
  * With L2-normalized codebook rows, dot-product order == cosine order.
  */
case class NearestCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, second.foldable, third.dataType, third.foldable) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _), true, IntegerType, true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells needs (float/double array, foldable array<array<double>> codebook, foldable int n), got $other")
    }

  /** The codebook, extracted once from the foldable literal — per-row
    * evaluation touches only this primitive double[][]. */
  private lazy val cells: Array[Array[Double]] = {
    val arr = second.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toDoubleArray())
  }

  private lazy val topN: Int =
    math.max(1, math.min(third.eval().asInstanceOf[Int], cells.length))

  private def elemIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, u1: Any, u2: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val xf = elemIsFloat
    val n = topN
    val bs = new Array[Double](n)
    val bi = new Array[Int](n)
    var filled = 0
    var c = 0
    while (c < cells.length) {
      val cell = cells(c)
      val m = math.min(x.numElements(), cell.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        acc += xi * cell(i)
        i += 1
      }
      var p = filled
      while (p > 0 && acc > bs(p - 1)) p -= 1
      if (p < n) {
        val end = math.min(filled, n - 1)
        var j = end
        while (j > p) { bs(j) = bs(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bs(p) = acc; bi(p) = c
        if (filled < n) filled += 1
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(bi, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val cb = ctx.addReferenceObj("cells", cells, "double[][]")
      val n = topN
      val bs = ctx.freshName("bs"); val bi = ctx.freshName("bi")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c"); val cell = ctx.freshName("cell")
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val p = ctx.freshName("p")
      val end = ctx.freshName("end"); val j = ctx.freshName("j")
      val getX = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |double[] $bs = new double[$n];
         |int[] $bi = new int[$n];
         |int $filled = 0;
         |for (int $c = 0; $c < $cb.length; $c++) {
         |  double[] $cell = $cb[$c];
         |  int $m = java.lang.Math.min($a.numElements(), $cell.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $acc += $getX * $cell[$i];
         |  }
         |  int $p = $filled;
         |  while ($p > 0 && $acc > $bs[$p - 1]) $p--;
         |  if ($p < $n) {
         |    int $end = java.lang.Math.min($filled, $n - 1);
         |    for (int $j = $end; $j > $p; $j--) { $bs[$j] = $bs[$j-1]; $bi[$j] = $bi[$j-1]; }
         |    $bs[$p] = $acc; $bi[$p] = $c;
         |    if ($filled < $n) $filled++;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($bi, $filled));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** [[NearestCells]] fused with its index→cell-id mapping: returns the
  * IDS (not positions) of the `n` nearest codebook rows, best first.
  * Exists because the composition `transform(nearest_cells(...), i =>
  * element_at(ids, i + 1))` routes through ArrayTransform — a
  * higher-order function, which never enters whole-stage codegen, so
  * the WHOLE projection around it fell back to interpreted evaluation
  * (~1 ms/row on the LSH assignment path, the measured wall of the
  * knn_join / cosinePairsLsh plans). Same scoring loop as NearestCells;
  * the id array rides along as one more foldable literal.
  */
@ExpressionDescription(
  usage = "_FUNC_(vec, codebook, ids, n) - ids of the n nearest codebook rows, best first")
case class NearestCellIds(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, second.foldable,
     third.dataType, third.foldable, fourth.dataType, fourth.foldable) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _), true,
            ArrayType(LongType, _), true, IntegerType, true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "nearest_cell_ids needs (float/double array, foldable array<array<double>> codebook, " +
            s"foldable array<bigint> ids, foldable int n), got $other")
    }

  private lazy val cells: Array[Array[Double]] = {
    val arr = second.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toDoubleArray())
  }

  private lazy val cellIds: Array[Long] = {
    val arr = third.eval().asInstanceOf[ArrayData]
    require(arr.numElements() == cells.length,
      s"nearest_cell_ids: ${cells.length} codebook rows but ${arr.numElements()} ids")
    arr.toLongArray()
  }

  private lazy val topN: Int =
    math.max(1, math.min(fourth.eval().asInstanceOf[Int], cells.length))

  private def elemIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, u1: Any, u2: Any, u3: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val xf = elemIsFloat
    val n = topN
    val bs = new Array[Double](n)
    val bi = new Array[Long](n)
    var filled = 0
    var c = 0
    while (c < cells.length) {
      val cell = cells(c)
      val m = math.min(x.numElements(), cell.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        acc += xi * cell(i)
        i += 1
      }
      var p = filled
      while (p > 0 && acc > bs(p - 1)) p -= 1
      if (p < n) {
        val end = math.min(filled, n - 1)
        var j = end
        while (j > p) { bs(j) = bs(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bs(p) = acc; bi(p) = cellIds(c)
        if (filled < n) filled += 1
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(bi, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _, _) => {
      val cb = ctx.addReferenceObj("cells", cells, "double[][]")
      val idsRef = ctx.addReferenceObj("cellIds", cellIds, "long[]")
      val n = topN
      val bs = ctx.freshName("bs"); val bi = ctx.freshName("bi")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c"); val cell = ctx.freshName("cell")
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val p = ctx.freshName("p")
      val end = ctx.freshName("end"); val j = ctx.freshName("j")
      val getX = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |double[] $bs = new double[$n];
         |long[] $bi = new long[$n];
         |int $filled = 0;
         |for (int $c = 0; $c < $cb.length; $c++) {
         |  double[] $cell = $cb[$c];
         |  int $m = java.lang.Math.min($a.numElements(), $cell.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $acc += $getX * $cell[$i];
         |  }
         |  int $p = $filled;
         |  while ($p > 0 && $acc > $bs[$p - 1]) $p--;
         |  if ($p < $n) {
         |    int $end = java.lang.Math.min($filled, $n - 1);
         |    for (int $j = $end; $j > $p; $j--) { $bs[$j] = $bs[$j - 1]; $bi[$j] = $bi[$j - 1]; }
         |    $bs[$p] = $acc; $bi[$p] = $idsRef[$c];
         |    if ($filled < $n) $filled++;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($bi, $filled));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Row-local nearest-centroid assignment in INTEGER arithmetic: returns
  * `[cluster, dist]` where `cluster` is the 0-based index of the
  * centroid with the smallest squared L2 distance to the input vector
  * (first-min-wins on ties — lowest index) and `dist` that squared
  * distance. Both the vector and the centroids are quantized longs
  * (see Kmeans.quantize), so the distance is an exact integer sum —
  * order-independent and replayable bit-for-bit by the SQL oracle,
  * unlike any float formulation. The centroid table rides along as a
  * reference object (k·dim longs, kilobytes): assignment is a pure
  * projection — NO join, NO explode, NO shuffle between the scan and
  * the cluster id, the Lloyd-iteration shape that survives 100 TB.
  *
  * Overflow bound: with |q| ≤ B the sum is ≤ dim·(2B)²; keep
  * dim·4B² < 2⁶³ (at the default quantization scale 10⁶ and unit-range
  * inputs, good to dim ~10⁶).
  */
@ExpressionDescription(
  usage = "_FUNC_(vec, centroids) - [argmin-index, squared-L2-distance] of a long vector against foldable long centroids")
case class NearestCentroidL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType, right.foldable) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _), true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid_l2 needs (array<bigint>, foldable array<array<bigint>> centroids), got $other")
    }

  private lazy val centroids: Array[Array[Long]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toLongArray())
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bestC = 0L
    var bestD = Long.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val m = math.min(x.numElements(), cent.length)
      var acc = 0L
      var i = 0
      while (i < m) {
        val d = x.getLong(i) - cent(i)
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; bestC = c.toLong }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(bestC, bestD))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val cb = ctx.addReferenceObj("centroids", centroids, "long[][]")
      val bestC = ctx.freshName("bestC"); val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c"); val cent = ctx.freshName("cent")
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |long $bestC = 0L;
         |long $bestD = Long.MAX_VALUE;
         |for (int $c = 0; $c < $cb.length; $c++) {
         |  long[] $cent = $cb[$c];
         |  int $m = java.lang.Math.min($a.numElements(), $cent.length);
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $d = $a.getLong($i) - $cent[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $bestC = (long) $c; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(new long[]{$bestC, $bestD});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val dotProductFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  val nearestCellsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nearest_cells"),
    new ExpressionInfo(classOf[NearestCells].getName, "nearest_cells"),
    (children: Seq[Expression]) => NearestCells(children(0), children(1), children(2)))

  val nearestCellIdsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nearest_cell_ids"),
    new ExpressionInfo(classOf[NearestCellIds].getName, "nearest_cell_ids"),
    (children: Seq[Expression]) =>
      NearestCellIds(children(0), children(1), children(2), children(3)))

  val nearestCentroidL2Function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nearest_centroid_l2"),
    new ExpressionInfo(classOf[NearestCentroidL2].getName, "nearest_centroid_l2"),
    (children: Seq[Expression]) => NearestCentroidL2(children(0), children(1)))

  /** Column form. Built from the expression directly (not
    * `call_function`) so the whole Similarity family works without
    * [[graft.GraftExtensions]] registered; the SQL-name registration
    * remains for `spark.sql` users.
    */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(DotProduct(
      org.apache.spark.sql.GraftColumnShim.expression(a),
      org.apache.spark.sql.GraftColumnShim.expression(b)))

  /** Column form: 0-based indices of the n nearest codebook rows, best
    * first. */
  def nearest_cells(vec: Column, codebook: Seq[Seq[Double]], n: Int): Column =
    org.apache.spark.sql.functions.call_function("nearest_cells", vec,
      org.apache.spark.sql.functions.typedLit(codebook),
      org.apache.spark.sql.functions.lit(n))

  /** Column form: ids of the n nearest codebook rows, best first. */
  def nearest_cell_ids(vec: Column, codebook: Seq[Seq[Double]],
                       ids: Seq[Long], n: Int): Column =
    org.apache.spark.sql.functions.call_function("nearest_cell_ids", vec,
      org.apache.spark.sql.functions.typedLit(codebook),
      org.apache.spark.sql.functions.typedLit(ids),
      org.apache.spark.sql.functions.lit(n))

  /** Column form: `[cluster, dist]` integer argmin against foldable
    * long centroids. */
  def nearest_centroid_l2(vec: Column, centroids: Seq[Seq[Long]]): Column =
    org.apache.spark.sql.functions.call_function("nearest_centroid_l2", vec,
      org.apache.spark.sql.functions.typedLit(centroids))
}
