package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Natural log via `java.lang.Math.log` — the PLATFORM ln, which on
  * every mainstream JVM/libc pair is the same correctly-rounded result
  * C++ engines' `std::log` produces (probed exhaustively over the
  * integer range oracle lanes feed it). Spark's own `log`/`ln` calls
  * `StrictMath.log` (fdlibm), which differs from the platform ln in
  * the last ulp on ~1% of small-integer inputs (3, 48, 74, 185,
  * 196, ...) — enough to break any hash-compared oracle whose float
  * chain contains a log. Oracle-replayable lanes (byte entropy) use
  * THIS; lanes that never hash-compare a log keep the builtin.
  */
@ExpressionDescription(
  usage = "_FUNC_(x) - natural log via the platform Math.log (matches C/C++ std::log), not Spark's fdlibm StrictMath.log")
case class IeeeLn(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ieee_ln needs a double, got $other (cast explicitly — an implicit widen here could hide an integer-division bug)")
    }

  override def nullSafeEval(x: Any): Any =
    java.lang.Math.log(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"java.lang.Math.log($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MathExpressions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val ieeeLnFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ieee_ln"),
    new ExpressionInfo(classOf[IeeeLn].getName, "ieee_ln"),
    (children: Seq[Expression]) => IeeeLn(children.head))

  /** Column form. Built from the expression directly (not
    * `call_function`), so library entry points whose float chain needs
    * the platform ln ([[graft.operators.Sketches.portableEstimate]])
    * work in any session — no [[graft.GraftExtensions]] registration
    * required. The SQL-name registration remains for `spark.sql` users.
    */
  def ieee_ln(x: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      IeeeLn(org.apache.spark.sql.GraftColumnShim.expression(x)))
}
