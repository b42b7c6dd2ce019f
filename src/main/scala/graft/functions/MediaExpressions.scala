package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Average-hash (aHash) over binary content: 64 bytes sampled at
  * positions ⌊i·n/64⌋ (i = 0..63), each emitting '1' iff its unsigned
  * value strictly exceeds the sample mean (compared exactly as
  * 64·v > Σv — no float division), '0' otherwise; empty content hashes
  * to all zeros. The classic perceptual-hash recipe over raw bytes
  * (byte-level near-dup for any media type); feed it the decoded luma
  * plane (Multimodal.resize output) for pixel-level similarity — the
  * kernel is the same. Deterministic, integer-exact, and SQL-replayable
  * byte-for-byte via hex(blob) indexing.
  */
@ExpressionDescription(
  usage = "_FUNC_(content) - 64-bit average-hash of binary content as a '0'/'1' string")
case class AHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ahash64 needs binary content, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Byte](64)
    java.util.Arrays.fill(out, '0'.toByte)
    val n = bytes.length
    if (n > 0) {
      val v = new Array[Long](64)
      var total = 0L
      var i = 0
      while (i < 64) {
        v(i) = bytes(((i.toLong * n) / 64).toInt) & 0xffL
        total += v(i)
        i += 1
      }
      i = 0
      while (i < 64) {
        if (v(i) * 64 > total) out(i) = '1'.toByte
        i += 1
      }
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out"); val n = ctx.freshName("n")
      val v = ctx.freshName("v"); val total = ctx.freshName("total")
      val i = ctx.freshName("i")
      s"""
         |byte[] $out = new byte[64];
         |java.util.Arrays.fill($out, (byte) '0');
         |int $n = $c.length;
         |if ($n > 0) {
         |  long[] $v = new long[64];
         |  long $total = 0L;
         |  for (int $i = 0; $i < 64; $i++) {
         |    $v[$i] = $c[(int) (((long) $i * $n) / 64)] & 0xffL;
         |    $total += $v[$i];
         |  }
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ($v[$i] * 64 > $total) $out[$i] = (byte) '1';
         |  }
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 256-cell byte histogram of binary content — ONE codegen'd pass per
  * item, the row-local primitive under the byte-entropy screen: the
  * histogram's exact-integer counts feed n_distinct / max_count and
  * the fixed-order entropy sum without ever exploding content to
  * per-byte rows (the relational explode formulation measured 27×
  * slower on the lane — per-byte conv/substr beats codegen every
  * time). Bounded output (256 longs) regardless of item size.
  */
@ExpressionDescription(
  usage = "_FUNC_(content) - 256-cell byte-value histogram of binary content as array<bigint>")
case class ByteHist(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_hist needs binary content, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val hist = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xff) += 1L; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hist)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val hist = ctx.freshName("hist")
      val i = ctx.freshName("i")
      s"""
         |long[] $hist = new long[256];
         |for (int $i = 0; $i < $c.length; $i++) {
         |  $hist[$c[$i] & 0xff] += 1L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($hist);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaExpressions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val aHash64Function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ahash64"),
    new ExpressionInfo(classOf[AHash64].getName, "ahash64"),
    (children: Seq[Expression]) => AHash64(children.head))

  val byteHistFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("byte_hist"),
    new ExpressionInfo(classOf[ByteHist].getName, "byte_hist"),
    (children: Seq[Expression]) => ByteHist(children.head))

  /** Column form (resolved through the registered SQL function). */
  def ahash64(content: Column): Column =
    org.apache.spark.sql.functions.call_function("ahash64", content)

  /** Column form: 256-cell byte histogram (array<bigint>). Built from
    * the expression directly so [[graft.multimodal.Multimodal.byteEntropyRelational]]
    * works without [[graft.GraftExtensions]] registered (the SQL-name
    * registration remains for `spark.sql` users).
    */
  def byte_hist(content: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      ByteHist(org.apache.spark.sql.GraftColumnShim.expression(content)))
}
