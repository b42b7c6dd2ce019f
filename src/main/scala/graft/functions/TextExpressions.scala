package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * canonicalization pass of a text-cleaning pipeline (decomposed accent
  * sequences, compatibility variants from different scrapers, etc. must
  * collapse to one canonical form BEFORE hashing/dedup, or byte-unequal
  * spellings of the same text defeat every digest-based operator).
  *
  * Spark has no built-in normalizer, and a Scala UDF would pay
  * serialization + boxing per row; this stays inside whole-stage
  * codegen. The already-normalized fast path (the overwhelmingly common
  * case for real corpora) is allocation-free: `Normalizer.isNormalized`
  * scans without building a new string, and the input UTF8String passes
  * through untouched.
  *
  * Mirrors DuckDB's `nfc_normalize`, so oracle queries replay it
  * verbatim (both implement Unicode canonical composition).
  */
@ExpressionDescription(
  usage = "_FUNC_(str) - Unicode NFC (canonical composition) normalization")
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize needs a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd text kernels (the SURVEY §7 "custom Expression" tier).
  *
  * Why these exist: the declarative forms — `filter(split(text, "\\s+"),
  * _ =!= "")` and `transform(sequence(...), i => array_join(slice(toks,
  * i, k), " "))` — route through higher-order functions (ArrayFilter /
  * ArrayTransform), which never enter whole-stage codegen; the per-row
  * lambda walk costs ~1 ms/row and was the measured wall of every
  * shingle-family map stage. These kernels compute the IDENTICAL result
  * (same Java regex split, same empty-token drop, same single-space
  * join) as one compiled JVM call per row, so every consumer — and the
  * DuckDB oracles, which replay `string_split_regex` + `list_filter` —
  * agrees byte-for-byte.
  */
@ExpressionDescription(
  usage = "_FUNC_(text) - whitespace tokens of text, empty tokens dropped")
case class WordTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_tokens needs a string, got $other")
    }

  // identical to Spark's split(text, "\\s+"): Java regex over the
  // decoded string, limit -1 (UTF8String.split delegates to Java split)
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def tokenize(t: UTF8String): ArrayData = {
    val parts = ws.split(t.toString, -1)
    var n = 0
    var i = 0
    while (i < parts.length) { if (!parts(i).isEmpty) n += 1; i += 1 }
    val out = new Array[Any](n)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) { out(j) = UTF8String.fromString(parts(i)); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(t: Any): Any = tokenize(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("wordTokens", this, classOf[WordTokens].getName)
      s"${ev.value} = $ref.tokenize($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Word k-gram shingles straight from text: tokenize (as [[WordTokens]])
  * then join each k consecutive tokens with a single space — the fused,
  * codegen'd form of `wordShingles(tokens(text), k)`. NULL text yields
  * an EMPTY array (not null), matching the `when(size(toks) >= k, ...)
  * .otherwise(array())` contract of the declarative original.
  */
@ExpressionDescription(
  usage = "_FUNC_(text, k) - word k-gram shingles of text (empty when fewer than k tokens)")
case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType, right.foldable) match {
      case (StringType, IntegerType, true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles needs (string, foldable int k), got $other")
    }

  @transient private lazy val k: Int = {
    val v = right.eval().asInstanceOf[Int]
    require(v >= 1, s"word_shingles: k must be >= 1, got $v")
    v
  }
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  @transient private lazy val empty = new GenericArrayData(Array.empty[Any])

  def emptyResult: ArrayData = empty

  def shingle(t: UTF8String): ArrayData = {
    val parts = ws.split(t.toString, -1)
    var n = 0
    var i = 0
    while (i < parts.length) { if (!parts(i).isEmpty) n += 1; i += 1 }
    if (n < k) return empty
    val toks = new Array[String](n)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) { toks(j) = parts(i); j += 1 }
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    var s = 0
    while (s <= n - k) {
      val sb = new java.lang.StringBuilder
      var c = 0
      while (c < k) {
        if (c > 0) sb.append(' ')
        sb.append(toks(s + c))
        c += 1
      }
      out(s) = UTF8String.fromString(sb.toString)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) empty else shingle(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = left.genCode(ctx)
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull} ? $ref.emptyResult() : $ref.shingle(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TextExpressions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val nfcNormalizeFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => NfcNormalize(children.head))

  /** Column form (resolved through the registered SQL function). */
  def nfc_normalize(c: Column): Column =
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)

  val wordTokensFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_tokens"),
    new ExpressionInfo(classOf[WordTokens].getName, "word_tokens"),
    (children: Seq[Expression]) => WordTokens(children.head))

  val wordShinglesFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    (children: Seq[Expression]) => WordShingles(children(0), children(1)))

  def word_tokens(text: Column): Column =
    org.apache.spark.sql.functions.call_function("word_tokens", text)

  def word_shingles(text: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("word_shingles", text,
      org.apache.spark.sql.functions.lit(k))
}
