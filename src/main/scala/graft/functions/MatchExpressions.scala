package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern matching over a term dictionary.
  *
  * The scale problem this solves: blocklist/phrase matching with a regex
  * alternation `(t1|t2|...|tN)` compiles to an NFA whose scan cost grows
  * with N — at dictionary sizes real curation pipelines use (10^4–10^5
  * phrases: URL blocklists, brand/PII phrase lists, contamination
  * canaries), a per-row regex walk is the map stage's wall. The
  * Aho-Corasick automaton matches ALL terms in ONE pass over the text,
  * O(|text| + #matches) regardless of dictionary size.
  *
  * The automaton is built once per executor from the term list
  * (@transient lazy — the Expression ships only the strings) and the
  * scan stays inside whole-stage codegen via the same reference-object
  * bridge as [[WordTokens]].
  *
  * Count semantics per term: leftmost greedy NON-OVERLAPPING occurrences
  * — exactly `len(string_split(text, term)) - 1`, so a SQL oracle
  * replays each term's lane verbatim. (Aho-Corasick visits every match
  * end in increasing position; greedily accepting a match whose start
  * is past the previous accepted end reproduces the independent
  * left-to-right scan per term.)
  */
private[graft] final class AcAutomaton(terms: IndexedSeq[String]) extends Serializable {
  require(terms.nonEmpty && terms.forall(_.nonEmpty), "need non-empty terms")

  private val termLen: Array[Int] = terms.map(_.length).toArray
  // trie: per-node char -> next, built densely enough for dictionaries
  // of phrases (nodes ~ total term chars)
  private val children = mutable.ArrayBuffer(new mutable.HashMap[Char, Int])
  private val out = mutable.ArrayBuffer(List.empty[Int])
  private val fail = mutable.ArrayBuffer(0)

  terms.zipWithIndex.foreach { case (t, i) =>
    var v = 0
    t.foreach { ch =>
      v = children(v).getOrElseUpdate(ch, {
        children += new mutable.HashMap[Char, Int]
        out += Nil
        fail += 0
        children.size - 1
      })
    }
    out(v) = i :: out(v)
  }
  locally { // BFS fail links; propagate outputs through them
    val q = mutable.Queue.empty[Int]
    children(0).values.foreach(q.enqueue)
    while (q.nonEmpty) {
      val v = q.dequeue()
      children(v).foreach { case (ch, u) =>
        var f = fail(v)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(u) = children(f).get(ch).filter(_ != u).getOrElse(0)
        out(u) = out(u) ::: out(fail(u))
        q.enqueue(u)
      }
    }
  }

  def nTerms: Int = terms.size

  /** Per-term leftmost-greedy non-overlapping match counts. */
  def counts(text: String): Array[Long] = {
    val c = new Array[Long](terms.size)
    val nextFree = new Array[Int](terms.size)
    var state = 0
    var pos = 0
    while (pos < text.length) {
      val ch = text.charAt(pos)
      while (state != 0 && !children(state).contains(ch)) state = fail(state)
      state = children(state).getOrElse(ch, 0)
      var hits = out(state)
      while (hits.nonEmpty) {
        val i = hits.head
        val start = pos - termLen(i) + 1
        if (start >= nextFree(i)) { c(i) += 1; nextFree(i) = pos + 1 }
        hits = hits.tail
      }
      pos += 1
    }
    c
  }
}

/** `multi_match_counts(text, terms)` — array of per-term non-overlapping
  * match counts against the dictionary (a foldable string-array literal,
  * fixed at plan time). Downstream aggregates (`aggregate(arr, sum)`,
  * `size(filter(arr, x -> x > 0))`) stay builtin.
  */
@ExpressionDescription(
  usage = "_FUNC_(text, terms) - per-dictionary-term non-overlapping match counts")
case class MultiMatchCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType, right.foldable) match {
      case (StringType, ArrayType(StringType, _), true) =>
        // the dictionary is foldable: validate it at ANALYSIS time so a
        // null/empty term is one clear planning error, not a per-task
        // NPE retry loop on every executor
        val arr = right.eval().asInstanceOf[ArrayData]
        if (arr == null || arr.numElements() == 0)
          TypeCheckResult.TypeCheckFailure(
            "multi_match_counts needs a non-empty terms dictionary")
        else if ((0 until arr.numElements()).exists(i => arr.isNullAt(i) ||
            arr.getUTF8String(i).numChars() == 0))
          TypeCheckResult.TypeCheckFailure(
            "multi_match_counts terms must be non-null and non-empty")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"multi_match_counts needs (string, foldable array<string> terms), got $other")
    }

  @transient private lazy val ac = {
    val arr = right.eval().asInstanceOf[ArrayData]
    new AcAutomaton(arr.toObjectArray(StringType)
      .map(_.asInstanceOf[UTF8String].toString).toIndexedSeq)
  }

  def countsOf(t: UTF8String): ArrayData = {
    val c = ac.counts(t.toString)
    val boxed = new Array[Any](c.length)
    var i = 0
    while (i < c.length) { boxed(i) = c(i); i += 1 }
    new GenericArrayData(boxed)
  }

  override def nullSafeEval(t: Any, ts: Any): Any =
    countsOf(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _) => {
      val ref = ctx.addReferenceObj("multiMatch", this, classOf[MultiMatchCounts].getName)
      s"${ev.value} = $ref.countsOf($c);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MatchExpressions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val multiMatchCountsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("multi_match_counts"),
    new ExpressionInfo(classOf[MultiMatchCounts].getName, "multi_match_counts"),
    (children: Seq[Expression]) => MultiMatchCounts(children(0), children(1)))

  /** Column form (resolved through the registered SQL function). */
  def multi_match_counts(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.functions.call_function("multi_match_counts", text,
      org.apache.spark.sql.functions.array(
        terms.map(org.apache.spark.sql.functions.lit): _*))
}
