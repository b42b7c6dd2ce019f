package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Retrieval}
import graft.operators.Retrieval.Query

/** Specs for the lexical-retrieval operators (BM25, inverted index) and
  * the cross-corpus fuzzy decontamination lane. The rational-idf BM25
  * lane is oracle-checked end to end (RetrievalQueries); these specs pin
  * the parts the oracle can't reach: the classic log-idf scoring (not
  * bit-replayable in SQL, see Retrieval scaladoc), bounded postings, and
  * the fuzzy-decon match/miss semantics.
  */
class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("4")
  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, "apple banana cherry date"),
    (1L, "apple apple apple apple"),
    (2L, "banana banana cherry fig grape kiwi lemon mango"),
    (3L, "cherry date fig grape")
  ).toDF("doc_id", "text")

  /** Reference BM25 (classic log idf) computed independently in plain
    * Scala — the same role the DuckDB oracle plays for the rational lane.
    */
  private def refBm25(docs: Seq[(Long, String)], terms: Seq[String],
                      k1: Double, b: Double): Map[Long, Double] = {
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = docs.size.toDouble
    val avgdl = toks.map(_._2.size).sum / n
    toks.map { case (id, ts) =>
      val dl = ts.size.toDouble
      id -> terms.map { term =>
        val df = toks.count(_._2.contains(term)).toDouble
        val tf = ts.count(_ == term).toDouble
        math.log((n - df + 0.5) / (df + 0.5) + 1.0) *
          ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
      }.sum
    }.toMap
  }

  test("bm25TopK log-idf lane matches an independent reference computation") {
    val rows = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq(Query(7L, Seq("apple", "cherry"))), k = 4,
        k1 = 1.2, b = 0.75, logIdf = true)
      .orderBy("rnk").collect()
    val ref = refBm25(
      Seq((0L, "apple banana cherry date"), (1L, "apple apple apple apple"),
        (2L, "banana banana cherry fig grape kiwi lemon mango"),
        (3L, "cherry date fig grape")),
      Seq("apple", "cherry"), 1.2, 0.75)
    val expected = ref.filter(_._2 > 0).toSeq
      .sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == expected)
    assert(rows.map(_.getAs[Int]("rnk")).toSeq == (1 to expected.size))
    assert(rows.forall(_.getAs[Long]("q_id") == 7L))
  }

  test("bm25TopK ranks only matching docs and k truncates") {
    // 'banana': docs 0 and 2 only; doc 2 has tf=2 but is twice as long
    val r = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(Query(1L, Seq("banana"))), k = 1)
    assert(r.count() == 1)
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(Query(1L, Seq("banana"))), k = 10)
    assert(top.select("doc_id").as[Long].collect().toSet == Set(0L, 2L))
  }

  test("invertedIndex bounds postings at k and counts df over documents") {
    val many = (0L until 30L).map(i => (i, if (i % 3 == 0) "x y" else "y"))
      .toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(many, "doc_id", "text", k = 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(idx("x")._1 == 10)          // df: every 3rd doc
    assert(idx("y")._1 == 30)
    assert(idx("x")._2 == "0,3,6,9,12") // k SMALLEST ids, ascending
    assert(idx("y")._2 == "0,1,2,3,4")
  }

  test("invertedIndex dedupes terms within a document") {
    val d = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx == Map("a" -> 1L, "b" -> 1L))
  }

  test("rrfFuse combines runs by reciprocal rank with absent docs contributing zero") {
    // run1: A,B,C at ranks 1,2,3; run2: B,D at ranks 1,2 (c = 60)
    // B = 1/62+1/61 > A = 1/61 > D = 1/62 > C = 1/63
    val run1 = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3)).toDF("q_id", "doc_id", "rnk")
    val run2 = Seq((1L, 20L, 1), (1L, 40L, 2)).toDF("q_id", "doc_id", "rnk")
    val fused = Retrieval.rrfFuse(Seq(run1, run2), k = 10).orderBy("rnk").collect()
    assert(fused.map(_.getAs[Long]("doc_id")).toSeq == Seq(20L, 10L, 40L, 30L))
    assert(fused.map(_.getAs[Int]("rnk")).toSeq == Seq(1, 2, 3, 4))
  }

  test("rrfFuse of a single run preserves its ranking; equal scores tie-break doc_id asc") {
    val run = Seq((1L, 9L, 1), (1L, 4L, 2), (2L, 7L, 1)).toDF("q_id", "doc_id", "rnk")
    val one = Retrieval.rrfFuse(Seq(run), k = 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"), r.getAs[Int]("rnk")))
    assert(one.toSet == Set((1L, 9L, 1), (1L, 4L, 2), (2L, 7L, 1)))
    // same rank-1 in each run for different docs: identical scores, so
    // the lower doc_id must win the fused tie
    val a = Seq((1L, 5L, 1)).toDF("q_id", "doc_id", "rnk")
    val b = Seq((1L, 3L, 1)).toDF("q_id", "doc_id", "rnk")
    val tied = Retrieval.rrfFuse(Seq(a, b), k = 2).orderBy("rnk").collect()
    assert(tied.map(_.getAs[Long]("doc_id")).toSeq == Seq(3L, 5L))
  }

  test("fuzzyDecontaminate finds paraphrase-level matches and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank " +
      "while the morning sun rises slowly above the quiet green valley and birds " +
      "begin to sing their first songs of the new day"
    val eval = Seq((97L, base)).toDF("doc_id", "text")
    val corpus = Seq(
      // one-word edit of the eval doc: ~0.85 shingle jaccard, not exact
      (1L, base.replace("lazy", "sleepy")),
      // unrelated
      (2L, "completely different text about spark query planning and shuffles here now")
    ).toDF("doc_id", "text")
    // 8 narrow bands: collision probability ~1 at this overlap (still
    // deterministic — the banding is seedless md5 arithmetic)
    val hits = Dedup.fuzzyDecontaminate(corpus, eval, "doc_id", "text",
        k = 3, numPerm = 16, rowsPerBand = 2, threshold = 0.3)
      .collect()
    assert(hits.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_id"))).toSet
      == Set((1L, 97L)))
    val j = hits.head.getAs[Double]("jaccard")
    assert(j > 0.3 && j < 1.0, s"paraphrase jaccard should be partial, got $j")
  }

  test("fuzzyDecontaminate scores an exact cross-corpus duplicate at jaccard 1.0") {
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val eval = Seq((50L, text)).toDF("doc_id", "text")
    val corpus = Seq((1L, text)).toDF("doc_id", "text")
    val hits = Dedup.fuzzyDecontaminate(corpus, eval, "doc_id", "text",
      k = 3, numPerm = 16, rowsPerBand = 4, threshold = 0.5).collect()
    assert(hits.length == 1 && hits.head.getAs[Double]("jaccard") == 1.0)
  }
}
