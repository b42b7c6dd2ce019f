package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based laws for the deterministic row-local operators —
  * the invariants that make the engine's "pure function of the data"
  * claims hold on ARBITRARY inputs, not just the fixture corpus:
  * canonicalization must be idempotent, hash assignments must be total
  * and partitioning-independent, binning must be monotone. Runs on a
  * tiny local session; each property is a Column-expression law checked
  * through the same execution path the queries use.
  */
object LawsSpec extends Properties("graft.laws") {

  private lazy val spark = GraftSession.build("2")
  import spark.implicits._

  // --- URL canonicalization ------------------------------------------

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "Https")
    host <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(10).mkString)
    tld <- Gen.oneOf("com", "ORG", "net")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.listOf(Gen.alphaNumChar).map(cs => "/" + cs.take(8).mkString)
    params <- Gen.someOf(Seq("utm_source=a", "q=1", "fbclid=xy", "id=9", "gclid=z"))
    frag <- Gen.oneOf("", "#top", "#s2")
  } yield s"$scheme://$host.$tld$port$path" +
    (if (params.isEmpty) "" else params.mkString("?", "&", "")) + frag

  property("canonicalize is idempotent") = forAll(Gen.listOfN(20, genUrl)) { urls =>
    val once = urls.toDF("u")
      .select(graft.operators.Urls.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq
    val twice = once.toDF("u")
      .select(graft.operators.Urls.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq
    once == twice
  }

  property("canonicalize never emits tracking params or fragments") =
    forAll(Gen.listOfN(20, genUrl)) { urls =>
      urls.toDF("u")
        .select(graft.operators.Urls.canonicalize(col("u")).as("c"))
        .as[String].collect()
        .forall(c => !c.contains("#") && !c.contains("utm_") &&
          !c.contains("fbclid") && !c.contains("gclid"))
    }

  // --- hash assignments -----------------------------------------------

  property("hashSplit is total and partitioning-independent") =
    forAll(Gen.listOfN(60, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))) { ids =>
      val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      def assign(parts: Int) = graft.operators.Sampling.hashSplit(
        ids.distinct.toDF("doc_id").repartition(parts), "doc_id", fr)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      val a = assign(1)
      a.size == ids.distinct.size &&
        a.values.forall(Set("train", "val", "test")) && a == assign(7)
    }

  property("mixtureWeights keeps an identical multiset under repartition") =
    forAll(Gen.listOfN(50, Gen.chooseNum(0L, 100000L))) { ids =>
      val rates = Map("s0" -> 2.5, "s1" -> 0.5)
      def kept(parts: Int) = graft.operators.Sampling.mixtureWeights(
        ids.distinct.map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
          .repartition(parts),
        "source", "doc_id", rates)
        .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
      kept(1) == kept(5)
    }

  // --- binning ----------------------------------------------------------

  property("binByCutoffs is monotone and lands in [1, cuts+1]") =
    forAll(Gen.listOfN(5, Gen.chooseNum(-1e6, 1e6)),
      Gen.listOfN(30, Gen.chooseNum(-1e6, 1e6))) { (cutsRaw, vals) =>
      val cuts = cutsRaw.distinct.sorted
      val binned = vals.sorted.toDF("v")
        .select(col("v"),
          graft.operators.Sampling.binByCutoffs(col("v"), cuts).as("b"))
        .orderBy("v").as[(Double, Int)].collect().toSeq
      val bins = binned.map(_._2)
      bins.forall(b => b >= 1 && b <= cuts.size + 1) &&
        bins.sliding(2).forall { case Seq(x, y) => x <= y; case _ => true }
    }

  // --- BPE round-trip ----------------------------------------------------

  property("BPE encode always reconstructs the word") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("ab", "abc", "banana", "aa", "xyzzy"))
      .map(_.take(30))) { wordsRaw =>
      // shrinking ignores generator constraints and can inject "" —
      // empty words are outside wordFreqs' domain, keep the law's too
      val words = wordsRaw.filter(_.nonEmpty)
      words.isEmpty || {
        val merges = graft.operators.Bpe.trainLocal(
          words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }.toSeq,
          nMerges = 10)
        val ranks = merges.zipWithIndex.toMap
        words.distinct.forall { w =>
          graft.operators.Bpe.encodeWord(w, ranks).mkString
            .stripSuffix(graft.operators.Bpe.EndMark) == w
        }
      }
    }
}
