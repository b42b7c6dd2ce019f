package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kmeans

/** Laws for the fixed-point integer k-means (operators/Kmeans): exact
  * arithmetic claims are testable as equalities, not tolerances.
  */
class KmeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("4")
  import spark.implicits._

  /** Two tight, well-separated blobs around (±10, ±10, ...) plus noise
    * offsets below 0.5 — any correct 2-means recovers the blobs. */
  private def blobs(dim: Int = 4, perBlob: Int = 20): DataFrame =
    (0 until 2 * perBlob).map { i =>
      val blob = i % 2
      val base = if (blob == 0) 10.0f else -10.0f
      val v = Array.tabulate(dim)(d => base + ((i * 7 + d * 3) % 10) / 20.0f)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")

  test("fitAssign is deterministic and partitioning-invariant") {
    val df = blobs()
    val a = Kmeans.fitAssign(df, "vec_id", "embedding", k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Kmeans.fitAssign(df.repartition(7), "vec_id", "embedding", k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b), "results must be bit-identical across partitionings")
  }

  test("assignment is the true integer argmin with lowest-index ties") {
    val df = blobs()
    val cents = Kmeans.fit(df, "vec_id", "embedding", k = 3, iters = 2)
    val rows = Kmeans.assign(df, "embedding", cents)
      .select(col("vec_id"), col("cluster"), col("dist"), col("embedding"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](3).map(x =>
        BigDecimal(x.toDouble * 1000000L)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
      val dists = cents.map(c =>
        v.zip(c).map { case (x, y) => val d = x - y; d * d }.sum)
      val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }
      assert(r.getLong(1) == best._2.toLong, s"wrong cluster for ${r.getLong(0)}")
      assert(r.getLong(2) == best._1, s"wrong dist for ${r.getLong(0)}")
    }
  }

  test("2-means on two separated blobs recovers the blobs exactly") {
    val asg = Kmeans.fitAssign(blobs(), "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBlob = asg.groupBy { case (id, _) => id % 2 }
      .map { case (blob, rows) => blob -> rows.map(_._2).toSet }
    assert(byBlob(0L).size == 1 && byBlob(1L).size == 1 && byBlob(0L) != byBlob(1L),
      s"blobs not separated: $byBlob")
  }

  test("k beyond the data: empty clusters keep their init centroid") {
    val tiny = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    // k == n: every point seeds a centroid; iterations must not crash
    // and every row must land in some cluster with dist bounded by its
    // distance to its own seed (0 for an unmoved seed)
    val asg = Kmeans.fitAssign(tiny, "vec_id", "embedding", k = 3, iters = 2)
      .collect()
    assert(asg.length == 3)
    assert(asg.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 3))
  }

  test("semDedup keeps exactly the lowest id of each near-dup set per cluster") {
    // blob data: within a blob all vectors are near-identical in angle
    // (cosine ~1), across blobs cosine ~-1 — with threshold 0.9 each
    // cluster keeps exactly its lowest id
    val out = Kmeans.semDedup(blobs(), "vec_id", "embedding", k = 2,
      iters = 2, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = out.groupBy(_._2)
    assert(byCluster.size == 2)
    byCluster.foreach { case (c, rows) =>
      val kept = rows.filter(_._3 == 1L).map(_._1)
      assert(kept.length == 1 && kept.head == rows.map(_._1).min,
        s"cluster $c kept $kept, expected only ${rows.map(_._1).min}")
    }
  }

  test("pruneHard keeps exactly the m farthest rows per cluster, rank-ordered") {
    val df = blobs(dim = 4, perBlob = 20)
    val full = Kmeans.fitAssign(df, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val kept = Kmeans.pruneHard(df, "vec_id", "embedding", k = 2, iters = 2, m = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(kept.length == 10)
    kept.groupBy(_._2).foreach { case (c, rows) =>
      val expect = full.filter(_._2 == c)
        .sortBy { case (id, _, d) => (-d, id) }.take(5).map(_._1).toSeq
      val got = rows.sortBy(_._3).map(_._1).toSeq
      assert(got == expect, s"cluster $c kept $got, expected $expect")
    }
  }

  test("NULL vectors: skipped by fit, null-assigned by assign — never a crash") {
    val withNull = Seq(
      (0L, Some(Seq(1.0f, 0.0f))), (1L, Some(Seq(0.9f, 0.1f))),
      (2L, None: Option[Seq[Float]]), (3L, Some(Seq(-1.0f, 0.0f))))
      .toDF("vec_id", "embedding")
    val cents = Kmeans.fit(withNull, "vec_id", "embedding", k = 2, iters = 2)
    assert(cents.length == 2)
    // the same fit as the null-free frame: the null row contributes nothing
    val centsClean = Kmeans.fit(withNull.filter(col("embedding").isNotNull),
      "vec_id", "embedding", k = 2, iters = 2)
    assert(cents.map(_.toSeq) == centsClean.map(_.toSeq))
    val rows = Kmeans.assign(withNull, "embedding", cents)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(rows(2L).isEmpty, "null vector must get a null cluster")
    assert(rows.filterKeys(_ != 2L).values.forall(_.isDefined))
  }

  test("quantize matches round-half-away-from-zero at the default scale") {
    val df = Seq((0L, Seq(0.0000005f, -0.0000005f, 0.25f))).toDF("id", "v")
    val q = df.select(Kmeans.quantize(col("v")).as("q"))
      .head().getSeq[Long](0)
    // 5e-7f is not exactly 5e-7 in binary; assert against the same
    // double the engine sees rather than a decimal literal
    val expected = Seq(0.0000005f, -0.0000005f, 0.25f).map(x =>
      BigDecimal(x.toDouble * 1000000L)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    assert(q == expected, s"got $q, expected $expected")
  }
}
