package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.Examples

class ExamplesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("4")

  test("QuasiMonteCarlo pi estimate converges") {
    val pi = Examples.estimatePi(spark, 100000, 8)
    assert(math.abs(pi - math.Pi) < 0.01, s"estimate $pi too far from pi")
  }

  test("JobControl runs a diamond DAG in dependency order; failures cascade") {
    import graft.jobs.JobControl
    import JobControl.ControlledJob
    val log = scala.collection.mutable.Buffer[String]()
    def job(n: String, deps: String*) =
      ControlledJob(n, deps.toSeq, () => { log += n; () })
    val (st, order) = JobControl.run(Seq(
      job("d", "b", "c"), job("b", "a"), job("c", "a"), job("a")))
    assert(st.values.forall(_ == JobControl.Success))
    assert(order.head == "a" && order.last == "d")
    assert(log.indexOf("b") > log.indexOf("a") && log.indexOf("d") > log.indexOf("c"))

    // a failing job: dependents get DEPENDENT_FAILED, independents run
    val (st2, order2) = JobControl.run(Seq(
      ControlledJob("boom", Seq.empty, () => sys.error("x")),
      job("down", "boom"),
      job("solo")))
    assert(st2("boom") == JobControl.Failed)
    assert(st2("down") == JobControl.DependentFailed)
    assert(st2("solo") == JobControl.Success)
    assert(!order2.contains("down"))

    intercept[IllegalArgumentException] {
      JobControl.run(Seq(job("x", "y"), job("y", "x")))
    }
  }

  test("BBP extracts the known hex digits of pi, any start offset") {
    // π = 3.243F6A8885A308D313198A2E03707344...
    assert(graft.jobs.Bbp.hexDigits(spark, 0, 16, 4) == "243F6A8885A308D3")
    // digit extraction is position-independent (the distributed property)
    assert(graft.jobs.Bbp.hexDigits(spark, 16, 8, 3) == "13198A2E")
  }

  test("randomTextLines is deterministic and partitioning-independent") {
    val a = Examples.randomTextLines(spark, 500, 20, 4)
    val b = Examples.randomTextLines(spark, 500, 20, 16)
    assert(a.collect().map(_.getString(0)).sorted.toSeq ==
      b.collect().map(_.getString(0)).sorted.toSeq)
    assert(a.select(size(split(col("line"), " "))).distinct().count() == 1)
  }

  test("randomBinary produces bounded variable-length values") {
    val df = Examples.randomBinary(spark, 1000, 4)
    val lens = df.select(length(col("value")).as("l"))
      .agg(min(col("l")), max(col("l"))).head()
    assert(lens.getInt(0) >= 8 && lens.getInt(1) <= 32)
    assert(df.count() == 1000)
  }

  test("distCp copies every file byte-identically") {
    val base = Files.createTempDirectory("graft-distcp").toString
    val src = s"$base/src"
    spark.range(1000).toDF("id").repartition(4).write.parquet(src)
    val copied = Examples.distCp(spark, src, s"$base/dst")
    assert(copied >= 4)
    val a = spark.read.parquet(src).agg(sum(col("id"))).head().getLong(0)
    val b = spark.read.parquet(s"$base/dst").agg(sum(col("id"))).head().getLong(0)
    assert(a == b)
  }
}
