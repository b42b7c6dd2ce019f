package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats
import graft.sources.sequencefile.SequenceFileIO

class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("4")
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-src").toString

  test("SequenceFile roundtrip (long, string) with schema inference") {
    val dir = tmp() + "/ls"
    val df = spark.range(100).select(col("id").as("key"),
      concat(lit("v"), col("id")).as("value"))
    SequenceFileIO.write(df, dir)
    val back = SequenceFileIO.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("key", "long"), ("value", "string")))
    assert(back.count() == 100)
    assert(back.as[(Long, String)].collect().toSet ==
      (0L until 100L).map(i => (i, s"v$i")).toSet)
  }

  test("SequenceFile roundtrip (int, int) and BLOCK compression") {
    val dir = tmp() + "/blk"
    val df = spark.range(1000).select(col("id").cast("int").as("key"),
      (col("id") * 2).cast("int").as("value"))
    SequenceFileIO.write(df, dir, compression = "BLOCK")
    val back = SequenceFileIO.read(spark, dir).as[(Int, Int)].collect().toSet
    assert(back == (0 until 1000).map(i => (i, i * 2)).toSet)
  }

  test("SequenceFile binary keys/values roundtrip") {
    val dir = tmp() + "/bin"
    val df = spark.range(50).select(
      md5(col("id").cast("string")).cast("binary").as("key"),
      col("id").cast("string").cast("binary").as("value"))
    SequenceFileIO.write(df, dir)
    val back = SequenceFileIO.read(spark, dir)
    assert(back.count() == 50)
    assert(back.select(length(col("key"))).distinct().as[Int].collect().toSeq == Seq(32))
  }

  test("SequenceFile pruned read skips the value column") {
    val dir = tmp() + "/prune"
    SequenceFileIO.write(
      spark.range(10).select(col("id").as("key"), lit("x").as("value")), dir)
    val keysOnly = SequenceFileIO.read(spark, dir).select("key")
    assert(keysOnly.queryExecution.executedPlan.toString.contains("key"))
    assert(keysOnly.as[Long].collect().sorted.toSeq == (0L until 10L))
  }

  test("KeyValueText splits at first tab only") {
    val dir = tmp() + "/kv"
    Seq("k1\tv1", "k2\tv2a\tv2b", "nokey").toDF("value")
      .coalesce(1).write.text(dir)
    val kv = Formats.keyValueText(spark, dir)
      .as[(String, String)].collect().toSet
    assert(kv == Set(("k1", "v1"), ("k2", "v2a\tv2b"), ("nokey", "")))
  }

  test("FixedLength reads exact-width binary records") {
    val dir = tmp()
    val f = new java.io.FileOutputStream(s"$dir/rec.bin")
    f.write("AAAABBBBCCCC".getBytes); f.close()
    val recs = Formats.fixedLength(spark, s"$dir/rec.bin", 4)
      .select(col("record").cast("string")).as[String].collect().toSet
    assert(recs == Set("AAAA", "BBBB", "CCCC"))
  }

  test("MapFileLike.get prunes via pushed filters and finds the row") {
    val dir = tmp() + "/mapfile"
    val df = spark.range(10000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
    graft.sources.MapFileLike.write(df, "k", 8, dir)
    val table = graft.sources.MapFileLike.open(spark, dir)
    val hit = graft.sources.MapFileLike.get(table, "k", 4242L)
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(k,4242)"),
      s"lookup filter not pushed:\n$plan")
    assert(hit.as[(Long, String)].collect().toSeq == Seq((4242L, "v4242")))
  }

  test("sniffFormat distinguishes sequencefile from text") {
    val dir = tmp()
    SequenceFileIO.write(
      spark.range(5).select(col("id").as("key"), lit("x").as("value")), s"$dir/seq")
    Seq("hello").toDF("v").coalesce(1).write.text(s"$dir/txt")
    assert(Formats.sniffFormat(spark, s"$dir/seq") == "sequencefile")
    assert(Formats.sniffFormat(spark, s"$dir/txt") == "text")
  }
}
