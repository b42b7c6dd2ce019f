package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class ToolsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("4")
  import spark.implicits._

  test("KeyFieldSpec parses fields, char offsets and flags") {
    val ks = KeyFieldSpec.parse("-k2,2nr -k1 -k3.2,4n")
    assert(ks == Seq(
      KeyFieldSpec.KeySpec(2, 1, Some(2), 0, numeric = true, reverse = true),
      KeyFieldSpec.KeySpec(1, 1, None, 0, numeric = false, reverse = false),
      KeyFieldSpec.KeySpec(3, 2, Some(4), 0, numeric = true, reverse = false)))
  }

  test("KeyFieldSpec matches the reference TestKeyFieldHelper matrix") {
    import KeyFieldSpec.{parse, KeySpec}
    // end-char offsets parse on both positions
    assert(parse("-k1.2,3.4") == Seq(KeySpec(1, 2, Some(3), 4, false, false)))
    // two-token form "-k 1.2"
    assert(parse("-k 1.2") == Seq(KeySpec(1, 2, None, 0, false, false)))
    // global flags apply only to keys with none of their own
    assert(parse("-nr -k1.2,3.4") == Seq(KeySpec(1, 2, Some(3), 4, true, true)))
    assert(parse("-nr -k1.2,3.4n") == Seq(KeySpec(1, 2, Some(3), 4, true, false)))
    assert(parse("-nr -k1.2,3.4r") == Seq(KeySpec(1, 2, Some(3), 4, false, true)))
    assert(parse("-nr -k1.2,3.4 -k5.6,7.8n -k9.10,11.12r -k13.14,15.16nr") == Seq(
      KeySpec(1, 2, Some(3), 4, true, true),
      KeySpec(5, 6, Some(7), 8, true, false),
      KeySpec(9, 10, Some(11), 12, false, true),
      KeySpec(13, 14, Some(15), 16, true, true)))
    // flags may sit after the begin pos
    assert(parse("-k1.2n,3.4") == Seq(KeySpec(1, 2, Some(3), 4, true, false)))
    assert(parse("-k1.2r,3.4") == Seq(KeySpec(1, 2, Some(3), 4, false, true)))
    assert(parse("-k1.2nr,3.4") == Seq(KeySpec(1, 2, Some(3), 4, true, true)))
    // ...or combine across both positions (union)
    assert(parse("-k1.2n,3.4r") == Seq(KeySpec(1, 2, Some(3), 4, true, true)))
  }

  test("KeyFieldSpec end-char offsets select the right key bytes") {
    val df = Seq("abc defg hij", "abz defa hij").toDF("line")
    val arr = split(col("line"), " ")
    // -k1.3,2.2: from char 3 of field 1 through char 2 of field 2
    val k = KeyFieldSpec.parse("-k1.3,2.2").head
    val vals = df.select(KeyFieldSpec.keyValue(arr, k, " ")).as[String].collect().toSeq
    assert(vals == Seq("c de", "z de"))
    // -k2: from field 2 through end of line (unix sort semantics)
    val k2 = KeyFieldSpec.parse("-k2").head
    val vals2 = df.select(KeyFieldSpec.keyValue(arr, k2, " ")).as[String].collect().toSeq
    assert(vals2 == Seq("defg hij", "defa hij"))
    // single-field with both char bounds: -k2.2,2.3
    val k3 = KeyFieldSpec.parse("-k2.2,2.3").head
    val vals3 = df.select(KeyFieldSpec.keyValue(arr, k3, " ")).as[String].collect().toSeq
    assert(vals3 == Seq("ef", "ef"))
  }

  test("KeyFieldSpec orders like unix sort -k") {
    val df = Seq("b 2", "a 10", "a 2", "b 1").toDF("line")
    val arr = split(col("line"), " ")
    val sorted = df.orderBy(KeyFieldSpec.sortColumns(arr, "-k1,1 -k2,2nr", " "): _*)
      .as[String].collect().toSeq
    assert(sorted == Seq("a 10", "a 2", "b 2", "b 1"))
  }

  test("TypedBytes codec writes the reference wire format") {
    import java.io._
    def enc(v: Any): Seq[Int] = {
      val bos = new ByteArrayOutputStream()
      TypedBytes.write(new DataOutputStream(bos), v)
      bos.toByteArray.toSeq.map(_ & 0xff)
    }
    // Type.java codes: INT(3) big-endian, STRING(7) len+utf8, BOOL(2)...
    assert(enc(42) == Seq(3, 0, 0, 0, 42))
    assert(enc("hi") == Seq(7, 0, 0, 0, 2, 'h'.toInt, 'i'.toInt))
    assert(enc(true) == Seq(2, 1))
    assert(enc(7L) == Seq(4, 0, 0, 0, 0, 0, 0, 0, 7))
    assert(enc(Array[Byte](1, 2)) == Seq(0, 0, 0, 0, 2, 1, 2))
    assert(enc(Seq(1, "a")) == Seq(8, 0, 0, 0, 2) ++ enc(1) ++ enc("a"))
    assert(enc(Map("k" -> 1)) == Seq(10, 0, 0, 0, 1) ++ enc("k") ++ enc(1))
  }

  test("TypedBytes roundtrips every type including nesting and LIST") {
    import java.io._
    val values: Seq[Any] = Seq(42, 7L, 1.5f, 2.5, true, "text",
      Seq(1, 2, Seq("nested")), Map("a" -> 1L))
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    values.foreach(TypedBytes.write(out, _))
    // a reference-style LIST (code 9, MARKER-terminated) must also parse
    out.write(9); TypedBytes.write(out, 5); TypedBytes.write(out, "x"); out.write(255)
    val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
    values.foreach(v => assert(TypedBytes.read(in) == v))
    assert(TypedBytes.read(in) == Seq(5, "x"))
    intercept[EOFException](TypedBytes.read(in))
  }

  test("TypedBytes.pipe frames rows through a real child process") {
    val df = spark.range(100).select(col("id").as("key"),
      concat(lit("v"), col("id")).as("value"))
    // cat: byte-exact passthrough — proves framing + parsing, not just codec
    val back = TypedBytes.pipe(df, Seq("cat"),
      org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.StringType)
    assert(back.as[(Long, String)].collect().toSet ==
      (0L until 100L).map(i => (i, s"v$i")).toSet)
  }

  test("TypedBytes.pipe fails the task when the child exits nonzero") {
    val df = spark.range(10).select(col("id").as("key"), col("id").as("value"))
    val boom = intercept[Exception] {
      TypedBytes.pipe(df, Seq("sh", "-c", "echo doomed >&2; exit 3"),
        org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.LongType)
        .collect()
    }
    // a crash must surface (with the child's stderr), never truncate
    // into a "successful" partial result
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    val msgs = chain(boom).mkString("\n")
    assert(msgs.contains("exited with 3") && msgs.contains("doomed"), msgs)
  }

  test("TypedBytes.pipe survives a child flooding stderr (no pipe deadlock)") {
    val df = spark.range(5).coalesce(1)
      .select(col("id").as("key"), col("id").as("value"))
    // 256KB of stderr (>> the ~64KB OS pipe buffer) before any stdout:
    // without a drain thread the child blocks on stderr and the task
    // deadlocks waiting for stdout
    val fut = java.util.concurrent.CompletableFuture.supplyAsync { () =>
      TypedBytes.pipe(df,
        Seq("sh", "-c", "head -c 262144 /dev/zero | tr '\\0' 'e' >&2; cat"),
        org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.LongType)
        .collect()
    }
    val rows = fut.get(120, java.util.concurrent.TimeUnit.SECONDS)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      (0L until 5L).map(i => (i, i)).toSet)
  }

  test("Pipe runs records through an external command per partition") {
    val df = Seq(("k1", "v1"), ("k2", "v2")).toDF("k", "v")
    val out = Pipe(df, Seq("cat"), col("k"), col("v")).as[String].collect().toSet
    assert(out == Set("k1\tv1", "k2\tv2"))
  }

  test("Pipe.keyed reframes child output at the numKeyFields-th separator") {
    val df = Seq(("a", "b", "c"), ("x", "y", "z")).toDF("c1", "c2", "c3")
    // tr turns tabs into spaces; key = first 2 space-fields, value = rest
    val out = Pipe.keyed(df, Seq("tr", "\t", " "), " ", 2,
      col("c1"), col("c2"), col("c3"))
      .as[(String, String)].collect().toSet
    assert(out == Set(("a b", "c"), ("x y", "z")))
    // a line with no fields past the key: empty value (reference behavior)
    val df2 = Seq(("k", "only")).toDF("c1", "c2")
    val out2 = Pipe.keyed(df2, Seq("cat"), "\t", 2, col("c1"), col("c2"))
      .as[(String, String)].collect().toSet
    assert(out2 == Set(("k\tonly", "")))
  }

  test("MultiOutput routes records by column and by named predicate") {
    val dir = Files.createTempDirectory("graft-mo").toString
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "tag")
    MultiOutput.byColumn(df, "tag", s"$dir/bycol")
    assert(spark.read.parquet(s"$dir/bycol").where(col("tag") === "a").count() == 2)
    MultiOutput.named(df, Map("small" -> (col("id") < 3), "big" -> (col("id") >= 3)), s"$dir/named")
    assert(spark.read.parquet(s"$dir/named/small").count() == 2)
    assert(spark.read.parquet(s"$dir/named/big").count() == 1)
  }

  test("ScanFilters: regex keeps matches, digest sample is deterministic") {
    val df = spark.range(1000).select(col("id"), concat(lit("k"), col("id")).as("key"))
    val re = ScanFilters.regexFilter(df, col("key"), "^k1\\d$").count()
    assert(re == 10)  // k10..k19
    val s1 = ScanFilters.digestSample(df, col("id"), 10).select("id").as[Long].collect().toSet
    val s2 = ScanFilters.digestSample(df.repartition(7), col("id"), 10)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty && s1.size < 1000)
  }

  test("ScanFilters.skipBad drops and counts throwing records") {
    val df = spark.range(100).select(col("id"))
    val (ok, acc) = ScanFilters.skipBad(df, "bad") { r =>
      val v = r.getLong(0)
      if (v % 10 == 0) throw new IllegalStateException("boom")
      v * 2
    }
    assert(ok.collect().length == 90)
    assert(acc.value == 10)
  }

  test("ValueAggregators registry dispatches by descriptor type string") {
    import graft.functions.ValueAggregators
    val df = Seq(("a", 1L, "x"), ("a", 2L, "y"), ("a", 2L, "y"), ("b", 5L, "z"))
      .toDF("k", "v", "s")
    val out = ValueAggregators.aggregate(df, "k", Seq(
      "LongValueSum:v", "longvaluemax:v", "LongValueMin:v",
      "StringValueMin:s", "StringValueMax:s",
      "UniqValueCount:v", "UniqValueCount:v:1", "DoubleValueSum:v"))
      .orderBy("k").collect()
    val a = out(0)
    assert(a.getAs[Long]("LongValueSum_v") == 5L)
    assert(a.getAs[Long]("longvaluemax_v") == 2L)   // case-insensitive dispatch
    assert(a.getAs[Long]("LongValueMin_v") == 1L)
    assert(a.getAs[String]("StringValueMin_s") == "x")
    assert(a.getAs[String]("StringValueMax_s") == "y")
    assert(a.getAs[Long]("UniqValueCount_v") == 2L)
    assert(a.getAs[Long]("UniqValueCount_v_1") == 1L)   // capped variant
    assert(a.getAs[Double]("DoubleValueSum_v") == 5.0)
    intercept[IllegalArgumentException] {
      ValueAggregators.parse("BogusType:v")
    }
  }

  test("UniqValueCount descriptor caps string columns through the registry") {
    import graft.functions.ValueAggregators
    // the reference's common case: arbitrary (string) values, capped
    // via the stringifying lane (UniqValueCount.java:59)
    val df = Seq(("a", "x1"), ("a", "x2"), ("a", "x3"), ("b", "x1"))
      .toDF("k", "s")
    val out = ValueAggregators.aggregate(df, "k", Seq("UniqValueCount:s:2"))
      .orderBy("k").collect()
    assert(out(0).getAs[Long]("UniqValueCount_s_2") == 2L)   // capped: 3 -> 2
    assert(out(1).getAs[Long]("UniqValueCount_s_2") == 1L)   // exact below cap
  }

  test("ValueAggregators loads UserDefined descriptor classes by name") {
    import graft.functions.ValueAggregators
    val df = Seq(("a", 1.25), ("a", 3.75), ("b", 2.0)).toDF("k", "v")
    val out = ValueAggregators.aggregate(df, "k",
      Seq("UserDefined,graft.functions.DecimalMinDescriptor:v",
          "UserDefined,graft.functions.DecimalMaxDescriptor:v"))
      .orderBy("k").collect()
    assert(out(0).getDecimal(1).doubleValue() == 1.25)
    assert(out(0).getDecimal(2).doubleValue() == 3.75)
    intercept[ClassNotFoundException] {
      ValueAggregators.parse("UserDefined,no.such.Klass:v")
    }
  }

  test("Counters.observe reports exactly-once metrics with the action") {
    val df = spark.range(100).toDF("id")
    val (observed, obs) = Counters.observe(df, "c", count(lit(1)).as("records"),
      sum(col("id")).as("id_sum"))
    observed.write.mode("overwrite").parquet(
      Files.createTempDirectory("graft-ctr").toString + "/out")
    assert(obs.get("records") == 100L)
    assert(obs.get("id_sum") == 4950L)
  }
}
