package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats
import graft.sources.sequencefile.{SequenceFileIO, SequenceFileSource}

class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("4")
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-src").toString

  test("Archive: pack/list/get/extract roundtrip with stats-pruned lookup") {
    import graft.jobs.Archive
    // 200 small files across two subdirs, deterministic contents
    val src = tmp() + "/files"
    (0 until 200).foreach { i =>
      val sub = if (i % 2 == 0) "even" else "odd"
      val p = java.nio.file.Paths.get(src, sub, f"f$i%03d.txt")
      Files.createDirectories(p.getParent)
      Files.write(p, s"content-$i ${"x" * (i % 37)}".getBytes("UTF-8"))
    }
    val arch = tmp() + "/arch"
    Archive.create(spark, src, arch, numParts = 4)
    // 4 parquet parts, nothing else
    val parts = new java.io.File(arch).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName).toSeq
    assert(parts.size == 4, s"expected 4 parts, got $parts")
    // toc: every file listed with its true size and one owning part
    val toc = Archive.toc(spark, arch).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(toc.size == 200)
    assert(toc("even/f042.txt")._1 ==
      s"content-42 ${"x" * (42 % 37)}".getBytes("UTF-8").length)
    assert(parts.contains(toc("odd/f043.txt")._2))
    // get: exact bytes back; missing path -> None
    assert(Archive.get(spark, arch, "odd/f137.txt")
      .map(new String(_, "UTF-8")) == Some(s"content-137 ${"x" * (137 % 37)}"))
    assert(Archive.get(spark, arch, "nope.txt").isEmpty)
    // the lookup predicate reaches the parquet scan (the sorted path
    // stats then prune parts/row groups — har's _index analog)
    val plan = spark.read.parquet(arch).filter(col("path") === "odd/f137.txt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(path), EqualTo(path,odd/f137.txt)]"),
      s"path lookup not pushed down:\n$plan")
    // extract: glob-limited copy-out matches the originals byte-for-byte
    val dest = tmp() + "/out"
    assert(Archive.extract(spark, arch, dest, Some("even/*")) == 100L)
    // ignore the local-FS .crc sidecars Hadoop's checksumming writes
    val backFiles = new java.io.File(dest + "/even").listFiles()
      .filter(!_.getName.startsWith("."))
    assert(backFiles.length == 100)
    backFiles.foreach { f =>
      val orig = java.nio.file.Paths.get(src, "even", f.getName)
      assert(java.util.Arrays.equals(Files.readAllBytes(f.toPath),
        Files.readAllBytes(orig)), s"extract mismatch for ${f.getName}")
    }
  }

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

  test("SequenceFile sync-marker splits: one large file fans out over >1 task") {
    val dir = tmp() + "/split"
    // one partition -> one file, big enough for many sync blocks
    val df = spark.range(0, 50000, 1, 1).select(col("id").as("key"),
      concat(lit("value-padding-padding-"), col("id")).as("value"))
    SequenceFileIO.write(df, dir)
    val back = spark.read.format(SequenceFileSource.FORMAT)
      .option("split_bytes", 64 * 1024)   // force many byte-range splits
      .load(dir)
    assert(back.rdd.getNumPartitions > 4,
      s"expected sync splits, got ${back.rdd.getNumPartitions} partition(s)")
    // the split-ownership protocol must neither lose nor duplicate records
    assert(back.count() == 50000)
    assert(back.select(sum(col("key"))).head().getLong(0) == 49999L * 50000 / 2)
  }

  test("SequenceFile sync splits work on BLOCK-compressed files") {
    val dir = tmp() + "/blksplit"
    val df = spark.range(0, 30000, 1, 1).select(col("id").as("key"),
      concat(lit("padding-value-"), col("id")).as("value"))
    SequenceFileIO.write(df, dir, compression = "BLOCK")
    val back = spark.read.format(SequenceFileSource.FORMAT)
      .option("split_bytes", 16 * 1024)
      .load(dir)
    assert(back.rdd.getNumPartitions > 1)
    assert(back.count() == 30000, "block-compressed splits lost/duplicated records")
    assert(back.select(sum(col("key"))).head().getLong(0) == 29999L * 30000 / 2)
  }

  test("SequenceFile composite Writables: array, map and tuple roundtrip") {
    import scala.jdk.CollectionConverters._
    val dir = tmp() + "/composite"
    val rows = (0 until 50).map { i =>
      org.apache.spark.sql.Row(
        i.toLong,
        org.apache.spark.sql.Row(s"s$i", Seq(i.toLong, i * 2L), Map(s"k$i" -> i.toDouble)))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("c0",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("c1",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)),
          org.apache.spark.sql.types.StructField("c2",
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.DoubleType)))))))
    val df = spark.createDataFrame(rows.asJava, schema)
    SequenceFileIO.write(df, dir)
    // read through the stock TupleWritable/MapWritable/ArrayPrimitiveWritable
    val back = SequenceFileIO.read(spark, dir)
    assert(back.schema("value").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val got = back.collect().map { r =>
      val v = r.getStruct(1)
      (r.getLong(0), v.getString(0), v.getSeq[Long](1), v.getMap[String, Double](2))
    }.toSet
    val want = (0 until 50).map(i =>
      (i.toLong, s"s$i", Seq(i.toLong, i * 2L), Map(s"k$i" -> i.toDouble))).toSet
    assert(got.map(t => (t._1, t._2, t._3, t._4.toMap)) == want)
  }

  test("SequenceFile string-array roundtrip (TextArrayWritable subclass idiom)") {
    val dir = tmp() + "/strarr"
    val df = spark.range(20).select(col("id").as("key"),
      array(concat(lit("a"), col("id")), concat(lit("b"), col("id"))).as("value"))
    SequenceFileIO.write(df, dir)
    val back = SequenceFileIO.read(spark, dir)
    import spark.implicits._
    assert(back.as[(Long, Seq[String])].collect().toSet ==
      (0L until 20L).map(i => (i, Seq(s"a$i", s"b$i"))).toSet)
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

  test("xmlRecords extracts begin/end-delimited subtrees (StreamXmlRecordReader)") {
    val dir = tmp() + "/xml"
    val doc = """<?xml version="1.0"?>
      |<root>
      |  <page><title>alpha</title><body>first page</body></page>
      |  noise between records
      |  <page><title>beta</title><body>second page</body></page>
      |  <page><title>gamma</title></page>
      |</root>""".stripMargin
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part.xml"), doc)
    val recs = Formats.xmlRecords(spark, dir, "<page>", "</page>")
      .as[String].collect().toSeq
    assert(recs.size == 3)
    assert(recs.forall(r => r.startsWith("<page>") && r.endsWith("</page>")))
    assert(recs.exists(_.contains("<title>beta</title>")))
    assert(!recs.exists(_.contains("noise")), "inter-record bytes must not leak")
  }

  test("nLine packs exactly n lines per partition (NLineInputFormat)") {
    val dir = tmp() + "/nline"
    spark.range(0, 103, 1, 1).select(concat(lit("line"), col("id")).as("value"))
      .write.text(dir)
    val df = Formats.nLine(spark, dir, 10)
    assert(df.rdd.getNumPartitions == 11)  // ceil(103/10)
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect().toSeq
    assert(sizes.count(_ == 10) == 10 && sizes.count(_ == 3) == 1, s"sizes=$sizes")
    assert(df.count() == 103)
  }

  test("nLine chunks per FILE, preserving line order across input splits") {
    // two files, forced into multiple Hadoop input splits each: groups
    // must never straddle files (getSplitsForFile numbers lines per
    // file) and lines inside a group must keep file order even when the
    // group's lines arrive from two different upstream splits
    val dir = tmp() + "/nline2"
    def writeFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        lines.mkString("", "\n", "\n").getBytes)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val f1 = (0 until 23).map(i => f"alpha-$i%03d")
    val f2 = (0 until 10).map(i => f"beta-$i%03d")
    writeFile("part-a.txt", f1)
    writeFile("part-b.txt", f2)
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val old = Option(conf.get(key))
    conf.setLong(key, 64)  // ~6 lines per split -> multi-split files
    try {
      val df = Formats.nLine(spark, dir, 5)
      // ceil(23/5) + ceil(10/5) partitions, files in lexicographic order
      assert(df.rdd.getNumPartitions == 7)
      val parts = df.rdd.mapPartitionsWithIndex { (pid, it) =>
        Iterator((pid, it.map(_.getString(0)).toVector))
      }.collect().sortBy(_._1).map(_._2).toVector
      val expected = f1.grouped(5).toVector ++ f2.grouped(5).toVector
      assert(parts == expected.map(_.toVector),
        s"got=$parts\nwant=$expected")
    } finally old match {
      case Some(v) => conf.set(key, v)
      case None    => conf.unset(key)
    }
  }

  test("multipleInputs unions per-path readers with per-path mappers") {
    val d1 = tmp() + "/mi1"; val d2 = tmp() + "/mi2"
    spark.range(3).select(concat(lit("k"), col("id")), lit("fromtext"))
      .toDF("k", "src").write.csv(d1)
    spark.range(3, 6).select(
      concat(lit("k"), col("id"), lit("\t"), lit("v"), col("id")).as("value"))
      .write.text(d2)
    val out = Formats.multipleInputs(Seq(
      Formats.In(d1, p => spark.read.csv(p),
        df => df.select(col("_c0").as("k"), col("_c1").as("src"))),
      Formats.In(d2, p => Formats.keyValueText(spark, p),
        df => df.select(col("key").as("k")))))
    assert(out.count() == 6)
    assert(out.columns.toSet == Set("k", "src"))
    assert(out.filter(col("src").isNull).count() == 3)
  }

  test("BinaryPartition co-locates equal key sub-arrays (BinaryPartitioner)") {
    import graft.operators.BinaryPartition
    val df = spark.range(1000).select(
      col("id"),
      // 5-byte keys: 2 id bytes then 3 bytes repeating with period 7
      concat(expr("unhex(lpad(hex(id), 4, '0'))"),
        expr("unhex(lpad(hex(id % 7), 6, '0'))")).as("bin"))
    val parted = BinaryPartition.repartitionBySlice(df, "bin", 5, left = 2, right = 4)
    val placed = parted
      .select(expr("hex(substring(bin, 3, 3))").as("slice"))
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
    // every distinct slice must map to exactly one partition
    val spread = placed.groupBy("slice")
      .agg(countDistinct(col("pid")).as("nparts"))
      .agg(max(col("nparts"))).head().getLong(0)
    assert(spread == 1L, "equal sub-arrays split across partitions")
    // python-style negative offsets: [-3,-1] == [2,4] for 5-byte keys
    val alt = BinaryPartition.sliceExpr(col("bin"), -3, -1)
    assert(df.filter(expr("substring(bin, 3, 3)") =!= alt).count() == 0)
  }

  test("small files coalesce into few partitions (CombineFileInputFormat)") {
    val dir = tmp() + "/many"
    // 40 tiny files (one per partition)
    spark.range(0, 400, 1, 40).select(col("id").cast("string").as("value"))
      .write.text(dir)
    val fine = spark.read.text(dir)
    // Spark's file coalescing (maxPartitionBytes/openCostInBytes) is the
    // built-in CombineFileInputFormat: far fewer partitions than files
    assert(fine.rdd.getNumPartitions < 40,
      s"expected coalesced splits, got ${fine.rdd.getNumPartitions}")
    assert(fine.count() == 400)
  }

  test("TextOutputFormat roundtrip: key TAB value lines re-read as KV") {
    val dir = tmp() + "/kvout"
    val df = spark.range(50).select(
      concat(lit("k"), col("id")).as("key"),
      concat(lit("v"), col("id")).as("value"))
    // TextOutputFormat's key \t value framing
    df.select(concat_ws("\t", col("key"), col("value")).as("line"))
      .write.text(dir)
    val back = Formats.keyValueText(spark, dir)
    import spark.implicits._
    assert(back.as[(String, String)].collect().toSet ==
      (0 until 50).map(i => (s"k$i", s"v$i")).toSet)
  }

  test("real MapFile roundtrip: Hadoop Reader.get finds keys via the index") {
    import graft.sources.MapFileLike
    val dir = tmp() + "/mapfile"
    val df = spark.range(0, 1000).select(col("id").as("key"),
      concat(lit("row-"), col("id")).as("value"))
    MapFileLike.writeMapFiles(df, dir)
    // byte-compatible: the stock MapFile.Reader seeks these files
    assert(MapFileLike.getFromMapFiles(spark, dir, 421L) == Some("row-421"))
    assert(MapFileLike.getFromMapFiles(spark, dir, 0L) == Some("row-0"))
    assert(MapFileLike.getFromMapFiles(spark, dir, 999L) == Some("row-999"))
    assert(MapFileLike.getFromMapFiles(spark, dir, 12345L).isEmpty)
  }

  test("BloomMapFile: negative lookup is rejected by the filter before any data scan") {
    import graft.sources.MapFileLike
    val dir = tmp() + "/bloommapfile"
    val df = spark.range(0, 1000).select(col("id").as("key"),
      concat(lit("row-"), col("id")).as("value"))
    MapFileLike.writeMapFiles(df, dir, bloom = true)
    // present keys: bloom says probably-present somewhere, get finds them
    assert(MapFileLike.getFromBloomMapFiles(spark, dir, 421L) == Some("row-421"))
    assert(MapFileLike.getFromBloomMapFiles(spark, dir, 0L) == Some("row-0"))
    assert(MapFileLike.bloomProbes(spark, dir, 421L).contains(true))
    // absent keys: at 0.5% configured error rate, the overwhelming
    // majority of probes reject WITHOUT touching index or data
    // (BloomMapFile.java:275-281 returns before super.get) — count
    // rejections across many misses rather than demand any single one.
    // The lookup LOOP runs through the amortized handle: readers (and
    // bloom sidecars) open once, not once per key.
    val lookup = MapFileLike.openBloomLookup(spark, dir)
    try {
      val missProbes = (100000L until 100100L).flatMap(k => lookup.probes(k))
      val rejected = missProbes.count(_ == false)
      assert(rejected > missProbes.size * 9 / 10,
        s"bloom filter rejected only $rejected/${missProbes.size} absent-key probes")
      assert(lookup.get(100042L).isEmpty)
      assert(lookup.get(421L) == Some("row-421"))
    } finally lookup.close()
    assert(MapFileLike.getFromBloomMapFiles(spark, dir, 100042L).isEmpty)
  }

  test("SequenceFile.Sorter analog: k-way merge of files into sorted output") {
    val d1 = tmp() + "/sorter-in1"; val d2 = tmp() + "/sorter-in2"
    val out = tmp() + "/sorter-out"
    // two unsorted inputs with interleaved keys
    SequenceFileIO.write(spark.range(100).select(
      ((col("id") * 37) % 100).as("key"), concat(lit("a"), col("id")).as("value")), d1)
    SequenceFileIO.write(spark.range(100).select(
      ((col("id") * 53) % 100 + 100).as("key"), concat(lit("b"), col("id")).as("value")), d2)
    SequenceFileIO.sortFiles(spark, Seq(d1, d2), out)
    import spark.implicits._
    val back = SequenceFileIO.read(spark, out).as[(Long, String)].collect()
    assert(back.map(_._1).toSeq == back.map(_._1).toSeq.sorted, "output not sorted")
    assert(back.length == 200)
  }

  test("SetFile membership and ArrayFile index-seek (MapFile family)") {
    import graft.sources.MapFileLike
    val sdir = tmp() + "/setfile"
    MapFileLike.writeSetFile(spark.range(0, 100, 2).select(col("id").as("key")), sdir)
    assert(MapFileLike.setFileContains(spark, sdir, 42L))
    assert(!MapFileLike.setFileContains(spark, sdir, 43L))
    val adir = tmp() + "/arrayfile"
    val vals = spark.range(0, 50).select(concat(lit("v"), col("id") * 10).as("v"))
    MapFileLike.writeArrayFile(vals, adir)
    assert(MapFileLike.arrayFileGet(spark, adir, 7L) == Some("v70"))
    assert(MapFileLike.arrayFileGet(spark, adir, 0L) == Some("v0"))
    assert(MapFileLike.arrayFileGet(spark, adir, 50L).isEmpty)
  }

  test("SequenceFile AsText variant stringifies both columns") {
    val dir = tmp() + "/astext"
    val df = spark.range(10).select(col("id").as("key"), (col("id") * 2).as("value"))
    SequenceFileIO.write(df, dir)
    val back = SequenceFileIO.readAsText(spark, dir)
    import spark.implicits._
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    assert(back.as[(String, String)].collect().toSet ==
      (0 until 10).map(i => (s"$i", s"${i * 2}")).toSet)
  }

  test("hive-partitioned write prunes at the scan: PartitionFilters + only matching files read") {
    import spark.implicits._
    val dir = tmp() + "/parted"
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    docs.write.partitionBy("lang").parquet(dir)
    val rd = spark.read.parquet(dir).filter(col("lang") === "en")
    rd.collect()
    val p = rd.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning),
    // NOT PushedFilters (row-group stats) — lang is a partition column
    assert(p.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(p).isDefined,
      s"lang predicate did not prune partitions:\n$p")
    // and the scan must physically touch only the lang=en directory
    val files = rd.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"scan read non-matching partitions: ${files.filterNot(_.contains("lang=en")).take(3).mkString}")
    assert(rd.count() == docs.filter(col("lang") === "en").count())
  }

  test("ORC, CSV and JSON-lines round-trips preserve the documents table") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val want = docs.as[(Long, String, String, String)].collect().toSet
    val base = tmp()
    docs.write.orc(s"$base/orc")
    docs.write.option("header", "true").csv(s"$base/csv")
    docs.write.json(s"$base/json")
    val orc = spark.read.orc(s"$base/orc")
    val csv = spark.read.option("header", "true").schema(docs.schema)
      .csv(s"$base/csv")
    val json = spark.read.schema(docs.schema).json(s"$base/json")
    for ((fmt, back) <- Seq(("orc", orc), ("csv", csv), ("json", json)))
      assert(back.as[(Long, String, String, String)].collect().toSet == want,
        s"$fmt round-trip diverged")
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
