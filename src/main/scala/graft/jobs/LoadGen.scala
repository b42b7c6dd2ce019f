package graft.jobs

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TeraIO

/** The reference's benchmark / synthetic-load harness jobs, Spark-first.
  *
  * - [[mrbench]] ≙ MRBench (hadoop-mapreduce-client-jobclient
  *   src/test/.../mapred/MRBench.java:41,173-233): N identical tiny
  *   text → identity-map → sort → identity-reduce → text jobs, reporting
  *   per-run wall time — the small-JOB-latency probe (scheduler + task
  *   launch + commit overhead, not data throughput).
  * - [[dfsioWrite]]/[[dfsioRead]] ≙ TestDFSIO
  *   (src/test/.../fs/TestDFSIO.java:88-103): sequential write then read
  *   of N files × M MB, reporting aggregate MB/s — the raw storage-path
  *   throughput probe. Records go through TeraIO's 100-byte raw format
  *   (no parquet encoding in the measurement).
  * - [[sleepJob]] ≙ SleepJob (src/test/.../mapreduce/SleepJob.java):
  *   configurable map/reduce task counts that do nothing but sleep —
  *   exercises scheduling and shuffle machinery with zero data.
  * - [[loadGen]] ≙ GenericMRLoadGenerator
  *   (src/test/.../mapreduce/GenericMRLoadGenerator.java): configurable-
  *   shape load over real input — map selectivity (keep.map.percent),
  *   a full shuffle, reduce selectivity (keep.reduce.percent). The
  *   reference keeps records by RNG; here acceptance is a deterministic
  *   per-record hash test, so runs are reproducible.
  */
object LoadGen {

  /** Returns per-run seconds; callers aggregate (MRBench prints avg). */
  def mrbench(spark: SparkSession, workDir: String, inputLines: Long = 1,
              runs: Int = 4): Seq[Double] = {
    val in = s"$workDir/mr_input"
    // MRBench.generateTextFile: zero-padded line numbers, one per line.
    // coalesce(1) is INTENTIONAL: MRBench's contract is one tiny input
    // file (the harness measures small-job framework latency, and a
    // 1000-line fixture split over 32 parts would measure task-launch
    // fan-out instead) — do not "fix" this into a parallel write.
    val padding = inputLines.toString.length
    spark.range(inputLines)
      .select(format_string(s"%0${padding}d", col("id")).as("value"))
      .coalesce(1).write.mode("overwrite").text(in)
    (1 to runs).map { i =>
      val out = s"$workDir/mr_output/run_$i"
      val t0 = System.nanoTime()
      // map emits (line, "") and the sorted reduce writes it back — an
      // identity job whose cost IS the framework overhead
      spark.read.text(in).orderBy("value")
        .write.mode("overwrite").text(out)
      (System.nanoTime() - t0) / 1e9
    }
  }

  /** Write `nFiles` × `mbPerFile` MB of 100-byte records; returns
    * (seconds, aggregate MB/s). One output file per task, like
    * TestDFSIO's one-file-per-map.
    */
  def dfsioWrite(spark: SparkSession, path: String,
                 nFiles: Int, mbPerFile: Int): (Double, Double) = {
    val rows = nFiles.toLong * mbPerFile * 10000L     // 10k rows per MB
    val df = TeraSort.teraGen(spark, rows, nFiles)
    TeraIO.delete(spark, path)
    val t0 = System.nanoTime()
    TeraIO.write(df, path)
    val sec = (System.nanoTime() - t0) / 1e9
    val mb = rows * TeraIO.RecordLength / 1e6
    (sec, mb / sec)
  }

  /** Read the files back fully (every byte crosses the record reader);
    * returns (seconds, aggregate MB/s).
    */
  def dfsioRead(spark: SparkSession, path: String): (Double, Double) = {
    val t0 = System.nanoTime()
    val bytes = TeraIO.read(spark, path)
      .select(sum(length(col("key")) + length(col("value"))).cast("long"))
      .head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, bytes / 1e6 / sec)
  }

  /** NNBench analog (src/test/.../hdfs/NNBench.java: create_write /
    * open_read / delete operation phases): metadata-op throughput —
    * each task creates, then reads, then deletes its share of `files`
    * tiny files through the Hadoop FS API, timed per phase from the
    * driver. The namenode/metadata-path probe (ops/sec, not MB/s):
    * a pipeline landing millions of small objects is gated here long
    * before raw storage bandwidth matters. Returns ops/sec per phase.
    */
  def nnbench(spark: SparkSession, workDir: String, files: Int,
              partitions: Int = 8): Map[String, Double] = {
    import org.apache.hadoop.fs.Path
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val ids = spark.sparkContext.range(0, files, 1, partitions)
    def phase(f: (org.apache.hadoop.fs.FileSystem, Path) => Unit): Double = {
      val t0 = System.nanoTime()
      ids.foreachPartition { it =>
        val fs = new Path(workDir).getFileSystem(conf.value)
        it.foreach(i => f(fs, new Path(workDir, s"nn_$i")))
      }
      files / ((System.nanoTime() - t0) / 1e9)
    }
    val create = phase { (fs, p) =>
      val out = fs.create(p, true)
      try out.write(1) finally out.close()
    }
    val read = phase { (fs, p) =>
      val in = fs.open(p)
      try { in.read(); () } finally in.close()
    }
    val delete = phase((fs, p) => fs.delete(p, false))
    Map("create_write" -> create, "open_read" -> read, "delete" -> delete)
  }

  /** `mapTasks` map partitions sleeping `mapMs` each, then (optionally)
    * a shuffle into `redTasks` reduce partitions sleeping `redMs`.
    * Returns total records passed through (== mapTasks).
    */
  def sleepJob(spark: SparkSession, mapTasks: Int, mapMs: Long,
               redTasks: Int = 0, redMs: Long = 0): Long = {
    val mapped = spark.range(0, mapTasks, 1, mapTasks).rdd
      .mapPartitions { it => Thread.sleep(mapMs); it }
    if (redTasks <= 0) mapped.count()
    else mapped.map(id => (id, 1L))
      .partitionBy(new HashPartitioner(redTasks))
      .mapPartitions { it => Thread.sleep(redMs); it }
      .count()
  }

  /** Map-selectivity → shuffle → reduce-selectivity over a real input:
    * the GenericMRLoadGenerator shape with deterministic acceptance
    * (xxhash64 of the key, salted per stage, mod 100 < pct).
    */
  def loadGen(df: DataFrame, keyCol: String,
              keepMapPct: Int, keepRedPct: Int): DataFrame =
    df.filter(pmod(xxhash64(col(keyCol), lit("map")), lit(100)) < keepMapPct)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .filter(pmod(xxhash64(col(keyCol), lit("red")), lit(100)) < keepRedPct)

  /** FileBench analog (hadoop-mapreduce-client-jobclient
    * src/test/.../io/FileBench.java:41,244-295: per-(format, codec,
    * read|write) MB/s over generated word text): times the engine's
    * record-format lanes — plain text, SequenceFile uncompressed, and
    * SequenceFile BLOCK-deflate — write then full read of the same
    * (key, value) records, reporting logical MB/s per lane. The
    * parquet lane is intentionally absent here: every declared query
    * already measures it; this probe isolates the K/V format codecs.
    */
  def fileBench(spark: SparkSession, workDir: String,
                mb: Int): Map[String, Double] = {
    val rows = mb.toLong * 10000L                     // 100 B/record
    val df = spark.range(rows).select(
      format_string("k%09d", col("id")).as("key"),
      rpad(format_string("v%09d", col("id")), 90, "x").as("value"))
    // every lane reports LOGICAL MB/s — the same 100-byte (key, value)
    // payload through each format — so the lanes compare "how fast does
    // this format move the same records". Physical framing differs per
    // format (tab+newline for text, record/sync headers for
    // sequencefile) and is precisely part of what each lane pays.
    val logicalMb = rows * 100 / 1e6
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      logicalMb / ((System.nanoTime() - t0) / 1e9)
    }
    import graft.sources.sequencefile.SequenceFileIO
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    out("txt_write") = timed {
      df.select(concat_ws("\t", col("key"), col("value")).as("value"))
        .write.mode("overwrite").text(s"$workDir/txt")
    }
    out("txt_read") = timed {
      spark.read.text(s"$workDir/txt")
        .select(sum(length(col("value")))).head()
    }
    out("seq_write") = timed(SequenceFileIO.write(df, s"$workDir/seq"))
    out("seq_read") = timed {
      SequenceFileIO.read(spark, s"$workDir/seq")
        .select(sum(length(col("key")) + length(col("value")))).head()
    }
    out("seq_blk_write") = timed {
      SequenceFileIO.write(df, s"$workDir/seq_blk", compression = "BLOCK")
    }
    out("seq_blk_read") = timed {
      SequenceFileIO.read(spark, s"$workDir/seq_blk")
        .select(sum(length(col("key")) + length(col("value")))).head()
    }
    out.toMap
  }

  /** Slive analog (hadoop-mapreduce-client-jobclient
    * src/test/.../fs/slive/SliveTest.java + the op classes CreateOp/
    * MkdirOp/RenameOp/ReadOp/ListOp/DeleteOp): a weighted mixed
    * metadata+data op load run by every partition against its own
    * directory — the reference's measure of sustained mixed-op
    * throughput with failures COUNTED rather than thrown (slive's
    * not-found outcomes). Append is omitted: local checksum
    * filesystems reject it, and the reference itself weights it
    * optional. Returns (totalOps, opsPerSec, failures).
    */
  def slive(spark: SparkSession, workDir: String, filesPerTask: Int = 50,
            partitions: Int = 8): (Long, Double, Long) = {
    import org.apache.hadoop.fs.Path
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val t0 = System.nanoTime()
    val (ops, fails) = spark.sparkContext
      .range(0, partitions, 1, partitions)
      .mapPartitions { it =>
        val t = it.next()
        val dir = new Path(workDir, s"task_$t")
        val fs = dir.getFileSystem(conf.value)
        var ops = 0L
        var fails = 0L
        def op(f: => Boolean): Unit = {
          ops += 1
          if (!scala.util.Try(f).getOrElse(false)) fails += 1
        }
        op(fs.mkdirs(dir))
        val files = (0 until filesPerTask).map(i => new Path(dir, s"f_$i"))
        files.foreach { p =>
          op { val o = fs.create(p, true); o.write(t.toInt); o.close(); true }
        }
        op(fs.listStatus(dir).length == filesPerTask)
        val renamed = files.map(p => new Path(dir, p.getName + ".r"))
        files.zip(renamed).foreach { case (a, b) => op(fs.rename(a, b)) }
        renamed.foreach { p =>
          op { val in = fs.open(p); val b = in.read(); in.close(); b >= 0 }
        }
        renamed.foreach(p => op(fs.delete(p, false)))
        Iterator.single((ops, fails))
      }
      .reduce { case ((o1, f1), (o2, f2)) => (o1 + o2, f1 + f2) }
    val sec = (System.nanoTime() - t0) / 1e9
    (ops, ops / sec, fails)
  }

  /** BigMapOutput analog (hadoop-mapreduce-client-jobclient
    * src/test/.../mapred/BigMapOutput.java:41,57-108: a big SequenceFile
    * of random BytesWritable records run through identity map → shuffle
    * → identity reduce): the MAP-OUTPUT/shuffle-path throughput probe —
    * every byte of a large binary record set crosses the shuffle. Here:
    * generate `mb` MB of deterministic pseudo-random 100-byte binary
    * (key, value) records into a SequenceFile, then read → hash-
    * repartition on key (the full shuffle) → write a SequenceFile back.
    * Keys are md5-derived so runs are reproducible (the reference's
    * Random keys make its own runs incomparable). Returns
    * (shuffleSec, shuffleMbps) over the logical bytes.
    */
  def bigMapOutput(spark: SparkSession, workDir: String, mb: Int,
                   partitions: Int = 8): (Double, Double) = {
    val rows = mb.toLong * 10000L                     // 100 B/record
    val in = s"$workDir/bmo_in"
    val out = s"$workDir/bmo_out"
    import graft.sources.sequencefile.SequenceFileIO
    val gen = spark.range(0, rows, 1, partitions).select(
      unhex(md5(col("id").cast("string"))).as("key"),          // 16 B
      unhex(concat((0 until 6).map(i =>                         // 84 B
        md5(concat(col("id").cast("string"), lit(s"_$i")))): _*)
        .substr(1, 168)).as("value"))
    SequenceFileIO.write(gen, in)
    val t0 = System.nanoTime()
    val shuffled = SequenceFileIO.read(spark, in)
      .repartition(partitions, col("key"))
    SequenceFileIO.write(shuffled, out)
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, rows * 100 / 1e6 / sec)
  }

  /** ThreadedMapBenchmark analog (hadoop-mapreduce-client-jobclient
    * src/test/.../mapred/ThreadedMapBenchmark.java:54-71: random data
    * per map, then a sort sized to force one vs many map-side spills):
    * the MAP-SIDE SORT/spill probe. Spark's analog of the spill phase
    * is the per-partition external sort, so the measured job is
    * generate → sortWithinPartitions(key) — no shuffle; the cost is
    * purely each task's in-memory/spill sort — with the same 100-byte
    * records the reference generates. Spark sizes and spills its
    * UnsafeExternalSorter automatically, which is exactly the
    * "multiple threaded spills" knob the reference hand-tunes.
    * Returns (sortSec, sortMbps).
    */
  def threadedMapBench(spark: SparkSession, mb: Int,
                       partitions: Int = 8): (Double, Double) = {
    val rows = mb.toLong * 10000L
    val df = TeraSort.teraGen(spark, rows, partitions)
    val t0 = System.nanoTime()
    df.sortWithinPartitions(col("key"))
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, rows * 100 / 1e6 / sec)
  }

  /** One job of a synthetic load trace: `rows` of generated input run
    * through the [[loadGen]] selectivity shape.
    */
  case class TraceJob(name: String, rows: Long, mapPct: Int, redPct: Int)

  /** GridMix-lite (HT/hadoop-gridmix/): replay a synthetic job mix in
    * submission order, one [[loadGen]]-shaped job per trace entry over
    * deterministic generated input, reporting (name, seconds, output
    * rows). The reference's SERIAL submission policy — each job starts
    * when its predecessor completes (its STRESS/REPLAY policies need a
    * multi-tenant scheduler; on one Spark app serial is the meaningful
    * mode). Traces can be hand-written or mined from a real event log
    * by [[Rumen.toTrace]]; [[Sls]] simulates the same mined traces
    * against scheduler policies without running them.
    */
  def replayTrace(spark: SparkSession,
                  trace: Seq[TraceJob]): Seq[(String, Double, Long)] =
    trace.map { j =>
      val in = spark.range(j.rows)
        .select((col("id") % math.max(1L, j.rows / 4)).as("k"))
      val t0 = System.nanoTime()
      val out = loadGen(in, "k", j.mapPct, j.redPct).count()
      (j.name, (System.nanoTime() - t0) / 1e9, out)
    }
}
