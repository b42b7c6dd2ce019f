package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MapFile analog: keyed random access over an immutable dataset.
  *
  * Reference: MapFile — a sorted SequenceFile plus an index permitting
  * `get(key)` (hadoop-common/.../io/MapFile.java:342 Reader, :674 get);
  * the DistributedCache + MapFile.get pattern is the reference's
  * broadcast-join building block. The derived family is covered too:
  * BloomMapFile (bloom-sidecar fast negative lookups,
  * [[writeMapFiles]] `bloom = true` / [[getFromBloomMapFiles]]),
  * SetFile ([[writeSetFile]]) and ArrayFile ([[writeArrayFile]]).
  *
  * Spark-first: the idiomatic replacement is parquet sorted WITHIN
  * key-hashed files. `sortWithinPartitions` before write gives per-file
  * min/max statistics on the key column, so a `get` (an equality filter)
  * prunes to one file via pushed filters and reads only the matching
  * row groups — the same I/O shape as MapFile's index seek, but with
  * columnar pruning on top.
  */
object MapFileLike {

  /** Write `df` keyed by `key`: `buckets` files, each sorted by key. */
  def write(df: DataFrame, key: String, buckets: Int, path: String): Unit =
    df.repartition(buckets, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(path)

  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Point lookup — an equality filter the scan pushes down. */
  def get(table: DataFrame, key: String, value: Any): DataFrame =
    table.filter(col(key) === lit(value))

  // ---- byte-compatible MapFile (reference consumers can read it) ----

  /** Write a REAL Hadoop MapFile (data + index SequenceFiles) per
    * partition, byte-compatible with MapFile.Reader
    * (hadoop-common/.../io/MapFile.java:98 Writer, :342 Reader). Each
    * partition must arrive sorted by key — the same precondition the
    * reference's Writer enforces — so the caller range-partitions and
    * sorts first (as done here).
    *
    * Task commit: each attempt writes under `_temporary/` (attempt-id
    * scoped) and renames into place only on success — the v1
    * FileOutputCommitter protocol, so a retried or speculative attempt
    * never leaves a partial `part-*` directory; first successful rename
    * wins and later attempts discard their output.
    */
  def writeMapFiles(df: DataFrame, path: String, bloom: Boolean = false): Unit = {
    import org.apache.hadoop.io._
    import graft.sources.sequencefile.SequenceFileIO
    val schema = df.schema
    require(schema.length == 2, s"mapfile write needs (key, value), got $schema")
    val kt = schema(0).dataType
    val vt = schema(1).dataType
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val sorted = df.repartitionByRange(col(schema(0).name))
      .sortWithinPartitions(col(schema(0).name))
    sorted.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val conf = confSer.value
        val dest = new org.apache.hadoop.fs.Path(f"$path/part-$pid%05d")
        val attempt = new org.apache.hadoop.fs.Path(
          f"$path/_temporary/part-$pid%05d-attempt-${tc.taskAttemptId()}")
        val fs = dest.getFileSystem(conf)
        val keyOpt = MapFile.Writer.keyClass(
          SequenceFileIO.writableClass(kt).asSubclass(classOf[WritableComparable[_]]))
        val valOpt = MapFile.Writer.valueClass(SequenceFileIO.writableClass(vt))
        // BloomMapFile.Writer extends MapFile.Writer: same append/commit
        // path, plus a DynamicBloomFilter over the keys written to a
        // `bloom` sidecar on close (HC/io/BloomMapFile.java:76,186-196)
        val writer: MapFile.Writer =
          if (bloom) new BloomMapFile.Writer(conf, attempt, keyOpt, valOpt)
          else new MapFile.Writer(conf, attempt, keyOpt, valOpt)
        try {
          it.foreach { row =>
            writer.append(
              SequenceFileIO.toWritable(row.get(0), kt).asInstanceOf[WritableComparable[_]],
              SequenceFileIO.toWritable(row.get(1), vt))
          }
          writer.close()
          // commit: first attempt wins. NOTE rename(src, existingDir)
          // moves src INSIDE an existing destination instead of failing,
          // so a bare rename would nest a loser's attempt dir under the
          // committed part-* dir — check existence first and have losers
          // (speculative/zombie attempts) discard their output. The
          // exists/rename pair is not atomic; if two attempts raced
          // through the check, the loser's rename nests under dest and
          // still "succeeds" — detect that and self-heal by deleting
          // the nested dir. Residual window: a zombie that dies between
          // nesting and healing leaves a stale subdir — harmless to
          // every reader here (MapFile.Reader opens only the named
          // data/index files; partDirs lists only top-level part-*),
          // but external consumers doing recursive copies should sweep
          // `*-attempt-*` children first.
          if (fs.exists(dest) || !fs.rename(attempt, dest))
            fs.delete(attempt, true)
          else {
            val nested = new org.apache.hadoop.fs.Path(dest, attempt.getName)
            if (fs.exists(nested)) fs.delete(nested, true)
          }
        } catch {
          case e: Throwable =>
            try writer.close() catch { case _: Throwable => () }
            fs.delete(attempt, true)
            throw e
        }
      }
    }
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_temporary")
    val fs = tmp.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** MapFile.get through the reference's own Reader (index seek + one
    * data-block read) across the partition directories — the
    * MapFileOutputFormat.getEntry pattern
    * (mapreduce/lib/output/MapFileOutputFormat.java:88-108, which hashes
    * to ONE reader; here range partitioning means probing each range
    * until hit, still O(partitions) index lookups, no scan).
    */
  /** The partition directories of a MapFile-family output, in name
    * order — shared by every probing reader below so directory-listing
    * fixes (junk filtering, ordering) happen in one place.
    */
  private def partDirs(spark: SparkSession, path: String): Seq[org.apache.hadoop.fs.Path] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    // only committed part dirs: a leftover `_temporary` from a crashed
    // writer (or one running concurrently) must not be probed
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("part-"))
      .map(_.getPath).sortBy(_.getName).toSeq
  }

  /** Open `mk` on each partition dir in turn, close it after `probe`. */
  private def probePartitions[R, T](spark: SparkSession, path: String)(
      mk: org.apache.hadoop.fs.Path => R)(close: R => Unit)(
      probe: R => Option[T]): Iterator[Option[T]] =
    partDirs(spark, path).iterator.map { d =>
      val reader = mk(d)
      try probe(reader) finally close(reader)
    }

  def getFromMapFiles(spark: SparkSession, path: String, key: Long): Option[String] = {
    import org.apache.hadoop.io._
    val conf = spark.sparkContext.hadoopConfiguration
    val k = new LongWritable(key)
    val v = new Text()
    probePartitions(spark, path)(d => new MapFile.Reader(d, conf))(_.close()) {
      r => Option(r.get(k, v)).map(_.toString)
    }.flatten.nextOption()
  }

  /** BloomMapFile.get analog (HC/io/BloomMapFile.java:275-281): each
    * partition's Reader consults its bloom sidecar FIRST —
    * `probablyHasKey` false means get returns null before any index or
    * data I/O, the sparse-lookup fast path the reference built the
    * class for. Partitions whose filter rejects the key are skipped
    * without opening a seek.
    */
  def getFromBloomMapFiles(spark: SparkSession, path: String, key: Long): Option[String] = {
    import org.apache.hadoop.io._
    val conf = spark.sparkContext.hadoopConfiguration
    val k = new LongWritable(key)
    val v = new Text()
    probePartitions(spark, path)(d => new BloomMapFile.Reader(d, conf))(_.close()) {
      r => Option(r.get(k, v)).map(_.toString)
    }.flatten.nextOption()
  }

  /** The bloom membership tests alone (one per partition directory) —
    * exposes the data-scan-skip decision for specs: a key is only ever
    * sought in partitions whose filter says "probably present".
    */
  def bloomProbes(spark: SparkSession, path: String, key: Long): Seq[Boolean] = {
    import org.apache.hadoop.io._
    val conf = spark.sparkContext.hadoopConfiguration
    val k = new LongWritable(key)
    probePartitions(spark, path)(d => new BloomMapFile.Reader(d, conf))(_.close()) {
      r => Some(r.probablyHasKey(k))
    }.flatten.toSeq
  }

  /** Amortized point-lookup handle: ONE open reader per partition,
    * reused across gets — the reference's long-lived-reader pattern
    * (mapreduce/lib/output/MapFileOutputFormat.java:65 getReaders). The
    * one-shot getFrom* helpers above re-open every index (and bloom
    * sidecar) per call, so the bloom filter's fast-negative win drowns
    * in reader construction on lookup LOOPS; this handle pays the opens
    * once.
    */
  final class BloomLookup private[MapFileLike] (
      readers: Seq[org.apache.hadoop.io.BloomMapFile.Reader]) extends AutoCloseable {
    import org.apache.hadoop.io._
    private val v = new Text()
    def get(key: Long): Option[String] = {
      val k = new LongWritable(key)
      readers.iterator.flatMap(r => Option(r.get(k, v)).map(_.toString)).nextOption()
    }
    /** The per-partition bloom decisions for a key (true = must seek). */
    def probes(key: Long): Seq[Boolean] = {
      val k = new LongWritable(key)
      readers.map(_.probablyHasKey(k))
    }
    def close(): Unit =
      readers.foreach(r => try r.close() catch { case _: Throwable => () })
  }

  def openBloomLookup(spark: SparkSession, path: String): BloomLookup = {
    val conf = spark.sparkContext.hadoopConfiguration
    new BloomLookup(partDirs(spark, path)
      .map(d => new org.apache.hadoop.io.BloomMapFile.Reader(d, conf)))
  }

  /** SetFile analog (HC/io/SetFile.java): a MapFile whose values are
    * all NullWritable — key membership only. Same files, same readers.
    */
  def writeSetFile(keys: DataFrame, path: String): Unit = {
    require(keys.schema.length == 1, s"setfile write needs one key column, got ${keys.schema}")
    writeMapFiles(keys.select(col(keys.schema(0).name),
      lit(null).cast("void").as("value")), path)
  }

  /** SetFile.Reader.seek-as-membership (SetFile.java:92-105). */
  def setFileContains(spark: SparkSession, path: String, key: Long): Boolean = {
    import org.apache.hadoop.io._
    val conf = spark.sparkContext.hadoopConfiguration
    val k = new LongWritable(key)
    probePartitions(spark, path)(d => new MapFile.Reader(d, conf))(_.close()) {
      r => if (r.get(k, NullWritable.get()) != null) Some(true) else None
    }.flatten.nextOption().isDefined
  }

  /** ArrayFile analog (HC/io/ArrayFile.java): a MapFile keyed by the
    * append index 0..n-1 (ArrayFile.Writer.append assigns count++ as
    * the key); `get(n)` is then an index seek. The input's row order is
    * the array order.
    */
  def writeArrayFile(values: DataFrame, path: String): Unit = {
    require(values.schema.length == 1, s"arrayfile write needs one value column, got ${values.schema}")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val vf = values.schema(0)
    val indexed = values.sparkSession.createDataFrame(
      values.rdd.zipWithIndex().map { case (r, i) => Row(i, r.get(0)) },
      StructType(Seq(StructField("key", LongType, nullable = false),
        vf.copy(name = "value"))))
    writeMapFiles(indexed, path)
  }

  /** ArrayFile.Reader.get(n) (ArrayFile.java:81-94). */
  def arrayFileGet(spark: SparkSession, path: String, n: Long): Option[String] =
    getFromMapFiles(spark, path, n)
}
