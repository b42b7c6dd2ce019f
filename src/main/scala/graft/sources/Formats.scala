package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small text/binary format adapters from SURVEY §2.1. */
object Formats {

  /** KeyValueTextInputFormat (mapreduce/lib/input/KeyValueTextInputFormat.java:44):
    * each line splits at the FIRST tab into (key, value); no tab ->
    * whole line is the key, value empty.
    */
  def keyValueText(spark: SparkSession, path: String, sep: String = "\t"): DataFrame = {
    // the quoted separator is embedded in a regex character CLASS below,
    // which is only correct for a single character
    require(sep.length == 1,
      s"keyValueText needs a single-char separator, got ${sep.length} chars")
    val q = java.util.regex.Pattern.quote(sep)
    spark.read.text(path).select(
      regexp_extract(col("value"), s"^([^$q]*)", 1).as("key"),
      // everything after the first separator (empty when absent)
      when(col("value").contains(sep),
        regexp_replace(col("value"), s"^[^$q]*$q", "")).otherwise("").as("value"))
  }

  /** FixedLengthInputFormat (mapreduce/lib/input/FixedLengthInputFormat.java:47):
    * fixed `recordLength`-byte binary records, no delimiters. One
    * `record: binary` row each; framing handled by Spark's binaryRecords.
    */
  def fixedLength(spark: SparkSession, path: String, recordLength: Int): DataFrame = {
    val rdd = spark.sparkContext.binaryRecords(path, recordLength)
    // BINARY encoder: codegen'd serializer, no per-row Row/converter
    // allocation (matters at 10M+ records/task)
    spark.createDataset(rdd)(org.apache.spark.sql.Encoders.BINARY).toDF("record")
  }

  /** StreamXmlRecordReader analog
    * (hadoop-streaming/.../StreamXmlRecordReader.java:44-60): records are
    * XML subtrees between configurable begin/end marks. Spark-first:
    * the end mark becomes the record delimiter of the splittable text
    * reader (Hadoop's LineRecordReader handles split-straddling records
    * exactly as the reference's seek-to-begin does), then each chunk is
    * trimmed to its first begin mark and the end mark restored.
    *
    * Known deviation: a malformed trailing fragment (a begin mark never
    * closed before EOF) is emitted with the end mark appended, where the
    * reference's reader drops it (StreamXmlRecordReader fast-match fails
    * at EOF). Well-formed documents are unaffected.
    */
  def xmlRecords(spark: SparkSession, path: String,
                 begin: String, end: String): DataFrame = {
    val chunks = spark.read.option("lineSep", end).text(path)
    chunks
      .filter(col("value").contains(begin))
      .select(concat(
        col("value").substr(locate(begin, col("value")), length(col("value"))),
        lit(end)).as("record"))
  }

  /** NLineInputFormat (mapreduce/lib/input/NLineInputFormat.java:81-110):
    * exactly `n` input lines per partition (the reference's lever for
    * map-task granularity when each line is an expensive work item).
    *
    * Reference-faithful granularity: each FILE is chunked into n-line
    * groups independently (getSplitsForFile numbers lines per file), so
    * a group never straddles files, files map to contiguous partition
    * ranges in lexicographic order, and WITHIN a group the original line
    * order is preserved (repartitionAndSortWithinPartitions on the
    * per-file line number — shuffle-block arrival order can't reorder).
    *
    * Two passes over the data: a count pass establishing each input
    * split's starting line number (the reference instead reads every
    * file on the DRIVER at planning time — getSplitsForFile opens the
    * file; distributing that pass is the scale-correct form), then the
    * partitioning pass.
    */
  def nLine(spark: SparkSession, path: String, n: Int): DataFrame = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
    val sc = spark.sparkContext
    val raw = sc.newAPIHadoopFile(path, classOf[TextInputFormat],
      classOf[LongWritable], classOf[Text], sc.hadoopConfiguration)
      .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[LongWritable, Text]]
    // (file, byte-offset, line); offsets order lines within a file
    val lines = raw.mapPartitionsWithInputSplit { (split, it) =>
      val file = split.asInstanceOf[FileSplit].getPath.toString
      it.map { case (off, text) => (file, off.get(), text.toString) }
    }
    // pass 1: (partition -> file, lines, first offset); each Hadoop
    // split belongs to exactly one file
    val splitInfo = lines.mapPartitionsWithIndex { (pid, it) =>
      var file: String = null; var c = 0L; var first = Long.MaxValue
      it.foreach { r => file = r._1; first = math.min(first, r._2); c += 1 }
      if (c == 0) Iterator.empty else Iterator((pid, file, first, c))
    }.collect()
    // per file (lexicographic), splits in offset order -> starting line
    // number of each split within its file + per-file group base
    val byFile = splitInfo.groupBy(_._2).toSeq.sortBy(_._1)
    val startLine = scala.collection.mutable.HashMap.empty[Int, Long]
    val groupBase = scala.collection.mutable.HashMap.empty[String, Long]
    var nextGroup = 0L
    byFile.foreach { case (file, splits) =>
      groupBase(file) = nextGroup
      var ln = 0L
      splits.sortBy(_._3).foreach { case (pid, _, _, c) =>
        startLine(pid) = ln; ln += c
      }
      nextGroup += (ln + n - 1) / n
    }
    val totalGroups = math.max(1L, nextGroup).toInt
    val startB = sc.broadcast((startLine.toMap, groupBase.toMap))
    val keyed = lines.mapPartitionsWithIndex { (pid, it) =>
      val (starts, bases) = startB.value
      var ln = starts.getOrElse(pid, 0L)
      it.map { case (file, _, line) =>
        val grp = bases(file) + ln / n
        val k = (grp, ln); ln += 1
        (k, line)
      }
    }
    val part = new org.apache.spark.Partitioner {
      def numPartitions: Int = totalGroups
      def getPartition(key: Any): Int = key.asInstanceOf[(Long, Long)]._1.toInt
    }
    val rows = keyed.repartitionAndSortWithinPartitions(part)
      .map { case (_, line) => org.apache.spark.sql.Row(line) }
    spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType))))
  }

  /** MultipleInputs / DelegatingInputFormat
    * (mapreduce/lib/input/MultipleInputs.java:43-60,
    * DelegatingInputFormat.java): each path gets its own format reader
    * and its own per-path mapper, all feeding one job. Heterogeneous
    * schemas align by column name; columns a source lacks are null —
    * the TaggedInputSplit dispatch, expressed as unionByName.
    */
  final case class In(path: String,
                      read: String => DataFrame,
                      map: DataFrame => DataFrame = identity)

  def multipleInputs(inputs: Seq[In]): DataFrame = {
    require(inputs.nonEmpty, "multipleInputs needs at least one input")
    inputs.map(i => i.map(i.read(i.path)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** AutoInputFormat (hadoop-streaming/.../AutoInputFormat.java): sniff
    * whether a file is a SequenceFile (leading magic "SEQ") or plain text.
    */
  def sniffFormat(spark: SparkSession, path: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file = graft.sources.sequencefile.SequenceFileSource.listDataFiles(fs, p)
      .headOption.getOrElse(throw new IllegalArgumentException(s"empty path $path"))
    val in = fs.open(file.getPath)
    try {
      val magic = new Array[Byte](3)
      in.readFully(magic)
      if (magic.sameElements("SEQ".getBytes)) "sequencefile" else "text"
    } finally in.close()
  }
}
