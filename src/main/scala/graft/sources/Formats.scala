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
    * Contiguous line ranges map to partitions in order, like the
    * reference's per-file line splits.
    */
  def nLine(spark: SparkSession, path: String, n: Int): DataFrame = {
    val lines = spark.read.text(path)
    val indexed = lines.rdd.zipWithIndex()
    val total = indexed.count()
    val parts = math.max(1, math.ceil(total.toDouble / n).toInt)
    val rows = indexed
      .map { case (row, idx) => (idx / n, row) }
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = parts
        def getPartition(key: Any): Int = key.asInstanceOf[Long].toInt
      })
      .map(_._2)
    spark.createDataFrame(rows, lines.schema)
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
