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
