package graft.sources.sequencefile

import org.apache.hadoop.io._
import org.apache.hadoop.mapreduce.lib.output.{FileOutputFormat, SequenceFileOutputFormat}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** User-facing SequenceFile API: DataFrame in, DataFrame out.
  *
  * Write parity target: SequenceFileOutputFormat with compression
  * NONE/RECORD/BLOCK (mapreduce/lib/output/SequenceFileOutputFormat.java:43;
  * compression types SequenceFile.java:219-225). The write path reuses
  * Hadoop's own OutputFormat + committer, so files are byte-compatible
  * with every reference consumer, written one file per partition with
  * the same atomic task-commit protocol the reference uses
  * (FileOutputCommitter).
  */
object SequenceFileIO {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(SequenceFileSource.FORMAT).load(path)

  /** SequenceFileAsTextInputFormat
    * (mapreduce/lib/input/SequenceFileAsTextInputFormat.java:35): the
    * same scan with both columns stringified via toString semantics.
    */
  def readAsText(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    read(spark, path).select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"))
  }

  /** SequenceFile.Sorter analog (HC/io/SequenceFile.java:2653 sort,
    * :3021 merge): sort — or k-way merge — SequenceFiles into a sorted
    * SequenceFile. On Spark both operations collapse to one plan:
    * read → range-repartition → in-partition sort → write (a k-way
    * merge IS the read side of a sorted shuffle, and pre-sorted runs
    * make that shuffle's sort cheap). Output part files are globally
    * ordered by file index and sorted within each file — MapFile
    * writer's precondition, as with the reference's Sorter. Key order
    * is unsigned-byte order for Text keys (UTF8String binary compare ==
    * Text byte compare) and numeric order for numeric keys.
    */
  def sortFiles(spark: SparkSession, inPaths: Seq[String], outPath: String,
                partitions: Int = 1, compression: String = "NONE"): Unit = {
    import org.apache.spark.sql.functions.col
    val in = inPaths.map(read(spark, _)).reduce(_.unionByName(_))
    val sorted = in.repartitionByRange(partitions, col("key"))
      .sortWithinPartitions(col("key"))
    write(sorted, outPath, compression)
  }

  /** Write a two-column (key, value) DataFrame. `compression` is NONE,
    * RECORD or BLOCK (deflate codec — pure-java, no native deps).
    */
  def write(df: DataFrame, path: String, compression: String = "NONE"): Unit = {
    val schema = df.schema
    require(schema.length == 2, s"sequencefile write needs (key, value), got $schema")
    val kt = schema(0).dataType
    val vt = schema(1).dataType
    val rdd = df.rdd.map(r => (toWritable(r.get(0), kt), toWritable(r.get(1), vt)))
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      df.sparkSession.sparkContext.hadoopConfiguration)
    job.setOutputKeyClass(writableClass(kt))
    job.setOutputValueClass(writableClass(vt))
    if (compression != "NONE") {
      FileOutputFormat.setCompressOutput(job, true)
      SequenceFileOutputFormat.setOutputCompressionType(job,
        SequenceFile.CompressionType.valueOf(compression))
      FileOutputFormat.setOutputCompressorClass(job,
        classOf[org.apache.hadoop.io.compress.DefaultCodec])
    }
    rdd.saveAsNewAPIHadoopFile(path, job.getOutputKeyClass, job.getOutputValueClass,
      classOf[SequenceFileOutputFormat[Writable, Writable]], job.getConfiguration)
  }

  def writableClass(dt: DataType): Class[_ <: Writable] = dt match {
    case NullType    => classOf[NullWritable]
    case BooleanType => classOf[BooleanWritable]
    case ByteType    => classOf[ByteWritable]
    case ShortType   => classOf[ShortWritable]
    case IntegerType => classOf[IntWritable]
    case LongType    => classOf[LongWritable]
    case FloatType   => classOf[FloatWritable]
    case DoubleType  => classOf[DoubleWritable]
    case StringType  => classOf[Text]
    case BinaryType  => classOf[BytesWritable]
    // typed-array subclass idiom for strings; numeric arrays go through
    // Hadoop's self-describing ArrayPrimitiveWritable
    case ArrayType(StringType, _) => classOf[TextArrayWritable]
    case ArrayType(BooleanType | ByteType | ShortType | IntegerType |
                   LongType | FloatType | DoubleType, _) =>
      classOf[ArrayPrimitiveWritable]
    case _: MapType    => classOf[MapWritable]
    case _: StructType => classOf[FullTupleWritable]
    case other       => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  def toWritable(v: Any, dt: DataType): Writable = dt match {
    case NullType    => NullWritable.get()
    case BooleanType => new BooleanWritable(v.asInstanceOf[Boolean])
    case ByteType    => new ByteWritable(v.asInstanceOf[Byte])
    case ShortType   => new ShortWritable(v.asInstanceOf[Short])
    case IntegerType => new IntWritable(v.asInstanceOf[Int])
    case LongType    => new LongWritable(v.asInstanceOf[Long])
    case FloatType   => new FloatWritable(v.asInstanceOf[Float])
    case DoubleType  => new DoubleWritable(v.asInstanceOf[Double])
    case StringType  => new Text(v.asInstanceOf[String])
    case BinaryType  => new BytesWritable(v.asInstanceOf[Array[Byte]])
    case ArrayType(StringType, _) =>
      new TextArrayWritable(v.asInstanceOf[scala.collection.Seq[String]].toArray)
    case ArrayType(et, _) =>
      val s = v.asInstanceOf[scala.collection.Seq[Any]]
      val arr: AnyRef = et match {
        case BooleanType => s.map(_.asInstanceOf[Boolean]).toArray
        case ByteType    => s.map(_.asInstanceOf[Byte]).toArray
        case ShortType   => s.map(_.asInstanceOf[Short]).toArray
        case IntegerType => s.map(_.asInstanceOf[Int]).toArray
        case LongType    => s.map(_.asInstanceOf[Long]).toArray
        case FloatType   => s.map(_.asInstanceOf[Float]).toArray
        case DoubleType  => s.map(_.asInstanceOf[Double]).toArray
        case other => throw new IllegalArgumentException(s"array of $other")
      }
      new ArrayPrimitiveWritable(arr)
    case MapType(kt, vt, _) =>
      val m = new MapWritable()
      v.asInstanceOf[scala.collection.Map[Any, Any]].foreach { case (k, x) =>
        m.put(toWritable(k, kt), toWritable(x, vt))
      }
      m
    case st: StructType =>
      val r = v.asInstanceOf[org.apache.spark.sql.Row]
      new FullTupleWritable(
        st.fields.zipWithIndex.map { case (f, i) => toWritable(r.get(i), f.dataType) })
    case other       => throw new IllegalArgumentException(s"unsupported type: $other")
  }
}
