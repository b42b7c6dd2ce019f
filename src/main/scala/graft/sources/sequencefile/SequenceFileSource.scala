package graft.sources.sequencefile

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.hadoop.io._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 read path for Hadoop SequenceFiles:
  * `spark.read.format("graft.sources.sequencefile.SequenceFileSource").load(path)`.
  *
  * Reference: the SequenceFile container (SEQ magic + version 6 header
  * carrying key/value class names and 16-byte sync markers,
  * hadoop-common/.../io/SequenceFile.java:199-208) and its scan operator
  * SequenceFileInputFormat (mapreduce/lib/input/SequenceFileInputFormat.java:41).
  * The binary format is parsed by the public Hadoop `SequenceFile.Reader`
  * shipped with Spark — byte-exact by construction, including RECORD and
  * BLOCK compression.
  *
  * Spark-first design:
  *  - schema is inferred from the header's Writable class names via the
  *    SURVEY §1 type table (no user schema needed);
  *  - one InputPartition per file (files are independently scannable;
  *    finer split-by-sync is a future refinement — at 100 TB the unit of
  *    parallelism is the file set, same as the reference's splits);
  *  - column pruning is honored: an unprojected value column is never
  *    deserialized (`Reader.next(key)` skips value bytes entirely).
  */
class SequenceFileSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("sequencefile source requires a path"))
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file = SequenceFileSource.listDataFiles(fs, p).headOption.getOrElse(
      throw new IllegalArgumentException(s"no sequence files under $path"))
    val reader = new SequenceFile.Reader(conf, SequenceFile.Reader.file(file.getPath))
    try {
      StructType(Seq(
        StructField("key", SequenceFileSource.catalystType(reader.getKeyClassName), nullable = true),
        StructField("value", SequenceFileSource.catalystType(reader.getValueClassName), nullable = true)))
    } finally reader.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SeqFileTable(properties.get("path"), schema)
}

object SequenceFileSource {
  val FORMAT: String = classOf[SequenceFileSource].getName

  def listDataFiles(fs: FileSystem, p: Path): Seq[FileStatus] = {
    if (!fs.exists(p)) return Seq.empty
    val st = fs.getFileStatus(p)
    val all = if (st.isDirectory) fs.listStatus(p).toSeq else Seq(st)
    all.filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
      !f.getPath.getName.startsWith("."))
  }

  /** Writable class name -> Catalyst type (SURVEY §1 mapping table). */
  def catalystType(writableClass: String): DataType =
    writableClass.split('.').last match {
      case "NullWritable"                      => NullType
      case "BooleanWritable"                   => BooleanType
      case "ByteWritable"                      => ByteType
      case "ShortWritable"                     => ShortType
      case "IntWritable" | "VIntWritable"      => IntegerType
      case "LongWritable" | "VLongWritable"    => LongType
      case "FloatWritable"                     => FloatType
      case "DoubleWritable"                    => DoubleType
      case "Text" | "UTF8"                     => StringType
      case "BytesWritable" | "MD5Hash"         => BinaryType
      case other =>
        throw new IllegalArgumentException(s"unsupported Writable: $other")
    }

  /** Writable instance -> Catalyst internal value. */
  def toCatalyst(w: Writable): Any = w match {
    case _: NullWritable    => null
    case x: BooleanWritable => x.get
    case x: ByteWritable    => x.get
    case x: ShortWritable   => x.get
    case x: IntWritable     => x.get
    case x: VIntWritable    => x.get
    case x: LongWritable    => x.get
    case x: VLongWritable   => x.get
    case x: FloatWritable   => x.get
    case x: DoubleWritable  => x.get
    case x: Text            => UTF8String.fromBytes(x.copyBytes())
    case x: BytesWritable   => util.Arrays.copyOf(x.getBytes, x.getLength)
    case x: MD5Hash         => x.getDigest.clone()
    case other              =>
      throw new IllegalArgumentException(s"unsupported Writable: ${other.getClass}")
  }
}

private class SeqFileTable(path: String, schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"sequencefile:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqFileScanBuilder(path, schema)
}

private class SeqFileScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new SeqFileScan(path, required)
}

private class SeqFileScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    SequenceFileSource.listDataFiles(fs, p)
      .map(f => SeqFilePartition(f.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqFileReaderFactory(required)
}

private case class SeqFilePartition(file: String) extends InputPartition

private class SeqFileReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SeqFileReader(partition.asInstanceOf[SeqFilePartition].file, required)
}

private class SeqFileReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  private val reader = new SequenceFile.Reader(conf, SequenceFile.Reader.file(new Path(file)))
  private val wantKey = required.fieldNames.contains("key")
  private val wantValue = required.fieldNames.contains("value")
  private val key = reader.getKeyClass.getDeclaredConstructor().newInstance().asInstanceOf[Writable]
  private val value = reader.getValueClass.getDeclaredConstructor().newInstance().asInstanceOf[Writable]
  private var row: InternalRow = _

  override def next(): Boolean = {
    // When the value column is pruned away, next(key) skips the value
    // bytes without deserializing them (the §2.1 column-pruning path).
    val has = if (wantValue) reader.next(key, value) else reader.next(key)
    if (has) {
      val fields = required.fieldNames.map {
        case "key"   => SequenceFileSource.toCatalyst(key)
        case "value" => SequenceFileSource.toCatalyst(value)
      }
      row = InternalRow.fromSeq(fields.toIndexedSeq)
    }
    has
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
