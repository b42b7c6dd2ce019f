package graft.sources.sequencefile

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.hadoop.io._
import org.apache.hadoop.mapreduce.lib.join.TupleWritable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
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
  *    SURVEY §1 type table; self-describing composites (MapWritable,
  *    TupleWritable, ArrayPrimitiveWritable) are inferred from the first
  *    record (homogeneous files assumed — same contract as the
  *    reference, whose record readers also fix K/V types per file);
  *  - files split at sync markers into byte ranges of `split_bytes`
  *    (default 128 MB) — one 10 GB file fans out across ~80 tasks, the
  *    same `(start, end]`-ownership protocol as the reference's
  *    SequenceFileRecordReader (mapreduce/lib/input/SequenceFileRecordReader.java:60-84:
  *    sync to the first marker past `start`, stop at the first record
  *    whose start position passed `end` after a sync);
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
      val kc = reader.getKeyClassName
      val vc = reader.getValueClassName
      def resolve(cls: String, instance: => Writable): DataType =
        SequenceFileSource.staticCatalystType(cls).getOrElse(
          SequenceFileSource.catalystTypeOf(instance))
      // self-describing composites need one record to fix element types
      lazy val (k, v) = {
        val key = reader.getKeyClass.getDeclaredConstructor().newInstance().asInstanceOf[Writable]
        val value = reader.getValueClass.getDeclaredConstructor().newInstance().asInstanceOf[Writable]
        if (!reader.next(key, value))
          throw new IllegalArgumentException(
            s"cannot infer composite schema from empty file $file")
        (key, value)
      }
      StructType(Seq(
        StructField("key", resolve(kc, k), nullable = true),
        StructField("value", resolve(vc, v), nullable = true)))
    } finally reader.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SeqFileTable(properties.get("path"), schema,
      Option(properties.get("split_bytes")).map(_.toLong)
        .getOrElse(SequenceFileSource.DefaultSplitBytes))
}

object SequenceFileSource {
  val FORMAT: String = classOf[SequenceFileSource].getName
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  def listDataFiles(fs: FileSystem, p: Path): Seq[FileStatus] = {
    if (!fs.exists(p)) return Seq.empty
    val st = fs.getFileStatus(p)
    val all = if (st.isDirectory) fs.listStatus(p).toSeq else Seq(st)
    all.filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
      !f.getPath.getName.startsWith("."))
  }

  /** Writable class name -> Catalyst type where the name alone decides
    * it (SURVEY §1 mapping table + the typed-array subclass idiom).
    * None for self-describing composites (resolved from a record).
    */
  def staticCatalystType(writableClass: String): Option[DataType] =
    writableClass.split('.').last match {
      case "NullWritable"                      => Some(NullType)
      case "BooleanWritable"                   => Some(BooleanType)
      case "ByteWritable"                      => Some(ByteType)
      case "ShortWritable"                     => Some(ShortType)
      case "IntWritable" | "VIntWritable"      => Some(IntegerType)
      case "LongWritable" | "VLongWritable"    => Some(LongType)
      case "FloatWritable"                     => Some(FloatType)
      case "DoubleWritable"                    => Some(DoubleType)
      case "Text" | "UTF8"                     => Some(StringType)
      case "BytesWritable" | "MD5Hash"         => Some(BinaryType)
      case "TextArrayWritable"                 => Some(ArrayType(StringType))
      case "MapWritable" | "SortedMapWritable" | "TupleWritable" |
           "FullTupleWritable" | "ArrayPrimitiveWritable" => None
      case other =>
        throw new IllegalArgumentException(s"unsupported Writable: $other")
    }

  def catalystType(writableClass: String): DataType =
    staticCatalystType(writableClass).getOrElse(throw new IllegalArgumentException(
      s"$writableClass needs record-based inference"))

  /** Catalyst type from a live Writable instance (composites). */
  def catalystTypeOf(w: Writable): DataType = w match {
    case a: ArrayPrimitiveWritable =>
      val elem = a.get().getClass.getComponentType.getName match {
        case "boolean" => BooleanType
        case "byte"    => ByteType
        case "short"   => ShortType
        case "int"     => IntegerType
        case "long"    => LongType
        case "float"   => FloatType
        case "double"  => DoubleType
        case other     => throw new IllegalArgumentException(s"array of $other")
      }
      ArrayType(elem)
    case m: MapWritable =>
      val it = m.entrySet().iterator()
      if (!it.hasNext) MapType(StringType, StringType)
      else {
        val e = it.next()
        MapType(catalystTypeOf(e.getKey), catalystTypeOf(e.getValue))
      }
    case t: TupleWritable =>
      StructType((0 until t.size()).map(i =>
        StructField(s"c$i", catalystTypeOf(t.get(i)), nullable = true)))
    case a: ArrayWritable =>
      val elems = a.get()
      if (elems.isEmpty) ArrayType(StringType)
      else ArrayType(catalystTypeOf(elems(0)))
    case other => catalystType(other.getClass.getName)
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
    case x: ArrayPrimitiveWritable => x.get() match {
      case a: Array[Boolean] => new GenericArrayData(a)
      case a: Array[Byte]    => new GenericArrayData(a.map(b => b: Any))
      case a: Array[Short]   => new GenericArrayData(a)
      case a: Array[Int]     => new GenericArrayData(a)
      case a: Array[Long]    => new GenericArrayData(a)
      case a: Array[Float]   => new GenericArrayData(a)
      case a: Array[Double]  => new GenericArrayData(a)
      case other => throw new IllegalArgumentException(s"array: $other")
    }
    case x: MapWritable =>
      val entries = x.entrySet().asScala.toArray
      new ArrayBasedMapData(
        new GenericArrayData(entries.map(e => toCatalyst(e.getKey))),
        new GenericArrayData(entries.map(e => toCatalyst(e.getValue))))
    case x: TupleWritable   =>
      // unwritten fields (outer-join gaps, TupleWritable.java:62-67) -> null
      InternalRow.fromSeq((0 until x.size()).map(i =>
        if (x.has(i)) toCatalyst(x.get(i)) else null))
    case x: ArrayWritable   =>
      new GenericArrayData(x.get().map(toCatalyst))
    case other              =>
      throw new IllegalArgumentException(s"unsupported Writable: ${other.getClass}")
  }
}

private class SeqFileTable(path: String, schema: StructType, splitBytes: Long)
    extends Table with SupportsRead {
  override def name(): String = s"sequencefile:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqFileScanBuilder(path, schema, splitBytes)
}

private class SeqFileScanBuilder(path: String, full: StructType, splitBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new SeqFileScan(path, required, splitBytes)
}

private class SeqFileScan(path: String, required: StructType, splitBytes: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Byte-range splits per file; the reader aligns each range to sync
    * markers, so ranges need no record awareness here (the reference's
    * FileInputFormat.getSplits + SequenceFile sync protocol).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    SequenceFileSource.listDataFiles(fs, p).flatMap { f =>
      val len = f.getLen
      if (len == 0) Seq.empty
      else (0L until len by splitBytes).map { start =>
        SeqFilePartition(f.getPath.toString, start, math.min(start + splitBytes, len))
      }
    }.map(x => x: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqFileReaderFactory(required)
}

private case class SeqFilePartition(file: String, start: Long, end: Long)
    extends InputPartition

private class SeqFileReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqFilePartition]
    new SeqFileReader(p.file, p.start, p.end, required)
  }
}

private class SeqFileReader(file: String, start: Long, end: Long, required: StructType)
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  private val reader = new SequenceFile.Reader(conf, SequenceFile.Reader.file(new Path(file)))
  // position at the first record after `start`'s next sync marker — the
  // reference's split-ownership protocol (SequenceFileRecordReader.initialize)
  if (start > reader.getPosition) reader.sync(start)
  private val wantKey = required.fieldNames.contains("key")
  private val wantValue = required.fieldNames.contains("value")
  private val key = reader.getKeyClass.getDeclaredConstructor().newInstance().asInstanceOf[Writable]
  private val value = reader.getValueClass.getDeclaredConstructor().newInstance().asInstanceOf[Writable]
  // the next sync may land at/after end: this split owns no records
  private var more = reader.getPosition < end
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (!more) return false
    val pos = reader.getPosition
    // When the value column is pruned away, next(key) skips the value
    // bytes without deserializing them (the §2.1 column-pruning path).
    val has = if (wantValue) reader.next(key, value) else reader.next(key)
    // a record starting at/past `end` after a sync belongs to the next
    // split (SequenceFileRecordReader.nextKeyValue's exact condition)
    if (!has || (pos >= end && reader.syncSeen())) { more = false; return false }
    val fields = required.fieldNames.map {
      case "key"   => SequenceFileSource.toCatalyst(key)
      case "value" => SequenceFileSource.toCatalyst(value)
    }
    row = InternalRow.fromSeq(fields.toIndexedSeq)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
