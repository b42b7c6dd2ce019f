package graft.operators

import java.io.{BufferedInputStream, BufferedOutputStream, DataInput, DataInputStream, DataOutput, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** TypedBytes — Hadoop Streaming's binary pipe framing.
  *
  * Wire format (reference: hadoop-streaming/.../typedbytes/Type.java:27-43,
  * TypedBytesOutput.java:75-260): every value is one type-code byte then
  * a big-endian payload — BYTES(0) len+raw, BYTE(1), BOOL(2), INT(3),
  * LONG(4), FLOAT(5), DOUBLE(6), STRING(7) len+utf8, VECTOR(8)
  * count+elems, LIST(9) elems+MARKER(255), MAP(10) count+pairs. A child
  * process written against the reference's typedbytes library reads and
  * writes this stream unchanged.
  *
  * [[pipe]] is the `-io typedbytes` mode of Hadoop Streaming
  * (PipeMapRed.java): one child per partition, rows framed as
  * key/value typedbytes pairs on stdin, child stdout parsed back as
  * pairs — the binary sibling of [[Pipe]]'s text framing.
  */
object TypedBytes {

  private val MARKER = 255

  /** TaskContext.setTaskContext is private[spark]; the stdin-writer
    * thread needs the task's context because the upstream iterator's
    * codegen reads the thread-local (NPE otherwise) — the exact
    * propagation PipedRDD does for RDD.pipe's writer thread.
    */
  private lazy val setTcMethod = {
    val cls = Class.forName("org.apache.spark.TaskContext$")
    val m = cls.getDeclaredMethod("setTaskContext", classOf[org.apache.spark.TaskContext])
    m.setAccessible(true)
    (cls.getField("MODULE$").get(null), m)
  }

  private def setTaskContext(tc: org.apache.spark.TaskContext): Unit =
    if (tc != null) { val (mod, m) = setTcMethod; m.invoke(mod, tc) }

  def write(out: DataOutput, v: Any): Unit = v match {
    case b: Array[Byte] => out.write(0); out.writeInt(b.length); out.write(b)
    case b: Byte        => out.write(1); out.writeByte(b.toInt)
    case b: Boolean     => out.write(2); out.writeBoolean(b)
    case i: Int         => out.write(3); out.writeInt(i)
    case l: Long        => out.write(4); out.writeLong(l)
    case f: Float       => out.write(5); out.writeFloat(f)
    case d: Double      => out.write(6); out.writeDouble(d)
    case s: String =>
      val b = s.getBytes(UTF_8); out.write(7); out.writeInt(b.length); out.write(b)
    case s: scala.collection.Seq[_] =>
      out.write(8); out.writeInt(s.size); s.foreach(write(out, _))
    case m: scala.collection.Map[_, _] =>
      out.write(10); out.writeInt(m.size)
      m.foreach { case (k, x) => write(out, k); write(out, x) }
    case other =>
      throw new IllegalArgumentException(s"typedbytes cannot frame: ${other.getClass}")
  }

  /** Reads one value; throws EOFException at end of stream. */
  def read(in: DataInput): Any = readTyped(in, in.readUnsignedByte())

  private def readTyped(in: DataInput, code: Int): Any = code match {
    case 0 => val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b); b
    case 1 => in.readByte()
    case 2 => in.readBoolean()
    case 3 => in.readInt()
    case 4 => in.readLong()
    case 5 => in.readFloat()
    case 6 => in.readDouble()
    case 7 =>
      val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
      new String(b, UTF_8)
    case 8 => Seq.fill(in.readInt())(read(in))
    case 9 => // LIST: elements until MARKER
      val buf = Seq.newBuilder[Any]
      var c = in.readUnsignedByte()
      while (c != MARKER) { buf += readTyped(in, c); c = in.readUnsignedByte() }
      buf.result()
    case 10 =>
      (0 until in.readInt()).map(_ => (read(in), read(in))).toMap
    case other =>
      throw new IllegalArgumentException(s"unknown typedbytes code: $other")
  }

  /** Binary pipe: rows stream to `cmd` as typedbytes (key, value) pairs,
    * the child's typedbytes pair output becomes the result. Declared
    * `keyType`/`valueType` must match the codes the child emits (the
    * same contract as the reference's TypedBytesWritable wrapping). One
    * child per partition — fan-out scales like the reference's per-task
    * fork.
    */
  def pipe(df: DataFrame, cmd: Seq[String],
           keyType: DataType, valueType: DataType): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("key", keyType, nullable = true),
      StructField("value", valueType, nullable = true)))
    val rdd = df.rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        val proc = new ProcessBuilder(cmd.asJava).start()
        val toChild = new DataOutputStream(
          new BufferedOutputStream(proc.getOutputStream))
        // a non-IO failure while COMPUTING the input rows must fail the
        // task (not silently truncate the child's input into a smaller
        // "successful" result) — surfaced at EOF below
        val writerError = new java.util.concurrent.atomic.AtomicReference[Throwable]()
        val writer = new Thread {
          override def run(): Unit = {
            // the upstream iterator runs codegen that reads the
            // thread-local TaskContext; propagate it like PipedRDD does
            // (core/.../rdd/PipedRDD.scala stdin-writer thread)
            setTaskContext(tc)
            try {
              it.foreach { row => write(toChild, row.get(0)); write(toChild, row.get(1)) }
              toChild.close()
            } catch {
              case _: java.io.IOException => () /* child exited early */
              case t: Throwable =>
                writerError.set(t)
                try toChild.close() catch { case _: java.io.IOException => () }
            }
          }
        }
        writer.setDaemon(true)
        writer.start()
        // drain stderr continuously (a child filling the ~64KB OS pipe
        // buffer would otherwise block mid-stream and deadlock the task)
        // keeping the tail for diagnostics — PipeMapRed's stderr thread
        val errTail = new java.util.concurrent.atomic.AtomicReference[String]("")
        val errDrain = new Thread {
          override def run(): Unit = {
            val buf = new Array[Byte](4096)
            val sb = new StringBuilder
            try {
              var n = proc.getErrorStream.read(buf)
              while (n >= 0) {
                sb.append(new String(buf, 0, n, UTF_8))
                if (sb.length > 8192) sb.delete(0, sb.length - 8192)
                n = proc.getErrorStream.read(buf)
              }
            } catch { case _: java.io.IOException => () }
            errTail.set(sb.toString)
          }
        }
        errDrain.setDaemon(true)
        errDrain.start()
        val fromChild = new DataInputStream(
          new BufferedInputStream(proc.getInputStream))
        new Iterator[Row] {
          private var nextRow: Row = fetch()
          private def fetch(): Row =
            try {
              val k = read(fromChild)
              val v = read(fromChild)
              Row(k, v)
            } catch {
              case _: EOFException =>
                fromChild.close()
                val code = proc.waitFor()
                writer.join(10000)
                errDrain.join(10000)
                if (writerError.get() != null) throw writerError.get()
                // a crashed child must FAIL the task, not truncate its
                // output into a "successful" partial result (RDD.pipe's
                // contract, PipeMapRed.waitOutputThreads)
                if (code != 0)
                  throw new IllegalStateException(
                    s"typedbytes child ${cmd.mkString(" ")} exited with $code: ${errTail.get}")
                null
            }
          def hasNext: Boolean = nextRow != null
          def next(): Row = { val r = nextRow; nextRow = fetch(); r }
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
