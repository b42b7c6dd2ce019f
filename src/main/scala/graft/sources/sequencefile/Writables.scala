package graft.sources.sequencefile

import java.io.DataOutput

import org.apache.hadoop.io._

/** Composite-Writable support classes.
  *
  * - [[TextArrayWritable]]: the standard Hadoop idiom for typed arrays —
  *   `ArrayWritable` itself does not serialize its element class
  *   (reference: hadoop-common/src/main/java/org/apache/hadoop/io/ArrayWritable.java:25-40
  *   "the subclass idiom"), so a named subclass carries the element type
  *   through the SequenceFile header. Numeric arrays use Hadoop's
  *   self-describing `ArrayPrimitiveWritable` instead.
  * - [[FullTupleWritable]]: a TupleWritable whose fields are all marked
  *   written. The reference's `TupleWritable.setWritten` is
  *   package-private (mapreduce/lib/join/TupleWritable.java:218-220), so
  *   this subclass reimplements `write()` in the exact wire format
  *   (TupleWritable.java:170-181: vint cardinality, vlong bitmask ≤64
  *   fields, class names, then values) — files it writes read back
  *   through the stock `TupleWritable.readFields` (which also repopulates
  *   the inherited storage on deserialization).
  */
class TextArrayWritable() extends ArrayWritable(classOf[Text]) {
  def this(values: Array[String]) = {
    this()
    set(values.map(new Text(_): Writable))
  }
}

class FullTupleWritable(values: Array[Writable])
    extends org.apache.hadoop.mapreduce.lib.join.TupleWritable(values) {

  def this() = this(Array.empty)

  override def write(out: DataOutput): Unit = {
    val n = size()
    require(n <= 64, "FullTupleWritable supports <= 64 fields")
    WritableUtils.writeVInt(out, n)
    // bitmask with every field present (TupleWritable.writeBitSet layout)
    val bits = if (n == 64) -1L else (1L << n) - 1L
    WritableUtils.writeVLong(out, bits)
    (0 until n).foreach(i => Text.writeString(out, get(i).getClass.getName))
    (0 until n).foreach(i => get(i).write(out))
  }
}
