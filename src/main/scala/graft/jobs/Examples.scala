package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining reference example jobs as one-call Spark programs. */
object Examples {

  /** QuasiMonteCarlo pi estimator (examples/QuasiMonteCarlo.java:70-190):
    * the reference maps Halton-sequence points and reduces two counters.
    * Same quasi-random sequence here (radical-inverse base 2 and 3 of
    * the row id, computed in a codegen'd expression), one aggregation.
    */
  def estimatePi(spark: SparkSession, samples: Long, partitions: Int): Double = {
    def halton(base: Int) =
      s"""aggregate(sequence(0, 40), cast(0.0 as double),
         |  (acc, d) -> acc + (cast(floor(id / pow($base, d)) as bigint) % $base) / pow($base, d + 1))""".stripMargin
    val inside = spark.range(0, samples, 1, partitions)
      .select(expr(halton(2)).as("x"), expr(halton(3)).as("y"))
      .filter((col("x") - 0.5) * (col("x") - 0.5) + (col("y") - 0.5) * (col("y") - 0.5) <= 0.25)
      .count()
    4.0 * inside / samples
  }

  /** RandomTextWriter analog (examples/RandomTextWriter.java:50-86):
    * deterministic word-soup lines from a fixed vocabulary, seedless via
    * md5 of the row id — reproducible for any row range and partitioning.
    */
  def randomTextLines(spark: SparkSession, rows: Long, wordsPerLine: Int,
                      partitions: Int): DataFrame = {
    val vocab = Seq("the", "fast", "key", "order", "sort", "table", "scan",
      "merge", "part", "window", "small", "hash", "join", "batch", "stream",
      "spark", "data", "row", "group", "query")
    val vocabExpr = vocab.map(w => s"'$w'").mkString("array(", ", ", ")")
    spark.range(0, rows, 1, partitions).select(
      expr(
        s"""array_join(transform(sequence(1, $wordsPerLine),
           |  i -> element_at($vocabExpr,
           |         cast(conv(substring(md5(concat(cast(id as string), ':', cast(i as string))), 1, 7), 16, 10) % ${vocab.size} as int) + 1)),
           |  ' ')""".stripMargin).as("line"))
  }

  /** RandomWriter analog (examples/RandomWriter.java:298): deterministic
    * variable-length binary K/V records.
    */
  def randomBinary(spark: SparkSession, rows: Long, partitions: Int): DataFrame =
    spark.range(0, rows, 1, partitions).select(
      expr("unhex(md5(cast(id as string)))").as("key"),
      expr(
        """substring(concat(unhex(md5(concat('v:', cast(id as string)))),
          |                 unhex(md5(concat('w:', cast(id as string))))),
          |  1, 8 + cast(conv(substring(md5(concat('l:', cast(id as string))), 1, 4), 16, 10) % 24 as int))""".stripMargin)
        .as("value"))

  /** DistCp-lite (hadoop-distcp/.../DistCp.java:52): parallel file copy —
    * enumerate the copy listing on the driver, copy each file in a task.
    */
  def distCp(spark: SparkSession, src: String, dst: String): Long = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val srcPath = new Path(src)
    val fs = srcPath.getFileSystem(conf.value)
    val files = fs.listStatus(srcPath).filter(_.isFile).map(_.getPath.toString)
    spark.sparkContext.parallelize(files.toIndexedSeq, math.max(files.length, 1))
      .map { f =>
        val from = new Path(f)
        val to = new Path(dst, from.getName)
        val sfs = from.getFileSystem(conf.value)
        FileUtil.copy(sfs, from, to.getFileSystem(conf.value), to,
          false, conf.value)
        1L
      }.sum().toLong
  }

  /** DistCh analog (hadoop-extras/.../DistCh.java): parallel metadata
    * change — the reference builds an operation listing then maps
    * chmod/chown over it as an MR job. Same shape: enumerate paths on
    * the driver (metadata-only; the listing is small even when the data
    * is not), apply each change in a task. `perm` is octal ("0640");
    * `owner`/`group` apply only where the FS/process allows ownership
    * changes (as in the reference — a plain user's chown fails there
    * too). Returns the number of paths changed.
    */
  def distCh(spark: SparkSession, dir: String, perm: Option[String],
             owner: Option[String] = None, group: Option[String] = None,
             recursive: Boolean = true): Long = {
    import org.apache.hadoop.fs.Path
    import org.apache.hadoop.fs.permission.FsPermission
    require(perm.nonEmpty || owner.nonEmpty || group.nonEmpty,
      "distCh needs at least one of perm/owner/group")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    val paths = scala.collection.mutable.ArrayBuffer[String]()
    val it = fs.listFiles(root, recursive)
    while (it.hasNext) paths += it.next().getPath.toString
    val permShort = perm.map(p => java.lang.Short.parseShort(p, 8))
    spark.sparkContext
      .parallelize(paths.toIndexedSeq,
        math.max(1, math.min(paths.length, 64)))
      .map { p =>
        val path = new Path(p)
        val pfs = path.getFileSystem(conf.value)
        permShort.foreach(s => pfs.setPermission(path, new FsPermission(s)))
        if (owner.nonEmpty || group.nonEmpty)
          pfs.setOwner(path, owner.orNull, group.orNull)
        1L
      }.sum().toLong
  }
}
