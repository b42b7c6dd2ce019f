package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-files archive — the HadoopArchives (har) analog
  * (HT/hadoop-archives/.../HadoopArchives.java:78): pack many small
  * files into a few large, indexed parts so downstream jobs stop paying
  * per-file open/seek/split costs (the classic small-files problem; at
  * 100 TB a crawl delivering billions of 10 KB pages would otherwise
  * drown the namenode/listing layer and schedule one task per file).
  *
  * The reference runs an MR job writing `part-*` blobs plus `_index` /
  * `_masterindex` sidecars mapping file → (part, offset, length). The
  * Spark-native shape needs no sidecar: parts are parquet with rows
  * (path, length, content), RANGE-partitioned and sorted by path — the
  * parquet footer min/max statistics on the sorted path column ARE the
  * two-level index (_masterindex ≙ per-file path range, _index ≙
  * per-row-group range), so a `path = x` lookup prunes to one part and
  * one row group through the ordinary scan machinery (PushedFilters),
  * and the archive stays a queryable table (join/filter/project over
  * file contents) instead of an opaque blob format.
  *
  * `toc`/`get`/`extract` mirror har's `ls` / single-file read / copy-out
  * verbs.
  */
object Archive {

  /** Pack every file under `inputDir` (recursively) into `numParts`
    * parquet parts at `archiveDir`. Paths are stored relative to
    * `inputDir` (har stores paths relative to the archive root).
    */
  def create(spark: SparkSession, inputDir: String, archiveDir: String,
             numParts: Int): Unit = {
    require(numParts > 0, "need at least one part")
    val root = normalized(spark, inputDir)
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(inputDir)
      .select(
        // prefix strip by length, NOT regexp_replace: the root is an
        // arbitrary path, and regex metacharacters in a directory name
        // ("+", "(", ".") would corrupt or crash the pattern
        substring(col("path"), root.length + 2, Int.MaxValue).as("path"),
        col("length"),
        col("content"))
      .repartitionByRange(numParts, col("path"))
      .sortWithinPartitions("path")
      .write.mode("overwrite").parquet(archiveDir)
  }

  /** Table of contents: (path, length, part) for every archived file —
    * har's `ls -R`. Reads only (path, length) + file names; content
    * columns are pruned from the scan.
    */
  def toc(spark: SparkSession, archiveDir: String): DataFrame =
    spark.read.parquet(archiveDir)
      .select(col("path"), col("length"),
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("part"))

  /** Single-file read: the content bytes for `path`, or None. The
    * equality predicate pushes into the parquet scan and prunes by the
    * sorted path statistics — one part, one row group, like har's
    * offset lookup through _index.
    */
  def get(spark: SparkSession, archiveDir: String, path: String): Option[Array[Byte]] =
    spark.read.parquet(archiveDir)
      .filter(col("path") === path)
      .select("content")
      .collect().headOption.map(_.getAs[Array[Byte]](0))

  /** Copy files back out to `destDir` (har's extract / DistCp-out).
    * Runs on executors: each partition writes its rows through the
    * Hadoop FS API — no driver bottleneck, any destination FS Spark
    * can reach. `pathGlob`, if set, limits extraction (e.g. `*.txt`,
    * or a subtree prefix glob).
    */
  def extract(spark: SparkSession, archiveDir: String, destDir: String,
              pathGlob: Option[String] = None): Long = {
    val df0 = spark.read.parquet(archiveDir).select("path", "content")
    val df = pathGlob.map(g => df0.filter(col("path").like(globToLike(g))))
      .getOrElse(df0)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val count = spark.sparkContext.longAccumulator("extracted")
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val fs = new Path(destDir).getFileSystem(conf.value)
      rows.foreach { r =>
        val out = fs.create(new Path(destDir, r.getString(0)), true)
        try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        count.add(1)
      }
    }
    count.value
  }

  /** The fully-qualified form of `dir` as binaryFile reports paths. */
  private def normalized(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    p.makeQualified(fs.getUri, fs.getWorkingDirectory).toString
  }

  /** Minimal glob → SQL LIKE: * matches within and across segments
    * (har's extract filters are path prefixes/globs; this covers the
    * prefix and extension cases without a regex engine in the filter).
    */
  private def globToLike(glob: String): String =
    glob.replace("%", "\\%").replace("_", "\\_").replace("*", "%")
}
