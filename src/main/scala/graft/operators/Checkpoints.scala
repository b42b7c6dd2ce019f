package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared lineage-truncation helper for the iterative operators
  * (connectedComponents, pageRankInt). `localCheckpoint` (the default)
  * stores blocks on executors — fast, but an executor loss
  * mid-iteration loses blocks AND the truncated lineage, killing the
  * job. For a cluster run pass a reliable `checkpointDir` (HDFS/S3):
  * each round's frame is written to reliable storage so iteration
  * survives executor failure. Superseded rounds' files stay on disk
  * for the app lifetime unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (or the dir
  * is cleaned post-job).
  */
private[graft] object Checkpoints {

  /** Returns the per-invocation ckpt function. The reliable path
    * persists BEFORE `checkpoint()` and unpersists after: the eager
    * checkpoint runs one action AND a second job that re-executes the
    * (otherwise unpersisted) lineage to write the files — without the
    * persist, every checkpointed frame is computed twice, exactly the
    * repeated source I/O checkpointing exists to avoid. Sets the
    * session checkpoint dir once per invocation.
    */
  def maker(checkpointDir: Option[String]): DataFrame => DataFrame = {
    var dirSet = false
    df => checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (!dirSet) { sc.setCheckpointDir(dir); dirSet = true }
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        val out = p.checkpoint()
        p.unpersist(false)
        out
      case None => df.localCheckpoint()
    }
  }
}
