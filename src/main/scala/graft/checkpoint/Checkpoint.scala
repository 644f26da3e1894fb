package graft.checkpoint

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.CheckpointEntry

/**
 * Checkpoint manifest: per-partition lineage (snapshot_id, ruleset_hash,
 * verdict, metrics) enabling resumable runs — the Spark-native replacement
 * for the reference's RUNNING/PASS/FAIL state machine + README sentinel
 * (reference validation_manager.py:209-253, cleanup_manager.py:114-128,
 * batch_notification.py:206-218). A restarted job skips partitions whose
 * (snapshot_id, ruleset_hash) already completed; any change to input data
 * or rule set re-validates exactly the affected partitions.
 *
 * Crash safety: jobs write violations → verdicts → checkpoint LAST, and
 * every data write is an idempotent dynamic-partition overwrite, so a replay
 * after a crash reproduces identical output (SURVEY.md §7.5 risk 3).
 */
object Checkpoint {

  def read(spark: SparkSession, path: String): Dataset[CheckpointEntry] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(path).as[CheckpointEntry]
    else spark.emptyDataset[CheckpointEntry]
  }

  def append(entries: Dataset[CheckpointEntry], path: String): Unit =
    entries.write.mode(SaveMode.Append).parquet(path)

  /** Run lock — the Spark-native analog of the reference's folder lock
    * (a Deny bucket-policy on the submission prefix while it is being
    * processed, folder_lock.py:44-164): an atomically-created marker file
    * under the output dir. A second concurrent run on the same outDir
    * fails to create it and aborts instead of double-writing. Stale locks
    * (crashed runs) are reclaimed after `staleMs`. */
  def acquireRunLock(
      spark: SparkSession, outDir: String,
      staleMs: Long = 6 * 3600 * 1000L,
      attempts: Int = 5): Boolean = {
    if (attempts <= 0) return false
    val p = new org.apache.hadoop.fs.Path(s"$outDir/_running")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    def retry() = acquireRunLock(spark, outDir, staleMs, attempts - 1)
    try {
      // createNewFile semantics: atomic create-if-absent
      val out = fs.create(p, false)
      out.writeBytes(java.time.Instant.now().toString)
      out.close()
      true
    } catch {
      case _: java.io.IOException =>
        // the lock may vanish between the failed create and the stat
        // (another run just released/reclaimed it) — that's a retry, not
        // an escaping IOException (ADVICE r02)
        val age =
          try System.currentTimeMillis() -
            fs.getFileStatus(p).getModificationTime
          catch { case _: java.io.FileNotFoundException => return retry() }
        if (age > staleMs) {
          // Reclaim via RENAME-then-delete: rename is atomic, so of N runs
          // observing the same stale lock exactly ONE wins the rename (and
          // deletes the tombstone); losers fail the rename and retry —
          // where they contend on create-if-absent against the winner's
          // fresh lock. The delete-then-create race (both delete, each
          // creates, B deletes A's fresh lock, both proceed) is gone.
          val tomb = new org.apache.hadoop.fs.Path(
            s"$outDir/_running.reclaim.${java.util.UUID.randomUUID()}")
          if (fs.rename(p, tomb)) fs.delete(tomb, false)
          retry()
        } else false
    }
  }

  def releaseRunLock(spark: SparkSession, outDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$outDir/_running")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** Partitions already validated for (snapshotId, rulesetHash) — the skip
    * set for a resumed run. Latest entry wins per partition. */
  def completedPartitions(
      spark: SparkSession,
      path: String,
      snapshotId: String,
      rulesetHash: String): Set[String] = {
    val cp = read(spark, path)
    cp.filter(
        col("snapshot_id") === snapshotId &&
          col("ruleset_hash") === rulesetHash)
      .select("partition")
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
  }
}
