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
