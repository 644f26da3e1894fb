package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Status

/**
 * Cross-run verdict REGRESSION diff: "what changed since the last run"
 * over the append-only `run_log` (one generation per run_id). The
 * reference's operators answer this by eyeballing consecutive
 * `STATUS:{check}` records in the results table (dynamodb.py:89-119,
 * results queried per submission in batch.py); here it is one query.
 *
 * Transitions are ranked on the severity ladder PASS <
 * PASS_WITH_WARNINGS < NOT_COMPLETED < FAIL:
 *  - `regressed`  — rank increased (e.g. PASS -> FAIL): the signal a
 *    gate should page on;
 *  - `recovered`  — rank decreased;
 *  - `appeared` — the (source, rule) exists only in the after run (new
 *    source or new rule — visibility, not severity);
 *  - `not_revalidated` — it exists only in the before run. Run logs are
 *    RUN-scoped, so a resume/submission-scoped run simply does not
 *    cover sources it skipped; absence means "no fresh verdict", never
 *    "the source vanished" (the checkpoint still carries its lineage);
 *  - `unchanged`  — everything else (dropped unless `all = true`).
 *
 * Scale shape: the run_log is partitioned by run_id, so each side of the
 * diff is a partition-pruned scan of ONE generation (|sources| × |rules|
 * rows — dimension-sized, never corpus-sized); the diff itself is a
 * single full-outer join on (source, rule_id).
 */
object RunDiff {

  private val rank = typedLit(Map(
    Status.Pass -> 0, Status.PassWithWarnings -> 1,
    Status.NotCompleted -> 2, Status.Fail -> 3))

  /** run_ids ordered oldest -> newest by their recorded completion time
    * (driver-side: one tiny aggregation over the run_log). */
  def runIdsByTime(spark: SparkSession, outDir: String): Seq[String] =
    spark.read.parquet(ValidationJob.runLogPath(outDir))
      .groupBy("run_id").agg(max("completed_at").as("t"))
      .orderBy(col("t").asc, col("run_id").asc)
      .select("run_id").collect().map(_.getString(0)).toSeq

  /** Verdict transitions from `beforeRun` to `afterRun`. */
  def diff(
      spark: SparkSession, outDir: String,
      beforeRun: String, afterRun: String,
      all: Boolean = false): DataFrame = {
    val log = spark.read.parquet(ValidationJob.runLogPath(outDir))
    def side(run: String, as: String) =
      log.filter(col("run_id") === run) // partition-pruned scan
        .select(col("source"), col("rule_id"),
          col("status").as(s"status_$as"), col("severity").as(s"sev_$as"))
    val joined = side(beforeRun, "before")
      .join(side(afterRun, "after"), Seq("source", "rule_id"), "full_outer")
    val rb = rank(col("status_before"))
    val ra = rank(col("status_after"))
    val out = joined.withColumn("kind",
      when(col("status_before").isNull, lit("appeared"))
        .when(col("status_after").isNull, lit("not_revalidated"))
        .when(ra > rb, lit("regressed"))
        .when(ra < rb, lit("recovered"))
        .otherwise(lit("unchanged")))
      .select("source", "rule_id", "status_before", "status_after", "kind")
    if (all) out else out.filter(col("kind") =!= "unchanged")
  }

  /** Latest-two convenience: (before, after, transitions). */
  def diffLatest(spark: SparkSession, outDir: String)
      : Option[(String, String, DataFrame)] = {
    val ids = runIdsByTime(spark, outDir)
    if (ids.size < 2) None
    else Some((ids(ids.size - 2), ids.last,
      diff(spark, outDir, ids(ids.size - 2), ids.last)))
  }
}
