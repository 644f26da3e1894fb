package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.sources.TableIO

/**
 * Post-validation promotion — the reference's E3 tail
 * (data_transfer_manager.py:36-344): re-check the verdict gate, move only
 * fully-passing submissions into the store, and regenerate manifest.txt
 * from what was actually stored (K4, data_transfer_manager.py:311-342).
 *
 * Spark-native shape: "move" = idempotent dynamic-partition overwrite of
 * the passing partitions into the store table (re-running after a crash
 * rewrites the same partitions); the manifest TSV is rebuilt from a
 * per-source aggregate of the STORED rows, so it always reflects store
 * contents, never intent.
 */
object TransferJob {

  final case class Config(
      inputPath: String,
      /** ValidationJob output dir (verdicts are the gate). */
      validationOutDir: String,
      storeDir: String,
      /** Directory for the regenerated manifest TSV. */
      manifestTsvDir: String)

  final case class Report(
      promoted: Seq[String],
      blocked: Seq[String])

  /** The gate (reference re-runs J9+A9 before any move,
    * data_transfer_manager.py:79-110): a source is promotable iff NO rule
    * verdict is FAIL or NOT_COMPLETED — warnings (e.g. surplus docs) do
    * not block, matching the reference's warn-only extra-file semantics
    * (submission_data.py:189-207). */
  def promotableSources(spark: SparkSession, validationOutDir: String): Seq[String] = {
    val verSchema = org.apache.spark.sql.Encoders.product[Verdict].schema
    val verdicts = spark.read.schema(verSchema)
      .parquet(ValidationJob.verdictsPath(validationOutDir))
    verdicts
      .groupBy(col("source"))
      .agg(max(
        when(col("status") === Status.Fail, 2)
          .when(col("status") === Status.NotCompleted, 1)
          .otherwise(0)).as("blockLvl"))
      .filter(col("blockLvl") === 0)
      .select("source")
      .collect().map(_.getString(0)).toSeq.sorted
  }

  def run(spark: SparkSession, cfg: Config): Report = {
    import spark.implicits._
    val all = TableIO.partitionValues(spark, cfg.inputPath, "source")
      .getOrElse(spark.read.parquet(cfg.inputPath)
        .select("source").distinct().as[String].collect().toSeq.sorted)
    val pass = promotableSources(spark, cfg.validationOutDir)
    val passSet = pass.toSet

    if (pass.nonEmpty) {
      // partition-pruned scan of exactly the passing sources; idempotent
      // per-partition overwrite into the store
      val rows = spark.read.parquet(cfg.inputPath)
        .filter(col("source").isin(pass.map(x => x: Any): _*))
      TableIO.writePartitioned(rows, cfg.storeDir)

      // K4: regenerate the manifest TSV from the STORE (one tiny agg)
      val manifest = spark.read.parquet(cfg.storeDir)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("expected_docs"),
          min(col("n_tok")).as("min_tok"),
          max(col("n_tok")).as("max_tok"))
        .orderBy("source")
      TableIO.writeManifestTsv(manifest, cfg.manifestTsvDir)
    }
    Report(pass, all.filterNot(passSet))
  }
}
