package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.rules.{RuleEngine, RuleSet, Rules}
import graft.checkpoint.Checkpoint
import graft.sources.TableIO

/**
 * The end-to-end resumable validation run — one spark-submit replaces the
 * reference's E1→E3 Lambda/Batch choreography (SURVEY.md §3): scan the
 * sequences table, skip checkpointed partitions, evaluate the rule set,
 * write violations + verdicts (idempotent dynamic-partition overwrite),
 * then append checkpoint entries LAST so a crash replays safely.
 */
object ValidationJob {

  final case class Config(
      inputPath: String,
      manifestPath: String,
      outDir: String,
      baselinePath: Option[String] = None,
      rules: RuleSet = Rules.standard,
      vocab: Int = graft.gen.SequenceGen.vocabSize)

  final case class RunReport(
      snapshotId: String,
      rulesetHash: String,
      validatedPartitions: Seq[String],
      skippedPartitions: Seq[String],
      rowsValidated: Long,
      violations: Long,
      wallMs: Long)

  def violationsPath(outDir: String) = s"$outDir/violations"
  def verdictsPath(outDir: String) = s"$outDir/verdicts"
  def checkpointPath(outDir: String) = s"$outDir/checkpoint"

  def run(spark: SparkSession, cfg: Config): RunReport = {
    import spark.implicits._
    val t0 = System.nanoTime()
    var tLast = t0
    val phaseLog = sys.env.get("GRAFT_PHASE_LOG").contains("1")
    def phase(name: String): Unit = if (phaseLog) {
      val now = System.nanoTime()
      System.err.println(f"[phase] $name%-22s ${(now - tLast) / 1e6}%9.1f ms")
      tLast = now
    }

    val snapshotId = TableIO.snapshotId(spark, cfg.inputPath)
    phase("snapshot_id")
    val rulesetHash = cfg.rules.rulesetHash

    val all = spark.read.parquet(cfg.inputPath).as[Sequence]
    val manifest = spark.read.parquet(cfg.manifestPath).as[ManifestEntry]
    val baseline = cfg.baselinePath.map(p =>
      spark.read.parquet(p).as[BaselineBin])

    // Resume: drop partitions already validated under this exact
    // (snapshot, rule set) lineage. The filter is on the partition column,
    // so Catalyst prunes their files from the scan entirely.
    val done = Checkpoint.completedPartitions(
      spark, checkpointPath(cfg.outDir), snapshotId, rulesetHash)
    val allParts = TableIO.partitionValues(spark, cfg.inputPath, "source")
      .getOrElse(
        all.select("source").distinct().as[String].collect().toSeq.sorted)
    val todo = allParts.filterNot(done)
    phase("checkpoint+parts")

    if (todo.isEmpty) {
      return RunReport(snapshotId, rulesetHash, Nil, allParts, 0L, 0L,
        (System.nanoTime() - t0) / 1000000)
    }

    val seqs0 =
      if (done.isEmpty) all
      else all.filter(col("source").isin(todo.map(x => x: Any): _*))

    // Cache the fact table across the rule-family passes (row rules,
    // uniqueness, RI, two drift histograms each rescan it). Materialize
    // up front so every pass runs at full parallelism against in-memory
    // partitions instead of re-decoding parquet.
    val seqs = seqs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rowsValidated = seqs.count()
    phase("cache_materialize")

    val result = RuleEngine.validate(seqs, manifest, cfg.rules, baseline, cfg.vocab)
    phase("validate_drift_eager")

    // Restrict verdict/violation output to partitions being validated (the
    // RI full-outer join can surface manifest-only sources; those belong to
    // this run only if not already checkpointed).
    val vio = result.violations.filter(col("source").isin(todo.map(x => x: Any): _*) ||
      !col("source").isin(allParts.map(x => x: Any): _*))

    TableIO.writePartitioned(vio.toDF(), violationsPath(cfg.outDir))
    phase("write_violations")

    // Roll up verdicts from the WRITTEN violations (cheap pruned re-read)
    // rather than recomputing the whole violation pipeline a second time.
    // Explicit schemas: a clean run writes ZERO violation files and schema
    // inference on an empty dir would fail.
    val vioSchema = org.apache.spark.sql.Encoders.product[Violation].schema
    val verSchema = org.apache.spark.sql.Encoders.product[Verdict].schema
    val writtenVio = spark.read.schema(vioSchema)
      .parquet(violationsPath(cfg.outDir)).as[Violation]

    val verdicts = graft.rules.RuleEngine
      .rollUpVerdicts(seqs.toDF(), manifest, cfg.rules, writtenVio)
    val ver = verdicts.filter(col("source").isin(todo.map(x => x: Any): _*) ||
      !col("source").isin(allParts.map(x => x: Any): _*))

    TableIO.writePartitioned(ver.toDF(), verdictsPath(cfg.outDir))
    phase("write_verdicts")

    val written = spark.read.schema(verSchema).parquet(verdictsPath(cfg.outDir))
    val vioCount = writtenVio
      .filter(col("source").isin(todo.map(x => x: Any): _*)).count()
    val wallMs = (System.nanoTime() - t0) / 1000000

    val perPartStatus = written
      .filter(col("source").isin(todo.map(x => x: Any): _*))
      .groupBy(col("source"))
      .agg(
        max(when(col("status") === Status.Fail, 2)
          .when(col("status") === Status.PassWithWarnings, 1)
          .otherwise(0)).as("lvl"),
        count(lit(1)).as("n_rules"))
      .collect()
      .map { r =>
        val verdict = r.getInt(1) match {
          case 2 => Status.Fail
          case 1 => Status.PassWithWarnings
          case _ => Status.Pass
        }
        CheckpointEntry(
          partition = r.getString(0),
          snapshot_id = snapshotId,
          ruleset_hash = rulesetHash,
          verdict = verdict,
          metrics =
            s"""{"n_rules":${r.getLong(2)},"wall_ms":$wallMs}""",
          completed_at = java.time.Instant.now().toString)
      }
      .toSeq

    Checkpoint.append(
      spark.createDataset(perPartStatus), checkpointPath(cfg.outDir))
    phase("checkpoint_write")

    seqs.unpersist(blocking = false)
    RunReport(snapshotId, rulesetHash, todo, done.toSeq.sorted,
      rowsValidated, vioCount, wallMs)
  }
}
