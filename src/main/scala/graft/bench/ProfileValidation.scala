package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model._
import graft.rules.{RuleEngine, Rules}
import graft.drift.Drift

/** Diagnostic: per-pass timing of the validation pipeline at one
  * parallelism level, over a prepared workDir (see ScalingBench.prepare).
  * Usage: runMain graft.bench.ProfileValidation <workDir> <cpus> */
object ProfileValidation {
  def main(args: Array[String]): Unit = {
    val workDir = args(0)
    val cpus = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof $cpus] $name%-26s ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
      r
    }

    val seqs = spark.read.parquet(s"$workDir/input").as[Sequence]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val manifest = spark.read.parquet(s"$workDir/manifest").as[ManifestEntry]
    val rules = Rules.standard

    (1 to 2).foreach { rep =>
      System.err.println(s"--- rep $rep ---")
      t("cache_count")(seqs.count())
      val enriched = RuleEngine.withManifest(seqs.toDF(), manifest)
      t("row_rules")(RuleEngine.rowViolations(enriched, rules.rowRules).count())
      t("unique")(RuleEngine.uniqueViolations(seqs.toDF(),
        rules.uniqueRules.head).count())
      t("ref_integrity")(RuleEngine.refViolations(seqs.toDF(), manifest,
        rules.refRules.head).count())
      t("ntok_hist")(Drift.ntokHist(seqs.toDF()).collect())
      t("token_hist")(Drift.tokenHist(seqs.toDF(),
        graft.gen.SequenceGen.vocabSize).collect())
      t("stats")(RuleEngine.partitionStats(seqs.toDF()).collect())
    }
    spark.stop()
  }
}
