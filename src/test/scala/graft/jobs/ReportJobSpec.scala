package graft.jobs

import graft.SparkSpec
import graft.gen.SequenceGen
import graft.gen.SequenceGen.Knobs

/** `report` verb: the submitter-facing text render of one run
  * (reference report.py:149-166 + notification.py body). Golden-text
  * over a seeded run — volatile lineage fields are masked, everything
  * else (counts, orderings, layout) must match byte-for-byte. */
class ReportJobSpec extends SparkSpec {

  private val N = 1500L

  private def seedRun(dir: String, knobs: Knobs): ValidationJob.RunReport = {
    SequenceGen.sequences(spark, N, knobs = knobs)
      .write.mode("overwrite").partitionBy("source").parquet(s"$dir/input")
    SequenceGen.manifest(spark, N)
      .write.mode("overwrite").parquet(s"$dir/manifest")
    graft.drift.Drift.histograms(
        SequenceGen.sequences(spark, N).toDF(),
        SequenceGen.vocabSize, s"gen-42-$N")
      .write.mode("overwrite").parquet(s"$dir/baseline")
    ValidationJob.run(spark, ValidationJob.Config(
      inputPath = s"$dir/input",
      manifestPath = s"$dir/manifest",
      outDir = s"$dir/out",
      baselinePath = Some(s"$dir/baseline")))
  }

  /** Mask run lineage (ids derive from wall-clock timestamps). */
  private def masked(text: String): String = text
    .replaceAll("(?m)^(run       : ).*$", "$1<RUN>")
    .replaceAll("(?m)^(snapshot  : ).*$", "$1<SNAPSHOT>")
    .replaceAll("(?m)^(ruleset   : ).*$", "$1<RULESET>")
    .replaceAll("(?m)^(completed : ).*$", "$1<TS>")

  test("golden text over a seeded dirty run") {
    val dir = tmpDir("report_gold")
    seedRun(dir, Knobs(badNtokRate = 0.04))
    val r = ReportJob.render(spark, s"$dir/out", topK = 3)
    val golden =
      """== VALIDATION REPORT =========================================================
        |run       : <RUN>
        |snapshot  : <SNAPSHOT>
        |ruleset   : <RULESET>
        |completed : <TS>
        |
        |-- summary -------------------------------------------------------------------
        |sources checked : 8     checks evaluated : 96
        |PASS : 88   PASS_WITH_WARNINGS : 0   NOT_COMPLETED : 0   FAIL : 8
        |clean sources : 0/8     promotable (no FAIL/NOT_COMPLETED) : 0/8
        |violations recorded : 66
        |
        |-- per-source verdicts -------------------------------------------------------
        |source   status              blocking / warning rules
        |brain    FAIL                FAIL:R_CONSISTENT_NTOK(7)
        |cardiac  FAIL                FAIL:R_CONSISTENT_NTOK(28)
        |ee       FAIL                FAIL:R_CONSISTENT_NTOK(7)
        |immuno   FAIL                FAIL:R_CONSISTENT_NTOK(4)
        |mito     FAIL                FAIL:R_CONSISTENT_NTOK(6)
        |neuro    FAIL                FAIL:R_CONSISTENT_NTOK(3)
        |renal    FAIL                FAIL:R_CONSISTENT_NTOK(4)
        |soma     FAIL                FAIL:R_CONSISTENT_NTOK(7)
        |
        |-- example violations (3 of 66) ----------------------------------------------
        |rule               source  doc_id         observed
        |R_CONSISTENT_NTOK  brain   D000000000108  {"declared":190,"actual":183}
        |R_CONSISTENT_NTOK  brain   D000000000110  {"declared":28,"actual":21}
        |R_CONSISTENT_NTOK  brain   D000000000246  {"declared":1829,"actual":1822}
        |""".stripMargin
    assert(masked(r.text) === golden)
  }

  test("clean run: all PASS, promotable, no example section") {
    val dir = tmpDir("report_clean")
    seedRun(dir, Knobs.clean)
    val r = ReportJob.render(spark, s"$dir/out")
    assert(r.text.contains("FAIL : 0"))
    assert(r.text.contains("clean sources : 8/8"))
    assert(r.text.contains("violations recorded : 0"))
    assert(!r.text.contains("example violations"))
    // every per-source line renders the no-noteworthy-rules dash
    val srcLines = r.text.linesIterator
      .dropWhile(!_.startsWith("source ")).drop(1).filter(_.nonEmpty).toSeq
    assert(srcLines.size === 8 && srcLines.forall(_.trim.endsWith("-")))
  }

  test("explicit run id selects that generation; unknown id throws") {
    val dir = tmpDir("report_runs")
    val r1 = seedRun(dir, Knobs(badNtokRate = 0.04))
    // changed input -> new snapshot -> a second, clean generation
    val r2 = seedRun(dir, Knobs.clean)
    assert(r1.snapshotId !== r2.snapshotId)
    val ids = RunDiff.runIdsByTime(spark, s"$dir/out")
    assert(ids.size === 2)
    val first = ReportJob.render(spark, s"$dir/out", Some(ids.head))
    assert(first.runId === ids.head)
    assert(first.text.contains("violations recorded : 66"))
    val latest = ReportJob.render(spark, s"$dir/out")
    assert(latest.runId === ids.last)
    assert(latest.text.contains("violations recorded : 0"))
    intercept[IllegalArgumentException] {
      ReportJob.render(spark, s"$dir/out", Some("nope"))
    }
  }
}
