package graft

import org.apache.spark.sql.SparkSession
import graft.bench.ScalingBench

/** Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR, plus the
  * BASELINE.md scaling protocol (identical rules-complete job at N vs 4N
  * parallelism — see ScalingBench.NCpus); prints ONE JSON line. */
object Bench {

  /** Representative subset spanning scan/join/agg/window/dedup/similarity
    * machinery — kept fast enough for a per-round run at sf0.1. */
  val headline: Seq[String] = Seq(
    "q1_agg", "j1_anti", "j2_undeclared_anti", "j4_dim_join",
    "j5_second_dim", "j7_full_outer_diff",
    "a7_count_reconciliation", "a8_group_evidence",
    "a9_verdict_rollup", "o_topk_users", "w_first_per_key",
    "st_sessionize", "f5_regex_valid",
    "text_quality", "text_fingerprint", "text_repetition",
    "text_freq_score",
    "sample_stratified",
    "dedup_exact", "dedup_first_seen", "dedup_chunk_fraction",
    "dedup_minhash_pairs", "dedup_minhash_pairs_capped",
    "dedup_clusters", "pipeline_curate",
    "dedup_simhash", "dedup_simhash_pairs_capped",
    "dedup_jaccard_pairs", "dedup_jaccard_pairs_capped",
    "dedup_embedding_pairs_lsh", "dedup_semantic",
    "dedup_incremental_bloom",
    "j10_snapshot_equality", "s8_results_json",
    "ann_topk_cosine", "ann_lsh_topk", "ann_ivf_topk",
    "ann_kmeans_codebook", "ann_ivf_trained_topk", "ann_pq_topk",
    "ann_ivfpq_topk",
    "seq_pack", "ngram_topk", "bm25_score", "j12_asof_join",
    "mix_sample", "seq_pack_stats", "quality_deciles",
    "text_entropy", "src_kl", "oov_rate", "len_outliers",
    "leak_prefix_matrix", "drift_ks_twosample", "drift_chi2_twosample",
    "ngram_cms_est",
    "dedup_chunk_rewrite", "dedup_normalized", "pii_redact",
    "tfidf_terms", "ann_recall_at_k", "mix_budget", "drift_psi_twosample",
    "quality_lr_score", "sample_weighted", "j13_interval_join",
    "mix_temperature", "curation_funnel",
    "lm_unigram_score", "zipf_slope", "quality_confusion", "dsir_weight",
    "lm_bigram_score", "split_cluster_aware", "bpe_merges", "bpe_encode",
    "dedup_minhash_audit", "text_blocklist",
    "dedup_span_exact", "dedup_span_rewrite", "drift_psi_equidepth",
    "emb_drift_centroid", "shard_assign", "dedup_source_matrix",
    "mm_phash_pairs", "fp_winnow", "dedup_winnow_pairs", "chunk_sliding",
    "emb_align_margin", "emb_coreset_kcenter",
    "emb_outlier", "decontaminate_semantic", "emb_pca_power",
    "pack_bucket_waste", "skew_audit",
    "dedup_canonical", "leak_benchmark_report", "quality_ablation",
    "mix_epoch_plan", "src_entropy")

  /** EVERY registered query is benched (VERDICT r04 #2: the previous
    * headline list silently excluded ~27 cheap filter/variant queries,
    * leaving regression diffs incomplete): headline order first (diff
    * stability against prior rounds), then any remaining registered
    * queries sorted by name. */
  def benchList: Seq[String] = {
    val all = headline ++
      (SparkEntry.queries.keySet -- headline.toSet).toSeq.sorted
    // local-iteration filter (comma-separated names); the driver never
    // sets it, so protocol runs always bench the full list
    sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(csv) if csv.nonEmpty =>
        val only = csv.split(",").toSet; all.filter(only)
      case _ => all
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up outside the measured window
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    // Host noise on this sandbox is bursty and only ever ADDS time (same
    // observation as the scaling protocol, BENCH/BASELINE.md): single-shot
    // timings at sf0.1 varied up to 3x run-to-run on an idle 32-core guest.
    // Min-of-reps recovers the engine's actual cost per query.
    // 5 reps (was 3): today's noise waves inflated EVERY query's min-of-3
    // ~1.5-2x across runs hours apart while the ALU probe read clean —
    // more draws per query is the only lever that widens quiet-slot
    // coverage inside one bench invocation, at ~+1 min total
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_QUERY_REPS")
        .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(5))
    // flaky-rep bookkeeping (ADVICE r03): a query that fails SOME reps
    // still reports its min over the successful ones, but the failure is
    // surfaced — in the per-query log line AND the headline JSON — instead
    // of silently reading as a clean time.
    val flaky = scala.collection.mutable.ListBuffer.empty[String]
    val results = benchList.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
          ((System.nanoTime() - t0) / 1e9, n)
        }
        // min over SUCCESSFUL reps — a transiently-failing rep returns in
        // ~ms and would otherwise masquerade as the fastest; n = -1 is
        // reported only when every rep failed
        val ok = times.filter(_._2 >= 0)
        val nFailed = times.size - ok.size
        if (nFailed > 0) flaky += s"$name:$nFailed/$reps"
        val (sec, n) = (if (ok.nonEmpty) ok else times).minBy(_._1)
        val flag = if (nFailed > 0) s"  [FAILED $nFailed/$reps reps]" else ""
        System.err.println(
          f"[bench] $name%-24s $sec%8.3f s  ($n rows, min of $reps)$flag")
        name -> sec
      }
    }
    spark.stop()

    // BASELINE.md scaling protocol (skippable for quick local iterations)
    val scaling =
      if (sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1")) None
      else {
        val rows = sys.env.get("SPARK_GRAFT_BENCH_ROWS")
          .map(_.toLong).getOrElse(16000000L)
        // tmpfs work dir — see ScalingBench.main (virtio disk would
        // serialize the per-pass scans and poison the measurement)
        val work = "/dev/shm/graft-bench-scaling"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(work))
        // 6 interleaved rounds: per-level minima need several draws to hit
        // a quiet host slot (bursty noise only ever ADDS time; the min of
        // 3 reps still varied ~8% run-to-run, multiplying into the
        // efficiency ratio from both ends)
        val r = ScalingBench.run(work, rows, maxReps = 6)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
        val out = java.nio.file.Paths.get("BENCH")
        java.nio.file.Files.createDirectories(out)
        java.nio.file.Files.writeString(
          out.resolve("BASELINE.md"),
          ScalingBench.report(r, Some(ScalingBench.recordHistory(r))))
        Some(r)
      }

    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scalingJson = scaling.map { r =>
      // normalized omitted when > 1 (probe under-measured the ceiling —
      // VERDICT r03 #4; the raw efficiency is the gate either way)
      val normJson =
        if (r.normalizedValid)
          s""","normalized_efficiency":${f"${r.normalizedEfficiency}%.3f"}"""
        else ""
      s""","scaling":{"rows":${r.rows},""" +
        s""""throughput_n":${r.n.rowsPerSec.round},""" +
        s""""throughput_4n":${r.n4.rowsPerSec.round},""" +
        s""""efficiency":${f"${r.efficiency}%.3f"},""" +
        s""""host_ceiling":${f"${r.hostCeiling}%.3f"}$normJson}"""
    }.getOrElse("")
    val flakyJson =
      if (flaky.isEmpty) ""
      else s""","failed_reps":[${flaky.map("\"" + _ + "\"").mkString(",")}]"""
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
        s""""queries":$qs,"sf":"$sfDir"$flakyJson$scalingJson}"""
    println(json)
    // durable copy — the driver captures only a tail window of stdout and
    // r4's single JSON line outgrew it, losing ~50 queries' times
    // (VERDICT r04 #2); the file artifact survives regardless of length.
    // Skipped under the SPARK_GRAFT_BENCH_ONLY iteration filter so a
    // subset run never clobbers the last full-list artifact.
    if (sys.env.get("SPARK_GRAFT_BENCH_ONLY").forall(_.isEmpty)) {
      val benchDir = java.nio.file.Paths.get("BENCH")
      java.nio.file.Files.createDirectories(benchDir)
      java.nio.file.Files.writeString(
        benchDir.resolve("last_queries.json"), json + "\n")
    }
  }
}
