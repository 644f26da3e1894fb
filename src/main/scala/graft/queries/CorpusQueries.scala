package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{fingerprint, words}
import graft.functions.TopKByScoreAggregate
import graft.operators.AsOfJoin

/**
 * Training-corpus preparation operators over `documents` plus the
 * temporal as-of lookup over `events` — the beyond-reference slice of
 * the inventory (sequence packing, corpus n-gram statistics, BM25
 * relevance, temporal attribution). Every query keeps its arithmetic
 * either integer-exact or as a fixed sequence of exactly-rounded IEEE
 * ops mirrored verbatim in the DuckDB oracle, so all four have full
 * row/schema/hash oracles.
 */
object CorpusQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** BM25 query vocabulary: fixed, high-frequency corpus terms so df
    * spans a real range at every SF. */
  private val bm25Terms =
    Seq("table", "row", "scan", "key", "hash", "value", "spark", "sort")

  /** Power-of-two padding bucket for an n-word doc (16..1024): the
    * fixed-shape batch widths a padded training loader allocates. A
    * when-chain over literal boundaries — integer-exact in both engines
    * (no float log2 anywhere). */
  private def pow2Bucket(n: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    Seq(16L, 32L, 64L, 128L, 256L, 512L)
      .foldRight(lit(1024L): org.apache.spark.sql.Column) { (b, rest) =>
        when(n <= b, lit(b)).otherwise(rest)
      }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PADDING-WASTE audit of power-of-two length bucketing — the batch
    // assembly question seq_pack's concat-and-chunk AVOIDS: if docs are
    // instead padded to fixed power-of-two widths (the dynamic-shape
    // loader strategy), how much compute is padding? Per bucket: docs,
    // real token mass, padded mass (bucket × docs), waste fraction —
    // the table that decides pack-vs-pad per corpus. Pure projection +
    // one ≤7-row aggregate; never a corpus sort or repartition.
    "pack_bucket_waste" -> ((s, dir) => {
      docs(s, dir)
        .select(size(words(col("text"))).cast("long").as("n"))
        .select(pow2Bucket(col("n")).as("bucket"), col("n"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("sum_words"))
        .select(col("bucket"), col("n_docs"), col("sum_words"),
          (col("bucket") * col("n_docs") - col("sum_words")).as("padding"),
          ((col("bucket") * col("n_docs") - col("sum_words"))
            .cast("double") /
            (col("bucket") * col("n_docs")).cast("double"))
            .as("waste_frac"))
    }),

    // Deterministic output SHARDING — the write-side step every training
    // pipeline ends with: route each doc to shard = fingerprint mod 8
    // (content-keyed, so membership is reproducible across runs, cluster
    // sizes, and later re-shards — the same derandomization rule as
    // mix_sample), and audit the balance the router achieves: per shard,
    // doc count, token mass, and distinct sources touched. A skewed row
    // would mean the hash is routing badly (it cannot — the fingerprint
    // is uniform) or a pathological corpus. Pure projection + one
    // 8-row aggregate: the corpus never sorts and never shuffles by
    // anything finer than the 8 shard keys' partials.
    "shard_assign" -> ((s, dir) => {
      docs(s, dir)
        .select(
          pmod(fingerprint(col("text")), lit(8L)).as("shard"),
          size(words(col("text"))).cast("long").as("nw"),
          col("source"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("nw").as("n_words"),
          countDistinct("source").as("n_sources"))
    }),

    // SHARD-MIX audit: per shard, the Shannon entropy of its SOURCE
    // composition and its KL divergence from the corpus source mix —
    // the "is the router actually shuffling" gate for the training
    // loader (shard_assign reports sizes and distinct-source counts;
    // this measures the mix: a shard can touch all sources yet be 95%
    // one of them, which correlates consecutive gradients exactly the
    // way curriculum literature warns). Integer-exact on the shared
    // quantized log: entropy qh = n_s·qln(n_s) − Σ c·qln(c); KL term
    // c·(qln(c·N) − qln(n_s·n_src)) — products ≤ N² stay int64 at test
    // SFs (the header's 10^12 requantization caveat applies). Plan: ONE
    // (shard, source) grid aggregation with map-side combine; the
    // corpus source totals RE-AGGREGATE the grid (no second scan); grid
    // volume is |shards|×|sources| everywhere downstream.
    "shard_mix_entropy" -> ((s, dir) => {
      import graft.queries.DistributionQueries.{qln => q}
      // totals come from WINDOWS over the |shards|×|sources| grid, not
      // re-aggregations of the grid DataFrame: re-deriving it per total
      // re-plans the corpus scan each time (the first cut scanned
      // documents 4×; PlanSpec pins 1)
      val grid = docs(s, dir)
        .select(pmod(fingerprint(col("text")), lit(8L)).as("shard"),
          col("source"))
        .groupBy("shard", "source").agg(count(lit(1)).as("c"))
        .withColumn("n_src",
          sum("c").over(Window.partitionBy(col("source"))))
        .withColumn("n_s",
          sum("c").over(Window.partitionBy(col("shard"))))
        .withColumn("n_total", sum("c").over(
          Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
      grid
        .groupBy(col("shard"), col("n_s"))
        .agg(count(lit(1)).as("n_sources"),
          sum(col("c") * q(col("c"))).as("qsum"),
          sum(col("c") * (q(col("c") * col("n_total"))
            - q(col("n_s") * col("n_src")))).as("kl_qsum"))
        .select(col("shard"), col("n_s").as("n_docs"), col("n_sources"),
          (((col("n_s") * q(col("n_s")) - col("qsum")).cast("double")
            / (col("n_s").cast("double") * lit(1e6)))
            / lit(0.6931471805599453)).as("entropy_bits"),
          (col("kl_qsum").cast("double")
            / (col("n_s").cast("double") * lit(1e6))).as("kl_to_corpus"))
    }),

    // BPE tokenizer TRAINING (Sennrich et al. 2016): the first 4 merges
    // learned from the corpus word vocabulary, with bit-exact replay in
    // the oracle (pair counts are integer word-frequency sums; argmax
    // tie-breaks count desc, pair asc; merge application is the
    // two-space plain-replace trick — see BpeTokenizer). ONE corpus pass
    // (the word count); each iteration is a vocab-sized aggregation +
    // driver top-1 — the same trained-operator shape as
    // ann_kmeans_codebook and quality_lr_weights.
    "bpe_merges" -> ((s, dir) => {
      import s.implicits._
      val (merges, _) =
        graft.operators.BpeTokenizer.train(docs(s, dir), "text", 4)
      merges.map(m => (m.step, m.pair, m.count))
        .toDF("step", "pair", "cnt")
    }),

    // BPE ENCODE with the trained merges: per-doc subword-token count
    // after applying the 4 learned merges in training order — the
    // "how many tokens will this corpus cost" accounting pass run with
    // a freshly trained tokenizer. The word→sym vocabulary join is
    // UNHINTED: the trained vocab spans the corpus's open word domain
    // (the same scale class as the lm_* count tables — VERDICT r04 #1),
    // so the w-keyed shuffled hash join is the safe plan and AQE still
    // broadcasts when the vocab happens to fit.
    "bpe_encode" -> ((s, dir) => {
      val d = docs(s, dir)
      val (_, vocab) = graft.operators.BpeTokenizer.train(d, "text", 4)
      val out = d
        .select(col("doc_id"), explode(words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .join(vocab.select(col("w"), col("sym")), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(size(graft.operators.BpeTokenizer.symbols(col("sym")))
            .cast("long")).as("n_bpe_tokens"))
      out
    }),

    // Tokenizer FERTILITY audit per language: subword tokens per word
    // and chars per subword token under the freshly trained BPE — the
    // standard "how well does this tokenizer fit each language slice"
    // health check (high fertility = the slice pays more sequence
    // length per word of content; budget/mixing decisions key off it).
    // Same single corpus word pass + unhinted vocab join as bpe_encode,
    // rolled up to |lang| rows; the ratios are exact-integer divisions
    // performed once at the end.
    "bpe_fertility" -> ((s, dir) => {
      val d = docs(s, dir)
      val (_, vocab) = graft.operators.BpeTokenizer.train(d, "text", 4)
      d.select(col("lang"), explode(words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .join(vocab.select(col("w"), col("sym")), "w")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum(size(graft.operators.BpeTokenizer.symbols(col("sym")))
            .cast("long")).as("n_bpe_tokens"),
          sum(length(col("w")).cast("long")).as("n_chars"))
        .withColumn("fertility",
          col("n_bpe_tokens").cast("double")
            / col("n_words").cast("double"))
        .withColumn("chars_per_token",
          col("n_chars").cast("double")
            / col("n_bpe_tokens").cast("double"))
    }),

    // UNIGRAM-LM (SentencePiece) VITERBI segmentation — the inference
    // half of Kudo 2018's ULM tokenizer, the principled alternative to
    // BPE's greedy merges this inventory already ships: pieces are all
    // 1..4-char substrings of corpus words (singletons kept
    // unconditionally — the closure that makes every word segmentable;
    // longer pieces kept at corpus mass ≥ 8), scored by the quantized
    // log-probability qs = qln(mass) − qln(Z), and each distinct word
    // takes its MAXIMUM-SCORE segmentation by exact integer Viterbi:
    //   best[i] = max over spans (j, i] in vocab of best[j] + qs(piece)
    // with the deterministic tie-break (score, then LARGER j — prefer
    // the shorter final piece), replayed position-for-position in
    // DuckDB. The whole DP runs INSIDE the row as codegen-friendly
    // higher-order functions — no per-position shuffle, no driver loop:
    // the only exchanges are the two open-vocab aggregations (word
    // counts, piece mass) and the piece-score join (UNHINTED, the
    // lm_* discipline). Output: the top-64 pieces by corpus-weighted
    // usage in the chosen segmentations — the "which pieces would this
    // tokenizer actually spend its vocabulary on" table next to
    // bpe_merges. Integer-exact end to end: scores are int64 qln sums;
    // the only floats are none at all.
    "ulm_viterbi_encode" -> ((s, dir) => {
      val sent = "-1152921504606846976" // -(2^60): unreachable sentinel
      val d = docs(s, dir)
      // DP length cap: the per-row fold rebuilds an O(|w|) array per
      // span, so a pathological mega-"word" (a no-space blob) would make
      // one row O(|w|²) and stall its task. Real tokenizers cap token
      // length the same way; capped-out words are excluded from the
      // usage table with documented semantics (they'd be byte-fallback
      // in a real pipeline), and the oracle mirrors the cap — it also
      // bounds the oracle's recursion depth.
      val wc = d.select(explode(words(col("text"))).as("w"))
        .filter(length(col("w")) > 0 && length(col("w")) <= 64)
        .groupBy("w").agg(count(lit(1)).as("c_w"))
      val spans = wc.select(col("w"), col("c_w"),
          explode(expr(
            "flatten(transform(sequence(0, length(w)-1), i -> " +
              "transform(sequence(1, least(4, length(w)-i)), L -> " +
              "named_struct('start', i, 'len', L, " +
              "'piece', substring(w, i+1, L)))))")).as("sp"))
        .select(col("w"), col("c_w"),
          col("sp.start").as("start"), col("sp.len").as("len"),
          col("sp.piece").as("piece"))
      val vocab = spans.groupBy("piece").agg(sum("c_w").as("sv"))
        .filter(length(col("piece")) === 1 || col("sv") >= 8L)
      val z = vocab.agg(sum("sv").as("z"))
      val scored = vocab.crossJoin(broadcast(z))
        .select(col("piece"),
          (DistributionQueries.qln(col("sv"))
            - DistributionQueries.qln(col("z"))).as("qs"))
      val perWord = spans.join(scored, Seq("piece"))
        .withColumn("end", col("start") + col("len"))
        .groupBy("w", "c_w")
        .agg(sort_array(collect_list(
          struct(col("end"), col("start"), col("qs")))).as("sps"))
      val dp = perWord.withColumn("dp", expr(s"""
        aggregate(sps,
          transform(sequence(0, length(w)),
            i -> named_struct('s', IF(i = 0, 0L, ${sent}L),
                              'bp', -1)),
          (st, sp) -> transform(st, (cell, idx) ->
            IF(idx = sp.end
                 AND element_at(st, sp.start + 1).s > ${sent}L
                 AND (element_at(st, sp.start + 1).s + sp.qs > cell.s
                      OR (element_at(st, sp.start + 1).s + sp.qs = cell.s
                          AND sp.start > cell.bp)),
               named_struct('s', element_at(st, sp.start + 1).s + sp.qs,
                            'bp', sp.start),
               cell)))"""))
      // backtrace: the visited-position chain (strictly decreasing, so
      // length(w) iterations always suffice), then pieces between
      // consecutive positions
      val segs = dp
        .withColumn("pos_chain", expr("""
          aggregate(sequence(1, length(w)),
            array(length(w)),
            (acc, step) -> IF(element_at(acc, 1) <= 0, acc,
              concat(array(element_at(dp,
                element_at(acc, 1) + 1).bp), acc)))"""))
        .withColumn("pieces", expr("""
          transform(sequence(1, size(pos_chain) - 1), k ->
            substring(w, element_at(pos_chain, k) + 1,
              element_at(pos_chain, k + 1) - element_at(pos_chain, k)))"""))
      segs.select(col("c_w"), explode(col("pieces")).as("piece"))
        .groupBy("piece").agg(sum("c_w").as("n_uses"))
        .orderBy(col("n_uses").desc, col("piece").asc).limit(64)
    }),

    // EXACT-budget source mixing: allocate a global budget of 100 docs
    // across sources proportionally to size, with largest-remainder
    // rounding (quotas sum to the budget EXACTLY — the hash-threshold
    // mix_sample only hits targets in expectation), then take each
    // source's quota deterministically by fingerprint order. All
    // integer arithmetic: base = (100·c) DIV total, bonus to the
    // largest (100·c) MOD total remainders. Scale shape: quotas derive
    // from a |sources|-row aggregate (windows over that tiny grid);
    // selection reuses the bounded top-k aggregate (≤ budget state per
    // source), never a corpus sort.
    "mix_budget" -> ((s, dir) => {
      val budget = 100
      val d = docs(s, dir)
      val wAll = Window.partitionBy(lit(1))
      val quotas = d.groupBy("source").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(d.agg(count(lit(1)).as("t"))))
        .withColumn("base", expr(s"($budget * c) DIV t"))
        .withColumn("rem", expr(s"($budget * c) % t"))
        .withColumn("sumbase", sum(col("base")).over(wAll))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("rem").desc, col("source").asc)))
        .withColumn("quota", col("base") +
          when(col("rnk") <= lit(budget.toLong) - col("sumbase"), 1L)
            .otherwise(0L))
        .select("source", "quota")
      TextQueries.sampleByFingerprint(d, budget)
        .join(broadcast(quotas), "source")
        .filter(col("rank") <= col("quota"))
        .select("source", "quota", "rank", "doc_id")
    }),

    // TEMPERATURE-scaled source mixing (the multilingual-sampling rule:
    // quota_s ∝ mass_s^α, α = 0.5, so small sources are up-weighted
    // relative to proportional allocation): per-source TOKEN mass →
    // sqrt → 2^20-quantized int64 weight → the same exact
    // largest-remainder allocation as mix_budget. sqrt is
    // IEEE-correctly-rounded and the quantization makes every
    // downstream comparison integer, so the allocation is bit-portable.
    // Same scale shape as mix_budget: one |sources|-row grid + bounded
    // top-k selection.
    "mix_temperature" -> ((s, dir) => {
      val budget = 100
      val d = docs(s, dir)
      val wAll = Window.partitionBy(lit(1))
      val weights = d
        .select(col("source"),
          size(words(col("text"))).cast("long").as("nw"))
        .groupBy("source").agg(sum(col("nw")).as("m"))
        .withColumn("qs",
          floor(sqrt(col("m").cast("double")) * lit(1048576.0))
            .cast("long"))
      val quotas = weights
        .crossJoin(broadcast(weights.agg(sum(col("qs")).as("t"))))
        .withColumn("base", expr(s"($budget * qs) DIV t"))
        .withColumn("rem", expr(s"($budget * qs) % t"))
        .withColumn("sumbase", sum(col("base")).over(wAll))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("rem").desc, col("source").asc)))
        .withColumn("quota", col("base") +
          when(col("rnk") <= lit(budget.toLong) - col("sumbase"), 1L)
            .otherwise(0L))
        .select("source", "quota")
      TextQueries.sampleByFingerprint(d, budget)
        .join(broadcast(quotas), "source")
        .filter(col("rank") <= col("quota"))
        .select("source", "quota", "rank", "doc_id")
    }),

    // EPOCH allocation under a token budget — the data-constrained
    // scaling table (Muennighoff et al. 2023, "Scaling Data-Constrained
    // Language Models": repeating up to ~4 epochs is near-fresh data,
    // beyond that returns decay): per source, the tokens the temperature-
    // scaled mixture WANTS at budget = 2× the corpus, the epochs that
    // requires over what the source HAS (ceil, capped at 4), the realized
    // tokens under the cap, and the unmet deficit. Integer-exact end to
    // end (shares ride mix_temperature's quantized-sqrt weights; ceil and
    // min are integer ops). The 2·total·qs product is computed in
    // DECIMAL(38,0) — total ≈ corpus words and qs ≈ sqrt(m)·2^20, so the
    // int64 product wraps silently above ~5e8 corpus words; the decimal
    // form is exact to 1e38 and the DIV result (≤ 2·total) is back in
    // int64 range (ADVICE r04 #1; oracle mirrors via HUGEINT). Scale
    // shape: one |sources|-row aggregate + a 1-row broadcast — the whole
    // plan is dimension-sized.
    "mix_epoch_plan" -> ((s, dir) => {
      val d = docs(s, dir)
      val avail = d
        .select(col("source"),
          size(words(col("text"))).cast("long").as("nw"))
        .groupBy("source").agg(sum(col("nw")).as("m"))
        .withColumn("qs",
          floor(sqrt(col("m").cast("double")) * lit(1048576.0))
            .cast("long"))
      avail
        .crossJoin(broadcast(avail.agg(
          sum(col("qs")).as("qt"), sum(col("m")).as("total"))))
        .withColumn("wanted",
          expr("(CAST(total AS DECIMAL(38,0)) * 2 * qs) DIV qt"))
        .withColumn("epochs",
          least(expr("(wanted + m - 1) DIV m"), lit(4L)))
        .withColumn("realized", least(col("wanted"), col("epochs") * col("m")))
        .select(col("source"), col("m").as("avail_tokens"),
          col("wanted").as("wanted_tokens"), col("epochs"),
          col("realized").as("realized_tokens"),
          (col("wanted") - col("realized")).as("deficit"))
    }),

    // DoReMi-style domain reweighting STEP (Xie et al. 2023, "DoReMi:
    // Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    // up-weight the domains the current model finds HARDEST. Per source,
    // excess loss = avg corpus-MLE unigram NLL of the source minus the
    // corpus average (clipped at 0 — only harder-than-average domains
    // gain), and the updated weight is the LINEARIZED multiplicative
    // update w'_s ∝ n_s·(1 + η·excess_s) at η = 1/nat — the first-order
    // form of DoReMi's exp(η·excess) exponentiated-gradient step, chosen
    // because exp() is not exactly-rounded IEEE and would break the
    // bit-exact oracle contract (sqrt/div are; exp is libm-dependent).
    // The per-source unigram NLL is the engine's own lm_unigram_score
    // aggregated by source — real deployments feed per-domain PROXY-MODEL
    // losses into the same step; the update arithmetic is what is being
    // pinned here. Integer-exact end to end on the shared quantized log:
    //   qnll_s   = n_s·qln(N) − Σ_w c_sw·qln(c_w)        (int64)
    //   qexc_s   = max(0, qnll_s·N − qnll_tot·n_s)       (decimal 38,0 —
    //              ≈ n_s·3e7·N wraps int64 beyond ~1e9 corpus words)
    //   qw_s     = n_s·1e6 + qexc_s DIV N   (≡ n_s·(1+excess)·1e6, the
    //              n_s·n_tot·1e6 denominator folded by exact division)
    // then the SAME largest-remainder allocation as mix_budget /
    // mix_temperature over qw. Scale shape: ONE word exchange
    // (source-word counts with map-side combine); the vocab join is
    // w-keyed and UNHINTED (open domain — src_kl's discipline); the
    // update + allocation run on a |sources|-row grid.
    "mix_doremi_step" -> ((s, dir) => {
      val budget = 100
      val wAll = Window.partitionBy(lit(1))
      val sw = docs(s, dir)
        .select(col("source"), explode(words(col("text"))).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      val cw = sw.groupBy("w").agg(sum("c_sw").as("c_w"))
      val per = sw.join(cw, "w")
        .groupBy("source")
        .agg(sum("c_sw").as("n_s"),
          sum(col("c_sw") * DistributionQueries.qln(col("c_w"))).as("qcw"))
      val tot = per.agg(sum("n_s").as("n_tot"), sum("qcw").as("qcw_tot"))
      val weights = per.crossJoin(broadcast(tot))
        .withColumn("qnll_s",
          col("n_s") * DistributionQueries.qln(col("n_tot")) - col("qcw"))
        .withColumn("qnll_tot",
          col("n_tot") * DistributionQueries.qln(col("n_tot"))
            - col("qcw_tot"))
        .withColumn("qexc", expr(
          """greatest(CAST(0 AS DECIMAL(38,0)),
             CAST(qnll_s AS DECIMAL(38,0)) * n_tot -
             CAST(qnll_tot AS DECIMAL(38,0)) * n_s)"""))
        .withColumn("qw", expr(
          "CAST(n_s AS DECIMAL(38,0)) * 1000000 + qexc DIV n_tot"))
      weights
        .crossJoin(broadcast(weights.agg(sum(col("qw")).as("tq"))))
        .withColumn("base", expr(s"($budget * qw) DIV tq"))
        .withColumn("rem", expr(s"($budget * qw) % tq"))
        .withColumn("sumbase", sum(col("base")).over(wAll))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("rem").desc, col("source").asc)))
        .select(col("source"), col("n_s").as("n_words"),
          (col("qnll_s").cast("double")
            / (col("n_s").cast("double") * lit(1e6))).as("avg_nll"),
          (col("qexc").cast("double")
            / (col("n_s").cast("double") * col("n_tot").cast("double")
              * lit(1e6))).as("excess_nats"),
          (col("base") + when(
            col("rnk") <= lit(budget.toLong) - col("sumbase"), 1L)
            .otherwise(0L)).as("quota"))
    }),

    // TWO-PHASE ANNEAL mix plan — the decay-phase data schedule modern
    // pretraining runs end with (publicly described for Llama 3 /
    // MiniCPM-style midtraining: the final slice of the token budget
    // re-weights toward the highest-quality data): a one-epoch token
    // budget splits 90/10 into a MAIN phase allocated proportionally to
    // raw token mass and an ANNEAL phase allocated proportionally to
    // each source's HIGH-QUALITY token mass (tokens in docs passing the
    // rule-based quality gate — the same label the classifier family
    // trains on). Integer-exact end to end: both phases reuse the exact
    // largest-remainder allocation (mix_budget), with budget×mass
    // products in DECIMAL(38,0) (they wrap int64 at corpus scale —
    // mix_epoch_plan's discipline); anneal_boost is the diagnostic
    // ratio of a source's anneal share to its proportional share.
    // Scale shape: ONE corpus scan to a |sources|-row (m, hq) grid;
    // everything after is dimension-sized windows over that grid.
    // Precondition: ≥1 high-quality token corpus-wide (a corpus whose
    // every doc fails its own quality gate has no anneal phase to plan).
    "mix_anneal" -> ((s, dir) => {
      val wAll = Window.partitionBy(lit(1))
      val nw = size(words(col("text"))).cast("long")
      val grid = docs(s, dir)
        .select(col("source"), nw.as("nw"),
          (col("n_chars") >= 100 && nw >= 20L).as("hqf"))
        .groupBy("source")
        .agg(sum(col("nw")).as("m"),
          sum(when(col("hqf"), col("nw")).otherwise(0L)).as("hq"))
      def allocate(df: DataFrame, budget: String, mass: String,
          total: String, out: String): DataFrame = df
        .withColumn("base", expr(
          s"(CAST($budget AS DECIMAL(38,0)) * $mass) DIV $total"))
        .withColumn("rem", expr(
          s"CAST((CAST($budget AS DECIMAL(38,0)) * $mass) % $total" +
            s" AS BIGINT)"))
        .withColumn("sumbase", sum(col("base")).over(wAll))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("rem").desc, col("source").asc)))
        .withColumn(out, col("base") +
          when(col("rnk") <= col(budget) - col("sumbase"), 1L)
            .otherwise(0L))
        .drop("base", "rem", "sumbase", "rnk")
      val withTot = grid
        .crossJoin(broadcast(grid.agg(
          sum(col("m")).as("tm"), sum(col("hq")).as("th"))))
        .withColumn("mainb", expr("(tm * 9) DIV 10"))
        .withColumn("annb", col("tm") - col("mainb"))
      val planned = allocate(
        allocate(withTot, "mainb", "m", "tm", "main_tokens"),
        "annb", "hq", "th", "anneal_tokens")
      planned.select(col("source"), col("m").as("avail_tokens"),
        col("hq").as("hq_tokens"),
        col("main_tokens"), col("anneal_tokens"),
        (col("main_tokens") + col("anneal_tokens")).as("phase_total"),
        ((col("anneal_tokens").cast("double") * col("tm").cast("double"))
          / (col("annb").cast("double") * col("m").cast("double")))
          .as("anneal_boost"))
    }),

    // TF-IDF source characterization: per source, the top-5 most
    // DISTINCTIVE terms by tf(source, term) * (qln(N) − qln(df(term)))
    // — integer-exact via the shared quantized log (DistributionQueries
    // .qln; qln(N) − qln(df) is the deterministic integer DEFINITION of
    // the idf, not a float ln(N/df)). Scale shape: ONE exchange on the
    // word serves the tf aggregation, the per-(word, doc) distinct, the
    // df roll-up, AND the tf⋈df join (all keyed on word, hash-
    // partitioned subsets); N broadcasts as a 1-row literal; the final
    // top-5 window runs on |sources|×|vocab| aggregated rows, never the
    // corpus.
    "tfidf_terms" -> ((s, dir) => {
      val d = docs(s, dir)
      val occ = d.select(col("source"), col("doc_id"),
          explode(words(col("text"))).as("word"))
        .repartition(col("word"))
      val tf = occ.groupBy("word", "source").agg(count(lit(1)).as("tf"))
      val df = occ.select("word", "doc_id").distinct()
        .groupBy("word").agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, "word")
        .crossJoin(broadcast(n))
        .withColumn("score_q",
          col("tf") * (DistributionQueries.qln(col("n_docs")) -
            DistributionQueries.qln(col("df"))))
      // r06: bounded per-source top-5 via TermTopKAggregate (map-side
      // ≤ k state; same (score desc, word asc) order and tie-break as
      // the r05 row_number window, which sorted the whole per-source
      // vocabulary on one task)
      scored
        .groupBy("source")
        .agg(graft.functions.TermTopKAggregate.topK(
          col("score_q"), col("word"), col("tf"), col("df"), 5).as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("source"), (col("i") + 1).cast("int").as("rank"),
          col("t.word").as("word"), col("t.a").as("tf"),
          col("t.b").as("df"), col("t.score_q").as("score_q"))
    }),

    // CONTEXT-LENGTH truncation sweep — the "what max_seq_len do we
    // train at" sizing table: for each candidate context length L, how
    // many docs overflow L and what fraction of the corpus' word mass a
    // truncate-at-L loader would drop. The complement of seq_pack's
    // concat-and-chunk, for pipelines that truncate instead of pack; the
    // knee of trunc_waste(L) is where the context budget goes. ONE
    // corpus scan to eight running sums + a 4-row stack (the
    // quality_ablation shape) — no explode-per-L row blowup, no joins,
    // nothing wider than the agg partials.
    "ctx_truncation_sweep" -> ((s, dir) => {
      def t(l: Int) = sum(when(col("nw") > l, 1L).otherwise(0L))
      def kept(l: Int) = sum(least(col("nw"), lit(l.toLong)))
      docs(s, dir)
        .select(size(words(col("text"))).cast("long").as("nw"))
        .agg(
          count(lit(1)).as("n_docs"), sum(col("nw")).as("tw"),
          t(64).as("t64"), kept(64).as("k64"),
          t(128).as("t128"), kept(128).as("k128"),
          t(256).as("t256"), kept(256).as("k256"),
          t(512).as("t512"), kept(512).as("k512"))
        .selectExpr(
          """stack(4,
               64L,  n_docs, t64,  tw, k64,
               128L, n_docs, t128, tw, k128,
               256L, n_docs, t256, tw, k256,
               512L, n_docs, t512, tw, k512)
             AS (ctx, n_docs, n_truncated, total_words, kept_words)""")
        .withColumn("trunc_waste",
          lit(1.0) - col("kept_words").cast("double")
            / col("total_words").cast("double"))
    }),

    // GPT-style sequence packing (concat-and-chunk): within each source,
    // documents are concatenated in doc_id order and cut into fixed
    // 64-word training sequences; the output is the doc -> chunk-span
    // index a training loader consumes. Pure integer arithmetic over ONE
    // window per source — a single hash exchange, no joins. At 100 TB
    // the packing unit is (source, shard) so no single window partition
    // holds a whole source; the per-source form here is the unit that
    // composes.
    "seq_pack" -> ((s, dir) => {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          size(words(col("text"))).cast("long").as("n_words"))
        .withColumn("cum_before",
          coalesce(sum(col("n_words")).over(w), lit(0L)))
        .select(col("source"), col("doc_id"), col("n_words"),
          expr("cum_before div 64").as("first_chunk"),
          expr("(cum_before + n_words - 1) div 64").as("last_chunk"))
        .withColumn("n_chunks",
          col("last_chunk") - col("first_chunk") + lit(1L))
    }),

    // RAG passage extraction: CLAMPED sliding 32-word windows at stride
    // 24 (8-word overlap) — the retrieval-side companion of seq_pack's
    // training-side concat-and-chunk. Every chunk is full-width (the last
    // start clamps to n−W, so no sub-width tail passage and full
    // coverage); docs shorter than one window yield exactly one chunk of
    // themselves. n_chunks = 1 + ceil((n−W)/S) in pure integer
    // arithmetic. A per-row projection + in-row explode — zero exchanges,
    // ~n/S output rows per doc; chunk_fp is the shared polynomial
    // fingerprint of the passage text, the key passage-level dedup and
    // the ANN index build consume downstream.
    "chunk_sliding" -> ((s, dir) => {
      val W = 32; val S = 24
      docs(s, dir)
        .select(col("doc_id"), words(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          size(col("toks")).cast("long").as("n"))
        .withColumn("n_chunks",
          when(col("n") <= W, lit(1L))
            .otherwise(expr(s"1 + (n - $W + ${S - 1}) div $S")))
        .select(col("doc_id"), col("toks"), col("n"),
          explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_idx"))
        .withColumn("start_word",
          when(col("n") <= W, lit(1L))
            .otherwise(least(col("chunk_idx") * S, col("n") - W) + 1L))
        .select(col("doc_id"), col("chunk_idx"), col("start_word"),
          least(lit(W.toLong), col("n")).as("n_words"),
          graft.functions.TextFunctions.polyHash(
            array_join(slice(col("toks"), col("start_word"), lit(W)), " "))
            .as("chunk_fp"))
    }),

    // corpus-level top-50 bigrams: the n-gram frequency table behind
    // contamination screens and boilerplate detection. Bigrams are a
    // codegen'd projection (two aligned slices zipped — no sequence()
    // range, which mis-steps on 1-word docs); the count groupBy gets
    // map-side partial aggregation and the top-50 is TakeOrdered, so
    // the exchange carries |vocab-bigram| partials, never corpus rows.
    "ngram_topk" -> ((s, dir) => {
      docs(s, dir)
        .select(words(col("text")).as("ws"))
        .select(explode(expr(
          "zip_with(slice(ws, 1, greatest(size(ws)-1, 0)), " +
            "slice(ws, 2, greatest(size(ws)-1, 0)), " +
            "(a, b) -> concat(a, ' ', b))")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(50)
    }),

    // Count-min-sketch heavy hitters: estimate the top-10 bigrams'
    // frequencies from a FIXED 4×1024-counter sketch instead of the
    // exact per-key counts. The sketch is the scale path for OPEN n-gram
    // domains (exact counting shuffles one partial per distinct key —
    // unbounded at 10^12 rows; the sketch's global aggregation
    // partial-merges a constant 32 KB array with zero key-space
    // exchanges). Estimates are min-over-rows of affine rehashes of the
    // portable polynomial hash — all integer arithmetic, replayed
    // bit-for-bit by the oracle, overestimates included (961 possible
    // bigrams into 1024 buckets collide deterministically).
    "ngram_cms_est" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.CountMinAggregate
      val bg = docs(s, dir)
        .select(words(col("text")).as("ws"))
        .select(explode(expr(
          "zip_with(slice(ws, 1, greatest(size(ws)-1, 0)), " +
            "slice(ws, 2, greatest(size(ws)-1, 0)), " +
            "(a, b) -> concat(a, ' ', b))")).as("bigram"))
        .select(col("bigram"),
          graft.functions.TextFunctions.fingerprint(col("bigram")).as("h"))
      val sketch = bg
        .agg(CountMinAggregate.agg(col("h"), lit(1L), 4, 1024).as("sk"))
        .head().getSeq[Long](0).toArray
      val top = bg.groupBy("bigram")
        .agg(count(lit(1)).as("exact"), min(col("h")).as("h"))
        .orderBy(col("exact").desc, col("bigram").asc)
        .limit(10).collect()
      top.toSeq
        .map { r =>
          val est = CountMinAggregate.estimate(
            sketch, r.getLong(2), 4, 1024)
          (r.getString(0), r.getLong(1), est, est - r.getLong(1))
        }
        .toDF("bigram", "exact", "est", "overestimate")
    }),

    // BM25 (k1=1.2, b=0.75) per-(term, doc) relevance with corpus-trained
    // df, top-5 docs per term. Scale shape — train then score, like
    // text_freq_score: ONE stats scan folds N, total length AND all 8
    // per-term document frequencies into a single driver row (the naive
    // explode/groupBy/self-join form scans the corpus three times and
    // computes the tf aggregation twice); scoring is then a pure
    // projection — per-term tf from an array filter, df/avgdl/N as
    // literals — so the whole query is 2 scans, ZERO joins, and the only
    // row exchange is the bounded TopKByScoreAggregate's 8-group
    // partial (<= k map-side state, no per-term window reducer).
    // Float discipline: idf avoids ln() — the rational
    // (N - df + 0.5)/(df + 0.5) form — and every double op is written in
    // the same association order as the oracle SQL, so each
    // exactly-rounded IEEE step matches bit-for-bit.
    "bm25_score" -> ((s, dir) => {
      val d = docs(s, dir)
        .select(col("doc_id"), words(col("text")).as("ws"))
      val st = d.agg(
        count(lit(1)),
        sum(size(col("ws")).cast("long")) +:
          bm25Terms.map(t =>
            sum(when(array_contains(col("ws"), t), 1L).otherwise(0L))): _*)
        .head()
      val nDocs = st.getLong(0).toDouble
      val avgdl = st.getLong(1).toDouble / st.getLong(0).toDouble
      val dfMap = bm25Terms.zipWithIndex
        .map { case (t, i) => t -> st.getLong(2 + i).toDouble }.toMap
      val perTerm = array(bm25Terms.map(t =>
        struct(lit(t).as("w"),
          size(filter(col("ws"), x => x === lit(t))).cast("long")
            .as("tf"))): _*)
      d.select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
          explode(perTerm).as("e"))
        .select(col("doc_id"), col("dl"),
          col("e.w").as("w"), col("e.tf").as("tf"))
        .where(col("tf") > 0)
        .withColumn("df", element_at(typedlit(dfMap), col("w")))
        .withColumn("score",
          ((col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") +
              (lit(1.2) * (lit(0.25) +
                (lit(0.75) * (col("dl").cast("double") / lit(avgdl))))))) *
            (((lit(nDocs) - col("df")) + lit(0.5)) / (col("df") + lit(0.5))))
        .groupBy(col("w").as("term"))
        .agg(TopKByScoreAggregate
          .topK(col("score"), col("doc_id"), 5).as("tk"))
        .select(col("term"), posexplode(col("tk")).as(Seq("r0", "e")))
        .select(col("term"), (col("r0") + 1).cast("int").as("rank"),
          col("e.neighbor_id").as("doc_id"), col("e.cos").as("score"))
    }),

    // deterministic source mixing: each source sampled to its target
    // fraction by CONTENT-HASH THRESHOLD (fp mod 10000 < frac*10000) —
    // the scale form of weighted data mixing. No top-k, no per-source
    // state, no shuffle: one projection + filter, reproducible across
    // runs and cluster sizes because membership depends only on content.
    "mix_sample" -> ((s, dir) => {
      // per-source mille-rate (parts per 10000); sources absent from the
      // map fall back to 500 (5%)
      val rates = Map("src0" -> 5000L, "src1" -> 2500L, "src2" -> 1000L)
      val rate = coalesce(
        element_at(typedlit(rates), col("source")), lit(500L))
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
        .where(pmod(col("fp"), lit(10000L)) < rate)
    }),

    // packing-efficiency report over the seq_pack layout: per source,
    // how many 64-word training sequences the corpus fills and what
    // fraction of the last chunk is padding. Plain partial-aggregated
    // groupBy — one exchange carrying |sources| partials.
    "seq_pack_stats" -> ((s, dir) => {
      docs(s, dir)
        .select(col("source"),
          size(words(col("text"))).cast("long").as("n_words"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"))
        .withColumn("n_chunks",
          expr("(total_words + 63) div 64"))
        .withColumn("pad_words",
          col("n_chunks") * lit(64L) - col("total_words"))
        .withColumn("pad_frac",
          col("pad_words").cast("double") /
            (col("n_chunks") * lit(64L)).cast("double"))
    }),

    // quality stratification: nearest-rank decile thresholds of n_chars
    // TRAINED corpus-wide, then bucketing is a projection. Edge training
    // runs DISTRIBUTED (DistributionQueries.nearestRankEdges — only the
    // 9 edge values reach the driver, never the value histogram; VERDICT
    // r04 #6); the integer rule cum*10 >= d*n avoids any float quantile
    // definition mismatch. Output: docs per (source, decile) — the
    // mixing table a curriculum sampler consumes.
    "quality_deciles" -> ((s, dir) => {
      val d = docs(s, dir)
      val thrs = DistributionQueries
        .nearestRankEdges(d.select(col("n_chars")), "n_chars", 10)
      val decile = thrs.foldLeft(lit(0L)) { (acc, t) =>
        acc + when(col("n_chars") > t, 1L).otherwise(0L)
      }
      d.select(col("source"), decile.as("decile"))
        .groupBy("source", "decile").agg(count(lit(1)).as("n"))
    }),

    // J12 as-of join: each purchase attributed to the user's latest
    // strictly-prior click (union + one window — see operators/AsOfJoin
    // for why this beats the range-join plan at scale).
    "j12_asof_join" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/events.parquet")
      AsOfJoin.asOf(
        left = e.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts"),
        right = e.where(col("event_type") === "click")
          .select("user_id", "ts", "event_id"),
        keys = Seq("user_id"), ts = "ts", tie = "event_id",
        payload = Seq("event_id", "ts"))
        .select("event_id", "user_id", "matched_event_id", "matched_ts")
    }),

    // Deterministic TRAINING ORDER — the step between sharding and the
    // loader: a reproducible global shuffle of the corpus. Order key =
    // content hash salted with a literal epoch tag (epoch 2 salts
    // differently and gets an equally deterministic but independent
    // permutation), shard = fingerprint mod |shards| (the same
    // content-keyed router as shard_assign), position = rank of the
    // order key within the shard. ONE exchange on the shard key; each
    // shard ranks only its own slice (corpus/|shards| rows) — never a
    // global sort, and |shards| scales with the cluster (8 here, ~1e5
    // at 100 TB so a shard stays executor-sized). Membership AND order
    // depend only on content + epoch tag, so any two runs (or cluster
    // sizes) emit the identical curriculum.
    "train_order" -> ((s, dir) => {
      import graft.functions.TextFunctions.polyHash
      val byShard = Window.partitionBy(col("shard"))
        .orderBy(col("ok").asc, col("doc_id").asc)
      docs(s, dir)
        .select(col("doc_id"),
          pmod(fingerprint(col("text")), lit(8L)).as("shard"),
          polyHash(concat(lit("epoch1:"), col("text"))).as("ok"))
        .withColumn("pos", row_number().over(byShard).cast("long"))
    }),

    // Collocation mining by pointwise mutual information (Church &
    // Hanks 1990): which adjacent word pairs co-occur far above chance.
    // qpmi = qln(c_ab) + qln(W) − qln(c_a) − qln(c_b) in micro-nats —
    // the logs are summed AFTER quantization so no count PRODUCT is
    // ever formed (c_ab·W wraps int64 past ~3e9 corpus words; four
    // bounded qln terms never can). The count floor keeps rare-pair
    // noise out of the ranking. Scale: one bigram exchange + one
    // unigram exchange, two UNHINTED word-keyed joins (open vocab
    // domain — the lm_* rule: AQE broadcasts small vocabs on its own,
    // big ones degrade to shuffled hash joins), bounded top-k via
    // orderBy+limit (TakeOrderedAndProject).
    "pmi_collocations" -> ((s, dir) => {
      val qln = DistributionQueries.qln _
      val d = docs(s, dir).select(words(col("text")).as("ws"))
      val uni = d.select(explode(col("ws")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c_w"))
      val tot = uni.agg(sum(col("c_w")).as("n_w"))
      val bi = d.select(explode(expr(
          "zip_with(slice(ws, 1, greatest(size(ws)-1, 0)), " +
            "slice(ws, 2, greatest(size(ws)-1, 0)), " +
            "(a, b) -> named_struct('w1', a, 'w2', b))")).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        .where(col("c_ab") >= 5L)
      bi
        .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), "w1")
        .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), "w2")
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
          (qln(col("c_ab")) + qln(col("n_w"))
            - qln(col("c_a")) - qln(col("c_b"))).as("qpmi"))
        .orderBy(col("qpmi").desc, col("w1").asc, col("w2").asc)
        .limit(50)
    }),

    // Corpus diversity per source: distinct-n over corpus 3-grams (the
    // diversity statistic Self-BLEU approximates from the generation
    // side; Zhu et al. 2018 texygen's distinct-n) — a collapsed or
    // templated source shows a low distinct fraction long before its
    // entropy moves. Two-level aggregate: (source, gram) partials with
    // map-side combine absorb within-doc repeats, then a |sources|-row
    // roll-up; one exchange on the composite key, no pair space, no
    // sort.
    "diversity_distinct_n" -> ((s, dir) => {
      // r06: 3-gram strings from the fused native kernel (identical
      // values; the r05 HOF allocated a slice + interpreted a concat
      // lambda per position)
      docs(s, dir)
        .select(col("source"),
          explode(graft.functions.NgramStrings(col("text"), 3)).as("g"))
        .groupBy("source", "g").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(col("c")).as("n_3grams"),
          count(lit(1)).as("n_distinct"))
        .select(col("source"), col("n_3grams"), col("n_distinct"),
          (col("n_distinct").cast("double") /
            col("n_3grams").cast("double")).as("diversity"))
    })
  )

  /** One BPE training stage: pair counts over v{i-1}, top pair by
    * (count desc, pair asc), merge applied via the two-space plain
    * replace (mirrors BpeTokenizer.applyMerge exactly). */
  private def bpeStageSql(i: Int): String = {
    val prev = s"v${i - 1}"
    s"""pc$i AS (SELECT pr, CAST(SUM(freq) AS BIGINT) AS cnt
          FROM (SELECT freq, unnest(
                  CASE WHEN len(a) < 2 THEN []
                       ELSE [a[j]||' '||a[j+1]
                             for j in range(1, len(a))] END) AS pr
                FROM (SELECT freq, string_split(trim(sym), '  ') AS a
                      FROM $prev))
          GROUP BY pr),
        m$i AS (SELECT pr, cnt FROM pc$i
                ORDER BY cnt DESC, pr ASC LIMIT 1),
        v$i AS (SELECT w, freq,
                 replace(sym,
                   ' ' || split_part((SELECT pr FROM m$i), ' ', 1) || '  '
                       || split_part((SELECT pr FROM m$i), ' ', 2) || ' ',
                   ' ' || replace((SELECT pr FROM m$i), ' ', '') || ' ')
                   AS sym
                FROM $prev)"""
  }

  /** v0 (word vocab with two-space char syms) + k training stages. */
  private def bpeCtesSql(k: Int): String =
    (s"""v0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
              '  ' || array_to_string(string_split(w, ''), '  ') || '  '
                AS sym
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE len(w) > 0 GROUP BY w)""" +:
      (1 to k).map(bpeStageSql)).mkString(",\n")

  val oracles: Map[String, String] = Map(
    "pack_bucket_waste" ->
      """WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
                      AS n
                    FROM documents),
          b AS (SELECT CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
                            WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                            WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                            ELSE 1024 END AS bucket, n
                FROM d)
          SELECT CAST(bucket AS BIGINT) AS bucket,
                 COUNT(*) AS n_docs,
                 CAST(SUM(n) AS BIGINT) AS sum_words,
                 CAST(bucket*COUNT(*) - SUM(n) AS BIGINT) AS padding,
                 CAST(bucket*COUNT(*) - SUM(n) AS DOUBLE)
                   / CAST(bucket*COUNT(*) AS DOUBLE) AS waste_frac
          FROM b GROUP BY bucket""",
    "shard_mix_entropy" ->
      s"""WITH grid AS (
           SELECT ((${TextQueries.sqlPolyHash("text")} % 8) + 8) % 8 AS shard,
                  source, CAST(COUNT(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
         by_src AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src
                    FROM grid GROUP BY 1),
         by_shard AS (SELECT shard, CAST(SUM(c) AS BIGINT) AS n_s
                      FROM grid GROUP BY 1),
         tot AS (SELECT CAST(SUM(n_src) AS BIGINT) AS n_total FROM by_src),
         agg AS (SELECT g.shard, n_s,
             CAST(COUNT(*) AS BIGINT) AS n_sources,
             CAST(SUM(c * CAST(floor(ln(CAST(c AS DOUBLE))*1e6) AS BIGINT))
               AS BIGINT) AS qsum,
             CAST(SUM(c *
               (CAST(floor(ln(CAST(c*n_total AS DOUBLE))*1e6) AS BIGINT) -
                CAST(floor(ln(CAST(n_s*n_src AS DOUBLE))*1e6) AS BIGINT)))
               AS BIGINT) AS kl_qsum
           FROM grid g JOIN by_src USING (source)
           JOIN by_shard ON g.shard = by_shard.shard, tot
           GROUP BY g.shard, n_s)
         SELECT shard, n_s AS n_docs, n_sources,
           (CAST(n_s * CAST(floor(ln(CAST(n_s AS DOUBLE))*1e6) AS BIGINT)
              - qsum AS DOUBLE)
             / (CAST(n_s AS DOUBLE) * 1e6)) / 0.6931471805599453
             AS entropy_bits,
           CAST(kl_qsum AS DOUBLE) / (CAST(n_s AS DOUBLE) * 1e6)
             AS kl_to_corpus
         FROM agg""",
    "shard_assign" ->
      s"""SELECT ((${TextQueries.sqlPolyHash("text")} % 8) + 8) % 8 AS shard,
            COUNT(*) AS n_docs,
            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
            CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
          FROM documents GROUP BY 1""",
    "bpe_merges" ->
      s"""WITH ${bpeCtesSql(4)}
          SELECT CAST(1 AS INT) AS step, pr AS pair, cnt FROM m1
          UNION ALL SELECT CAST(2 AS INT), pr, cnt FROM m2
          UNION ALL SELECT CAST(3 AS INT), pr, cnt FROM m3
          UNION ALL SELECT CAST(4 AS INT), pr, cnt FROM m4""",
    // NOTE the DP is relational (recursive CTE over a rolling 4-cell
    // window + a backtrace recursion) rather than a list_reduce fold:
    // DuckDB 1.0's nested-lambda accumulator capture is nondeterministic
    // under parallel execution (observed: same query, different results
    // run-to-run), so the oracle uses only joins/aggregates; max(struct)
    // replays the (score, larger-start) tie-break lexicographically.
    "ulm_viterbi_encode" ->
      """WITH RECURSIVE t AS (SELECT unnest(string_split(text,' ')) AS w
                              FROM documents),
         wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w FROM t
                WHERE len(w) > 0 AND len(w) <= 64 GROUP BY w),
         spans AS (SELECT w, c_w, sp.sta AS sta, sp.ln AS ln,
                     sp.piece AS piece
                   FROM (SELECT w, c_w, unnest(flatten(
                     [[{'sta': i, 'ln': L, 'piece': substr(w, i+1, L)}
                       for L in range(1, least(4, len(w)-i)+1)]
                      for i in range(0, len(w))])) AS sp
                     FROM wc)),
         vocab AS (SELECT piece, CAST(SUM(c_w) AS BIGINT) AS sv
                   FROM spans GROUP BY 1
                   HAVING len(piece) = 1 OR SUM(c_w) >= 8),
         z AS (SELECT CAST(SUM(sv) AS BIGINT) AS z FROM vocab),
         scored AS (SELECT piece,
             CAST(floor(ln(CAST(sv AS DOUBLE))*1e6) AS BIGINT)
             - CAST(floor(ln(CAST(z AS DOUBLE))*1e6) AS BIGINT) AS qs
           FROM vocab, z),
         sp2 AS (SELECT s.w, s.sta, s.sta + s.ln AS e, sc.qs
                 FROM spans s JOIN scored sc USING (piece)),
         dpstep(w, c_w, i, last4, s, bp) AS (
           SELECT w, c_w, 0,
             [{'s': CAST(-1152921504606846976 AS BIGINT), 'bp': -1},
              {'s': CAST(-1152921504606846976 AS BIGINT), 'bp': -1},
              {'s': CAST(-1152921504606846976 AS BIGINT), 'bp': -1},
              {'s': CAST(0 AS BIGINT), 'bp': -1}],
             CAST(0 AS BIGINT), -1
           FROM wc
           UNION ALL
           SELECT w, c_w, i + 1,
             [last4[2], last4[3], last4[4], {'s': best.s, 'bp': best.bp}],
             best.s, best.bp
           FROM (
             SELECT d.w, d.c_w, d.i, first(d.last4) AS last4,
               max({'s': d.last4[4 - d.i + s2.sta].s + s2.qs,
                    'bp': s2.sta}) AS best
             FROM dpstep d
             JOIN sp2 s2 ON s2.w = d.w AND s2.e = d.i + 1
             WHERE d.i + 1 <= len(d.w)
               AND d.last4[4 - d.i + s2.sta].s
                   > CAST(-1152921504606846976 AS BIGINT)
             GROUP BY d.w, d.c_w, d.i)),
         dpfull AS (SELECT w, c_w, i, s, bp FROM dpstep WHERE i > 0),
         bt(w, c_w, pos, piece) AS (
           SELECT w, c_w, len(w), CAST(NULL AS VARCHAR) FROM wc
           UNION ALL
           SELECT b.w, b.c_w, d.bp, substr(b.w, d.bp + 1, b.pos - d.bp)
           FROM bt b JOIN dpfull d ON d.w = b.w AND d.i = b.pos
           WHERE b.pos > 0)
         SELECT piece, CAST(SUM(c_w) AS BIGINT) AS n_uses
         FROM bt WHERE piece IS NOT NULL
         GROUP BY piece ORDER BY n_uses DESC, piece ASC LIMIT 64""",
    "bpe_encode" ->
      s"""WITH ${bpeCtesSql(4)},
          tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
                 CAST(SUM(len(string_split(trim(v.sym), '  '))) AS BIGINT)
                   AS n_bpe_tokens
          FROM tok JOIN v4 v USING (w)
          GROUP BY doc_id""",
    "bpe_fertility" ->
      s"""WITH ${bpeCtesSql(4)},
          tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
                  FROM documents)
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
                 CAST(SUM(len(string_split(trim(v.sym), '  '))) AS BIGINT)
                   AS n_bpe_tokens,
                 CAST(SUM(len(w)) AS BIGINT) AS n_chars,
                 CAST(SUM(len(string_split(trim(v.sym), '  '))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS fertility,
                 CAST(SUM(len(w)) AS DOUBLE)
                   / CAST(SUM(len(string_split(trim(v.sym), '  ')))
                       AS DOUBLE) AS chars_per_token
          FROM tok JOIN v4 v USING (w)
          GROUP BY lang""",
    "mix_budget" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY 1),
          t AS (SELECT SUM(c) AS t FROM c),
          q0 AS (SELECT source, c, (100*c)//t AS base, (100*c)%t AS rem
                 FROM c CROSS JOIN t),
          q AS (SELECT source,
                       base + CASE WHEN ROW_NUMBER() OVER
                           (ORDER BY rem DESC, source ASC)
                         <= 100 - (SELECT SUM(base) FROM q0)
                         THEN 1 ELSE 0 END AS quota
                FROM q0),
          r AS (SELECT source, doc_id,
                       ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY ${TextQueries.sqlPolyHash("text")} ASC,
                                  doc_id ASC) AS rn
                FROM documents)
          SELECT r.source, CAST(q.quota AS BIGINT) AS quota,
                 CAST(rn AS INT) AS rank, doc_id
          FROM r JOIN q USING (source) WHERE rn <= q.quota""",
    "mix_temperature" ->
      s"""WITH c AS (SELECT source,
                 CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS m
               FROM documents GROUP BY 1),
          w AS (SELECT source,
                 CAST(floor(sqrt(CAST(m AS DOUBLE)) * 1048576.0) AS BIGINT)
                   AS qs
               FROM c),
          t AS (SELECT SUM(qs) AS t FROM w),
          q0 AS (SELECT source, qs, (100*qs)//t AS base, (100*qs)%t AS rem
                 FROM w CROSS JOIN t),
          q AS (SELECT source,
                       base + CASE WHEN ROW_NUMBER() OVER
                           (ORDER BY rem DESC, source ASC)
                         <= 100 - (SELECT SUM(base) FROM q0)
                         THEN 1 ELSE 0 END AS quota
                FROM q0),
          r AS (SELECT source, doc_id,
                       ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY ${TextQueries.sqlPolyHash("text")} ASC,
                                  doc_id ASC) AS rn
                FROM documents)
          SELECT r.source, CAST(q.quota AS BIGINT) AS quota,
                 CAST(rn AS INT) AS rank, doc_id
          FROM r JOIN q USING (source) WHERE rn <= q.quota""",
    "mix_epoch_plan" ->
      """WITH c AS (SELECT source,
                 CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS m
               FROM documents GROUP BY 1),
          w AS (SELECT source, m,
                 CAST(floor(sqrt(CAST(m AS DOUBLE)) * 1048576.0) AS BIGINT)
                   AS qs
               FROM c),
          t AS (SELECT SUM(qs) AS qt, SUM(m) AS total FROM w),
          p AS (SELECT source, m,
                  CAST((CAST(total AS HUGEINT) * 2 * qs)//qt AS BIGINT)
                    AS wanted
                FROM w CROSS JOIN t),
          e AS (SELECT source, m, wanted,
                       least((wanted + m - 1)//m, 4) AS epochs
                FROM p)
          SELECT source, CAST(m AS BIGINT) AS avail_tokens,
                 CAST(wanted AS BIGINT) AS wanted_tokens,
                 CAST(epochs AS BIGINT) AS epochs,
                 CAST(least(wanted, epochs*m) AS BIGINT) AS realized_tokens,
                 CAST(wanted - least(wanted, epochs*m) AS BIGINT) AS deficit
          FROM e""",
    "mix_doremi_step" ->
      """WITH sw AS (SELECT source, unnest(string_split(text,' ')) AS w
                FROM documents),
          swc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_sw
                  FROM sw GROUP BY 1, 2),
          cw AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w
                 FROM swc GROUP BY 1),
          per AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s,
                    CAST(SUM(c_sw *
                      CAST(floor(ln(CAST(c_w AS DOUBLE))*1e6) AS BIGINT))
                      AS BIGINT) AS qcw
                  FROM swc JOIN cw USING (w) GROUP BY source),
          t AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_tot,
                       CAST(SUM(qcw) AS BIGINT) AS qcw_tot FROM per),
          x AS (SELECT source, n_s, n_tot,
                  n_s * CAST(floor(ln(CAST(n_tot AS DOUBLE))*1e6)
                    AS BIGINT) - qcw AS qnll_s,
                  n_tot * CAST(floor(ln(CAST(n_tot AS DOUBLE))*1e6)
                    AS BIGINT) - qcw_tot AS qnll_tot
                FROM per CROSS JOIN t),
          y AS (SELECT source, n_s, n_tot, qnll_s,
                  greatest(CAST(0 AS HUGEINT),
                    CAST(qnll_s AS HUGEINT)*n_tot -
                    CAST(qnll_tot AS HUGEINT)*n_s) AS qexc
                FROM x),
          z AS (SELECT source, n_s, n_tot, qnll_s, qexc,
                  CAST(n_s AS HUGEINT)*1000000 + qexc//n_tot AS qw
                FROM y),
          tt AS (SELECT SUM(qw) AS tq FROM z),
          q AS (SELECT z.*, (100*qw)//tq AS base, (100*qw) % tq AS rem
                FROM z CROSS JOIN tt),
          r AS (SELECT *, SUM(base) OVER () AS sumbase,
                  ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rnk
                FROM q)
          SELECT source, n_s AS n_words,
            CAST(qnll_s AS DOUBLE)/(CAST(n_s AS DOUBLE)*1000000.0)
              AS avg_nll,
            CAST(qexc AS DOUBLE)/(CAST(n_s AS DOUBLE)
              *CAST(n_tot AS DOUBLE)*1000000.0) AS excess_nats,
            CAST(base + CASE WHEN rnk <= 100 - sumbase THEN 1 ELSE 0 END
              AS BIGINT) AS quota
          FROM r""",
    "mix_anneal" ->
      """WITH g AS (SELECT source,
                 CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS m,
                 CAST(SUM(CASE WHEN n_chars >= 100
                                AND len(string_split(text,' ')) >= 20
                          THEN len(string_split(text,' '))
                          ELSE 0 END) AS BIGINT) AS hq
               FROM documents GROUP BY 1),
          t AS (SELECT CAST(SUM(m) AS BIGINT) AS tm,
                       CAST(SUM(hq) AS BIGINT) AS th FROM g),
          b AS (SELECT g.*, tm, th, (tm*9)//10 AS mainb,
                       tm - (tm*9)//10 AS annb
                FROM g CROSS JOIN t),
          m0 AS (SELECT *, (CAST(mainb AS HUGEINT)*m)//tm AS mbase,
                        CAST((CAST(mainb AS HUGEINT)*m)%tm AS BIGINT)
                          AS mrem
                 FROM b),
          m1 AS (SELECT *, mbase + CASE WHEN
                     ROW_NUMBER() OVER (ORDER BY mrem DESC, source ASC)
                     <= mainb - (SELECT SUM(mbase) FROM m0)
                   THEN 1 ELSE 0 END AS main_tokens
                 FROM m0),
          a0 AS (SELECT *, (CAST(annb AS HUGEINT)*hq)//th AS abase,
                        CAST((CAST(annb AS HUGEINT)*hq)%th AS BIGINT)
                          AS arem
                 FROM m1),
          a1 AS (SELECT *, abase + CASE WHEN
                     ROW_NUMBER() OVER (ORDER BY arem DESC, source ASC)
                     <= annb - (SELECT SUM(abase) FROM a0)
                   THEN 1 ELSE 0 END AS anneal_tokens
                 FROM a0)
          SELECT source, m AS avail_tokens, hq AS hq_tokens,
                 CAST(main_tokens AS BIGINT) AS main_tokens,
                 CAST(anneal_tokens AS BIGINT) AS anneal_tokens,
                 CAST(main_tokens + anneal_tokens AS BIGINT)
                   AS phase_total,
                 (CAST(anneal_tokens AS DOUBLE) * CAST(tm AS DOUBLE))
                   / (CAST(annb AS DOUBLE) * CAST(m AS DOUBLE))
                   AS anneal_boost
          FROM a1""",
    "tfidf_terms" ->
      """WITH occ AS (SELECT source, doc_id,
                             UNNEST(string_split(text, ' ')) AS word
                      FROM documents),
          tf AS (SELECT source, word, COUNT(*) AS tf FROM occ GROUP BY 1, 2),
          df AS (SELECT word, COUNT(DISTINCT doc_id) AS df
                 FROM occ GROUP BY 1),
          n AS (SELECT COUNT(*) AS n_docs FROM documents),
          sc AS (SELECT source, word, tf, df,
                        tf * (CAST(floor(ln(CAST(n_docs AS DOUBLE))*1e6)
                                AS BIGINT)
                            - CAST(floor(ln(CAST(df AS DOUBLE))*1e6)
                                AS BIGINT)) AS score_q
                 FROM tf JOIN df USING (word) CROSS JOIN n)
          SELECT source, CAST(rank AS INT) AS rank, word, tf, df, score_q
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY score_q DESC, word) AS rank FROM sc)
          WHERE rank <= 5""",
    "ctx_truncation_sweep" ->
      """WITH d AS (SELECT CAST(len(string_split(text,' ')) AS BIGINT)
               AS nw
             FROM documents),
         a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(nw) AS BIGINT) AS tw,
                 CAST(SUM(CASE WHEN nw > 64 THEN 1 ELSE 0 END)
                   AS BIGINT) AS t64,
                 CAST(SUM(LEAST(nw, 64)) AS BIGINT) AS k64,
                 CAST(SUM(CASE WHEN nw > 128 THEN 1 ELSE 0 END)
                   AS BIGINT) AS t128,
                 CAST(SUM(LEAST(nw, 128)) AS BIGINT) AS k128,
                 CAST(SUM(CASE WHEN nw > 256 THEN 1 ELSE 0 END)
                   AS BIGINT) AS t256,
                 CAST(SUM(LEAST(nw, 256)) AS BIGINT) AS k256,
                 CAST(SUM(CASE WHEN nw > 512 THEN 1 ELSE 0 END)
                   AS BIGINT) AS t512,
                 CAST(SUM(LEAST(nw, 512)) AS BIGINT) AS k512
               FROM d),
         s AS (
           SELECT CAST(64 AS BIGINT) AS ctx, n_docs, t64 AS n_truncated,
                  tw AS total_words, k64 AS kept_words FROM a
           UNION ALL
           SELECT CAST(128 AS BIGINT), n_docs, t128, tw, k128 FROM a
           UNION ALL
           SELECT CAST(256 AS BIGINT), n_docs, t256, tw, k256 FROM a
           UNION ALL
           SELECT CAST(512 AS BIGINT), n_docs, t512, tw, k512 FROM a)
         SELECT ctx, n_docs, n_truncated, total_words, kept_words,
                1.0 - CAST(kept_words AS DOUBLE)
                  / CAST(total_words AS DOUBLE) AS trunc_waste
         FROM s""",
    "seq_pack" ->
      """WITH d AS (SELECT source, doc_id,
             CAST(len(string_split(text,' ')) AS BIGINT) AS n_words
           FROM documents),
         c AS (SELECT *, COALESCE(SUM(n_words) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
               FROM d)
         SELECT source, doc_id, n_words,
                CAST(cum_before // 64 AS BIGINT) AS first_chunk,
                CAST((cum_before + n_words - 1) // 64 AS BIGINT) AS last_chunk,
                CAST(((cum_before + n_words - 1) // 64) - (cum_before // 64)
                  + 1 AS BIGINT) AS n_chunks
         FROM c""",
    "chunk_sliding" ->
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS toks,
                CAST(len(string_split(text,' ')) AS BIGINT) AS n
              FROM documents),
          c AS (SELECT *, CASE WHEN n <= 32 THEN 1
                               ELSE 1 + (n - 32 + 23) // 24 END AS n_chunks
                FROM d),
          e AS (SELECT doc_id, toks, n, unnest(range(n_chunks)) AS ci
                FROM c),
          s AS (SELECT doc_id, toks, n, ci,
                       CASE WHEN n <= 32 THEN 1
                            ELSE least(ci*24, n-32) + 1 END AS start_word
                FROM e)
          SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
                 CAST(start_word AS BIGINT) AS start_word,
                 CAST(least(32, n) AS BIGINT) AS n_words,
                 ${TextQueries.sqlPolyHash(
                   "array_to_string(toks[start_word:start_word+31], ' ')")}
                   AS chunk_fp
          FROM s""",
    "ngram_topk" ->
      """WITH d AS (SELECT string_split(text,' ') AS ws FROM documents),
         b AS (SELECT ws[i] || ' ' || ws[i+1] AS bigram
               FROM d, unnest(range(1, len(ws))) AS t(i))
         SELECT bigram, COUNT(*) AS n FROM b GROUP BY 1
         ORDER BY n DESC, bigram ASC LIMIT 50""",
    "ngram_cms_est" ->
      s"""WITH d AS (SELECT string_split(text,' ') AS ws FROM documents),
         b0 AS (SELECT ws[i] || ' ' || ws[i+1] AS bigram
                FROM d, unnest(range(1, len(ws))) AS t(i)),
         b AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS exact,
                 ${TextQueries.sqlPolyHash("bigram")} AS h
               FROM b0 GROUP BY bigram),
         rc(r, a, bb) AS (VALUES
           (0, CAST(31 AS BIGINT), CAST(7 AS BIGINT)),
           (1, CAST(131 AS BIGINT), CAST(101 AS BIGINT)),
           (2, CAST(1031 AS BIGINT), CAST(997 AS BIGINT)),
           (3, CAST(8191 AS BIGINT), CAST(7919 AS BIGINT))),
         hh AS (SELECT bigram, exact, r,
                  ((h * a + bb) % 1000000007) % 1024 AS bkt
                FROM b, rc),
         cells AS (SELECT r, bkt, CAST(SUM(exact) AS BIGINT) AS cell
                   FROM hh GROUP BY r, bkt),
         est AS (SELECT bigram, CAST(MIN(cell) AS BIGINT) AS est
                 FROM hh JOIN cells USING (r, bkt) GROUP BY bigram),
         top AS (SELECT bigram, exact FROM b
                 ORDER BY exact DESC, bigram ASC LIMIT 10)
         SELECT top.bigram, top.exact, est.est,
                est.est - top.exact AS overestimate
         FROM top JOIN est ON top.bigram = est.bigram""",
    "bm25_score" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents),
         dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
         tf AS (SELECT doc_id, w, COUNT(*) AS tf
                FROM (SELECT doc_id, unnest(ws) AS w FROM d)
                WHERE w IN ('table','row','scan','key',
                            'hash','value','spark','sort')
                GROUP BY 1,2),
         df AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                       CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                         AS avgdl
                FROM dl),
         sc AS (SELECT tf.w AS term, tf.doc_id,
                  ((CAST(tf.tf AS DOUBLE) * 2.2) /
                   (CAST(tf.tf AS DOUBLE) +
                    (1.2 * (0.25 +
                      (0.75 * (CAST(dl.dl AS DOUBLE) / st.avgdl)))))) *
                  (((st.n_docs - df.df) + 0.5) / (df.df + 0.5)) AS score
                FROM tf JOIN dl USING (doc_id) JOIN df ON tf.w = df.w, st)
         SELECT term, rank, doc_id, score FROM (
           SELECT term, doc_id, score,
                  CAST(ROW_NUMBER() OVER (PARTITION BY term
                    ORDER BY score DESC, doc_id ASC) AS INT) AS rank
           FROM sc) WHERE rank <= 5""",
    "mix_sample" ->
      s"""WITH f AS (SELECT source, doc_id,
             ${TextQueries.sqlPolyHash("text")} AS fp FROM documents)
         SELECT source, doc_id, fp FROM f
         WHERE fp % 10000 < CASE source WHEN 'src0' THEN 5000
           WHEN 'src1' THEN 2500 WHEN 'src2' THEN 1000 ELSE 500 END""",
    "seq_pack_stats" ->
      """WITH a AS (SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CAST(len(string_split(text,' ')) AS BIGINT)) AS BIGINT)
               AS total_words
           FROM documents GROUP BY 1)
         SELECT source, n_docs, total_words,
                (total_words + 63) // 64 AS n_chunks,
                ((total_words + 63) // 64) * 64 - total_words AS pad_words,
                CAST(((total_words + 63) // 64) * 64 - total_words AS DOUBLE)
                  / CAST(((total_words + 63) // 64) * 64 AS DOUBLE)
                  AS pad_frac
         FROM a""",
    "quality_deciles" ->
      """WITH h AS (SELECT n_chars AS v, COUNT(*) AS c
                    FROM documents GROUP BY 1),
         cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM h),
         tot AS (SELECT COUNT(*) AS n FROM documents),
         t AS (SELECT d, MIN(v) AS thr
               FROM cum, tot, unnest(range(1,10)) AS r(d)
               WHERE cum * 10 >= d * n GROUP BY d),
         b AS (SELECT source,
                 (SELECT COUNT(*) FROM t WHERE documents.n_chars > t.thr)
                   AS decile
               FROM documents)
         SELECT source, CAST(decile AS BIGINT) AS decile, COUNT(*) AS n
         FROM b GROUP BY 1,2""",
    "j12_asof_join" ->
      """WITH ev AS (
           SELECT user_id, ts, event_id, event_type,
                  CASE WHEN event_type='purchase' THEN 0 ELSE 1 END AS side
           FROM events WHERE event_type IN ('purchase','click')),
         w AS (
           SELECT user_id, ts, event_id, event_type,
                  last_value(CASE WHEN event_type='click' THEN event_id END
                    IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS matched_event_id,
                  last_value(CASE WHEN event_type='click' THEN ts END
                    IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS matched_ts
           FROM ev)
         SELECT event_id, user_id, matched_event_id, matched_ts
         FROM w WHERE event_type='purchase'""",
    "train_order" ->
      s"""WITH f AS (SELECT doc_id,
             ((${TextQueries.sqlPolyHash("text")} % 8) + 8) % 8 AS shard,
             ${TextQueries.sqlPolyHash("'epoch1:' || text")} AS ok
           FROM documents)
         SELECT doc_id, shard, ok,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
             ORDER BY ok ASC, doc_id ASC) AS BIGINT) AS pos
         FROM f""",
    "pmi_collocations" ->
      """WITH d AS (SELECT string_split(text,' ') AS ws FROM documents),
         uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w
                 FROM (SELECT unnest(ws) AS w FROM d) GROUP BY 1),
         tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_w FROM uni),
         bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
                FROM (SELECT ws[i] AS w1, ws[i+1] AS w2
                      FROM d, unnest(range(1, len(ws))) AS t(i))
                GROUP BY 1,2 HAVING COUNT(*) >= 5),
         j AS (SELECT b.w1, b.w2, b.c_ab, a.c_w AS c_a, c.c_w AS c_b,
                      tot.n_w
               FROM bi b JOIN uni a ON b.w1 = a.w
                         JOIN uni c ON b.w2 = c.w, tot)
         SELECT w1, w2, c_ab, c_a, c_b,
           CAST(floor(ln(CAST(c_ab AS DOUBLE))*1e6) AS BIGINT)
             + CAST(floor(ln(CAST(n_w AS DOUBLE))*1e6) AS BIGINT)
             - CAST(floor(ln(CAST(c_a AS DOUBLE))*1e6) AS BIGINT)
             - CAST(floor(ln(CAST(c_b AS DOUBLE))*1e6) AS BIGINT) AS qpmi
         FROM j
         ORDER BY qpmi DESC, w1 ASC, w2 ASC LIMIT 50""",
    "diversity_distinct_n" ->
      """WITH d AS (SELECT source, string_split(text,' ') AS w
                    FROM documents),
         g AS (SELECT source, w[i]||' '||w[i+1]||' '||w[i+2] AS g
               FROM d, unnest(range(1, len(w)-1)) AS t(i)),
         c AS (SELECT source, g, COUNT(*) AS c FROM g GROUP BY 1,2)
         SELECT source, CAST(SUM(c) AS BIGINT) AS n_3grams,
                CAST(COUNT(*) AS BIGINT) AS n_distinct,
                CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                  AS diversity
         FROM c GROUP BY 1"""
  )
}
