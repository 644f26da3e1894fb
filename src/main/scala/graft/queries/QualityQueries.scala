package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.TopKByScoreAggregate
import graft.operators.LinearModel

/**
 * Learned quality filtering + weighted sampling over `documents` — the
 * model-in-the-loop half of a curation pipeline (the rule-based half lives
 * in [[TextQueries]] / [[graft.rules.RuleEngine]]).
 *
 * Everything here is bit-portable: the classifier trains with quantized
 * int64 gradient sums ([[LinearModel]]), the sampler keys on the verified
 * quantized-log transform ([[DistributionQueries.qln]]), so every query
 * has a full DuckDB oracle including the training loop itself.
 */
object QualityQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private val XCols = Seq("x1", "x2", "x3")
  private val Iters = 4
  private val Lr = 0.5 // power of two: the lr multiply is exact

  /** Feature/label table for the quality classifier: capped length,
    * type-token ratio, stopword ratio; label = the rule-based
    * quality_class from `text_quality` (the model learns the boundary the
    * rule chain draws, so label agreement is checkable). Narrow (4 doubles
    * + id) — at 100 TB this is computed once from text and persisted;
    * training re-scans never touch raw bytes. */
  private def features(d: DataFrame): DataFrame = {
    // r06: counters from the fused RepStats kernel (the r05 projection
    // re-split the text ~5x per row), materialized ONCE via
    // localCheckpoint — training collects and the final scoring scan
    // all read the same instance-keyed materialization, which (unlike
    // the r05 plan-keyed persist) cannot survive into a later
    // invocation, and needs no caller unpersist bookkeeping. The
    // fraction arithmetic reproduces the r05 int->double promotions
    // exactly.
    val rc = graft.functions.RepStats(col("text"))
    d.select(col("doc_id"), col("source"), col("n_chars"), rc.as("rc"))
      .select(
        col("doc_id"),
        col("source"),
        col("rc.nw").cast("long").as("nw"),
        (least(col("rc.nw"), lit(400)).cast("double") / lit(400.0))
          .as("x1"),
        (col("rc.dw").cast("double") / col("rc.nw")).as("x2"),
        (col("rc.nsw").cast("double") / col("rc.nw")).as("x3"),
        when(col("n_chars") >= 100 && col("rc.nw") >= 20, lit(1.0))
          .otherwise(lit(0.0)).as("y"))
      .localCheckpoint()
  }

  /** Standardize (bit-portable moments, [[LinearModel.fitStandardizer]])
    * then train — unscaled quality features are ill-conditioned (means
    * near 1, correlated with the bias) and LMS would crawl. Caller
    * persists `f`; everything here re-scans only the persisted features. */
  private def zFeatures(f: DataFrame): DataFrame = {
    val (mus, sds) = LinearModel.fitStandardizer(f, XCols)
    LinearModel.standardize(f, XCols, mus, sds)
  }

  private def trainedWeights(zf: DataFrame): Array[Double] =
    LinearModel.lmsTrain(zf, XCols, "y", Iters, Lr)

  // Efraimidis–Spirakis weighted sampling key, derandomized: the uniform
  // draw u is the doc's content fingerprint mapped into (0,1) as
  // num/999984 with num = 1 + fp mod 999983, and ln(u) rides the verified
  // quantized log (qln(num) − qln(999984), an integer). key = ~ln(u)/w:
  // per source, the k LARGEST keys are the sample, so P(selected) rises
  // with weight w exactly as in the randomized algorithm.
  private val QlnDen: Long = math.floor(math.log(999984.0) * 1e6).toLong

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Quality-gate ABLATION — the filter-design table curation reports
    // publish (RefinedWeb/FineWeb style): for each gate, how many docs it
    // flags, how many ONLY it flags (its marginal contribution — a gate
    // with n_only ≈ 0 is redundant with the others), and the word mass it
    // would remove. Gates are the pipeline's own rules: the length gate
    // (text_quality's class), the repetition gate (text_repetition's
    // class), and the language gate (text_langid's pred). ONE corpus scan
    // computing three booleans, one 1-row aggregate, a 4-row stack — no
    // shuffle wider than the agg partials.
    "quality_ablation" -> ((s, dir) => {
      // r06: the gate counters ride ONE fused codegen'd pass
      // (RepStats) — the r05 projection re-evaluated split(text) ~12x
      // and the 3-gram slice+concat lambda 3x per row. The fractions
      // and thresholds below reproduce the r05 arithmetic over the
      // counters exactly (same int->double promotions).
      val rc = graft.functions.RepStats(col("text"))
      def dupFrac(d: org.apache.spark.sql.Column,
          n: org.apache.spark.sql.Column) =
        when(n > 0, lit(1.0) - d.cast("double") / n).otherwise(lit(0.0))
      val flags = docs(s, dir)
        .select(col("n_chars"), rc.as("rc"))
        .select(
          col("rc.nw").cast("long").as("nw"),
          (!(col("n_chars") >= 100 && col("rc.nw") >= 20)).as("gl"),
          (dupFrac(col("rc.dw"), col("rc.nw")) > 0.6 ||
            dupFrac(col("rc.d3"), col("rc.n3")) > 0.2).as("gr"),
          ((col("rc.nsw").cast("double") / col("rc.nw")) <= 0.03).as("gg"))
      def n(c: org.apache.spark.sql.Column) =
        sum(when(c, 1L).otherwise(0L))
      def wm(c: org.apache.spark.sql.Column) =
        sum(when(c, col("nw")).otherwise(0L))
      val anyG = col("gl") || col("gr") || col("gg")
      flags.agg(
          n(col("gl")).as("l_n"),
          n(col("gl") && !col("gr") && !col("gg")).as("l_only"),
          wm(col("gl")).as("l_w"),
          n(col("gr")).as("r_n"),
          n(col("gr") && !col("gl") && !col("gg")).as("r_only"),
          wm(col("gr")).as("r_w"),
          n(col("gg")).as("g_n"),
          n(col("gg") && !col("gl") && !col("gr")).as("g_only"),
          wm(col("gg")).as("g_w"),
          n(anyG).as("any_n"),
          wm(anyG).as("any_w"))
        .selectExpr(
          """stack(4,
               'length', l_n, l_only, l_w,
               'repetition', r_n, r_only, r_w,
               'language', g_n, g_only, g_w,
               'any', any_n, l_only + r_only + g_only, any_w)
             AS (gate, n_flagged, n_only, words_flagged)""")
    }),
    // TRAINED quality-classifier weights: 3 full-batch LMS iterations,
    // quantized int64 gradient sums — the oracle replays training
    // bit-for-bit (the learned analog of ann_kmeans_codebook).
    "quality_lr_weights" -> ((s, dir) => {
      import s.implicits._
      val f = features(docs(s, dir))
      val w = trainedWeights(zFeatures(f))
      w.zipWithIndex.map { case (v, j) => (j, v) }.toSeq.toDF("j", "w")
    }),

    // Per-doc scores from the trained model: score = w·z as a pure
    // projection (zero scoring shuffles), thresholded at 0.5 against the
    // rule-based label. The oracle replays standardization, training AND
    // scoring.
    "quality_lr_score" -> ((s, dir) => {
      val f = features(docs(s, dir))
      val zf = zFeatures(f)
      val w = trainedWeights(zf)
      zf.select(
          col("doc_id"),
          LinearModel.predict(w, XCols).as("score"),
          col("y"))
        .select(col("doc_id"), col("score"),
          when(col("score") >= 0.5, 1).otherwise(0).as("pred_good"),
          col("y").cast("int").as("label_good"))
    }),

    // Per-source CONFUSION MATRIX of the trained classifier against the
    // rule-based label — the calibration/agreement audit a learned
    // quality gate ships with (where does the model disagree with the
    // rule chain, and is the disagreement concentrated in one source?).
    // Training is the verified bit-portable loop; the confusion roll-up
    // is one aggregation over the scored feature table (scoring itself
    // is a zero-shuffle projection over literal weights).
    "quality_confusion" -> ((s, dir) => {
      val f = features(docs(s, dir))
      val zf = zFeatures(f)
      val w = trainedWeights(zf)
      zf.select(col("source"),
          when(LinearModel.predict(w, XCols) >= 0.5, 1).otherwise(0)
            .as("pred"),
          col("y").cast("int").as("label"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") === 1 && col("label") === 1, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("pred") === 1 && col("label") === 0, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("pred") === 0 && col("label") === 1, 1L)
            .otherwise(0L)).as("fn"),
          sum(when(col("pred") === 0 && col("label") === 0, 1L)
            .otherwise(0L)).as("tn"))
        .withColumn("accuracy",
          (col("tp") + col("tn")).cast("double") / col("n").cast("double"))
    }),

    // RELIABILITY / CALIBRATION curve of the trained classifier — the
    // third standard model audit next to quality_confusion and
    // quality_ablation (is the SCORE trustworthy as a probability, not
    // just the thresholded verdict?): predicted score binned into ten
    // equal-width bins (clamped — LMS output is linear, so out-of-range
    // predictions land in the edge bins), per bin the doc count, the
    // observed positive rate, and the exact quantized mean predicted
    // score. A calibrated gate has mean_pred ≈ obs_rate per bin; a
    // divergence localizes where thresholding on the score misleads.
    // Training is the verified bit-portable loop; the curve is one
    // projection + one ≤10-row aggregate (per-row floor(score·2^20)
    // int64 quantization makes the bin means integer-exact).
    "quality_calibration" -> ((s, dir) => {
      val f = features(docs(s, dir))
      val zf = zFeatures(f)
      val w = trainedWeights(zf)
      val score = LinearModel.predict(w, XCols)
      zf.select(
          greatest(least(floor(score * 10).cast("int"), lit(9)), lit(0))
            .as("bin"),
          floor(score * 1048576.0).cast("long").as("qs"),
          col("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          sum(col("y").cast("long")).as("n_pos"),
          sum(col("qs")).as("q_pred_sum"))
        .select(col("bin"), col("n"), col("n_pos"), col("q_pred_sum"),
          (col("q_pred_sum").cast("double") /
            (col("n").cast("double") * 1048576.0)).as("mean_pred"),
          (col("n_pos").cast("double") / col("n").cast("double"))
            .as("obs_rate"))
    }),

    // OPERATING-POINT sweep of the trained gate — the precision/recall/
    // retention table that picks the production threshold (AUC says the
    // gate ranks; this says what each cut actually costs): per candidate
    // threshold t, docs retained, word mass retained, precision and
    // recall vs the rule-based label. Five thresholds fold into 15 agg
    // columns over ONE scan of the persisted feature table + a 5-row
    // stack (the ctx_truncation_sweep shape) — scoring is a
    // literal-weights projection, nothing sorts, nothing joins.
    // Zero-retention cuts emit NULL precision (no 0/0).
    "quality_pr_sweep" -> ((s, dir) => {
      val f = features(docs(s, dir))
      val zf = zFeatures(f)
      val w = trainedWeights(zf)
      val sc = zf.select(
        LinearModel.predict(w, XCols).as("sc"), col("y"), col("nw"))
      val ts = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
      val aggs = ts.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when(col("sc") >= t, 1L).otherwise(0L)).as(s"r$i"),
        sum(when(col("sc") >= t, col("nw")).otherwise(0L)).as(s"m$i"),
        sum(when(col("sc") >= t && col("y") === 1.0, 1L).otherwise(0L))
          .as(s"t$i")) }
      val base = Seq(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("total_words"),
        sum(col("y").cast("long")).as("n_pos")) ++ aggs
      sc.agg(base.head, base.tail: _*)
        .selectExpr(
          s"""stack(${ts.length}, ${ts.zipWithIndex.map { case (t, i) =>
               s"CAST($t AS DOUBLE), n_docs, total_words, n_pos, " +
                 s"r$i, m$i, t$i" }.mkString(", ")})
             AS (threshold, n_docs, total_words, n_pos, n_retained,
                 words_retained, tp)""")
        .select(col("threshold"), col("n_docs"), col("total_words"),
          col("n_pos"), col("n_retained"), col("words_retained"),
          when(col("n_retained") > 0L, col("tp").cast("double")
            / col("n_retained").cast("double")).as("precision"),
          (col("tp").cast("double") / col("n_pos").cast("double"))
            .as("recall"))
    }),

    // Threshold-free RANKING audit of the trained classifier: ROC AUC by
    // the Mann-Whitney rank identity over a BOUNDED score histogram —
    // scores quantized into 4096 bins (edge-clamped like the calibration
    // curve), AUC = Σ_bins (neg_below + neg_b/2)·pos_b / (n_pos·n_neg),
    // exact integer arithmetic via the ×2 trick (no half-counts). Per
    // source, so a gate that ranks well globally but INVERTS inside one
    // feed is visible. The corpus never sorts: scoring is a
    // literal-weights projection, the histogram is one agg to a
    // |sources|×≤4096 grid, the cumulative is a grid-sized window, and
    // the rank products ride decimal(38,0) (pos·neg wraps int64 past
    // ~3e9 rows per source).
    "quality_auc" -> ((s, dir) => {
      val f = features(docs(s, dir))
      val zf = zFeatures(f)
      val w = trainedWeights(zf)
      val score = LinearModel.predict(w, XCols)
      val cells = zf.select(
          col("source"),
          greatest(least(floor(score * 4096).cast("long"), lit(4095L)),
            lit(0L)).as("bin"),
          col("y"))
        .groupBy("source", "bin")
        .agg(sum(col("y").cast("long")).as("pos"),
          sum(when(col("y") === 0.0, 1L).otherwise(0L)).as("neg"))
      val wlo = Window.partitionBy(col("source")).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, -1)
      cells
        .withColumn("neg_below",
          coalesce(sum(col("neg")).over(wlo), lit(0L)))
        .groupBy("source")
        .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
          sum(expr("CAST(2*neg_below + neg AS DECIMAL(38,0)) * pos"))
            .as("num2"))
        .filter(col("n_pos") > 0 && col("n_neg") > 0)
        .select(col("source"), col("n_pos"), col("n_neg"),
          (col("num2").cast("double") /
            (lit(2.0) * col("n_pos").cast("double")
              * col("n_neg").cast("double"))).as("auc"))
    }),

    // DSIR-style importance weights (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling" — public
    // algorithm): hashed unigram features (polyHash(word) mod 64
    // buckets), per-doc weight = Σ_occurrences log(p_target(b)/p_raw(b))
    // with Laplace +1 smoothing on both sides. Target = the held-out
    // benchmark split (every 50th doc — the same split the
    // decontamination operators verify), raw = the rest; a raw doc
    // scoring HIGH is distributionally close to the target and gets
    // up-sampled. INTEGER-exact: the per-bucket log-ratio
    //   qlr_b = (qln(ct_b+1) − qln(Nt+B)) − (qln(cs_b+1) − qln(Ns+B))
    // rides the shared quantized log; per-doc sums are int64.
    // Scale shape: ONE corpus word exchange (groupBy (doc_id, bucket));
    // both bucket grids are B=64 rows, broadcast back; the per-doc
    // roll-up is the only other shuffle.
    "dsir_weight" -> ((s, dir) => {
      val B = 64
      val d = docs(s, dir)
      def occ(df: DataFrame) = df
        .select(col("doc_id"),
          explode(wordHashes(col("text"))).as("h"))
        .select(col("doc_id"), pmod(col("h"), lit(B.toLong)).as("b"))
      val raw = occ(d.filter(col("doc_id") % 50 =!= 0))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("c_db"))
      val tgt = occ(d.filter(col("doc_id") % 50 === 0))
        .groupBy("b").agg(count(lit(1)).as("ct"))
      val srcg = raw.groupBy("b").agg(sum("c_db").as("cs"))
      val grid = s.range(B).toDF("b")
        .join(tgt, Seq("b"), "left").na.fill(0L, Seq("ct"))
        .join(srcg, Seq("b"), "left").na.fill(0L, Seq("cs"))
      val tots = grid.agg(sum("ct").as("nt"), sum("cs").as("ns"))
      val qln = DistributionQueries.qln _
      val lr = grid.crossJoin(broadcast(tots))
        .select(col("b"),
          ((qln(col("ct") + 1L) - qln(col("nt") + lit(B.toLong)))
            - (qln(col("cs") + 1L) - qln(col("ns") + lit(B.toLong))))
            .as("qlr"))
      raw.join(broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(sum(col("c_db")).as("n_words"),
          sum(col("c_db") * col("qlr")).as("qweight"))
        .select(col("doc_id"), col("n_words"), col("qweight"),
          (col("qweight").cast("double")
            / (col("n_words").cast("double") * lit(1e6))).as("dsir_score"))
    }),

    // Deterministic WEIGHTED k-sample per source (weight = n_words, so
    // longer docs are proportionally likelier — the token-budget-aware
    // sampler): Efraimidis–Spirakis keys on the fingerprint-derived
    // uniform, bounded TopKByScoreAggregate (≤ k state per (source, task),
    // no per-group window reducer — same scale shape as
    // sample_stratified).
    "sample_weighted" -> ((s, dir) => {
      val wgt = size(words(col("text"))).cast("long")
      val uNum = pmod(fingerprint(col("text")), lit(999983L)) + lit(1L)
      val key = (DistributionQueries.qln(uNum) - lit(QlnDen)).cast("double") /
        wgt.cast("double")
      docs(s, dir)
        .select(col("source"), col("doc_id"), key.as("k"))
        .groupBy("source")
        .agg(TopKByScoreAggregate.topK(col("k"), col("doc_id"), 25).as("tk"))
        .select(col("source"), posexplode(col("tk")).as(Seq("r0", "e")))
        .select(col("source"), (col("r0") + 1).cast("int").as("rank"),
          col("e.neighbor_id").as("doc_id"), col("e.cos").as("es_key"))
    })
  )

  // --- oracle SQL ---

  // feature table + example count, shared by both classifier oracles;
  // x1/x2 mirror TextQueries' oracles, x3 is the shared sqlStopRatio
  // fragment, y the text_quality rule.
  private val featsSql: String =
    s"""feats AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text,' ')) AS BIGINT) AS nw,
                 CAST(LEAST(len(string_split(text,' ')), 400) AS DOUBLE)
                   / 400.0 AS x1,
                 CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                   / len(string_split(text,' ')) AS x2,
                 ${TextQueries.sqlStopRatio} AS x3,
                 CASE WHEN n_chars >= 100
                           AND len(string_split(text,' ')) >= 20
                      THEN CAST(1.0 AS DOUBLE)
                      ELSE CAST(0.0 AS DOUBLE) END AS y
          FROM documents),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM feats),
        ${standardizeSql},
        w0c AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
                       CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3)"""

  // standardization: quantized int64 moment sums, then (x − mu)/sd with
  // the exact op order of LinearModel.fitStandardizer/standardize (sqrt
  // is IEEE-correctly-rounded in both engines). A def, not a val:
  // featsSql interpolates it and vals initialize in declaration order.
  private def standardizeSql: String = {
    val js = 1 to 3
    val moms = js.map { j =>
      s"""CAST(SUM(CAST(floor(x$j * 1048576.0) AS BIGINT)) AS BIGINT)
            AS a$j,
          CAST(SUM(CAST(floor(x$j * x$j * 1048576.0) AS BIGINT)) AS BIGINT)
            AS b$j"""
    }.mkString(",\n")
    val mus = js.map { j =>
      s"(CAST(a$j AS DOUBLE)/1048576.0)/(SELECT n FROM nn) AS mu$j"
    }.mkString(", ")
    val vars = js.map { j =>
      s"""(CAST(o.b$j AS DOUBLE)/1048576.0)/(SELECT n FROM nn)
            - m.mu$j*m.mu$j AS v$j"""
    }.mkString(", ")
    val sdSel = js.map { j =>
      s"CASE WHEN v$j > 1e-12 THEN sqrt(v$j) " +
        s"ELSE CAST(1.0 AS DOUBLE) END AS sd$j"
    }.mkString(", ")
    val zSel = js.map { j =>
      s"(f.x$j - s.mu$j)/s.sd$j AS x$j"
    }.mkString(", ")
    s"""mom AS (SELECT $moms FROM feats),
        mus AS (SELECT $mus FROM mom),
        sds AS (SELECT mu1, mu2, mu3, $sdSel
                FROM (SELECT m.mu1, m.mu2, m.mu3, $vars
                      FROM mus m, mom o)),
        zf AS (SELECT f.doc_id, f.source, f.nw, $zSel, f.y
               FROM feats f, sds s)"""
  }

  // w·z with the exact fold order LinearModel.predict emits
  private val predSql = "(w.w0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3)"

  /** One LMS iteration: quantized int64 gradient sums, then the update
    * with the exact op order of LinearModel.lmsTrain. */
  private def lmsStepSql(prev: String, grad: String, out: String): String = {
    def g(xf: String) =
      s"CAST(SUM(CAST(floor(($predSql - f.y)$xf * 1048576.0) " +
        s"AS BIGINT)) AS BIGINT)"
    def upd(wn: String, gn: String) =
      s"w.$wn - 0.5 * (CAST(g.$gn AS DOUBLE) / 1048576.0) " +
        s"/ (SELECT n FROM nn) AS $wn"
    s"""$grad AS (
          SELECT ${g("")} AS g0,
                 ${g(" * f.x1")} AS g1,
                 ${g(" * f.x2")} AS g2,
                 ${g(" * f.x3")} AS g3
          FROM zf f, $prev w),
        $out AS (
          SELECT ${upd("w0", "g0")}, ${upd("w1", "g1")},
                 ${upd("w2", "g2")}, ${upd("w3", "g3")}
          FROM $prev w, $grad g)"""
  }

  private val trainSql: String =
    s"""$featsSql,
        ${lmsStepSql("w0c", "g1", "w1c")},
        ${lmsStepSql("w1c", "g2", "w2c")},
        ${lmsStepSql("w2c", "g3", "w3c")},
        ${lmsStepSql("w3c", "g4", "w4c")}"""

  val oracles: Map[String, String] = Map(
    "quality_ablation" ->
      s"""WITH base AS (
            SELECT doc_id, n_chars, text, string_split(text,' ') AS w
            FROM documents),
          grams AS (
            SELECT *, CASE WHEN len(w) < 3 THEN []
                           ELSE [w[i]||' '||w[i+1]||' '||w[i+2]
                                 for i in range(1, len(w)-1)] END AS g3
            FROM base),
          fl AS (
            SELECT CAST(len(w) AS BIGINT) AS nw,
                   NOT (n_chars >= 100 AND len(w) >= 20) AS gl,
                   ((CASE WHEN len(w) > 0
                          THEN 1 - CAST(len(list_distinct(w)) AS DOUBLE)
                                   / len(w)
                          ELSE 0.0 END) > 0.6
                    OR (CASE WHEN len(g3) > 0
                             THEN 1 - CAST(len(list_distinct(g3)) AS DOUBLE)
                                      / len(g3)
                             ELSE 0.0 END) > 0.2) AS gr,
                   (${TextQueries.sqlStopRatio} <= 0.03) AS gg
            FROM grams),
          a AS (
            SELECT
              SUM(CASE WHEN gl THEN 1 ELSE 0 END) AS l_n,
              SUM(CASE WHEN gl AND NOT gr AND NOT gg THEN 1 ELSE 0 END)
                AS l_only,
              SUM(CASE WHEN gl THEN nw ELSE 0 END) AS l_w,
              SUM(CASE WHEN gr THEN 1 ELSE 0 END) AS r_n,
              SUM(CASE WHEN gr AND NOT gl AND NOT gg THEN 1 ELSE 0 END)
                AS r_only,
              SUM(CASE WHEN gr THEN nw ELSE 0 END) AS r_w,
              SUM(CASE WHEN gg THEN 1 ELSE 0 END) AS g_n,
              SUM(CASE WHEN gg AND NOT gl AND NOT gr THEN 1 ELSE 0 END)
                AS g_only,
              SUM(CASE WHEN gg THEN nw ELSE 0 END) AS g_w,
              SUM(CASE WHEN gl OR gr OR gg THEN 1 ELSE 0 END) AS any_n,
              SUM(CASE WHEN gl OR gr OR gg THEN nw ELSE 0 END) AS any_w
            FROM fl)
          SELECT 'length' AS gate, CAST(l_n AS BIGINT) AS n_flagged,
                 CAST(l_only AS BIGINT) AS n_only,
                 CAST(l_w AS BIGINT) AS words_flagged FROM a
          UNION ALL
          SELECT 'repetition', CAST(r_n AS BIGINT),
                 CAST(r_only AS BIGINT), CAST(r_w AS BIGINT) FROM a
          UNION ALL
          SELECT 'language', CAST(g_n AS BIGINT),
                 CAST(g_only AS BIGINT), CAST(g_w AS BIGINT) FROM a
          UNION ALL
          SELECT 'any', CAST(any_n AS BIGINT),
                 CAST(l_only + r_only + g_only AS BIGINT),
                 CAST(any_w AS BIGINT) FROM a""",
    "quality_lr_weights" ->
      s"""WITH $trainSql
          SELECT 0 AS j, w0 AS w FROM w4c
          UNION ALL SELECT 1 AS j, w1 AS w FROM w4c
          UNION ALL SELECT 2 AS j, w2 AS w FROM w4c
          UNION ALL SELECT 3 AS j, w3 AS w FROM w4c""",
    "quality_lr_score" ->
      s"""WITH $trainSql
          SELECT f.doc_id, $predSql AS score,
                 CASE WHEN $predSql >= 0.5 THEN 1 ELSE 0 END AS pred_good,
                 CAST(f.y AS INT) AS label_good
          FROM zf f, w4c w""",
    "quality_confusion" ->
      s"""WITH $trainSql,
          cf AS (
            SELECT f.source, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN $predSql >= 0.5 AND f.y = 1.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN $predSql >= 0.5 AND f.y = 0.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN $predSql < 0.5 AND f.y = 1.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                   CAST(SUM(CASE WHEN $predSql < 0.5 AND f.y = 0.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS tn
            FROM zf f, w4c w GROUP BY f.source)
          SELECT source, n, tp, fp, fn, tn,
                 CAST(tp + tn AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy
          FROM cf""",
    "quality_calibration" ->
      s"""WITH $trainSql,
          sc AS (
            SELECT GREATEST(LEAST(CAST(floor($predSql * 10) AS INT), 9), 0)
                     AS bin,
                   CAST(floor($predSql * 1048576.0) AS BIGINT) AS qs,
                   f.y
            FROM zf f, w4c w)
          SELECT bin, COUNT(*) AS n,
                 CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS n_pos,
                 CAST(SUM(qs) AS BIGINT) AS q_pred_sum,
                 CAST(SUM(qs) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE)
                   * 1048576.0) AS mean_pred,
                 CAST(SUM(CAST(y AS BIGINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS obs_rate
          FROM sc GROUP BY bin""",
    "quality_pr_sweep" -> {
      val ts = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
      val cols = ts.zipWithIndex.map { case (t, i) =>
        s"""CAST(SUM(CASE WHEN $predSql >= $t THEN 1 ELSE 0 END)
              AS BIGINT) AS r$i,
            CAST(SUM(CASE WHEN $predSql >= $t THEN f.nw ELSE 0 END)
              AS BIGINT) AS m$i,
            CAST(SUM(CASE WHEN $predSql >= $t AND f.y = 1.0
              THEN 1 ELSE 0 END) AS BIGINT) AS t$i""" }.mkString(",\n")
      val rows = ts.zipWithIndex.map { case (t, i) =>
        s"""SELECT CAST($t AS DOUBLE) AS threshold, n_docs, total_words,
              n_pos, r$i AS n_retained, m$i AS words_retained, t$i AS tp
            FROM a""" }.mkString("\nUNION ALL\n")
      s"""WITH $trainSql,
          a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(f.nw) AS BIGINT) AS total_words,
                  CAST(SUM(CAST(f.y AS BIGINT)) AS BIGINT) AS n_pos,
                  $cols
                FROM zf f, w4c w),
          s AS ($rows)
          SELECT threshold, n_docs, total_words, n_pos, n_retained,
                 words_retained,
                 CASE WHEN n_retained > 0
                      THEN CAST(tp AS DOUBLE) / CAST(n_retained AS DOUBLE)
                      END AS "precision",
                 CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE) AS recall
          FROM s"""
    },
    "quality_auc" ->
      s"""WITH $trainSql,
          sc AS (
            SELECT f.source,
                   GREATEST(LEAST(CAST(floor($predSql * 4096) AS BIGINT),
                     4095), 0) AS bin,
                   f.y
            FROM zf f, w4c w),
          b AS (SELECT source, bin,
                  CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS pos,
                  CAST(SUM(CASE WHEN y = 0.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS neg
                FROM sc GROUP BY 1, 2),
          c AS (SELECT *, CAST(COALESCE(SUM(neg) OVER (
                  PARTITION BY source ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS neg_below
                FROM b),
          g AS (SELECT source, CAST(SUM(pos) AS BIGINT) AS n_pos,
                  CAST(SUM(neg) AS BIGINT) AS n_neg,
                  SUM(CAST(2*neg_below + neg AS HUGEINT) * pos) AS num2
                FROM c GROUP BY 1)
          SELECT source, n_pos, n_neg,
                 CAST(num2 AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE)
                   * CAST(n_neg AS DOUBLE)) AS auc
          FROM g WHERE n_pos > 0 AND n_neg > 0""",
    "dsir_weight" ->
      s"""WITH wh AS (SELECT doc_id, ${TextQueries.sqlPolyHash("w")} % 64
                        AS b
                      FROM (SELECT doc_id,
                              unnest(string_split(text,' ')) AS w
                            FROM documents)),
          raw AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c_db
                  FROM wh WHERE doc_id % 50 <> 0 GROUP BY doc_id, b),
          tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct
                  FROM wh WHERE doc_id % 50 = 0 GROUP BY b),
          srcg AS (SELECT b, CAST(SUM(c_db) AS BIGINT) AS cs
                   FROM raw GROUP BY b),
          grid AS (SELECT g.b, COALESCE(tgt.ct, 0) AS ct,
                          COALESCE(srcg.cs, 0) AS cs
                   FROM (SELECT unnest(range(64)) AS b) g
                   LEFT JOIN tgt USING (b) LEFT JOIN srcg USING (b)),
          tots AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
                          CAST(SUM(cs) AS BIGINT) AS ns FROM grid),
          lr AS (SELECT b,
                   (CAST(floor(ln(CAST(ct+1 AS DOUBLE))*1e6) AS BIGINT) -
                    CAST(floor(ln(CAST(nt+64 AS DOUBLE))*1e6) AS BIGINT)) -
                   (CAST(floor(ln(CAST(cs+1 AS DOUBLE))*1e6) AS BIGINT) -
                    CAST(floor(ln(CAST(ns+64 AS DOUBLE))*1e6) AS BIGINT))
                     AS qlr
                 FROM grid, tots)
          SELECT r.doc_id, CAST(SUM(c_db) AS BIGINT) AS n_words,
                 CAST(SUM(c_db * qlr) AS BIGINT) AS qweight,
                 CAST(SUM(c_db * qlr) AS DOUBLE)
                   / (CAST(SUM(c_db) AS DOUBLE) * 1e6) AS dsir_score
          FROM raw r JOIN lr USING (b) GROUP BY r.doc_id""",
    "sample_weighted" ->
      s"""WITH keyed AS (
            SELECT source, doc_id,
                   CAST(CAST(floor(ln(CAST(
                          1 + (${TextQueries.sqlPolyHash("text")} % 999983)
                          AS DOUBLE)) * 1e6) AS BIGINT) - $QlnDen AS DOUBLE)
                     / CAST(len(string_split(text,' ')) AS DOUBLE) AS es_key
            FROM documents)
          SELECT source, CAST(rn AS INT) AS rank, doc_id, es_key FROM (
            SELECT source, doc_id, es_key,
                   ROW_NUMBER() OVER (PARTITION BY source
                     ORDER BY es_key DESC, doc_id ASC) AS rn
            FROM keyed)
          WHERE rn <= 25"""
  )
}
