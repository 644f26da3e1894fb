package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed training of a linear least-mean-squares classifier with
 * bit-portable arithmetic — the trained-quality-filter operator of a
 * training-data pipeline (the fastText/CCNet-style learned quality score,
 * here as a linear model so every step has an exact cross-engine oracle).
 *
 * Reference analog: the reference pipeline's per-file quality verdict is a
 * fixed rule chain (validation Lambda, manifest_processor.py rule table);
 * a corpus-scale curation engine additionally LEARNS the verdict boundary
 * from labeled examples. This operator trains that boundary as full-batch
 * gradient descent where each iteration is ONE map-side-combined
 * aggregation over the (narrow, numeric) feature table:
 *
 *   w' = w − lr/n · Xᵀ(Xw − y)
 *
 * Bit-portability uses the same trick as the k-means codebooks
 * ([[SimilaritySearch.kmeansCodebookSeq]], oracle `ann_kmeans_codebook`):
 * every gradient component is accumulated as the INTEGER sum of
 * floor(err·x·2^20) per row, so partial aggregation is order-free across
 * any partitioning and a SQL engine replays training bit-for-bit. The
 * weight vector (d+1 doubles) lives on the driver between iterations and
 * enters each scan as literals, so prediction is a codegen'd projection.
 *
 * 100 TB shape: features are computed ONCE from the raw text and
 * persisted (they are a handful of doubles per doc — orders of magnitude
 * narrower than the corpus), so the per-iteration re-scan never touches
 * raw bytes; each iteration shuffles exactly d+1 int64 partials per task.
 */
object LinearModel {

  /** Gradient quantization scale, 2^20: large enough that the quantized
    * gradient direction is indistinguishable from the float one, small
    * enough that |rows|·err·x·2^20 stays far inside int64. A power of two
    * so `g/Quant` is an EXACT double scaling (no rounding). */
  val Quant: Double = 1048576.0

  /** w·x over literal weights (bias first) — the zero-shuffle scoring
    * projection. Fold order is fixed (left-associative) and must match
    * the oracle SQL text: ((w0 + w1*x1) + w2*x2) + ... */
  def predict(w: Array[Double], xCols: Seq[String]): Column =
    xCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
    }

  /** Per-feature standardization statistics (mean, stddev) with the same
    * bit-portable arithmetic as training: first and second moments
    * accumulate as quantized int64 sums, the only rounding ops are the
    * divisions and the IEEE-correctly-rounded sqrt (identical in every
    * engine). Standardizing first is what makes a handful of GD steps
    * enough: raw quality features are mean-0.9-ish and correlated with
    * the bias, so unscaled LMS crawls. Returns (means, stddevs); a
    * near-zero variance column gets sd = 1.0 (pass-through) instead of a
    * divide-by-~0. */
  def fitStandardizer(feats: DataFrame, xCols: Seq[String])
      : (Array[Double], Array[Double]) = {
    val n = feats.count().toDouble
    val aggs = xCols.flatMap { c =>
      Seq(sum(floor(col(c) * lit(Quant))).as(s"s1_$c"),
        sum(floor(col(c) * col(c) * lit(Quant))).as(s"s2_$c"))
    }
    val r = feats.agg(aggs.head, aggs.tail: _*).head()
    val mus = new Array[Double](xCols.length)
    val sds = new Array[Double](xCols.length)
    for (j <- xCols.indices) {
      val mu = (r.getLong(2 * j) / Quant) / n
      val v = (r.getLong(2 * j + 1) / Quant) / n - mu * mu
      mus(j) = mu
      sds(j) = if (v > 1e-12) math.sqrt(v) else 1.0
    }
    (mus, sds)
  }

  /** (x − mu)/sd per feature column, all other columns passed through. */
  def standardize(feats: DataFrame, xCols: Seq[String],
      mus: Array[Double], sds: Array[Double]): DataFrame = {
    val zCols = xCols.zipWithIndex.map { case (c, j) =>
      ((col(c) - lit(mus(j))) / lit(sds(j))).as(c)
    }
    val rest = feats.columns.filterNot(xCols.contains).map(col(_)).toSeq
    feats.select(rest ++ zCols: _*)
  }

  /** Full-batch LMS gradient descent over `feats` (one row per example,
    * numeric feature columns `xCols`, label column `yCol` in {0.0, 1.0}).
    * Returns trained weights, bias first. Callers should persist `feats`:
    * training runs `iters` aggregation scans plus one count. */
  def lmsTrain(feats: DataFrame, xCols: Seq[String], yCol: String,
      iters: Int, lr: Double): Array[Double] = {
    require(iters >= 1 && xCols.nonEmpty)
    val n = feats.count().toDouble
    val w = Array.fill(xCols.length + 1)(0.0)
    for (_ <- 0 until iters) {
      val err = predict(w, xCols) - col(yCol)
      // bias gradient spells err*Quant (no *1.0 term) — oracle matches
      val gradCols = sum(floor(err * lit(Quant))).as("g0") +:
        xCols.zipWithIndex.map { case (c, j) =>
          sum(floor(err * col(c) * lit(Quant))).as(s"g${j + 1}")
        }
      val gs = feats.agg(gradCols.head, gradCols.tail: _*).head()
      for (j <- w.indices)
        // exact-op order: (lr * (g/2^20)) / n, then one subtract —
        // g/2^20 and lr=power-of-two multiply are exact, so only the
        // division by n and the subtraction round (same as the oracle)
        w(j) = w(j) - lr * (gs.getLong(j) / Quant) / n
    }
    w
  }
}
