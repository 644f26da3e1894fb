package graft.drift

import graft.SparkSpec
import graft.gen.SequenceGen
import graft.gen.SequenceGen.Knobs

class DriftSpec extends SparkSpec {

  test("token histogram aggregator equals explode-based reference computation") {
    val seqs = SequenceGen.sequences(spark, 300).toDF()
    import org.apache.spark.sql.functions._
    val vocab = SequenceGen.vocabSize
    val viaAgg = Drift.tokenHist(seqs, vocab)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val viaExplode = seqs
      .select(col("source"), explode(col("tokens")).as("t"))
      .select(col("source"),
        (col("t").cast("long") * Drift.tokenBins / vocab).cast("int").as("bin"))
      .groupBy("source", "bin").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(viaAgg === viaExplode)
  }

  test("ntok histogram bins cover and sum to row count") {
    val seqs = SequenceGen.sequences(spark, 500).toDF()
    val hist = Drift.ntokHist(seqs).collect()
    assert(hist.map(_.getLong(2)).sum === 500L)
    assert(hist.forall(r => r.getInt(1) >= 0 && r.getInt(1) < Drift.ntokBins))
  }

  test("KS: identical samples accept, shifted samples reject") {
    val base = (0 until 64).map(b => b -> (1000L - 10 * b).max(1L)).toMap
    val same = base
    val shifted = base.map { case (b, c) => ((b + 8).min(63)) -> c }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val ok = Drift.ksTest(same, base, 64, 0.01)
    assert(!ok.rejected && ok.statistic === 0.0)
    val bad = Drift.ksTest(shifted, base, 64, 0.01)
    assert(bad.rejected, s"stat=${bad.statistic} thr=${bad.threshold}")
  }

  test("chi2: identical accept, disjoint reject; quantile sane") {
    val a = (0 until 10).map(b => b -> 500L).toMap
    val b = (10 until 20).map(b => b -> 500L).toMap
    assert(!Drift.chi2Test(a, a, 20, 0.01).rejected)
    assert(Drift.chi2Test(a, b, 20, 0.01).rejected)
    // chi2(0.99, df=10) ≈ 23.21
    assert(math.abs(Drift.chi2Quantile(10, 0.99) - 23.21) < 0.5)
    // normal quantile spot checks
    assert(math.abs(Drift.normalQuantile(0.975) - 1.95996) < 1e-3)
    assert(math.abs(Drift.normalQuantile(0.5)) < 1e-9)
  }

  test("PSI: identical accept (psi ~ 0), shifted reject at 0.25; " +
      "empty bins are Laplace-safe") {
    val base = (0 until 64).map(b => b -> (1000L - 10 * b).max(1L)).toMap
    val same = Drift.psiTest(base, base, 64, 0.25)
    assert(!same.rejected && same.statistic === 0.0)
    val shifted = base.map { case (b, c) => ((b + 16).min(63)) -> c }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val bad = Drift.psiTest(shifted, base, 64, 0.25)
    assert(bad.rejected, s"psi=${bad.statistic}")
    // disjoint supports (all-empty bins on each side) must not hit ln(0)
    val lo = (0 until 8).map(b => b -> 100L).toMap
    val hi = (56 until 64).map(b => b -> 100L).toMap
    val dj = Drift.psiTest(lo, hi, 64, 0.25)
    assert(dj.rejected && !dj.statistic.isNaN && !dj.statistic.isInfinite)
    // PSI detects the same injected n_tok drift the engine rule gates on
    val clean = SequenceGen.sequences(spark, 4000).toDF()
    val drifted = SequenceGen.sequences(spark, 4000,
      knobs = Knobs(driftShiftSources = SequenceGen.sources,
        driftShift = 200)).toDF()
    def hist(df: org.apache.spark.sql.DataFrame) =
      Drift.ntokHist(df).collect().filter(_.getString(0) == "cardiac")
        .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(Drift.psiTest(hist(drifted), hist(clean), Drift.ntokBins, 0.25)
      .rejected)
    assert(!Drift.psiTest(hist(clean), hist(clean), Drift.ntokBins, 0.25)
      .rejected)
  }

  test("small drift shift is detected by KS on n_tok at moderate n") {
    val clean = SequenceGen.sequences(spark, 4000).toDF()
    val drifted = SequenceGen.sequences(spark, 4000,
      knobs = Knobs(driftShiftSources = SequenceGen.sources, driftShift = 200)).toDF()
    val b = Drift.ntokHist(clean).collect()
      .filter(_.getString(0) == "cardiac")
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    val c = Drift.ntokHist(drifted).collect()
      .filter(_.getString(0) == "cardiac")
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(Drift.ksTest(c, b, Drift.ntokBins, 0.01).rejected)
    assert(!Drift.ksTest(b, b, Drift.ntokBins, 0.01).rejected)
  }
}
