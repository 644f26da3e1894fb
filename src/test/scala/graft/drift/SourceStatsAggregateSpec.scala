package graft.drift

import graft.SparkSpec
import graft.gen.SequenceGen
import graft.gen.SequenceGen.Knobs
import graft.rules.RuleEngine
import org.apache.spark.sql.functions._

/** Independent anchors for the all-in-one stats aggregate: every field is
  * checked against a brute-force computation with Spark built-ins (not
  * against the aggregate itself). */
class SourceStatsAggregateSpec extends SparkSpec {
  import spark.implicits._

  private val N = 6000L
  private lazy val df = SequenceGen
    .sequences(spark, N, knobs = Knobs(dupDocIdRate = 0.01)).toDF()
    .cache()

  private lazy val aggs = RuleEngine
    .aggregateBySource(df, SequenceGen.vocabSize)
    .map(a => a.source -> a).toMap

  test("counts, min/max/sum and null fraction are exact") {
    val exact = df.groupBy("source")
      .agg(count(lit(1)).as("n"), min("n_tok").as("mn"), max("n_tok").as("mx"),
        sum(col("n_tok").cast("long")).as("s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    assert(aggs.keySet === exact.keySet)
    exact.foreach { case (s, (n, mn, mx, sm)) =>
      val a = aggs(s)
      assert(a.nDocs === n, s)
      assert(a.minNtok === mn && a.maxNtok === mx, s)
      assert(a.totalTokens === sm, s)
      assert(a.nullFracDocId === 0.0)
      assert(math.abs(a.avgNtok - sm.toDouble / n) < 1e-12)
    }
  }

  test("p50/p95 match exact nearest-rank percentiles") {
    val bySource = df.select("source", "n_tok").as[(String, Int)]
      .collect().groupBy(_._1)
    bySource.foreach { case (s, rows) =>
      val sorted = rows.map(_._2).sorted
      def nearestRank(q: Double) =
        sorted(math.max(1, math.ceil(q * sorted.length).toInt) - 1)
      assert(aggs(s).p50Ntok === nearestRank(0.50), s"p50 $s")
      assert(aggs(s).p95Ntok === nearestRank(0.95), s"p95 $s")
    }
  }

  test("HLL distinct estimate is within 5% of the exact distinct count") {
    val exact = df.groupBy("source")
      .agg(countDistinct("doc_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (s, d) =>
      val est = aggs(s).approxDistinctDocId
      assert(math.abs(est - d).toDouble / d < 0.05,
        s"$s: est $est vs exact $d")
    }
  }

  test("drift histograms equal the standalone per-row aggregates") {
    val hists = df.groupBy("source")
      .agg(
        HistAggregate.ntokHist(col("n_tok"), Drift.ntokBins,
          Drift.ntokBinWidth).as("nh"),
        HistAggregate.tokenHist(col("tokens"), Drift.tokenBins,
          SequenceGen.vocabSize).as("th"),
        min(array_min(col("tokens"))).as("mnt"),
        max(array_max(col("tokens"))).as("mxt"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Long](1), r.getSeq[Long](2), r.getInt(3), r.getInt(4)))
      .toMap
    hists.foreach { case (s, (nh, th, mnt, mxt)) =>
      assert(aggs(s).ntokHist.toSeq === nh, s"ntok_hist $s")
      assert(aggs(s).tokenHist.toSeq === th, s"token_hist $s")
      assert(aggs(s).minTokenId === mnt && aggs(s).maxTokenId === mxt, s)
    }
  }

  test("NULL-source rows book under the sentinel label — counted, not " +
      "silently dropped") {
    import graft.model.Sequence
    val withNulls = (Seq(
      Sequence("D000000000001", Array(1, 2), 2, null),
      Sequence("D000000000002", Array(3), 1, null)) ++
      (1 to 5).map(i => Sequence(f"D$i%012d", Array(1), 1, "ok")))
      .toDS().toDF()
    val aggs = RuleEngine.aggregateBySource(withNulls, SequenceGen.vocabSize)
      .map(a => a.source -> a).toMap
    assert(aggs.keySet ===
      Set("ok", SourceStatsAggregate.NullSourceLabel))
    assert(aggs(SourceStatsAggregate.NullSourceLabel).nDocs === 2L)
    assert(aggs.values.map(_.nDocs).sum === 7L) // rowCount stays exact
  }

  test("hllEstimate: exact-ish at tiny cardinality (linear counting)") {
    val regs = new Array[Byte](SourceStatsAggregate.HllM)
    val seen = (1 to 100).map(i =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s"doc-$i"))
    seen.foreach { u =>
      val h = SourceStatsAggregate.fnv1a64(u)
      val idx = (h >>> (64 - SourceStatsAggregate.HllP)).toInt
      val w = h << SourceStatsAggregate.HllP
      val rank = (if (w == 0) 64 - SourceStatsAggregate.HllP
        else java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rank > regs(idx)) regs(idx) = rank.toByte
    }
    val est = SourceStatsAggregate.hllEstimate(regs)
    assert(math.abs(est - 100L) <= 2, s"est $est")
  }
}
