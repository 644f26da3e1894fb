package graft.drift

import graft.SparkSpec
import graft.gen.SequenceGen
import org.apache.spark.sql.functions._

class HistAggregateSpec extends SparkSpec {

  test("zero-copy hist aggregates equal the explode/groupBy reference") {
    val seqs = SequenceGen.sequences(spark, 400).toDF()
    val vocab = SequenceGen.vocabSize

    val got = seqs.groupBy("source").agg(
      HistAggregate.ntokHist(col("n_tok"), Drift.ntokBins, Drift.ntokBinWidth)
        .as("nh"),
      HistAggregate.tokenHist(col("tokens"), Drift.tokenBins, vocab)
        .as("th"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray)).toMap

    val ntokRef = Drift.ntokHist(seqs).collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(r => r.getInt(1) -> r.getLong(2)).toMap }
    val tokRef = Drift.tokenHist(seqs, vocab).collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(r => r.getInt(1) -> r.getLong(2)).toMap }

    got.foreach { case (src, (nh, th)) =>
      nh.zipWithIndex.foreach { case (c, b) =>
        assert(c === ntokRef(src).getOrElse(b, 0L), s"$src ntok bin $b")
      }
      th.zipWithIndex.foreach { case (c, b) =>
        assert(c === tokRef(src).getOrElse(b, 0L), s"$src token bin $b")
      }
    }
    assert(got.values.map(_._1.sum).sum === 400L)
  }
}
