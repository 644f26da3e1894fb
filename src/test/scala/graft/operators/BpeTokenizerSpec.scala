package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("merge application handles back-to-back sites and overlapping " +
      "runs (the greedy left-to-right BPE contract)") {
    val df = Seq("  a  b  a  b  ", "  a  a  a  ").toDF("sym")
    val abab = df.filter(col("sym").contains("b"))
      .select(BpeTokenizer.applyMerge(col("sym"), "a b")).head().getString(0)
    // both sites merge: one match must not consume the next site's flank
    assert(abab === "  ab  ab  ")
    val aaa = df.filter(!col("sym").contains("b"))
      .select(BpeTokenizer.applyMerge(col("sym"), "a a")).head().getString(0)
    // overlapping run merges greedily left-to-right, exactly once
    assert(aaa === "  aa  a  ")
  }

  test("train learns the hand-computed merge sequence on a toy corpus " +
      "and encode collapses fully merged words to one token") {
    // vocab: abab freq 3 (two in doc 1, one in doc 2), aaa freq 1.
    // step1 pairs: (a b)=2*3=6, (b a)=3, (a a)=2 -> "a b"
    // step2: (ab ab)=3, (a a)=2                  -> "ab ab"
    // step3: (a a)=2                             -> "a a"
    // step4: (aa a)=1                            -> "aa a"
    val docs = Seq((1L, "abab abab aaa"), (2L, "abab")).toDF("doc_id", "text")
    val (merges, vocab) = BpeTokenizer.train(docs, "text", 4)
    assert(merges.map(m => (m.step, m.pair, m.count)) ===
      Seq((1, "a b", 6L), (2, "ab ab", 3L), (3, "a a", 2L), (4, "aa a", 1L)))
    val syms = vocab.select(col("w"), col("sym")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(syms("abab") === "  abab  ")
    assert(syms("aaa") === "  aaa  ")
    vocab.unpersist(blocking = false)
  }

  test("training is invariant to input partitioning (integer pair " +
      "counts + deterministic tie-break)") {
    val text = Seq("spark spark scan scan scan table row row",
      "spark table scan row key key", "scan table spark spark row")
    val base = text.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val d1 = spark.createDataFrame(base).toDF("doc_id", "text")
      .repartition(1)
    val d7 = spark.createDataFrame(base).toDF("doc_id", "text")
      .repartition(7)
    val (m1, v1) = BpeTokenizer.train(d1, "text", 3)
    val (m7, v7) = BpeTokenizer.train(d7, "text", 3)
    assert(m1 === m7)
    v1.unpersist(blocking = false); v7.unpersist(blocking = false)
  }

  test("bpe_fertility per-lang roll-up is consistent with bpe_encode's " +
      "per-doc totals and respects fertility bounds") {
    val sf = "/root/testdata/sf0.001"
    val enc = graft.SparkEntry.queries("bpe_encode")(spark, sf)
      .agg(sum(col("n_words")), sum(col("n_bpe_tokens")))
      .collect().head
    val fert = graft.SparkEntry.queries("bpe_fertility")(spark, sf)
      .collect()
    assert(fert.nonEmpty)
    // same word universe, different roll-up key -> totals must agree
    assert(fert.map(_.getAs[Long]("n_words")).sum === enc.getLong(0))
    assert(fert.map(_.getAs[Long]("n_bpe_tokens")).sum === enc.getLong(1))
    fert.foreach { r =>
      val f = r.getAs[Double]("fertility")
      val cpt = r.getAs[Double]("chars_per_token")
      // a word is always >= 1 subword token; a token is >= 1 char
      assert(f >= 1.0, r.toString)
      assert(cpt >= 1.0, r.toString)
      assert(r.getAs[Long]("n_chars") >= r.getAs[Long]("n_bpe_tokens"))
    }
  }
}
