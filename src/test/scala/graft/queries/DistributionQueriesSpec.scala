package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Distribution/vocabulary validation: the quantized-log entropy and KL
  * queries against a driver-side reference, the MAD outlier invariant,
  * and the zero-shuffle plan shape of the per-row entropy fold. */
class DistributionQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def qln(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong

  test("text_entropy matches a driver-side reference on every doc") {
    val got = graft.SparkEntry.queries("text_entropy")(spark, sf)
      .select("doc_id", "n_words", "qsum", "entropy")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val ws = r.getString(1).split(" ", -1)
      val counts = ws.groupBy(identity).map(_._2.length.toLong)
      val qsum = counts.map(c => c * qln(c)).sum
      val n = ws.length.toLong
      val ent = (qln(n) * n - qsum).toDouble / (n.toDouble * 1e6)
      val (gn, gq, ge) = got(r.getLong(0))
      assert(gn == n && gq == qsum && ge == ent, s"doc ${r.getLong(0)}")
    }
  }

  test("text_entropy is a zero-shuffle per-row fold") {
    val df = graft.SparkEntry.queries("text_entropy")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty, plan.toString.take(2000))
  }

  test("src_kl is non-negative (up to quantization) and detects a shifted source") {
    val base = (1 to 400).map(i => ("even", s"w${i % 8} w${(i + 1) % 8}"))
    val skew = (1 to 400).map(_ => ("skewed", "w0 w0"))
    val out = tmpDir("klq")
    (base ++ skew).toDF("source", "text").write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    val kl = graft.SparkEntry.queries("src_kl")(spark, out)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(kl("even") >= -1e-5 && kl("skewed") >= -1e-5)
    assert(kl("skewed") > kl("even") + 0.1,
      s"shifted source must dominate: $kl")
  }

  test("oov_rate is in [0,1] and zero when the vocab covers the corpus") {
    val rows = graft.SparkEntry.queries("oov_rate")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
    // corpus with <=16 distinct words: everything is in-vocab
    val out = tmpDir("oov")
    (1 to 100).map(i => (s"s${i % 3}", s"a b c w${i % 4}"))
      .toDF("source", "text").write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    graft.SparkEntry.queries("oov_rate")(spark, out).collect()
      .foreach(r => assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }

  test("len_outliers returns exactly the rows beyond 2.5 MAD") {
    val rows = graft.SparkEntry.queries("len_outliers")(spark, sf).collect()
    assert(rows.nonEmpty, "sf0.001 is known to contain >2.5-MAD docs")
    rows.foreach { r =>
      assert(r.getDouble(4) > 2.5 * r.getDouble(5),
        s"flagged row must satisfy the threshold: $r")
    }
    // injected extreme row is flagged
    val out = tmpDir("mad")
    val docs = (1 to 99).map(i => ("s", i.toLong, 100L + (i % 5))) :+
      (("s", 999L, 100000L))
    docs.toDF("source", "doc_id", "n_chars")
      .withColumn("text", org.apache.spark.sql.functions.lit("x"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val flagged = graft.SparkEntry.queries("len_outliers")(spark, out)
      .select("doc_id").as[Long].collect()
    assert(flagged.contains(999L))
  }

  test("drift_ks_twosample: bounded in [0,1], zero-ish for identical halves, " +
      "and an injected shifted source dominates") {
    val rows = graft.SparkEntry.queries("drift_ks_twosample")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getDouble(4)
      assert(ks >= 0.0 && ks <= 1.0, r.toString)
    }
    // identical distributions -> KS 0; shifted source -> KS near 1
    val out = tmpDir("ks")
    // the complement ("rest of corpus") includes every other source, so
    // keep the shifted source SMALL: matched sources then face a rest
    // that is mostly their own distribution
    val same = (1 to 200).map(i => ("a", i.toLong, 100L + (i % 10))) ++
      (1 to 200).map(i => ("b", 1000L + i, 100L + (i % 10)))
    val shifted = (1 to 20).map(i => ("c", 2000L + i, 900L + (i % 10)))
    (same ++ shifted).toDF("source", "doc_id", "n_chars")
      .withColumn("text", org.apache.spark.sql.functions.lit("x"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val ks = graft.SparkEntry.queries("drift_ks_twosample")(spark, out)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(ks("c") == 1.0, s"fully shifted source must reach 1: $ks")
    assert(ks("a") < 0.15 && ks("b") < 0.15, s"matched halves stay low: $ks")
  }

  test("drift_chi2_twosample: non-negative, zero for proportional sources, " +
      "shifted source dominates") {
    val rows = graft.SparkEntry.queries("drift_chi2_twosample")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(4) >= 0.0, r.toString))
    val out = tmpDir("chi2")
    val same = (1 to 200).map(i => ("a", i.toLong, 100L + 100 * (i % 3))) ++
      (1 to 200).map(i => ("b", 1000L + i, 100L + 100 * (i % 3)))
    val shifted = (1 to 20).map(i => ("c", 2000L + i, 900L))
    (same ++ shifted).toDF("source", "doc_id", "n_chars")
      .withColumn("text", org.apache.spark.sql.functions.lit("x"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val chi = graft.SparkEntry.queries("drift_chi2_twosample")(spark, out)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(chi("c") > chi("a") * 10 && chi("c") > chi("b") * 10,
      s"shifted source must dominate: $chi")
  }

  test("leak_prefix_matrix finds an injected cross-source shared prefix") {
    val out = tmpDir("leak")
    val shared = "a b c d e f g h tail"
    val docs = Seq(
      ("sA", 1L, shared), ("sB", 2L, shared + " more"),
      ("sA", 3L, "p q r s t u v w x"), ("sC", 4L, "z y x w v u t s r"))
    docs.toDF("source", "doc_id", "text")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val m = graft.SparkEntry.queries("leak_prefix_matrix")(spark, out)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(m.toSeq == Seq(("sA", "sB", 1L)), m.mkString(","))
  }

  test("ppl_band_split partitions each source into nearest-rank " +
      "terciles of the doc NLL") {
    val rows = graft.SparkEntry.queries("ppl_band_split")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perSource = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet === perSource.keySet)
    assert(rows.forall(r => Set(0L, 1L, 2L).contains(r._2)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val n = perSource(src)
      val byBand = rs.map(r => r._2 -> r._3).toMap.withDefaultValue(0L)
      // bands partition the source
      assert(rs.map(_._3).sum === n, src)
      // nearest-rank edge(q) = min v with cum*3 >= q*n means the head
      // holds >= ceil(n/3) docs and head+middle >= ceil(2n/3) — ties
      // can only GROW the lower bands, never shrink them
      assert(byBand(0L) * 3 >= n, s"$src head=${byBand(0L)} n=$n")
      assert((byBand(0L) + byBand(1L)) * 3 >= 2 * n,
        s"$src head+mid=${byBand(0L) + byBand(1L)} n=$n")
    }
  }

  test("vocab_coverage: exact hand-computed crossing points on a planted " +
      "frequency distribution, including a shared count class and a " +
      "partial-class ceil") {
    // word counts: a=60 b=25 c=10 d=3 e=1 f=1 -> N=100, vocab=6;
    // fof = {60:1, 25:1, 10:1, 3:1, 1:2}
    val doc1 = (Seq.fill(60)("a") ++ Seq.fill(25)("b")).mkString(" ")
    val doc2 = (Seq.fill(10)("c") ++ Seq.fill(3)("d") ++
      Seq("e", "f")).mkString(" ")
    val out = tmpDir("voccov")
    Seq((1L, doc1, "s0", doc1.length.toLong),
        (2L, doc2, "s0", doc2.length.toLong))
      .toDF("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val got = graft.SparkEntry.queries("vocab_coverage")(spark, out)
      .collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // need(50)=50: covered inside the c=60 class -> ceil(50/60)=1 word
    // need(90)=90: 85 words of mass before the c=10 class -> 2+ceil(5/10)
    // need(95)=95: same class, exactly exhausts it -> 3
    // need(99)=99: crosses into the shared c=1 class (nw=2) -> 4+1
    val expected = Map(
      50 -> (100L, 6L, 1L, 60L),
      90 -> (100L, 6L, 3L, 10L),
      95 -> (100L, 6L, 3L, 10L),
      99 -> (100L, 6L, 5L, 1L))
    assert(got == expected, s"got $got")
  }

  test("src_bigram_entropy: a templated cycle reads exactly 0 bits of " +
      "next-word entropy while varied text reads well above; counts and " +
      "the quantized formula replay driver-side") {
    val cyc = Seq.fill(30)(Seq("x", "y")).flatten.mkString(" ")
    val rnd = new scala.util.Random(42)
    val varied = (0 until 60).map(_ => s"w${rnd.nextInt(7)}").mkString(" ")
    val out = tmpDir("bigent")
    Seq((1L, cyc, "en", "tmpl", cyc.length.toLong),
        (2L, varied, "en", "nat", varied.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val got = graft.SparkEntry.queries("src_bigram_entropy")(spark, out)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // the cycle: 59 bigrams, 2 types ("x y" ×30, "y x" ×29), 2 contexts,
    // each context fully determines its successor -> H = 0 exactly
    assert(got("tmpl")._1 == 59L && got("tmpl")._2 == 2L &&
      got("tmpl")._3 == 2L)
    assert(got("tmpl")._4 === 0.0, s"templated source must read 0 bits")
    // varied text: strictly positive conditional entropy, and the value
    // replays from driver-side counts with the same quantized arithmetic
    val ws = varied.split(" ")
    val bgs = ws.sliding(2).map(_.mkString(" ")).toSeq
    def qln(x: Long) = math.floor(math.log(x.toDouble) * 1e6).toLong
    val cbg = bgs.groupBy(identity).map(_._2.length.toLong)
    val ca = bgs.map(_.split(" ").head).groupBy(identity)
      .map(_._2.length.toLong)
    val n = bgs.length.toLong
    val ref = ((ca.map(c => BigInt(c) * qln(c)).sum -
      cbg.map(c => BigInt(c) * qln(c)).sum).toDouble
      / (n.toDouble * 1e6)) / 0.6931471805599453
    assert(math.abs(got("nat")._4 - ref) < 1e-9, s"got ${got("nat")._4}")
    assert(got("nat")._4 > 0.5)
  }

  test("src_len_percentiles: exact nearest-rank values on planted " +
      "lengths, including duplicate-heavy and uniform sources") {
    val out = tmpDir("lenpct")
    val rows =
      (1 to 10).map(i => (i.toLong, "t", "en", "uni", i.toLong)) ++
      Seq((11L, "t", "en", "dup", 1L), (12L, "t", "en", "dup", 1L),
        (13L, "t", "en", "dup", 1L), (14L, "t", "en", "dup", 7L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val got = graft.SparkEntry.queries("src_len_percentiles")(spark, out)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      ("uni", 50) -> (10L, 5L), ("uni", 90) -> (10L, 9L),
      ("uni", 95) -> (10L, 10L), ("uni", 99) -> (10L, 10L),
      ("dup", 50) -> (4L, 1L), ("dup", 90) -> (4L, 7L),
      ("dup", 95) -> (4L, 7L), ("dup", 99) -> (4L, 7L)), s"got $got")
  }

  test("quality_pr_sweep matches a brute-force threshold sweep over the " +
      "scored corpus; recall is monotone nonincreasing in the threshold") {
    val sc = graft.SparkEntry.queries("quality_lr_score")(spark, sf)
      .select("doc_id", "score", "label_good").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val nwOf = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong)
      .toMap
    val totalW = nwOf.values.sum
    val nPos = sc.count(_._3 == 1).toLong
    val got = graft.SparkEntry.queries("quality_pr_sweep")(spark, sf)
      .collect().map(r => r.getDouble(0) -> r).toMap
    assert(got.keySet == Set(0.1, 0.3, 0.5, 0.7, 0.9))
    Seq(0.1, 0.3, 0.5, 0.7, 0.9).foreach { t =>
      val kept = sc.filter(_._2 >= t)
      val tp = kept.count(_._3 == 1).toLong
      val r = got(t)
      assert(r.getAs[Long]("n_docs") == sc.length.toLong)
      assert(r.getAs[Long]("total_words") == totalW)
      assert(r.getAs[Long]("n_pos") == nPos)
      assert(r.getAs[Long]("n_retained") == kept.length.toLong)
      assert(r.getAs[Long]("words_retained") ==
        kept.map(k => nwOf(k._1)).sum)
      if (kept.nonEmpty)
        assert(math.abs(r.getAs[Double]("precision")
          - tp.toDouble / kept.length) < 1e-12)
      else assert(r.isNullAt(r.fieldIndex("precision")))
      assert(math.abs(r.getAs[Double]("recall")
        - tp.toDouble / nPos) < 1e-12)
    }
    val recalls = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
      .map(t => got(t).getAs[Double]("recall"))
    assert(recalls == recalls.sorted.reverse)
  }

  test("drift_js_twosample is bounded by ln 2 and ranks the shifted source highest") {
    // Each source is compared against the REST of the corpus. Dataset 1:
    // two sources with identical length distributions → JS ≈ 0 for both
    // (smoothing residual only). Dataset 2: add a third source shifted
    // entirely into disjoint bins → its JS vs rest approaches the ln 2
    // ceiling and dominates the matched pair (whose own JS rises, since
    // their rest now contains the disjoint mass) — and no score ever
    // exceeds ln 2, the JS upper bound that PSI/KL lack.
    val ln2 = math.log(2.0)
    val same = (1 to 300).flatMap(i =>
      Seq(("a", 50L + (i % 5) * 100L), ("b", 50L + (i % 5) * 100L)))
    val out1 = tmpDir("jsq1")
    same.toDF("source", "n_chars").write.mode("overwrite")
      .parquet(s"$out1/documents.parquet")
    val matched = graft.SparkEntry.queries("drift_js_twosample")(spark, out1)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("js"))
      .toMap
    matched.values.foreach(v => assert(v >= -1e-6 && v < 0.01, matched))

    val shifted = (1 to 600).map(i => ("c", 1050L + (i % 5) * 100L))
    val out2 = tmpDir("jsq2")
    (same ++ shifted).toDF("source", "n_chars").write.mode("overwrite")
      .parquet(s"$out2/documents.parquet")
    val got = graft.SparkEntry.queries("drift_js_twosample")(spark, out2)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("js"))
      .toMap
    got.values.foreach(v => assert(v >= -1e-6 && v <= ln2 + 1e-6, got))
    assert(got("c") > 0.5 && got("c") > got("a") + 0.3, got)
  }
}
