package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-reference checks for the planning-audit queries: power-of-two
  * padding waste (pack_bucket_waste) and shuffle-key skew (skew_audit).
  * Both also carry full DuckDB oracles; these specs pin the invariants
  * the oracle's value-hash alone doesn't name. */
class AuditQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pack_bucket_waste: buckets cover their docs, masses conserve, " +
      "waste fractions are sane") {
    val rows = CorpusQueries.queries("pack_bucket_waste")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // buckets are the declared power-of-two widths
    val widths = Set(16L, 32L, 64L, 128L, 256L, 512L, 1024L)
    rows.foreach { case (b, nd, sw, pad, wf) =>
      assert(widths.contains(b))
      assert(nd > 0)
      // every doc fits its bucket and none would fit the next one down:
      // sum of words is within (bucket/2, bucket] per doc on average
      assert(sw <= b * nd)
      assert(pad === b * nd - sw)
      assert(wf >= 0.0 && wf < 1.0)
      assert(wf === pad.toDouble / (b * nd).toDouble)
    }
    // total word mass conserves against the raw table
    val total = spark.read.parquet(s"$dir/documents.parquet")
      .select(sum(size(split(col("text"), " "))).cast("long"))
      .collect().head.getLong(0)
    assert(rows.map(_._3).sum === total)
    // doc count conserves
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._2).sum === nDocs)
  }

  test("mix_doremi_step: quotas sum to the budget, excess clips at zero, " +
      "and only harder-than-average sources gain over their token share") {
    val rows = CorpusQueries.queries("mix_doremi_step")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._5).sum === 100L) // largest-remainder exactness
    rows.foreach { case (_, n, nll, exc, q) =>
      assert(n > 0 && nll > 0.0 && exc >= 0.0 && q >= 0L)
    }
    // the corpus-average NLL separates gainers from the rest: every
    // source with positive excess scores above the token-weighted mean
    val nTot = rows.map(_._2).sum
    val meanNll = rows.map(r => r._3 * r._2).sum / nTot
    rows.filter(_._4 > 0.0).foreach { case (s, _, nll, _, _) =>
      assert(nll > meanNll - 1e-6, s"source $s gained without excess loss")
    }
    // at least one source sits above and one below the mean on real data
    assert(rows.exists(_._4 > 0.0) && rows.exists(_._4 == 0.0))
  }

  test("skew_audit equals a driver-computed heavy-hitter reference " +
      "(counts, shares, salt factors, tie-breaks)") {
    val got = RelationalQueries.queries("skew_audit")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
      .sortBy(_._1)
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id")).collect().map(_.getLong(0))
    val counts = events.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val total = events.length.toLong
    val want = counts.toSeq.sortBy { case (k, n) => (-n, k) }.take(5)
      .zipWithIndex.map { case ((k, n), i) =>
        (i + 1, k, n, n.toDouble / total.toDouble,
          (n * 32 + total - 1) / total)
      }
    assert(got.toSeq === want)
    // the audit's salt factor levels the heaviest key across <= 32 ways
    assert(got.head._5 >= 1L && got.head._5 <= 32L)
  }

  test("quality_ablation: marginal counts decompose consistently") {
    val rows = QualityQueries.queries("quality_ablation")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(rows.keySet === Set("length", "repetition", "language", "any"))
    val gates = Seq("length", "repetition", "language").map(rows)
    val any = rows("any")
    // n_only <= n_flagged per gate; any covers each gate; union bound
    gates.foreach { case (n, only, w) =>
      assert(only <= n); assert(n <= any._1); assert(w <= any._3)
    }
    assert(any._1 <= gates.map(_._1).sum)
    // 'any' n_only = sum of per-gate exclusives (the stack's definition)
    assert(any._2 === gates.map(_._2).sum)
    // the corpus has flagged docs at every gate (testdata sanity)
    assert(gates.forall(_._1 > 0))
  }

  test("dedup_canonical keeps each cluster's longest member " +
      "(tie: lowest id) and conserves membership") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = DedupQueries.queries("dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val got = DedupQueries.queries("dedup_canonical")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val want = clusters.groupBy(_._2).map { case (cid, ms) =>
      val ids = ms.map(_._1).toSeq
      val canon = ids.minBy(id => (-d(id), id))
      cid -> ((canon, ids.size.toLong, ids.map(d).sum))
    }
    assert(got === want)
    // every cluster is a genuine duplicate group
    assert(got.values.forall(_._2 >= 2L))
  }

  test("langid_confusion: planted stopword-laden vs gibberish docs land " +
      "in the exact declared-vs-predicted cells with correct shares") {
    import spark.implicits._
    val out = tmpDir("langconf")
    val rows = Seq(
      (1L, "the a of zz", "en", "s0"), // ratio .75 -> en_like
      (2L, "the the it qq", "en", "s0"),
      (3L, "a of in yy", "en", "s0"),
      (4L, "zz yy xx ww", "en", "s0"), // ratio 0 -> other
      (5L, "qq rr ss", "xx", "s0"),
      (6L, "tt uu vv", "xx", "s0"))
    rows.map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val got = graft.SparkEntry.queries("langid_confusion")(spark, out)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(got == Map(
      ("s0", "en", "en_like") -> (3L, 0.75),
      ("s0", "en", "other") -> (1L, 0.25),
      ("s0", "xx", "other") -> (2L, 1.0)), s"got $got")
  }
}
