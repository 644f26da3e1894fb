package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Training-order, PMI-collocation and distinct-n diversity semantics:
  * the round-5 corpus-prep additions. */
class TrainPrepQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("train_order: per-shard positions are a contiguous 1..n ranking " +
      "and every doc appears exactly once") {
    val rows = graft.SparkEntry.queries("train_order")(spark, sf)
      .select("doc_id", "shard", "pos").collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    assert(rows.map(_.getLong(0)).distinct.length == nDocs)
    rows.groupBy(_.getLong(1)).foreach { case (shard, rs) =>
      val ps = rs.map(_.getLong(2)).sorted
      assert(ps.sameElements(1L to rs.length),
        s"shard $shard positions not contiguous")
    }
  }

  test("train_order is reproducible: two evaluations emit the identical " +
      "(doc, shard, pos) assignment") {
    def snap() = graft.SparkEntry.queries("train_order")(spark, sf)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(snap() == snap())
  }

  test("pmi_collocations ranks a planted collocation above a chance pair") {
    // 'alpha beta' always adjacent (a true collocation); filler words
    // are frequent but pair up at chance only
    val filler = Array("t0", "t1", "t2", "t3", "t4", "t5", "t6", "t7")
    val docsRows = (0 until 200).map { i =>
      val r = new scala.util.Random(i)
      val ws = Seq.fill(20)(filler(r.nextInt(filler.length)))
      val (pre, post) = ws.splitAt(r.nextInt(ws.length))
      (i.toLong, (pre ++ Seq("alpha", "beta") ++ post).mkString(" "),
        "en", "src0", 0L)
    }
    val out = tmpDir("pmi")
    docsRows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val got = graft.SparkEntry.queries("pmi_collocations")(spark, out)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    val planted = got(("alpha", "beta"))
    val chance = got.collect {
      case ((a, b), q) if a.startsWith("t") && b.startsWith("t") => q
    }
    assert(chance.nonEmpty)
    assert(planted > chance.max + 500000, // > +0.5 nats over any chance pair
      s"planted=$planted chanceMax=${chance.max}")
  }

  test("diversity_distinct_n: a templated source scores far below a " +
      "varied one") {
    val varied = (0 until 100).map { i =>
      (i.toLong, (0 until 12).map(j => s"w${i * 31 + j * 7}").mkString(" "),
        "en", "varied", 0L)
    }
    val template = (100 until 200).map { i =>
      (i.toLong, (0 until 12).map(j => s"b$j").mkString(" "),
        "en", "boiler", 0L)
    }
    val out = tmpDir("divn")
    (varied ++ template).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val d = graft.SparkEntry.queries("diversity_distinct_n")(spark, out)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(d("varied") > 0.9, s"varied=${d("varied")}")
    assert(d("boiler") < 0.02, s"boiler=${d("boiler")}")
  }
}
