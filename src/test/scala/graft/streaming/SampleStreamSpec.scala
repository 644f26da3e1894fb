package graft.streaming

import graft.SparkSpec
import graft.model.Sequence

/** Streaming per-source k-sample: convergence to the batch selection
  * rule, arrival-order invariance, bounded re-emission. */
class SampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private def seq(id: String, src: String, toks: Int*) =
    Sequence(id, toks.toArray, toks.length, src)

  private def fp(toks: Int*): Long =
    toks.foldLeft(0L)((a, b) => (a * 31 + b) % 1000000007L)

  // driver-side reference: per source the k smallest (fp, doc_id)
  private def reference(rows: Seq[Sequence], k: Int)
      : Map[String, Seq[(Long, String)]] =
    rows.groupBy(_.source).map { case (s, rs) =>
      s -> rs.map(r => (fp(r.tokens.toIndexedSeq: _*), r.doc_id))
        .distinct.sorted.take(k)
    }

  private def finalSample(rows: Array[StreamingValidation.SampleEntry])
      : Map[String, Seq[(Long, String)]] =
    rows.groupBy(_.source).map { case (s, rs) =>
      val maxGen = rs.map(_.gen).max
      s -> rs.filter(_.gen == maxGen).map(e => (e.fp, e.doc_id))
        .sorted.toSeq
    }

  private def run(k: Int, batches: Seq[Seq[Sequence]], name: String)
      : Array[StreamingValidation.SampleEntry] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Sequence]
    val q = StreamingValidation.sampleStream(in.toDS(), k)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[StreamingValidation.SampleEntry].collect()
    } finally q.stop()
  }

  private val rows = Seq(
    seq("a1", "s1", 5, 1), seq("a2", "s1", 9, 9, 9), seq("a3", "s1", 1),
    seq("a4", "s1", 2, 7), seq("a5", "s1", 30), seq("b1", "s2", 4),
    seq("b2", "s2", 100, 3), seq("b3", "s2", 8))

  test("streaming k-sample converges to the batch top-k rule and " +
      "caps every emission at k rows per source") {
    val got = run(3, rows.grouped(3).toSeq, "sample_conv")
    assert(finalSample(got) === reference(rows, 3))
    // every (source, gen) emission is a full sample of ≤ k rows
    got.groupBy(e => (e.source, e.gen)).values
      .foreach(g => assert(g.length <= 3))
  }

  test("final sample is invariant to arrival order and batch boundaries") {
    val a = run(3, rows.reverse.grouped(2).toSeq, "sample_ord_a")
    val b = run(3, Seq(rows), "sample_ord_b")
    assert(finalSample(a) === finalSample(b))
    assert(finalSample(a) === reference(rows, 3))
  }

  test("a batch that cannot change the sample emits nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Sequence]
    val q = StreamingValidation.sampleStream(in.toDS(), 2)
      .writeStream.format("memory").queryName("sample_quiet")
      .outputMode("update").start()
    try {
      in.addData(seq("a1", "s1", 1), seq("a2", "s1", 2))
      q.processAllAvailable()
      val n1 = spark.table("sample_quiet").count()
      // fp(500) = 500 is far above both current members (1·31-fold = 1, 2)
      in.addData(seq("a9", "s1", 500))
      q.processAllAvailable()
      assert(spark.table("sample_quiet").count() === n1,
        "an unchanged source must not re-emit")
    } finally q.stop()
  }
}
