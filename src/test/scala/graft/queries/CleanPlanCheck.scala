package graft.queries

import graft.SparkSpec

/** Plan-shape pins for the cleaning/rewrite queries. */
class CleanPlanCheck extends SparkSpec {

  test("dedup_chunk_rewrite: ONE text decode, ONE chunk-hash exchange " +
      "(df/winner as windows over it), no self-join") {
    val df = DedupQueries.queries("dedup_chunk_rewrite")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val joins = plan.linesIterator.count(_.contains("Join"))
    assert(scans === 1, s"text must decode once:\n$plan")
    assert(exchanges === 2, // chunk hash + final per-doc aggregation
      s"expected exactly the h + doc_id exchanges:\n$plan")
    assert(joins === 0, s"no self-join:\n$plan")
  }

  test("pii_redact and dedup_normalized stay single-scan") {
    for (name <- Seq("pii_redact", "dedup_normalized")) {
      val df = CleanQueries.queries(name)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      assert(scans === 1, s"$name should scan once:\n$plan")
    }
  }
}
