package graft.queries

import graft.SparkSpec

/** Clamped sliding-window passage extraction (`chunk_sliding`): coverage,
  * clamping, and fingerprint invariants against the real documents table
  * (its DuckDB oracle covers the cross-engine bit-exact contract). */
class ChunkSlidingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val W = 32
  private val S = 24

  test("chunk_sliding: full coverage, full-width clamped windows, and " +
      "the integer chunk-count rule") {
    val rows = graft.SparkEntry.queries("chunk_sliding")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS LONG) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)

    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet === lens.keySet) // every doc chunks
    byDoc.foreach { case (id, cs) =>
      val n = lens(id)
      val sorted = cs.sortBy(_._2)
      // chunk ids are 0..nChunks-1 with the integer count rule
      val wantChunks = if (n <= W) 1L else 1L + (n - W + (S - 1)) / S
      assert(sorted.map(_._2).toSeq === (0L until wantChunks))
      sorted.foreach { case (_, ci, start, nw, _) =>
        assert(nw === math.min(W.toLong, n)) // every window full-width
        val wantStart =
          if (n <= W) 1L else math.min(ci * S, n - W) + 1L
        assert(start === wantStart) // stride, clamped at the tail
        assert(start + nw - 1 <= n) // never past the end
      }
      // union of windows covers every word exactly
      val covered = sorted
        .flatMap { case (_, _, start, nw, _) => start until (start + nw) }
        .toSet
      assert(covered === (1L to n).toSet)
    }
    // fingerprints are not a degenerate constant hash
    assert(rows.map(_._5).distinct.length > 1)
  }
}
