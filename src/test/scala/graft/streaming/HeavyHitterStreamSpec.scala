package graft.streaming

import graft.SparkSpec
import graft.model.Sequence
import org.apache.spark.sql.functions._

/** Streaming per-source token heavy hitters: exactness at full width,
  * the CMS overestimate-only contract at tiny width, and the bounded
  * rebuild/compaction behavior shared with the drift monitors. */
class HeavyHitterStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic corpus with strictly Zipf-ordered token frequencies:
    * row i of a source carries tokens {off, off+1, …, off + (i mod 10)},
    * so token off+j appears in exactly the rows with (i mod 10) >= j —
    * counts strictly decrease in j and the exact top-k is known. */
  private def rows(src: String, off: Int, n: Int, phase: Int): Seq[Sequence] =
    (0 until n).map { i =>
      val toks = (0 to (i % 10)).map(off + _).toArray
      Sequence(f"$src-$phase-$i%04d", toks, toks.length, src)
    }

  private def exactCounts(rs: Seq[Sequence]): Map[String, Map[Long, Long]] =
    rs.groupBy(_.source).map { case (s, g) =>
      s -> g.flatMap(_.tokens).groupBy(_.toLong)
        .map { case (t, xs) => t -> xs.size.toLong }
    }

  private def latestTopk(out: String): Map[(String, Int), (Long, Long)] = {
    val df = spark.read.parquet(s"$out/hh_topk")
    // batch_id is a hive partition dir -> inferred int, read as Number
    val latest = df.agg(max(col("batch_id").cast("long")))
      .collect().head.getLong(0)
    df.filter(col("batch_id").cast("long") === latest).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rank")) ->
        ((r.getAs[Long]("token"), r.getAs[Long]("est_count")))).toMap
  }

  test("heavy hitters are exact at full width and survive a restart " +
      "with appended data") {
    val dir = tmpDir("hh_exact")
    val in = s"$dir/in"; val out = s"$dir/out"
    val b1 = rows("a", 0, 50, 0) ++ rows("b", 100, 40, 0)
    b1.toDF().write.mode("overwrite").parquet(in)
    assert(StreamingValidation.startHeavyHitterMonitor(
      spark, in, out, k = 4, candidateK = 16, depth = 4, width = 512)
      .awaitTermination(300000), "run 1 did not finish")
    val t1 = latestTopk(out)
    val e1 = exactCounts(b1)
    Seq("a" -> 0, "b" -> 100).foreach { case (src, off) =>
      (1 to 4).foreach { r =>
        val (tok, est) = t1((src, r))
        assert(tok === off + r - 1, s"$src rank $r") // Zipf order by id
        assert(est === e1(src)(tok), s"$src rank $r exact at full width")
      }
    }

    // restart with appended data: cumulative counts, not batch counts
    val b2 = rows("a", 0, 30, 1)
    b2.toDF().write.mode("append").parquet(in)
    assert(StreamingValidation.startHeavyHitterMonitor(
      spark, in, out, k = 4, candidateK = 16, depth = 4, width = 512)
      .awaitTermination(300000), "run 2 did not finish")
    val t2 = latestTopk(out)
    val e2 = exactCounts(b1 ++ b2)
    (1 to 4).foreach { r =>
      val (tok, est) = t2(("a", r))
      assert(est === e2("a")(tok), s"cumulative count at rank $r")
    }
    assert(t2(("a", 1))._2 === 80L) // token 0 in every row of both phases
  }

  test("tiny-width estimates only ever OVERestimate the true count") {
    val dir = tmpDir("hh_over")
    val in = s"$dir/in"; val out = s"$dir/out"
    val data = rows("a", 0, 60, 0)
    data.toDF().write.mode("overwrite").parquet(in)
    assert(StreamingValidation.startHeavyHitterMonitor(
      spark, in, out, k = 6, candidateK = 10, depth = 3, width = 4)
      .awaitTermination(300000), "run did not finish")
    val exact = exactCounts(data)("a")
    val got = latestTopk(out)
    assert(got.nonEmpty)
    got.foreach { case ((_, r), (tok, est)) =>
      assert(est >= exact(tok), s"rank $r token $tok underestimated")
    }
  }

  test("per-batch work is bounded: one rebuild per run, generations " +
      "compact, candidate rebuild reads one generation") {
    val dir = tmpDir("hh_bounded")
    val in = s"$dir/in"; val out = s"$dir/out"
    // 120 rows across 40 partitions -> 40 nonempty files, 3 micro-batches
    // per run at maxFilesPerTrigger=16 (fewer rows leave empty partitions
    // unwritten and collapse the run to 2 batches — no compaction tick)
    rows("a", 0, 120, 0).toDF().repartition(40)
      .write.mode("overwrite").parquet(in)
    val st1 = new StreamingValidation.DriftMonitorStats
    assert(StreamingValidation.startHeavyHitterMonitor(
        spark, in, out, k = 3, candidateK = 8, depth = 4, width = 64,
        compactEvery = 2, stats = Some(st1))
      .awaitTermination(300000), "bounded run 1 did not finish")
    assert(st1.rebuilds.get === 1L)
    assert(st1.compactions.get >= 1L)

    rows("a", 0, 120, 1).toDF().repartition(40)
      .write.mode("append").parquet(in)
    val st2 = new StreamingValidation.DriftMonitorStats
    assert(StreamingValidation.startHeavyHitterMonitor(
        spark, in, out, k = 3, candidateK = 8, depth = 4, width = 64,
        compactEvery = 2, stats = Some(st2))
      .awaitTermination(300000), "bounded run 2 did not finish")
    assert(st2.rebuilds.get === 1L)
    // bound: (base + <= compactEvery generations) x nonzero cells, one
    // source, <= 10 distinct tokens -> <= depth*10 nonzero cells per gen
    assert(st2.stateRowsRead.get <= 3L * 4 * 10,
      s"rebuild read ${st2.stateRowsRead.get} state rows")
    val gens = graft.sources.TableIO
      .partitionValues(spark, s"$out/hh_state", "batch_id")
      .getOrElse(Nil)
    assert(gens.size <= 3, s"state generations not compacted: $gens")
    // the result is still exact (width >= vocab): cumulative top-1
    val t = latestTopk(out)
    assert(t(("a", 1)) === ((0L, 240L))) // token 0 in all 2x120 rows
  }
}
