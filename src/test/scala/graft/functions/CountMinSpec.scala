package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._
  import CountMinAggregate._

  private def sketchOf(rows: Seq[(Long, Long)], width: Int): Array[Long] =
    rows.toDF("h", "w")
      .agg(CountMinAggregate.agg(col("h"), col("w"), 4, width).as("sk"))
      .head().getSeq[Long](0).toArray

  test("sketch equals a driver-side replay of the update arithmetic") {
    val rows = (1 to 500).map(i => ((i % 37).toLong * 101 % P, 1L))
    val got = sketchOf(rows, 64)
    val want = new Array[Long](4 * 64)
    rows.foreach { case (h, w) =>
      (0 until 4).foreach(r => want(r * 64 + bucket(h, r, 64)) += w)
    }
    assert(got.sameElements(want))
  }

  test("estimates never underestimate, and are exact at ample width") {
    val keys = (1 to 30).map(i => (i * 7919L) % P)
    val rows = keys.flatMap(h => Seq.fill((h % 5).toInt + 1)((h, 1L)))
    val exact = rows.groupBy(_._1).map { case (h, g) => h -> g.size.toLong }
    val tight = sketchOf(rows, 16) // collisions guaranteed: 30 keys, 16 buckets
    val ample = sketchOf(rows, 4096)
    exact.foreach { case (h, c) =>
      assert(estimate(tight, h, 4, 16) >= c)
      assert(estimate(ample, h, 4, 4096) == c, s"key $h")
    }
  }

  test("merging partial sketches equals sketching the union (order-free)") {
    val a = (1 to 200).map(i => ((i * 31L) % P, (i % 3).toLong))
    val b = (1 to 150).map(i => ((i * 17L) % P, 2L))
    val merged = sketchOf(a, 128).zip(sketchOf(b, 128)).map(t => t._1 + t._2)
    assert(sketchOf(a ++ b, 128).sameElements(merged))
  }
}
