package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: pure-CPU scaling of this host (no IO, no cache) — xxhash64
  * folding over spark.range at two parallelism levels. Distinguishes
  * "engine doesn't scale" from "box doesn't scale". */
object CpuScaleProbe {
  def time(cpus: Int, n: Long): Double = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // warm-up
    s.range(0, 1000000, 1, cpus * 4).select(sum(pmod(xxhash64(col("id")), lit(1000)))).collect()
    val t0 = System.nanoTime()
    s.range(0, n, 1, cpus * 4)
      .select(sum(pmod(xxhash64(col("id"), col("id"), col("id")), lit(1000)))).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    s.stop()
    sec
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000000L)
    val c1 = args.lift(1).map(_.toInt).getOrElse(8)
    val c2 = args.lift(2).map(_.toInt).getOrElse(32)
    val t8 = time(c1, n)
    val t32 = time(c2, n)
    println(f"""{"n":$n,"sec8":$t8%.2f,"sec32":$t32%.2f,"speedup":${t8 / t32}%.2f,"efficiency":${t8 / t32 / 4}%.3f}""")
  }
}
