package graft.bench

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.SparkEntry

/** Round-6 measurement harness (spark_optimization_guide §1) — SEPARATE
  * from the frozen graft.Bench: isolates each query with the noop sink,
  * times the bench-identical `count()` action, and dumps
  * `.explain("formatted")` to plans/<tag>/<name>_<suffix>.txt so plan
  * claims in OPTIMIZATION_r06.md are auditable without running Spark.
  *
  * Usage: runMain graft.bench.BenchExtra <suffix> <query,query,...>
  *   env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  *        SPARK_GRAFT_CPUS (default 32)
  *        SPARK_GRAFT_EXTRA_REPS (default 5)
  *        SPARK_GRAFT_PLAN_DIR (default plans/r06)
  *        SPARK_GRAFT_EXTRA_NOOP (default 1; 0 skips the noop pass)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keySet.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_EXTRA_REPS")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(5)
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r06")
    val doNoop = !sys.env.get("SPARK_GRAFT_EXTRA_NOOP").contains("0")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count() // warm-up

    Files.createDirectories(Paths.get(planDir))
    val out = names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        spark.sparkContext.setJobDescription(s"$name [$suffix]")
        val df = fn(spark, sfDir)
        // plan dump (df.explain goes to stdout; capture via QueryExecution)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(
          Paths.get(s"$planDir/${name}_$suffix.txt"), plan)
        // bench-identical action: count(), min of reps
        val cTimes = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (cSec, n) = cTimes.minBy(_._1)
        // noop sink: computes every column of every row (guide §1.4)
        val nSec = if (doNoop) {
          val ts = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          ts.min
        } else Double.NaN
        spark.sparkContext.setJobDescription(null)
        System.err.println(
          f"[extra] $name%-28s count=$cSec%8.3f s  noop=$nSec%8.3f s  ($n rows, min of $reps)")
        (name, cSec, nSec, n)
      }
    }
    val json = out.map { case (k, c, nn, _) =>
      val noopPart = if (nn.isNaN) "" else f""","noop":$nn%.3f"""
      s""""$k":{"count":${f"$c%.3f"}$noopPart}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"extra","suffix":"$suffix","queries":$json,"sf":"$sfDir"}""")
    spark.stop()
  }
}
