package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary diagnostic for the minhash hot path. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      System.err.println(
        f"PROBE $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }
    t("words")(d.select(size(split(col("text"), " ")).as("n"))
      .agg(sum("n")).collect().head.getLong(0))
    t("shingles")(d.select(graft.functions.TextFunctions
        .shingles(split(col("text"), " "), 3).as("s"))
      .select(size(col("s")).as("n")).agg(sum("n")).collect().head.getLong(0))
    t("shingleHashes")(d.select(graft.functions.TextFunctions
        .shingleHashes(col("text"), 3).as("hs"))
      .select(size(col("hs")).as("n")).agg(sum("n")).collect().head.getLong(0))
    t("signatures")(graft.operators.Dedup
      .minhashSignatures(d, "doc_id", "text", 16).count())
    t("banded")(graft.operators.Dedup
      .minhashSignatures(d, "doc_id", "text", 16)
      .select(col("doc_id"), posexplode(transform(sequence(lit(0), lit(3)),
        b => concat_ws("_", slice(col("sig"), b * 4 + 1, lit(4)))))
        .as(Seq("band_idx", "band_key"))).count())
    t("pairs")(graft.operators.Dedup
      .minhashLshPairs(d, "doc_id", "text", 16, 4, 0.5).count())
    spark.stop()
  }
}
