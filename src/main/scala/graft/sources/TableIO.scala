package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Thin storage abstraction (SURVEY.md §7.1): the BASELINE input hint names
 * Iceberg, but the sandbox ships no Iceberg runtime, so the default
 * implementation is source-partitioned Parquet + an engine-maintained
 * snapshot id, carrying the Iceberg concepts the engine needs (partitioned
 * layout, idempotent partition overwrite, stable snapshot identity for
 * checkpoint lineage). An Iceberg-catalog implementation can slot in when
 * the runtime jar is present — the engine only uses this interface.
 */
object TableIO {

  /** Write partitioned by `source` with DYNAMIC partition overwrite — the
    * Spark-native form of the reference's delete-then-rewrite idempotent
    * refresh (reference manifest_processor.py:465-491): re-running a
    * partition replaces exactly that partition's files, nothing else. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String = "source"): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Stable snapshot identity for a table path: hash of the sorted data
    * file (name, length) listing — deterministic for identical data,
    * changes when any file changes. Stands in for an Iceberg snapshot id
    * in checkpoint lineage. */
  def snapshotId(spark: SparkSession, path: String): String = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(dir: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(dir).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (!st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
          files += s"${st.getPath.toUri.getPath}:${st.getLen}"
      }
    walk(p)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(files.sorted.mkString("\n").getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  }
}
