package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries aggregate the operator inventories under graft.queries. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the verdict roll-up (A9 semantics) over documents. */
  def entry(spark: SparkSession): DataFrame =
    queries("a9_verdict_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      SnapshotQueries.queries ++ CorpusQueries.queries ++
      DistributionQueries.queries ++ CleanQueries.queries ++
      QualityQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++
      SnapshotQueries.oracles ++ CorpusQueries.oracles ++
      DistributionQueries.oracles ++ CleanQueries.oracles ++
      QualityQueries.oracles
}
