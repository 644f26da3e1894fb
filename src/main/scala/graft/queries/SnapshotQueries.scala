package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.SnapshotDiff

/**
 * Cross-snapshot and result-scan queries:
 *
 *  - j10_snapshot_equality: row-level keyed equality across two snapshots
 *    (reference J10, move_to_new_pipeline_check.py:84-147; the BASELINE
 *    per-row invariant in table form). The "new" snapshot is derived
 *    deterministically from `documents` (drops, perturbations, additions),
 *    and the oracle derives the identical snapshot in SQL.
 *
 *  - s8_results_json: array-of-structs JSON results scan (reference S8,
 *    s3.py:164-174 + s3_event_recorder.py:182-236 — one `__results.json`
 *    per file holding an array of {staging_key, task_type, value,
 *    status}). The JSON strings are synthesized deterministically per doc,
 *    then parsed with from_json + explode; the oracle computes the same
 *    fields directly, checking the engine's JSON round-trip exactly.
 */
object SnapshotQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Deterministic "new" snapshot: doc_id%97==0 dropped (missing_in_new),
    * doc_id%89==0 text-perturbed (mismatch), doc_id%101==0 re-added under
    * a shifted key (missing_in_old). */
  private def newSnapshot(d: DataFrame): DataFrame =
    d.filter(col("doc_id") % 97 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 89 === 0, concat(col("text"), lit(" drifted")))
          .otherwise(col("text")))
      .unionByName(
        d.filter(col("doc_id") % 101 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))

  private val resultsSchema = org.apache.spark.sql.types.DataType
    .fromDDL("array<struct<staging_key:string,task_type:string," +
      "value:string,status:string>>")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j10_snapshot_equality" -> ((s, dir) => {
      val d = docs(s, dir)
      SnapshotDiff.diff(d, newSnapshot(d), "doc_id",
        TextFunctions.polyHash(col("text")), length(col("text")))
    }),

    "s8_results_json" -> ((s, dir) => {
      val d = docs(s, dir)
      val json = to_json(array(
        struct(
          concat(lit("staging/"), col("doc_id").cast("string"), lit(".txt"))
            .as("staging_key"),
          lit("CHECKSUM_VALIDATION").as("task_type"),
          md5(col("text")).as("value"),
          when(col("n_chars") % 7 === 0, "FAIL").otherwise("SUCCEED")
            .as("status")),
        struct(
          concat(lit("staging/"), col("doc_id").cast("string"), lit(".txt"))
            .as("staging_key"),
          lit("FILE_VALIDATION").as("task_type"),
          col("n_chars").cast("string").as("value"),
          when(col("n_chars") % 11 === 0, "FAIL").otherwise("SUCCEED")
            .as("status"))))
      d.select(col("doc_id"), from_json(json, resultsSchema).as("results"))
        .select(col("doc_id"), explode(col("results")).as("r"))
        .select(col("doc_id"), col("r.staging_key").as("staging_key"),
          col("r.task_type").as("task_type"), col("r.value").as("value"),
          col("r.status").as("status"))
    })
  )

  private val polyHashOf =
    (c: String) => s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ascii(ch) AS BIGINT) for ch in string_split($c,'')]), " +
      s"(a,b)->(a*31+b)%1000000007)"

  val oracles: Map[String, String] = Map(
    "j10_snapshot_equality" ->
      s"""WITH newt AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 89 = 0 THEN text || ' drifted'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 97 <> 0
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents
            WHERE doc_id % 101 = 0),
          o AS (SELECT doc_id AS k, ${polyHashOf("text")} AS old_hash,
                       CAST(len(text) AS BIGINT) AS old_len FROM documents),
          n AS (SELECT doc_id AS nk, ${polyHashOf("text")} AS new_hash,
                       CAST(len(text) AS BIGINT) AS new_len FROM newt),
          d AS (
            SELECT COALESCE(k, nk) AS doc_id,
                   CASE WHEN nk IS NULL THEN 'missing_in_new'
                        WHEN k IS NULL THEN 'missing_in_old'
                        WHEN old_hash <> new_hash OR old_len <> new_len
                          THEN 'mismatch'
                        ELSE 'equal' END AS status,
                   old_hash, new_hash, old_len, new_len
            FROM o FULL OUTER JOIN n ON k = nk)
          SELECT * FROM d WHERE status <> 'equal'""",
    "s8_results_json" ->
      """SELECT doc_id,
                'staging/' || CAST(doc_id AS VARCHAR) || '.txt' AS staging_key,
                'CHECKSUM_VALIDATION' AS task_type,
                md5(text) AS value,
                CASE WHEN n_chars % 7 = 0 THEN 'FAIL'
                     ELSE 'SUCCEED' END AS status
         FROM documents
         UNION ALL
         SELECT doc_id,
                'staging/' || CAST(doc_id AS VARCHAR) || '.txt',
                'FILE_VALIDATION',
                CAST(n_chars AS VARCHAR),
                CASE WHEN n_chars % 11 = 0 THEN 'FAIL' ELSE 'SUCCEED' END
         FROM documents"""
  )
}
