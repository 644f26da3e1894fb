package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/**
 * Text-CLEANING operators: canonical normalization ahead of exact dedup
 * ("fuzzy-exact" dedup — trivial formatting variants collapse to one
 * key), and PII detection + redaction. Reference analog: the per-file
 * content gates (checksum + structure validation, validate_file_data.py)
 * generalized to content-level hygiene a training-data pipeline needs.
 *
 * Both operators are pure codegen'd projections (regex + hash per row,
 * no shuffle) followed by at most one hash aggregation — the 100 TB shape
 * is a single scan.
 */
object CleanQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Oracle fragment mirroring [[normalizeText]] (DuckDB regexp_replace
    * needs the explicit 'g' flag; Spark's replaces globally by default).
    * Shared with [[DedupQueries]]' sorted-neighborhood oracle, whose sort
    * key is the same normal form. */
  private[queries] def sqlNormalize(expr: String): String =
    s"trim(regexp_replace(regexp_replace(lower($expr), " +
      s"'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** The synthetic corpus carries no real PII, so the PII query PLANTS
    * deterministic doc_id-derived PII into every row — identically in
    * engine and oracle — and cross-verifies detection counts and the
    * redacted output. The operator itself ([[piiCount]]/[[redactPii]])
    * takes any text column; PiiSpec covers realistic strings. Division
    * by 256 (a power of two) is exact in double, so the Spark cast and
    * DuckDB's integer `//` agree. */
  private def planted(textCol: String): org.apache.spark.sql.Column = {
    val d = col("doc_id")
    concat(col(textCol),
      lit(" contact user"), d.cast("string"), lit("@example.com"),
      lit(" call +1 415 555 0"),
      lpad((d % 100).cast("string"), 3, "0"),
      lit(" from 10.0."), (d % 256).cast("string"), lit("."),
      ((d / 256).cast("long") % 256).cast("string"))
  }

  private val sqlPlanted =
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'" +
      " || ' call +1 415 555 0' ||" +
      " lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0')" +
      " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||" +
      " CAST((doc_id // 256) % 256 AS VARCHAR)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // fuzzy-exact dedup: normalize (case / punctuation / whitespace)
    // before hashing, so formatting variants land in one group. Emits
    // EVERY doc with its normalized key + group size (this corpus has no
    // exact dups — see dedup_exact — so a groups-only output would be a
    // trivially-empty oracle; per-row keys verify the normal form itself).
    // Group size via a count window over the key: ONE exchange.
    "dedup_normalized" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), md5(normalizeText(col("text"))).as("norm_md5"))
        .withColumn("n_group", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("norm_md5"))))
    }),

    // PII scan + redaction over planted doc_id-derived PII (see
    // [[planted]]): per doc, detector hit counts and the md5 of the
    // redacted text — any count or replacement divergence breaks the hash
    "pii_redact" -> ((s, dir) => {
      val t = planted("text")
      docs(s, dir).select(
        col("doc_id"),
        piiCount(t, emailPattern).as("n_email"),
        piiCount(t, phonePattern).as("n_phone"),
        piiCount(t, ipPattern).as("n_ip"),
        md5(redactPii(t)).as("red_md5"))
    }))

  val oracles: Map[String, String] = Map(
    "dedup_normalized" ->
      s"""SELECT doc_id, md5(${sqlNormalize("text")}) AS norm_md5,
                 COUNT(*) OVER (PARTITION BY md5(${sqlNormalize("text")}))
                   AS n_group
          FROM documents""",
    "pii_redact" ->
      s"""WITH p AS (SELECT doc_id, $sqlPlanted AS t FROM documents)
          SELECT doc_id,
                 CAST(len(regexp_extract_all(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                   AS BIGINT) AS n_email,
                 CAST(len(regexp_extract_all(t,
                   '\\+[0-9][0-9 ]{6,}[0-9]')) AS BIGINT) AS n_phone,
                 CAST(len(regexp_extract_all(t,
                   '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS BIGINT) AS n_ip,
                 md5(regexp_replace(regexp_replace(regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   '\\+[0-9][0-9 ]{6,}[0-9]', '<PHONE>', 'g'),
                   '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'))
                   AS red_md5
          FROM p""")
}
