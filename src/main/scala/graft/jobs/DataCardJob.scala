package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{shingles, stopwordRatio, words}

/**
 * Corpus DATA CARD: the human-readable per-dataset summary published next
 * to a training corpus (HF dataset cards / Dolma-style data sheets) — the
 * corpus-side sibling of [[ReportJob]]'s per-run validation report
 * (reference analog: the rendered submission report body,
 * lambdas/functions/report/report.py:149-166, generalized from one
 * submission's files to a whole corpus).
 *
 * Everything on the card is dimension-sized and single-pass-per-shape:
 *  - the narrow (source, lang, nw, n_chars, gate flags) projection is
 *    computed ONCE (text decoded once) and persisted; the per-source and
 *    per-lang tables are two cheap map-side-combined aggregations over it;
 *  - exact-duplicate mass is ONE md5 groupBy (the dedup_exact shape);
 *  - top terms are ONE word exchange with map-side combine +
 *    TakeOrdered(k) (the ngram_topk discipline — no global sort).
 * Quality gates are the SAME three predicates `quality_ablation` oracles
 * (length / repetition / language), so the card cannot drift from the
 * verified gate suite.
 */
object DataCardJob {

  private def fmtPct(num: Long, den: Long): String =
    if (den == 0L) "0.0%"
    else f"${num.toDouble * 100.0 / den.toDouble}%.1f%%"

  def render(spark: SparkSession, docsPath: String, topK: Int = 10): String = {
    val docs = spark.read.parquet(docsPath)

    val w = words(col("text"))
    def dupFrac(arr: org.apache.spark.sql.Column) =
      when(size(arr) > 0,
        lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr))
        .otherwise(lit(0.0))
    // the three verified gate predicates (quality_ablation's definitions)
    val flat = docs.select(
      col("source"), col("lang"),
      size(w).cast("long").as("nw"),
      col("n_chars").cast("long").as("nc"),
      (!(col("n_chars") >= 100 && size(w) >= 20)).as("gl"),
      (dupFrac(w) > 0.6 || dupFrac(shingles(w, 3)) > 0.2).as("gr"),
      (stopwordRatio(col("text")) <= 0.03).as("gg"))
      .persist()

    def flagged = col("gl") || col("gr") || col("gg")
    val perSource = flat.groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("nw").as("ws"),
        sum("nc").as("cs"),
        sum(when(flagged, 1L).otherwise(0L)).as("fl"))
      .orderBy("source")
      .collect()
    val perLang = flat.groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum("nw").as("ws"))
      .orderBy("lang")
      .collect()
    flat.unpersist()

    val nDocs = perSource.map(_.getAs[Long]("docs")).sum
    val nWords = perSource.map(_.getAs[Long]("ws")).sum
    val nChars = perSource.map(_.getAs[Long]("cs")).sum
    val nFlagged = perSource.map(_.getAs[Long]("fl")).sum

    // exact-duplicate mass: docs − distinct content hashes (dedup_exact's
    // one hash exchange; countDistinct partial-aggregates map-side)
    val nContent = docs.select(md5(col("text")).as("h"))
      .agg(countDistinct(col("h"))).collect().head.getLong(0)
    val nDupDocs = nDocs - nContent

    // corpus top terms: one word exchange + TakeOrdered (never a sort)
    val topTerms = docs
      .select(explode(words(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term").asc)
      .limit(topK)
      .collect()

    val sb = new StringBuilder
    def header(title: String): String =
      (s"-- $title " + "-" * 78).take(78) + "\n"
    sb ++= ("== DATA CARD " + "=" * 78).take(78) + "\n"
    sb ++= s"corpus    : $docsPath\n"
    sb ++= f"documents : $nDocs%d%n"
    sb ++= f"words     : $nWords%d  (chars: $nChars%d)%n"
    sb ++= s"exact dups: $nDupDocs docs share another doc's content " +
      s"(${fmtPct(nDupDocs, nDocs)})\n"
    sb ++= s"quality   : $nFlagged docs flagged by the rule gates " +
      s"(${fmtPct(nFlagged, nDocs)} - length/repetition/language)\n"
    sb ++= "\n" + header("sources")
    sb ++= f"${"source"}%-10s ${"docs"}%10s ${"words"}%12s " +
      f"${"doc share"}%10s ${"flagged"}%9s%n"
    perSource.foreach { r =>
      val d = r.getAs[Long]("docs")
      sb ++= f"${r.getAs[String]("source")}%-10s $d%10d " +
        f"${r.getAs[Long]("ws")}%12d ${fmtPct(d, nDocs)}%10s " +
        f"${fmtPct(r.getAs[Long]("fl"), d)}%9s%n"
    }
    sb ++= "\n" + header("languages")
    perLang.foreach { r =>
      sb ++= f"${r.getAs[String]("lang")}%-10s " +
        f"${r.getAs[Long]("docs")}%10d ${r.getAs[Long]("ws")}%12d%n"
    }
    sb ++= "\n" + header(s"top $topK terms")
    topTerms.foreach { r =>
      sb ++= f"${r.getAs[String]("term")}%-20s ${r.getAs[Long]("c")}%12d%n"
    }
    sb.result()
  }
}
