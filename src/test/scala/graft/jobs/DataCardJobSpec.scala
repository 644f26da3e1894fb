package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The data card renders from the real documents table and its numbers
  * must agree with directly-computed aggregates (the card is derived
  * state — any drift from the table is a bug, not a formatting choice). */
class DataCardJobSpec extends SparkSpec {

  private val docsPath = "/root/testdata/sf0.001/documents.parquet"

  test("data card totals, source rows and top terms agree with the table") {
    val text = DataCardJob.render(spark, docsPath, topK = 5)
    val docs = spark.read.parquet(docsPath)

    val nDocs = docs.count()
    val nWords = docs.select(sum(size(split(col("text"), " "))))
      .collect().head.getLong(0)
    assert(text.contains("== DATA CARD"))
    assert(text.contains(s"documents : $nDocs"))
    assert(text.contains(s"words     : $nWords"))

    // every source appears in the composition table
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0))
    sources.foreach(s => assert(text.contains(s), s"missing source $s"))

    // exact-dup line agrees with the md5-distinct computation
    val nContent = docs.select(md5(col("text")).as("h"))
      .agg(countDistinct(col("h"))).collect().head.getLong(0)
    assert(text.contains(s"exact dups: ${nDocs - nContent} docs"))

    // top-terms section holds exactly topK rows, led by the true argmax
    val top = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count()
      .orderBy(col("count").desc, col("t").asc)
      .limit(1).collect().head
    val termSection = text.split("-- top 5 terms").last.trim
      .linesIterator.toSeq.drop(1) // remainder of the header rule line
    assert(termSection.size === 5)
    assert(termSection.head.startsWith(top.getString(0)))
    assert(termSection.head.trim.endsWith(top.getLong(1).toString))
  }

  test("context-length sizing and vocabulary coverage sections agree " +
      "with directly computed aggregates and the oracled query") {
    val text = DataCardJob.render(spark, docsPath, topK = 5)
    val docs = spark.read.parquet(docsPath)
    val nw = docs.select(size(split(col("text"), " ")).cast("long").as("nw"))
    val r64 = nw.agg(
      sum(when(col("nw") > 64L, 1L).otherwise(0L)).as("t"),
      sum(least(col("nw"), lit(64L))).as("k")).collect().head
    val ctxLine = text.linesIterator
      .find(_.trim.startsWith("64 ")).getOrElse(sys.error("no 64 row"))
    val cols = ctxLine.trim.split("\\s+")
    assert(cols(1).toLong == r64.getLong(0), s"truncated: $ctxLine")
    assert(cols(2).toLong == r64.getLong(1), s"kept: $ctxLine")
    val vneed99 = graft.SparkEntry.queries("vocab_coverage")(
      spark, "/root/testdata/sf0.001")
      .filter(col("pct") === 99).collect().head.getAs[Long]("vocab_needed")
    assert(text.contains(s"99% of token mass: $vneed99 distinct words"),
      text.split("vocabulary coverage").last.take(300))
  }

  test("datacard is deterministic across renders") {
    val a = DataCardJob.render(spark, docsPath, topK = 3)
    val b = DataCardJob.render(spark, docsPath, topK = 3)
    assert(a === b)
  }
}
