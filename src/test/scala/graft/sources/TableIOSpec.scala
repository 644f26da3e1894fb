package graft.sources

import graft.SparkSpec
import graft.gen.SequenceGen
import org.apache.spark.sql.functions._

class TableIOSpec extends SparkSpec {
  import spark.implicits._

  test("manifest TSV round-trips with trim + fill semantics") {
    val dir = tmpDir("tsv")
    val tsv = s"$dir/manifest_tsv"
    SequenceGen.manifest(spark, 200).toDF()
      .withColumn("source", concat(lit("  "), col("source"), lit(" ")))
      .createOrReplaceTempView("m")
    TableIO.writeManifestTsv(spark.table("m"), tsv)
    val back = TableIO.readManifestTsv(spark, tsv)
    val srcs = back.select("source").as[String].collect().toSet
    assert(srcs === SequenceGen.sources.toSet) // trimmed
    assert(back.count() === SequenceGen.sources.size)
    assert(back.schema.fieldNames.toSeq ===
      Seq("source", "expected_docs", "min_tok", "max_tok"))
  }

  test("manifest TSV missing a required column aborts (reference " +
      "pre-flight hard fail)") {
    val dir = tmpDir("tsvbad")
    val tsv = s"$dir/manifest_bad"
    // header lacks expected_docs
    Seq(("cardiac", 0, 100)).toDF("source", "min_tok", "max_tok")
      .coalesce(1).write.option("sep", "\t").option("header", "true").csv(tsv)
    val e = intercept[IllegalArgumentException] {
      TableIO.readManifestTsv(spark, tsv)
    }
    assert(e.getMessage.contains("expected_docs"))
  }

  test("deletePartitions removes exactly the named hive partitions") {
    val dir = tmpDir("delpart")
    SequenceGen.sequences(spark, 300)
      .write.partitionBy("source").parquet(s"$dir/t")
    val before = TableIO.partitionValues(spark, s"$dir/t", "source").get
    val victim = before.head
    TableIO.deletePartitions(spark, s"$dir/t", "source", Seq(victim))
    val after = TableIO.partitionValues(spark, s"$dir/t", "source").get
    assert(after.toSet === before.toSet - victim)
  }

  test("partitionValues reads hive dirs; None for unpartitioned") {
    val dir = tmpDir("pv")
    SequenceGen.sequences(spark, 300)
      .write.partitionBy("source").parquet(s"$dir/part")
    SequenceGen.sequences(spark, 50).write.parquet(s"$dir/flat")
    val vals = TableIO.partitionValues(spark, s"$dir/part", "source")
    assert(vals.isDefined)
    assert(vals.get.toSet.subsetOf(
      (SequenceGen.sources :+ SequenceGen.unknownSource).toSet))
    assert(TableIO.partitionValues(spark, s"$dir/flat", "source").isEmpty)
    assert(TableIO.partitionValues(spark, s"$dir/nope", "source").isEmpty)
  }

  test("deletePartitions + partitionValues handle Spark-escaped values " +
      "(space, '#', '+'; ADVICE r02: URL encoding targeted 'not+provided')") {
    val dir = tmpDir("esc")
    val rows = Seq(
      ("a", "not provided"), // the manifest fill value — space stays literal
      ("b", "x#y"),          // '#' is %23-escaped by Spark
      ("c", "p+q"),          // '+' is LITERAL in hive paths (URL trap)
      ("d", "plain"))
    rows.toDF("doc_id", "source")
      .write.partitionBy("source").parquet(s"$dir/t")

    val vals = TableIO.partitionValues(spark, s"$dir/t", "source").get
    assert(vals.toSet === rows.map(_._2).toSet) // decoded round-trip

    TableIO.deletePartitions(spark, s"$dir/t", "source",
      Seq("not provided", "x#y", "p+q"))
    val after = TableIO.partitionValues(spark, s"$dir/t", "source").get
    assert(after === Seq("plain"))
  }

  test("snapshotId is stable for identical data, changes with data") {
    val dir = tmpDir("snap")
    SequenceGen.sequences(spark, 100).write.parquet(s"$dir/t")
    val s1 = TableIO.snapshotId(spark, s"$dir/t")
    val s2 = TableIO.snapshotId(spark, s"$dir/t")
    assert(s1 === s2)
    Seq(graft.model.Sequence("D999", Array(1), 1, "x")).toDS()
      .write.mode("append").parquet(s"$dir/t")
    assert(TableIO.snapshotId(spark, s"$dir/t") !== s1)
  }
}
