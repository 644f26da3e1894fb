package graft.operators

import graft.SparkSpec
import graft.jobs.ValidationJob
import graft.operators.SchemaCheck._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types._

class SchemaCheckSpec extends SparkSpec {
  import spark.implicits._

  private val seqSchema = Encoders.product[graft.model.Sequence].schema

  test("diff reports added, removed, and retyped columns") {
    val before = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("tokens", ArrayType(IntegerType, containsNull = false)),
      StructField("n_tok", IntegerType)))
    val after = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("tokens", ArrayType(StringType)),
      StructField("extra", LongType)))
    val d = diff(before, after)
    assert(d.map(c => (c.column, c.change)).toSet == Set(
      ("n_tok", Removed), ("tokens", TypeChanged), ("extra", Added)))
  }

  test("diff ignores nullability at every nesting level") {
    val a = StructType(Seq(
      StructField("tokens", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    val b = StructType(Seq(
      StructField("tokens", ArrayType(IntegerType, containsNull = true),
        nullable = true)))
    assert(diff(a, b).isEmpty)
  }

  test("requireCompatible tolerates extra columns, aborts on missing/retyped") {
    val extra = StructType(seqSchema.fields :+ StructField("added", LongType))
    requireCompatible(extra, seqSchema, "t") // no throw
    val retyped = StructType(seqSchema.fields.map {
      case f if f.name == "n_tok" => StructField("n_tok", StringType)
      case f => f
    })
    val e = intercept[IllegalStateException](
      requireCompatible(retyped, seqSchema, "t"))
    assert(e.getMessage.contains("n_tok"), e.getMessage)
    val missing = StructType(seqSchema.fields.filterNot(_.name == "tokens"))
    val e2 = intercept[IllegalStateException](
      requireCompatible(missing, seqSchema, "t"))
    assert(e2.getMessage.contains("tokens"), e2.getMessage)
  }

  test("validation aborts up front on a structurally drifted input table") {
    val dir = tmpDir("schemagate")
    // tokens written as array<string> — the enforced-schema read would
    // have silently nulled/coerced; the gate must name the column instead
    Seq(("D000000000001", Seq("1", "2"), 2, "s"))
      .toDF("doc_id", "tokens", "n_tok", "source")
      .write.partitionBy("source").parquet(s"$dir/input")
    Seq(("s", 1L, 0, 10, "0" * 32))
      .toDF("source", "expected_docs", "min_tok", "max_tok", "checksum")
      .write.parquet(s"$dir/manifest")
    val e = intercept[IllegalStateException] {
      ValidationJob.run(spark, ValidationJob.Config(
        inputPath = s"$dir/input", manifestPath = s"$dir/manifest",
        outDir = s"$dir/out"))
    }
    assert(e.getMessage.contains("schema drift") &&
      e.getMessage.contains("tokens"), e.getMessage)
  }

  test("parquetSchema does not type-infer partition values") {
    val dir = tmpDir("partinfer")
    // numeric-looking partition dir (source=123) must still probe string
    Seq(("D000000000001", Seq(1, 2), 2, "123"))
      .toDF("doc_id", "tokens", "n_tok", "source")
      .write.partitionBy("source").parquet(s"$dir/input")
    val s = parquetSchema(spark, s"$dir/input")
    assert(s("source").dataType == StringType, s.treeString)
    requireCompatible(s, seqSchema, "t") // compatible as a whole
  }

  test("concurrent schema probes never corrupt the shared session's " +
      "partition-type inference (regression: stuck-false race)") {
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    assert(spark.conf.get(key) === "true")
    val dir = tmpDir("partrace")
    Seq(("D000000000001", Seq(1, 2), 2, "123"))
      .toDF("doc_id", "tokens", "n_tok", "source")
      .write.partitionBy("source").parquet(s"$dir/input")
    // a set/restore toggle on the shared conf loses this race about
    // half the time at 16 interleaved probes; the isolated probe
    // session cannot — and inferring readers keep working THROUGHOUT
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val probes = (1 to 16).map { _ =>
      Future(parquetSchema(spark, s"$dir/input"))
    }
    val readers = (1 to 4).map { _ =>
      Future {
        // shared-session read with inference ON: partition col is INT
        spark.read.parquet(s"$dir/input").schema("source").dataType
      }
    }
    Await.result(Future.sequence(probes), 120.seconds)
      .foreach(s => assert(s("source").dataType == StringType))
    Await.result(Future.sequence(readers), 120.seconds)
      .foreach(dt => assert(dt == org.apache.spark.sql.types.IntegerType))
    assert(spark.conf.get(key) === "true",
      "shared session conf was corrupted by a schema probe")
  }
}
