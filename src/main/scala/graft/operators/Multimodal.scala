package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns with typed metadata; decode / feature-extraction runs
 * per partition in fixed-size batches (the Scala analog of a batched
 * Pandas-UDF stage). The actual codec is STUBBED — this sandbox ships no
 * image/audio libraries — behind [[MediaCodec]], with a deterministic fake
 * implementation so the Spark-side plumbing (schema, partitioning, batch
 * shape, null handling) is real and tested. Swap [[MediaCodec.decode]] for
 * a real decoder (JNI/ffmpeg/javacv) without touching the plan.
 */
object Multimodal {

  /** Typed metadata accompanying every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Decoder contract. A real deployment implements this with an image /
    * audio library; the sandbox uses [[FakeCodec]]. */
  trait MediaCodec extends Serializable {
    /** Decode a payload into a fixed-length feature vector. */
    def decode(payload: Array[Byte], mime: String): Array[Float]
  }

  /** Deterministic stand-in: feature lane j = (sum of payload bytes at
    * positions ≡ j mod dim) mod 1009, as a float. Integer-valued floats
    * (< 2^24, exactly representable) by design, so the DuckDB oracle
    * reproduces the features bit-for-bit with integer arithmetic — no
    * cross-engine float-accumulation-order hazards. Tests stay stable and
    * the batch plumbing is exercised with realistic shapes. */
  object FakeCodec extends MediaCodec {
    val dim = 8
    def decode(payload: Array[Byte], mime: String): Array[Float] = {
      val sums = new Array[Long](dim)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          sums(i % dim) += (payload(i) & 0xff)
          i += 1
        }
      }
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) { out(j) = (sums(j) % 1009L).toFloat; j += 1 }
      out
    }
  }

  final case class MediaFeatures(
      media_id: Long, mime: String, n_bytes: Int, features: Array[Float])

  /** Batched per-partition feature extraction (mapPartitions — the one
    * justified use: imperative per-batch codec calls that expressions
    * can't express). Batch size bounds peak memory per task; partitions
    * stream through without materializing. */
  def extractFeatures(
      media: DataFrame,
      codec: MediaCodec = FakeCodec,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, mime, payload) =>
            val nb = if (payload == null) 0 else payload.length
            MediaFeatures(id, mime, nb, codec.decode(payload, mime))
          }
        }
      }
  }

  /** Demo media table synthesized from the documents table: utf-8 payload
    * bytes standing in for encoded media (deterministic, no external
    * data). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, lit("image/png"))
        .otherwise(lit("audio/wav")).as("mime"),
      encode(col("text"), "utf-8").as("payload"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"))
}
