package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("batched feature extraction is deterministic and null-safe") {
    val media = Seq(
      (1L, "image/png", "some bytes here".getBytes("UTF-8")),
      (2L, "audio/wav", "other payload".getBytes("UTF-8")),
      (3L, "image/png", null: Array[Byte])
    ).toDF("media_id", "mime", "payload")

    val f1 = Multimodal.extractFeatures(media, batchSize = 2)
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, batchSize = 64)
      .collect().sortBy(_.media_id)

    assert(f1.length === 3)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.features.sameElements(b.features)) // batch size irrelevant
    }
    assert(f1.forall(_.features.length === Multimodal.FakeCodec.dim))
    assert(f1.find(_.media_id == 3L).get.n_bytes === 0)
    assert(f1.find(_.media_id == 1L).get.n_bytes === 15)
    // content-sensitive: different payloads, different features
    assert(!f1(0).features.sameElements(f1(1).features))
  }

  test("mediaFromDocuments preserves byte lengths and routes mimes") {
    val docs = Seq((0L, "abc"), (1L, "defg")).toDF("doc_id", "text")
    val m = Multimodal.mediaFromDocuments(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getAs[Array[Byte]]("payload").length)).toMap
    assert(m(0L) === ("image/png", 3))
    assert(m(1L) === ("audio/wav", 4))
  }
}
