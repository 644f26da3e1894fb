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

  test("frame sampling emits every Nth full frame with exact fingerprints") {
    val payload = ("abcdefgh" * 13).getBytes("UTF-8") // 104 bytes
    val media = Seq((7L, "video/mp4", payload), (8L, "video/mp4", null))
      .toDF("media_id", "mime", "payload")
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, every = 2)
      .collect().sortBy(_.frame_idx)
    // 104/32 = 3 full frames (idx 0,1,2); every=2 keeps 0 and 2
    assert(frames.map(f => (f.media_id, f.frame_idx)).toSeq ===
      Seq((7L, 0), (7L, 2)))
    assert(frames.forall(_.frame_len === 32))
    // fingerprint equals poly_hash of the corresponding text slice
    val expected = frames.map { f =>
      val s = new String(payload, f.frame_idx * 32, 32, "UTF-8")
      graft.functions.PolyHashUtil.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
    }
    assert(frames.map(_.frame_fp).toSeq === expected.toSeq)
  }

  test("resize: nearest-neighbor downsample; short payloads pass through") {
    val long = ("0123456789" * 20).getBytes("UTF-8") // 200 bytes
    val short = "tiny".getBytes("UTF-8")
    val media = Seq((1L, "image/png", long), (2L, "image/png", short),
        (3L, "image/png", null))
      .toDF("media_id", "mime", "payload")
    val out = Multimodal.resizePayload(media, targetBytes = 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload"))
      .toMap
    assert(out(1L).length === 64)
    assert(out(2L).toSeq === short.toSeq) // pass-through
    // missing media stays MISSING (null), not present-but-empty — the
    // schema declares payload nullable and downstream IS NULL checks
    // depend on the distinction
    assert(out(3L) == null)
    // spot-check the index formula: out[i] = in[floor(i*len/target)]
    (0 until 64).foreach { i =>
      assert(out(1L)(i) === long((i.toLong * 200 / 64).toInt))
    }
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
