package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing contracts (SURVEY §2.9): deterministic stub
  * decode, correct batch shape, shuffle-free plan.
  */
class MultimodalSpec extends SparkSuite {

  test("stub decoder is deterministic and histogram is normalized") {
    val a = Multimodal.MediaAsset(1L, "image", "hello multimodal world".getBytes, 64, 64, 1)
    val f1 = Multimodal.stubDecode(a, 4)
    val f2 = Multimodal.stubDecode(a, 4)
    assert(f1.feature.toSeq == f2.feature.toSeq)
    assert(math.abs(f1.feature.sum - 1.0f) < 1e-5)
    assert(f1.n_bytes == a.data.length.toLong)
  }

  test("decodeFeatures preserves rows and schema over real data") {
    val docs = Tables(spark, sf, "documents").limit(100)
    val out = Multimodal.features(spark, docs)
    assert(out.count() == 100)
    assert(out.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "sampled_frames", "feature_json"))
    assert(out.where(col("n_bytes") <= 0).count() == 0)
  }

  test("decode pipeline is shuffle-free (mapPartitions, no Exchange)") {
    val docs = Tables(spark, sf, "documents")
    val plan = Multimodal.features(spark, docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode should not shuffle:\n$plan")
  }

  test("resize: deterministic, exact target size, end-to-end into decode") {
    val a = Multimodal.MediaAsset(3L, "image", Array.tabulate[Byte](1000)(_.toByte), 100, 10, 1)
    val r = Multimodal.resizeStub(a, 8, 8)
    assert(r.data.length == 64 && r.width == 8 && r.height == 8)
    assert(r.data.toSeq == Multimodal.resizeStub(a, 8, 8).data.toSeq)
    // distributed resize feeds decode without shuffle
    val docs = Tables(spark, sf, "documents").limit(50)
    val resized = Multimodal.resize(
      Multimodal.asAssets(docs, "doc_id", "text"), 16, 16)
    val feats = Multimodal.decodeFeatures(resized)
    assert(feats.count() == 50)
    assert(resized.head().data.length == 256)
  }

  test("frame sampling follows the stride") {
    val bytes = new Array[Byte](256 * 8) // exactly 8 frames
    val a = Multimodal.MediaAsset(2L, "video", bytes, 64, 64, 8)
    assert(Multimodal.stubDecode(a, 4).sampled_frames == 2)
    assert(Multimodal.stubDecode(a, 1).sampled_frames == 8)
  }
}
