package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing contracts (SURVEY §2.9): real javax.imageio
  * decode for image payloads, deterministic stub for un-decodable
  * media, correct batch shape, shuffle-free plan.
  */
class MultimodalSpec extends SparkSuite {

  test("image payloads take the REAL codec path (javax.imageio)") {
    val png = Multimodal.syntheticPng("decode me for real".getBytes("UTF-8"))
    val a = Multimodal.MediaAsset(7L, "image", png, 8, 8, 1)
    val f = Multimodal.decodeAsset(a, 4)
    // one container frame, luminance histogram normalized over pixels
    assert(f.sampled_frames == 1)
    assert(math.abs(f.feature.sum - 1.0f) < 1e-5)
    assert(f.n_bytes == png.length.toLong)
    // deterministic: same payload, same features
    assert(f.feature.toSeq == Multimodal.decodeAsset(a, 4).feature.toSeq)
    // and it is NOT the stub's byte histogram
    assert(f.feature.toSeq != Multimodal.stubDecode(a, 4).feature.toSeq)
  }

  test("image resize is a true bilinear rescale, re-decodable") {
    val png = Multimodal.syntheticPng(Array.tabulate[Byte](100)(_.toByte))
    val a = Multimodal.MediaAsset(8L, "image", png, 8, 8, 1)
    val r = Multimodal.resizeAsset(a, 4, 4)
    assert(r.width == 4 && r.height == 4)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.data))
    assert(img.getWidth == 4 && img.getHeight == 4)
  }

  test("features query exercises both codec paths in one pass") {
    val docs = Tables(spark, sf, "documents").limit(40)
    val out = Multimodal.features(spark, docs)
    val kinds = out.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio"))
    assert(out.where(col("n_bytes") <= 0).count() == 0)
  }

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

  test("dhash: invariant to brightness shift and resize, far for distinct images") {
    import graft.functions.ImageOps
    val gradient = Array.tabulate(64)(i => (i * 3).toByte) // ≤189: +30 stays unclamped
    val noise = Array.tabulate(64)(i => ((i * 37 + 11) % 251).toByte)
    val a = Multimodal.syntheticPng(gradient)
    val aBright = Multimodal.syntheticPng(gradient, shift = 30)
    val aBig = ImageOps.resize(a, 32, 32)
    val b = Multimodal.syntheticPng(noise)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val ha = ImageOps.dhash64(a)
    assert(ham(ha, ImageOps.dhash64(aBright)) <= 2, "brightness shift must barely move dhash")
    assert(ham(ha, ImageOps.dhash64(aBig)) <= 6, "resize must stay near")
    assert(ham(ha, ImageOps.dhash64(b)) >= 16, "distinct images must land far")
  }

  test("image near-dup pairing recovers planted brightness-shifted copies") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents").where(col("doc_id") < 60)
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
    val imgs = docs.mapPartitions(_.flatMap { case (id, text) =>
      val raw = text.getBytes("UTF-8")
      val orig = (id, Multimodal.syntheticPng(raw))
      if (id < 15) Seq(orig, (id + 100000L, Multimodal.syntheticPng(raw, shift = 30)))
      else Seq(orig)
    }).toDF("img_id", "png")
    val pairs = Multimodal.imageDupPairs(imgs, "img_id", "png", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 15L).map(id => (id, id + 100000L))
    val found = planted.count(p => pairs.contains(p) || pairs.contains(p.swap))
    assert(found >= 13, s"recovered $found/15 planted image near-dups")
    // no pixels in the shuffle: the plan's exchange carries chunk/value/id
    val plan = Multimodal.imageDupPairs(imgs, "img_id", "png")
      .queryExecution.executedPlan.toString
    assert(plan.contains("image_dhash"), plan.take(1200))
  }
}
