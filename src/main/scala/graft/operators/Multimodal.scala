package graft.operators

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ImageOps

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms.
  *
  * Image payloads (png/jpeg/gif — sniffed by magic number) decode for
  * REAL through the JDK's javax.imageio, sharing the codec with the
  * image plugin pack (functions/ImageOps): features are a 16-bin
  * luminance histogram over decoded pixels, frame counts come from the
  * container (animated GIF frames count individually), and resize is
  * true bilinear scaling. Audio/video payloads fall back to a
  * clearly-marked DETERMINISTIC STUB — the JDK ships no mp3/aac/h264
  * codecs and the container has no native media libraries — with the
  * same schema, mapPartitions batch shape, and shuffle-free plan, so a
  * JNI/FFI codec swaps in without touching the pipeline.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  case class MediaAsset(media_id: Long, kind: String, data: Array[Byte],
                        width: Int, height: Int, n_frames: Int)

  /** Decoded per-asset features. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           sampled_frames: Int, feature: Array[Float])

  private def isImage(bytes: Array[Byte]): Boolean =
    try { ImageOps.detectFormat(bytes); true }
    catch { case _: IllegalArgumentException => false }

  /** REAL image decode via javax.imageio: 16-bin luminance histogram
    * (normalized over pixel count) as the feature vector; frame count
    * from the container (GIF can be multi-frame), sampled per stride.
    */
  def imageDecode(a: MediaAsset, stride: Int): MediaFeatures = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(a.data))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "image decode error")
      val reader = readers.next()
      reader.setInput(iis)
      val nFrames = math.max(1, reader.getNumImages(true))
      val img = reader.read(0)
      val hist = new Array[Float](16)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum / 16) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(1, img.getWidth * img.getHeight).toFloat
      var j = 0
      while (j < 16) { hist(j) /= n; j += 1 }
      reader.dispose()
      MediaFeatures(a.media_id, a.kind, a.data.length.toLong,
        (nFrames + stride - 1) / stride, hist)
    } finally iis.close()
  }

  /** DETERMINISTIC STUB decoder for media the JVM cannot decode
    * (audio/video): emits a 16-bin byte histogram (normalized) as the
    * "embedding" and samples every `stride`-th 256-byte block as a
    * "frame". Deterministic in the payload bytes — tests pin outputs.
    */
  def stubDecode(a: MediaAsset, stride: Int): MediaFeatures = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < a.data.length) { hist((a.data(i) & 0xFF) / 16) += 1f; i += 1 }
    val n = math.max(a.data.length, 1).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    val frames = (a.data.length + 255) / 256
    MediaFeatures(a.media_id, a.kind, a.data.length.toLong,
      (frames + stride - 1) / stride, hist)
  }

  /** Dispatch: real codec for image payloads, stub otherwise. */
  def decodeAsset(a: MediaAsset, stride: Int): MediaFeatures =
    if (isImage(a.data)) imageDecode(a, stride) else stubDecode(a, stride)

  /** DETERMINISTIC STUB resize for non-image payloads: maps the
    * payload onto a w×h byte grid by uniform sampling.
    */
  def resizeStub(a: MediaAsset, w: Int, h: Int): MediaAsset = {
    val n = math.max(1, w * h)
    val out = new Array[Byte](n)
    val len = math.max(1, a.data.length)
    var i = 0
    while (i < n) { out(i) = a.data((i.toLong * len / n).toInt); i += 1 }
    a.copy(data = out, width = w, height = h)
  }

  /** Dispatch resize: true bilinear rescale (ImageOps, re-encoded in
    * the detected format) for images, stub grid-sample otherwise.
    */
  def resizeAsset(a: MediaAsset, w: Int, h: Int): MediaAsset =
    if (isImage(a.data)) a.copy(data = ImageOps.resize(a.data, w, h), width = w, height = h)
    else resizeStub(a, w, h)

  /** Resize a whole asset table — partition-local, shuffle-free. */
  def resize(assets: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a => resizeAsset(a, w, h)))
  }

  /** Decode + feature-extract + frame-sample, one partition at a time.
    * mapPartitions (not per-row map) so the codec path amortizes
    * reader setup across the batch — the Scala analogue of a
    * pandas-batched UDF.
    */
  def decodeFeatures(assets: Dataset[MediaAsset], frameStride: Int = 4): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would go here (codec handles, buffers)
      it.map(a => decodeAsset(a, frameStride))
    }
  }

  /** Deterministic synthetic PNG: folds the seed bytes onto an 8×8
    * grayscale grid and encodes through the real PNG codec. Lets
    * queries and tests drive the REAL decode path from arbitrary
    * deterministic bytes (documents.text) without binary fixtures.
    */
  def syntheticPng(seed: Array[Byte], shift: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val src = if (seed.isEmpty) Array[Byte](0) else seed // empty doc → black image
    var i = 0
    while (i < 64) {
      val v = math.min(255, (src(i % src.length) & 0xff) + shift)
      img.setRGB(i % 8, i / 8, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Build a media table from any (id, payload) pair — used by queries
    * and tests to exercise the plumbing on deterministic bytes.
    */
  def asAssets(df: DataFrame, idCol: String, payloadCol: String,
               kind: String = "image"): Dataset[MediaAsset] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("data"),
      lit(64).as("width"), lit(64).as("height"),
      (length(col(payloadCol)) / 256 + 1).cast("int").as("n_frames"))
      .as[MediaAsset]
  }

  /** Perceptual near-duplicate image pairs: 64-bit dHash per image
    * (REAL decode via javax.imageio — robust to re-encoding, uniform
    * brightness shifts and resizes), then the same 16-bit-chunk
    * blocking the text simhash path uses ([[Dedup.sigPairs]]): the
    * shuffle carries (chunk, value, id), never pixels, so the corpus
    * of image BYTES is read once map-only and only signatures travel.
    * Returns (a, b, hamming).
    */
  def imageDupPairs(images: DataFrame, idCol: String, binCol: String,
                    maxHamming: Int = 4, maxBucket: Int = 64): DataFrame =
    graft.operators.Dedup.sigPairs(
      images.select(col(idCol).as("id"),
        graft.functions.ImageFunctions.image_dhash(col(binCol)).as("sig")),
      maxHamming, maxBucket)

  /** End-to-end plumbing query over deterministic payloads: even doc
    * ids become synthetic PNGs (REAL javax.imageio decode), odd ids
    * stay opaque bytes (stub path) — both paths exercised in one
    * shuffle-free pass.
    */
  def features(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val assets = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        if (id % 2 == 0)
          MediaAsset(id, "image", syntheticPng(raw), 8, 8, 1)
        else
          MediaAsset(id, "audio", raw, 0, 0, (raw.length + 255) / 256)
      })
    decodeFeatures(assets).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("sampled_frames"),
        to_json(transform(col("feature"), f => round(f.cast("double"), 5))).as("feature_json"))
  }
}
