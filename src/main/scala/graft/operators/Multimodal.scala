package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms.
  *
  * The actual codec step is a clearly-marked DETERMINISTIC STUB (no
  * image/audio libraries ship in this container); everything around it
  * — the schema, the Dataset encoder, the mapPartitions batch shape,
  * and the partition-preserving execution (no shuffle) — is the real
  * pattern a decoder plugs into: swap `stubDecode` for JNI/FFI calls
  * and the plan is unchanged.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  case class MediaAsset(media_id: Long, kind: String, data: Array[Byte],
                        width: Int, height: Int, n_frames: Int)

  /** Decoded per-asset features. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           sampled_frames: Int, feature: Array[Float])

  /** DETERMINISTIC STUB decoder: stands in for a real image/audio
    * decode. Emits a 16-bin byte histogram (normalized) as the
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

  /** DETERMINISTIC STUB resize: stands in for an image rescale. Maps
    * the payload onto a w×h byte grid by uniform sampling (the real
    * implementation swaps in a codec + interpolation; the Spark-side
    * shape — payload in, smaller payload + updated dims out — is what
    * the pipeline depends on).
    */
  def resizeStub(a: MediaAsset, w: Int, h: Int): MediaAsset = {
    val n = math.max(1, w * h)
    val out = new Array[Byte](n)
    val len = math.max(1, a.data.length)
    var i = 0
    while (i < n) { out(i) = a.data((i.toLong * len / n).toInt); i += 1 }
    a.copy(data = out, width = w, height = h)
  }

  /** Resize a whole asset table — partition-local, shuffle-free. */
  def resize(assets: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a => resizeStub(a, w, h)))
  }

  /** Decode + feature-extract + frame-sample, one partition at a time.
    * mapPartitions (not per-row map) so a real decoder can amortize
    * codec/context setup across the batch — the Scala analogue of a
    * pandas-batched UDF.
    */
  def decodeFeatures(assets: Dataset[MediaAsset], frameStride: Int = 4): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would go here (codec handles, buffers)
      it.map(a => stubDecode(a, frameStride))
    }
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

  /** End-to-end plumbing query over deterministic payloads. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeFeatures(asAssets(docs, "doc_id", "text")).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("sampled_frames"),
        to_json(transform(col("feature"), f => round(f.cast("double"), 5))).as("feature_json"))
  }
}
