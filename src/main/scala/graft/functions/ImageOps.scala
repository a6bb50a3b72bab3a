package graft.functions

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Image plugin functions (reference extensions/functions/image:
  * resize.go, thumbnail.go). Real codecs via the JDK's javax.imageio
  * (png/jpeg/gif — the same formats the reference's stdlib image
  * package decodes), bilinear scaling like the reference's
  * resize.Bilinear.
  *
  * Semantics ported from the reference:
  *  - resize(img, w, h): scale to exactly w×h; a 0 for either
  *    dimension preserves the aspect ratio (nfnt/resize contract)
  *  - resize(img, w, h, true): return raw 8-bit RGB triplets
  *    row-major instead of re-encoding
  *  - thumbnail(img, maxW, maxH): shrink (never grow) to fit the box,
  *    keeping aspect ratio
  *  - output re-encodes in the DETECTED input format; undecodable
  *    bytes or unsupported formats error the row (reference returns
  *    an error result)
  *
  * The expressions codegen to one static call per row; the work is
  * decode/encode-bound (ms per image), so the call boundary is noise.
  * At scale these run map-only over binary columns — partitioning and
  * batch shape are the multimodal pipeline's (operators/Multimodal).
  */
object ImageOps {

  /** Magic-number sniff matching Go image.Decode's registered formats. */
  def detectFormat(bytes: Array[Byte]): String = {
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else throw new IllegalArgumentException("image: unknown format")
  }

  private def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException("image decode error")
    img
  }

  private def scaleBilinear(img: BufferedImage, w: Int, h: Int,
                            hasAlpha: Boolean): BufferedImage = {
    val kind = if (hasAlpha) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_INT_RGB
    val out = new BufferedImage(w, h, kind)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** nfnt/resize dimension rule: 0 on one side derives it from the
    * aspect ratio; 0 on both is identity.
    */
  private def targetDims(img: BufferedImage, w: Int, h: Int): (Int, Int) =
    (w, h) match {
      case (0, 0) => (img.getWidth, img.getHeight)
      case (0, _) => (math.max(1, img.getWidth * h / img.getHeight), h)
      case (_, 0) => (w, math.max(1, img.getHeight * w / img.getWidth))
      case _ => (w, h)
    }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    // jpeg cannot carry alpha; flatten first
    val toWrite =
      if (format == "jpeg" && img.getColorModel.hasAlpha)
        scaleBilinear(img, img.getWidth, img.getHeight, hasAlpha = false)
      else img
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(toWrite, format, bos))
      throw new IllegalArgumentException(s"$format image type is not currently supported")
    bos.toByteArray
  }

  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w >= 0 && h >= 0, "resize dimensions must be >= 0")
    val format = detectFormat(bytes)
    val img = decode(bytes)
    val (tw, th) = targetDims(img, w, h)
    encode(scaleBilinear(img, tw, th, img.getColorModel.hasAlpha), format)
  }

  /** Raw variant: row-major 8-bit RGB triplets of the w×h result. */
  def resizeRaw(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, "raw resize needs explicit dimensions")
    val img = scaleBilinear(decode(bytes), w, h, hasAlpha = false)
    val out = new Array[Byte](w * h * 3)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(i) = ((rgb >> 16) & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = (rgb & 0xff).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit dHash; see [[ImageDhashExpr]]. */
  def dhash64(bytes: Array[Byte]): Long = {
    val img = decode(bytes)
    val small = scaleBilinear(img, 9, 8, hasAlpha = false)
    @inline def lum(rgb: Int): Int = {
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      (299 * r + 587 * g + 114 * b) / 1000
    }
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(small.getRGB(x, y)) < lum(small.getRGB(x + 1, y))) h |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  def thumbnail(bytes: Array[Byte], maxW: Int, maxH: Int): Array[Byte] = {
    require(maxW >= 0 && maxH >= 0, "thumbnail dimensions must be >= 0")
    val format = detectFormat(bytes)
    val img = decode(bytes)
    if (img.getWidth <= maxW && img.getHeight <= maxH)
      encode(img, format) // never grow (resize.Thumbnail contract)
    else {
      val scale = math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight)
      val tw = math.max(1, math.round(img.getWidth * scale).toInt)
      val th = math.max(1, math.round(img.getHeight * scale).toInt)
      encode(scaleBilinear(img, tw, th, img.getColorModel.hasAlpha), format)
    }
  }
}

/** 64-bit difference hash (dHash — the standard perceptual image
  * fingerprint, e.g. Krawetz's widely-documented variant): decode,
  * bilinear-scale to 9×8 luminance, set one bit per adjacent-pixel
  * gradient. Robust to re-encoding, uniform brightness shifts and
  * resizes; pairs with [[graft.operators.Dedup.sigPairs]] for
  * banding-blocked near-dup candidate generation over image corpora.
  */
case class ImageDhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "image_dhash"
  override protected def nullSafeEval(img: Any): Any =
    ImageOps.dhash64(img.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageOps.dhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): ImageDhashExpr =
    copy(child = newChild)
}

case class ImageResizeExpr(first: Expression, second: Expression, third: Expression,
                           raw: Boolean) extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "resize"
  override protected def nullSafeEval(img: Any, w: Any, h: Any): Any =
    if (raw) ImageOps.resizeRaw(img.asInstanceOf[Array[Byte]], w.asInstanceOf[Int], h.asInstanceOf[Int])
    else ImageOps.resize(img.asInstanceOf[Array[Byte]], w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (raw) "resizeRaw" else "resize"
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.ImageOps.$m($a, $b, $c)")
  }
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): ImageResizeExpr =
    copy(first = a, second = b, third = c)
}

case class ImageThumbnailExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "thumbnail"
  override protected def nullSafeEval(img: Any, w: Any, h: Any): Any =
    ImageOps.thumbnail(img.asInstanceOf[Array[Byte]], w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.ImageOps.thumbnail($a, $b, $c)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): ImageThumbnailExpr =
    copy(first = a, second = b, third = c)
}

object ImageFunctions {
  private def e(c: Column): Expression = ColumnBridge.expression(c)

  def resize(img: Column, w: Column, h: Column, raw: Boolean = false): Column =
    ColumnBridge.column(ImageResizeExpr(e(img), e(w.cast("int")), e(h.cast("int")), raw))
  def thumbnail(img: Column, maxW: Column, maxH: Column): Column =
    ColumnBridge.column(ImageThumbnailExpr(e(img), e(maxW.cast("int")), e(maxH.cast("int"))))
  def image_dhash(img: Column): Column =
    ColumnBridge.column(ImageDhashExpr(e(img)))
}
