package graft

import graft.functions.{GraftFunctions, ImageFunctions, ImageOps}
import org.apache.spark.sql.functions._

/** Image plugin functions (reference extensions/functions/image):
  * real javax.imageio codecs, bilinear scaling, reference semantics —
  * exact-dims resize, aspect-preserving 0-dimension, raw RGB output,
  * never-grow thumbnail, re-encode in the detected input format.
  */
class ImageOpsSpec extends SparkSuite {

  private def solid(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  private def dims(bytes: Array[Byte]): (Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    (img.getWidth, img.getHeight)
  }

  test("resize scales to exact dims and re-encodes the input format") {
    val png = solid(40, 20, 0x3366cc, "png")
    val out = ImageOps.resize(png, 10, 5)
    assert(ImageOps.detectFormat(out) === "png")
    assert(dims(out) === ((10, 5)))
    val jpg = solid(40, 20, 0x3366cc, "jpeg")
    val outJ = ImageOps.resize(jpg, 8, 8)
    assert(ImageOps.detectFormat(outJ) === "jpeg")
    assert(dims(outJ) === ((8, 8)))
  }

  test("a zero dimension preserves aspect ratio (nfnt contract)") {
    val png = solid(40, 20, 0xffffff, "png")
    assert(dims(ImageOps.resize(png, 20, 0)) === ((20, 10)))
    assert(dims(ImageOps.resize(png, 0, 10)) === ((20, 10)))
    assert(dims(ImageOps.resize(png, 0, 0)) === ((40, 20)))
  }

  test("raw resize emits row-major 8-bit RGB triplets") {
    val png = solid(6, 4, 0x11aa55, "png")
    val raw = ImageOps.resizeRaw(png, 3, 2)
    assert(raw.length === 3 * 2 * 3)
    // solid color survives bilinear scaling exactly
    assert((raw(0) & 0xff) === 0x11 && (raw(1) & 0xff) === 0xaa && (raw(2) & 0xff) === 0x55)
  }

  test("thumbnail fits the box preserving aspect and never grows") {
    val png = solid(100, 50, 0x000000, "png")
    assert(dims(ImageOps.thumbnail(png, 30, 30)) === ((30, 15)))
    // already smaller than the box: untouched dimensions
    assert(dims(ImageOps.thumbnail(png, 200, 200)) === ((100, 50)))
  }

  test("garbage bytes and unknown formats error the row") {
    intercept[IllegalArgumentException](ImageOps.resize("not an image".getBytes, 2, 2))
    intercept[IllegalArgumentException](ImageOps.detectFormat(Array[Byte](1, 2, 3, 4)))
  }

  test("SQL registry: resize/thumbnail run inside a query, incl. raw mode") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val df = Seq((1L, solid(16, 8, 0x224466, "png"))).toDF("id", "img")
    df.createOrReplaceTempView("img_t")
    val r = spark.sql(
      """SELECT resize(img, 8, 4) AS small,
        |       resize(img, 4, 2, true) AS raw,
        |       thumbnail(img, 4, 4) AS thumb FROM img_t""".stripMargin).head()
    assert(dims(r.getAs[Array[Byte]]("small")) === ((8, 4)))
    assert(r.getAs[Array[Byte]]("raw").length === 4 * 2 * 3)
    assert(dims(r.getAs[Array[Byte]]("thumb")) === ((4, 2)))
    // Column API parity
    val c = df.select(ImageFunctions.thumbnail(col("img"), lit(2), lit(2)).as("t")).head()
    assert(dims(c.getAs[Array[Byte]]("t")) === ((2, 1)))
  }
}
