package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.BinaryType

/** Image sink (reference: extensions/impl/image/image.go): every
  * binary column of each row is decoded, re-encoded as
  * `imageFormat` (png | jpeg — the reference's two formats; here via
  * the JDK's javax.imageio, so decode/encode is real), and saved under
  * `path` as `<column>_<millis>_<n>.<fmt>`. Undecodable bytes fail the
  * batch like the reference's png.Decode error path.
  *
  * Writing runs on the EXECUTORS via foreachPartition — each executor
  * persists the images that land in its partitions to its local
  * `path` (the reference's single-writer loop would bottleneck a
  * cluster; a shared filesystem mount gives the single-directory
  * behavior back when needed).
  *
  * Retention (reference delFile, run on a 3-minute ticker): files
  * beyond `maxCount` or older than `maxAge` hours are pruned after
  * each batch, newest kept first. prune() lists the DRIVER-visible
  * `path` — with executor-local disks it governs nothing; pair the
  * sink with a shared mount (the same condition under which the
  * single-directory layout exists at all).
  */
final case class ImageSink(path: String, imageFormat: String = "png",
                           maxAge: Int = 72, maxCount: Int = 1000,
                           options: Map[String, String] = Map.empty) extends Sink {
  require(imageFormat == "png" || imageFormat == "jpeg",
    s"invalid image format: $imageFormat")
  require(maxAge >= 0, s"invalid max age: $maxAge")
  require(maxCount >= 0, s"invalid max count: $maxCount")

  def writeBatch(df: DataFrame): Unit = {
    val out = shaped(df)
    val binCols = out.schema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType == BinaryType => (f.name, i)
    }.toSeq
    require(binCols.nonEmpty, "image sink needs at least one binary column")
    val (dir, fmt) = (path, imageFormat)
    out.foreachPartition { (rows: Iterator[Row]) =>
      val d = new java.io.File(dir)
      if (!d.exists()) d.mkdirs()
      var n = 0
      rows.foreach { r =>
        binCols.foreach { case (name, i) =>
          if (!r.isNullAt(i)) {
            val bytes = r.getAs[Array[Byte]](i)
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null)
              throw new java.io.IOException(s"column $name holds undecodable image bytes")
            val f = new java.io.File(d,
              s"${name}_${System.currentTimeMillis()}_${n}_${Thread.currentThread().getId}.$fmt")
            if (!javax.imageio.ImageIO.write(img, fmt, f)) {
              f.delete()
              throw new java.io.IOException(s"cannot encode $fmt")
            }
            n += 1
          }
        }
      }
    }
    prune()
  }

  /** Apply maxCount/maxAge retention, newest-first (reference delFile). */
  def prune(): Unit = {
    val files = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(s".$imageFormat"))
      .sortBy(-_.lastModified())
    val cutoff = System.currentTimeMillis() - maxAge.toLong * 3600 * 1000
    files.zipWithIndex.foreach { case (f, i) =>
      if (i >= maxCount || f.lastModified() < cutoff) f.delete()
    }
  }
}
