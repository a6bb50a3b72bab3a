package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geohash kernel for the reference's geohash plugin function pack
  * (reference: extensions/functions/geohash/geohash.go:174-300, which
  * delegates to the public mmcloughlin/geohash library). This is a
  * from-scratch implementation of the public Niemeyer geohash
  * algorithm: interleave lat (even bit-levels) and lng (odd
  * bit-levels) scaled to 32-bit ranges, base32-encode the top 5·n
  * bits ("0123456789bcdefghjkmnpqrstuvwxyz").
  *
  * All methods are static and primitive-friendly so the Catalyst
  * expressions below stay inside whole-stage codegen (one generated
  * call per row, no UDF boxing).
  */
object Geohash {
  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val base32Idx: Array[Int] = {
    val a = Array.fill(128)(-1)
    base32.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Spread the 32 low bits of x onto the even bit-levels of a long. */
  private def spread(x: Long): Long = {
    var v = x & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Collapse the even bit-levels of x back into 32 contiguous bits. */
  private def squash(x: Long): Long = {
    var v = x & 0x5555555555555555L
    v = (v | (v >>> 1)) & 0x3333333333333333L
    v = (v | (v >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v >>> 4)) & 0x00ff00ff00ff00ffL
    v = (v | (v >>> 8)) & 0x0000ffff0000ffffL
    v = (v | (v >>> 16)) & 0x00000000ffffffffL
    v
  }

  /** x in [-r, r] → 32-bit fixed-point fraction of the range, clamped
    * at the boundaries: lat = 90 must stay the northernmost bucket
    * (a plain truncate-and-mask would wrap it to -90's encoding).
    */
  private def encodeRange(x: Double, r: Double): Long = {
    val p = (x + r) / (2 * r)
    val v = (p * 4294967296.0).toLong
    if (v >= 4294967296L) 4294967295L else if (v < 0) 0L else v
  }

  private def decodeRange(x: Long, r: Double): Double =
    2 * r * (x.toDouble / 4294967296.0) - r

  /** Full-precision (64-bit) integer geohash; lng on odd bit-levels so
    * the most significant bit is a longitude bit (standard geohash).
    */
  def encodeInt(lat: Double, lng: Double): Long =
    spread(encodeRange(lat, 90)) | (spread(encodeRange(lng, 180)) << 1)

  /** 12-character string geohash (the reference plugin's precision). */
  def encode(lat: Double, lng: Double): String = encodeWithPrecision(lat, lng, 12)

  def encodeWithPrecision(lat: Double, lng: Double, chars: Int): String = {
    val h = encodeInt(lat, lng) >>> (64 - 5 * chars)
    val out = new Array[Char](chars)
    var v = h
    var i = chars - 1
    while (i >= 0) { out(i) = base32((v & 0x1f).toInt); v >>>= 5; i -= 1 }
    new String(out)
  }

  /** Reject hashes the reference's Validate rejects (len 1..12, base32
    * alphabet). Errors fail the row like the reference's error return.
    */
  def validate(hash: String): Unit = {
    require(hash != null && hash.nonEmpty && hash.length <= 12,
      s"invalid geohash '$hash': length must be 1..12")
    var i = 0
    while (i < hash.length) {
      val c = hash.charAt(i)
      require(c < 128 && base32Idx(c.toInt) >= 0,
        s"invalid geohash '$hash': bad character '$c'")
      i += 1
    }
  }

  /** Bounding box as (minLat, maxLat, minLng, maxLng). */
  def boundingBox(hash: String): Array[Double] = {
    validate(hash)
    val bits = 5 * hash.length
    var h = 0L
    var i = 0
    while (i < hash.length) { h = (h << 5) | base32Idx(hash.charAt(i).toInt); i += 1 }
    boundingBoxBits(h << (64 - bits), bits)
  }

  def boundingBoxInt(h: Long): Array[Double] = boundingBoxBits(h, 64)

  private def boundingBoxBits(full: Long, bits: Int): Array[Double] = {
    val latBits = bits / 2
    val lngBits = bits - latBits
    val latErr = math.pow(2.0, -latBits) * 180.0
    val lngErr = math.pow(2.0, -lngBits) * 360.0
    val minLat = decodeRange(squash(full), 90)
    val minLng = decodeRange(squash(full >>> 1), 180)
    Array(minLat, minLat + latErr, minLng, minLng + lngErr)
  }

  /** Decode = a point inside the box rounded to the coarsest decimal
    * grid that is guaranteed to intersect a box of that size (the
    * public library's Box.Round contract): step = 10^floor(log10(w)),
    * point = ceil(min/step)·step — always within [min, min+w].
    */
  private def roundedPoint(min: Double, width: Double): Double = {
    val step = math.pow(10, math.floor(math.log10(width)))
    math.ceil(min / step) * step
  }

  /** (lat, lng) */
  def decode(hash: String): Array[Double] = {
    val b = boundingBox(hash)
    Array(roundedPoint(b(0), b(1) - b(0)), roundedPoint(b(2), b(3) - b(2)))
  }

  def decodeInt(h: Long): Array[Double] = {
    val b = boundingBoxInt(h)
    Array(roundedPoint(b(0), b(1) - b(0)), roundedPoint(b(2), b(3) - b(2)))
  }

  /** Direction names exactly as the reference's g_direction map
    * (geohash.go:53-62); index order is the library's Direction iota,
    * which is also the Neighbors output order.
    */
  private val dirs = Array("North", "NorthEast", "East", "SouthEast",
    "South", "SouthWest", "West", "NorthWest")

  private def directionIndex(d: String): Int = {
    val i = dirs.indexOf(d)
    require(i >= 0, s"invalid direction '$d' (expected one of ${dirs.mkString(", ")})")
    i
  }

  /** Center of box shifted one cell in the given direction; longitude
    * wraps across the antimeridian.
    */
  private def shifted(b: Array[Double], dir: Int): Array[Double] = {
    val latDelta = b(1) - b(0)
    val lngDelta = b(3) - b(2)
    var lat = (b(0) + b(1)) / 2
    var lng = (b(2) + b(3)) / 2
    dir match {
      case 0 => lat += latDelta
      case 1 => lat += latDelta; lng += lngDelta
      case 2 => lng += lngDelta
      case 3 => lat -= latDelta; lng += lngDelta
      case 4 => lat -= latDelta
      case 5 => lat -= latDelta; lng -= lngDelta
      case 6 => lng -= lngDelta
      case 7 => lat += latDelta; lng -= lngDelta
    }
    if (lng > 180) lng -= 360 else if (lng < -180) lng += 360
    Array(lat, lng)
  }

  def neighbor(hash: String, dir: String): String = {
    val p = shifted(boundingBox(hash), directionIndex(dir))
    encodeWithPrecision(p(0), p(1), hash.length)
  }

  def neighborInt(h: Long, dir: String): Long = {
    val p = shifted(boundingBoxInt(h), directionIndex(dir))
    encodeInt(p(0), p(1))
  }

  def neighbors(hash: String): Array[String] = {
    val b = boundingBox(hash)
    Array.tabulate(8) { i =>
      val p = shifted(b, i)
      encodeWithPrecision(p(0), p(1), hash.length)
    }
  }

  def neighborsInt(h: Long): Array[Long] = {
    val b = boundingBoxInt(h)
    Array.tabulate(8) { i =>
      val p = shifted(b, i)
      encodeInt(p(0), p(1))
    }
  }

  // ---- InternalRow/UTF8String bridges called from generated code ----

  def encodeUtf(lat: Double, lng: Double): UTF8String =
    UTF8String.fromString(encode(lat, lng))

  /** Field order matches the reference's position struct: Longitude
    * first (geohash.go:36-39).
    */
  def decodeRow(hash: UTF8String): InternalRow = {
    val p = decode(hash.toString)
    new GenericInternalRow(Array[Any](p(1), p(0)))
  }

  def decodeIntRow(h: Long): InternalRow = {
    val p = decodeInt(h)
    new GenericInternalRow(Array[Any](p(1), p(0)))
  }

  def bboxRow(hash: UTF8String): InternalRow = {
    val b = boundingBox(hash.toString)
    new GenericInternalRow(Array[Any](b(0), b(1), b(2), b(3)))
  }

  def bboxIntRow(h: Long): InternalRow = {
    val b = boundingBoxInt(h)
    new GenericInternalRow(Array[Any](b(0), b(1), b(2), b(3)))
  }

  def neighborUtf(hash: UTF8String, dir: UTF8String): UTF8String =
    UTF8String.fromString(neighbor(hash.toString, dir.toString))

  def neighborsArray(hash: UTF8String): GenericArrayData =
    new GenericArrayData(neighbors(hash.toString).map(UTF8String.fromString(_): Any))

  def neighborsIntArray(h: Long): GenericArrayData =
    new GenericArrayData(neighborsInt(h))

  val positionType: StructType = StructType(Seq(
    StructField("Longitude", DoubleType, nullable = false),
    StructField("Latitude", DoubleType, nullable = false)))

  /** Field order matches the library's Box struct (MinLat, MaxLat,
    * MinLng, MaxLng) that the reference returns verbatim.
    */
  val boxType: StructType = StructType(Seq(
    StructField("MinLat", DoubleType, nullable = false),
    StructField("MaxLat", DoubleType, nullable = false),
    StructField("MinLng", DoubleType, nullable = false),
    StructField("MaxLng", DoubleType, nullable = false)))
}

case class GeohashEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "geohashencode"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Geohash.encodeUtf(l.asInstanceOf[Double], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Geohash.encodeUtf($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeohashEncodeExpr =
    copy(left = l, right = r)
}

case class GeohashEncodeIntExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "geohashencodeint"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Geohash.encodeInt(l.asInstanceOf[Double], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Geohash.encodeInt($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeohashEncodeIntExpr =
    copy(left = l, right = r)
}

case class GeohashDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Geohash.positionType
  override def prettyName: String = "geohashdecode"
  override protected def nullSafeEval(input: Any): Any =
    Geohash.decodeRow(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Geohash.decodeRow($c)")
  override protected def withNewChildInternal(newChild: Expression): GeohashDecodeExpr =
    copy(child = newChild)
}

case class GeohashDecodeIntExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Geohash.positionType
  override def prettyName: String = "geohashdecodeint"
  override protected def nullSafeEval(input: Any): Any =
    Geohash.decodeIntRow(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Geohash.decodeIntRow($c)")
  override protected def withNewChildInternal(newChild: Expression): GeohashDecodeIntExpr =
    copy(child = newChild)
}

case class GeohashBoundingBoxExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Geohash.boxType
  override def prettyName: String = "geohashboundingbox"
  override protected def nullSafeEval(input: Any): Any =
    Geohash.bboxRow(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Geohash.bboxRow($c)")
  override protected def withNewChildInternal(newChild: Expression): GeohashBoundingBoxExpr =
    copy(child = newChild)
}

case class GeohashBoundingBoxIntExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Geohash.boxType
  override def prettyName: String = "geohashboundingboxint"
  override protected def nullSafeEval(input: Any): Any =
    Geohash.bboxIntRow(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Geohash.bboxIntRow($c)")
  override protected def withNewChildInternal(newChild: Expression): GeohashBoundingBoxIntExpr =
    copy(child = newChild)
}

case class GeohashNeighborExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "geohashneighbor"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Geohash.neighborUtf(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Geohash.neighborUtf($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeohashNeighborExpr =
    copy(left = l, right = r)
}

case class GeohashNeighborIntExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "geohashneighborint"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Geohash.neighborInt(l.asInstanceOf[Long], r.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Geohash.neighborInt($a, $b.toString())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeohashNeighborIntExpr =
    copy(left = l, right = r)
}

case class GeohashNeighborsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "geohashneighbors"
  override protected def nullSafeEval(input: Any): Any =
    Geohash.neighborsArray(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Geohash.neighborsArray($c)")
  override protected def withNewChildInternal(newChild: Expression): GeohashNeighborsExpr =
    copy(child = newChild)
}

case class GeohashNeighborsIntExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "geohashneighborsint"
  override protected def nullSafeEval(input: Any): Any =
    Geohash.neighborsIntArray(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Geohash.neighborsIntArray($c)")
  override protected def withNewChildInternal(newChild: Expression): GeohashNeighborsIntExpr =
    copy(child = newChild)
}

/** Column wrappers so batch queries can use the pack without SQL. */
object GeoFunctions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def geohash_encode(lat: Column, lng: Column): Column =
    c(GeohashEncodeExpr(e(lat.cast("double")), e(lng.cast("double"))))
  def geohash_encode_int(lat: Column, lng: Column): Column =
    c(GeohashEncodeIntExpr(e(lat.cast("double")), e(lng.cast("double"))))
  def geohash_decode(hash: Column): Column = c(GeohashDecodeExpr(e(hash)))
  def geohash_decode_int(hash: Column): Column = c(GeohashDecodeIntExpr(e(hash.cast("long"))))
  def geohash_bbox(hash: Column): Column = c(GeohashBoundingBoxExpr(e(hash)))
  def geohash_bbox_int(hash: Column): Column = c(GeohashBoundingBoxIntExpr(e(hash.cast("long"))))
  def geohash_neighbor(hash: Column, dir: Column): Column =
    c(GeohashNeighborExpr(e(hash), e(dir)))
  def geohash_neighbor_int(hash: Column, dir: Column): Column =
    c(GeohashNeighborIntExpr(e(hash.cast("long")), e(dir)))
  def geohash_neighbors(hash: Column): Column = c(GeohashNeighborsExpr(e(hash)))
  def geohash_neighbors_int(hash: Column): Column =
    c(GeohashNeighborsIntExpr(e(hash.cast("long"))))
}
