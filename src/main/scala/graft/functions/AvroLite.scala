package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, SpecializedGetters, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Dependency-free Avro binary codec — the reference's avro converter
  * without the avro jars (absent in this container): Avro's binary
  * encoding is a public spec — fields in schema order with no tags,
  * zigzag varints for int/long, IEEE little-endian for float/double,
  * length-prefixed UTF-8 for string/bytes. Every field is treated as
  * the nullable union ["null", T] (the conventional nullable-record
  * shape): a 0/1 union index precedes each value. Nested records
  * encode recursively — a struct field is its union index followed by
  * the sub-record's fields inline, per the spec. Arrays and maps use
  * the spec's block encoding (the reference's converter reads them via
  * the avro schema, internal/converter/converter.go): a series of
  * blocks, each a zigzag item count followed by that many items,
  * terminated by a count of 0; readers also accept the negative-count
  * form where a byte size follows the count. Array elements and map
  * values are plain non-null T (no per-element union); map keys are
  * avro strings, so MapType keys must be StringType. Null elements/
  * values are rejected at encode.
  */
object AvroLite {

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  def encode(values: InternalRow, schema: StructType): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    encodeInto(out, values, schema)
    out.toByteArray
  }

  private def encodeInto(out: java.io.ByteArrayOutputStream,
                         values: InternalRow, schema: StructType): Unit = {
    var i = 0
    while (i < schema.length) {
      if (values.isNullAt(i)) writeVarint(out, zigzag(0L)) // union branch: null
      else {
        writeVarint(out, zigzag(1L)) // union branch: value
        encodeDatum(out, schema.fields(i).dataType, values, i)
      }
      i += 1
    }
  }

  /** One non-null value of type `dt` at `ordinal` of `values` —
    * SpecializedGetters covers rows and array data alike.
    */
  private def encodeDatum(out: java.io.ByteArrayOutputStream, dt: DataType,
                          values: SpecializedGetters, ordinal: Int): Unit = dt match {
    case LongType => writeVarint(out, zigzag(values.getLong(ordinal)))
    case IntegerType => writeVarint(out, zigzag(values.getInt(ordinal).toLong))
    case BooleanType => out.write(if (values.getBoolean(ordinal)) 1 else 0)
    case DoubleType =>
      var b = 0; var v = java.lang.Double.doubleToLongBits(values.getDouble(ordinal))
      while (b < 8) { out.write((v & 0xff).toInt); v >>>= 8; b += 1 }
    case FloatType =>
      var b = 0; var v = java.lang.Float.floatToIntBits(values.getFloat(ordinal))
      while (b < 4) { out.write(v & 0xff); v >>>= 8; b += 1 }
    case StringType =>
      val bytes = values.getUTF8String(ordinal).getBytes
      writeVarint(out, zigzag(bytes.length.toLong)); out.write(bytes)
    case BinaryType =>
      val bytes = values.getBinary(ordinal)
      writeVarint(out, zigzag(bytes.length.toLong)); out.write(bytes)
    case st: StructType => // nested record: fields inline, spec order
      encodeInto(out, values.getStruct(ordinal, st.length), st)
    case at: ArrayType => // block encoding: one block of n items, then 0
      val arr = values.getArray(ordinal)
      val n = arr.numElements()
      if (n > 0) {
        writeVarint(out, zigzag(n.toLong))
        var j = 0
        while (j < n) {
          if (arr.isNullAt(j)) throw new IllegalArgumentException(
            "avro codec: null array element (items are non-null T)")
          encodeDatum(out, at.elementType, arr, j)
          j += 1
        }
      }
      writeVarint(out, zigzag(0L)) // end of blocks
    case mt: MapType => // blocks of string-key/value pairs, then 0
      require(mt.keyType == StringType,
        s"avro codec: map keys must be STRING (avro maps are string-keyed), got ${mt.keyType}")
      val map = values.getMap(ordinal)
      val n = map.numElements()
      if (n > 0) {
        writeVarint(out, zigzag(n.toLong))
        val keys = map.keyArray(); val vals = map.valueArray()
        var j = 0
        while (j < n) {
          val k = keys.getUTF8String(j).getBytes
          writeVarint(out, zigzag(k.length.toLong)); out.write(k)
          if (vals.isNullAt(j)) throw new IllegalArgumentException(
            "avro codec: null map value (values are non-null T)")
          encodeDatum(out, mt.valueType, vals, j)
          j += 1
        }
      }
      writeVarint(out, zigzag(0L))
    case other => throw new IllegalArgumentException(
      s"avro codec: unsupported field type $other")
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        if (pos >= bytes.length)
          throw new IllegalArgumentException("avro codec: truncated varint")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return unzigzag(v)
        shift += 7
      }
      0L
    }
    def readFixed(n: Int): Long = {
      if (pos + n > bytes.length)
        throw new IllegalArgumentException("avro codec: truncated fixed field")
      var v = 0L; var i = 0
      while (i < n) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += n; v
    }
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      if (n < 0 || pos + n > bytes.length)
        throw new IllegalArgumentException("avro codec: truncated bytes field")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n; out
    }
    def readBoolean(): Boolean = {
      if (pos >= bytes.length)
        throw new IllegalArgumentException("avro codec: truncated boolean")
      val v = bytes(pos) != 0; pos += 1; v
    }
  }

  def decode(bytes: Array[Byte], schema: StructType): InternalRow =
    decodeRecord(new Reader(bytes), schema)

  private def decodeRecord(r: Reader, schema: StructType): InternalRow = {
    val row = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      val branch = r.readVarint()
      if (branch != 0L && branch != 1L)
        throw new IllegalArgumentException(
          s"avro codec: invalid union branch $branch for field ${schema.fields(i).name}")
      if (branch == 1L) row.update(i, decodeDatum(r, schema.fields(i).dataType))
      i += 1
    }
    row
  }

  private def decodeDatum(r: Reader, dt: DataType): Any = dt match {
    case LongType => r.readVarint()
    case IntegerType => r.readVarint().toInt
    case BooleanType => r.readBoolean()
    case DoubleType => java.lang.Double.longBitsToDouble(r.readFixed(8))
    case FloatType => java.lang.Float.intBitsToFloat(r.readFixed(4).toInt)
    case StringType => UTF8String.fromBytes(r.readBytes())
    case BinaryType => r.readBytes()
    case st: StructType => decodeRecord(r, st)
    case at: ArrayType =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
      foreachBlockItem(r)(() => buf += decodeDatum(r, at.elementType))
      new GenericArrayData(buf.toArray)
    case mt: MapType =>
      require(mt.keyType == StringType,
        s"avro codec: map keys must be STRING (avro maps are string-keyed), got ${mt.keyType}")
      val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
      val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
      foreachBlockItem(r) { () =>
        keys += UTF8String.fromBytes(r.readBytes())
        vals += decodeDatum(r, mt.valueType)
      }
      ArrayBasedMapData(keys.toArray, vals.toArray)
    case other => throw new IllegalArgumentException(
      s"avro codec: unsupported field type $other")
  }

  /** Walk the spec's block sequence: positive count = count items;
    * negative count = abs(count) items preceded by a byte-size long
    * (written by size-aware encoders, skipped here); 0 ends the series.
    */
  private def foreachBlockItem(r: Reader)(item: () => Unit): Unit = {
    var n = r.readVarint()
    while (n != 0L) {
      if (n < 0L) { r.readVarint(); n = -n } // discard the block byte size
      var j = 0L
      while (j < n) { item(); j += 1 }
      n = r.readVarint()
    }
  }
}

/** Codegen decode of a binary Avro record column to a struct. */
case class AvroDecodeExpr(child: Expression, schema: StructType)
    extends UnaryExpression {
  override def dataType: DataType = schema
  override def prettyName: String = "avro_decode"
  override protected def nullSafeEval(input: Any): Any =
    AvroLite.decode(input.asInstanceOf[Array[Byte]], schema)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroSchema", schema, classOf[StructType].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.AvroLite.decode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): AvroDecodeExpr =
    copy(child = newChild)
}

/** Codegen encode of a struct column to Avro record bytes. */
case class AvroEncodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_encode"
  private lazy val structType = child.dataType.asInstanceOf[StructType]
  override protected def nullSafeEval(input: Any): Any =
    AvroLite.encode(input.asInstanceOf[InternalRow], structType)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroSchema", structType, classOf[StructType].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.AvroLite.encode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): AvroEncodeExpr =
    copy(child = newChild)
}

object AvroFunctions {
  def avro_decode(data: Column, schema: StructType): Column =
    ColumnBridge.column(AvroDecodeExpr(ColumnBridge.expression(data), schema))
  def avro_encode(struct: Column): Column =
    ColumnBridge.column(AvroEncodeExpr(ColumnBridge.expression(struct)))
}
