package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * the sub-record's fields inline, per the spec. Arrays and maps
  * remain out of scope (documented divergence).
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
        schema.fields(i).dataType match {
          case LongType => writeVarint(out, zigzag(values.getLong(i)))
          case IntegerType => writeVarint(out, zigzag(values.getInt(i).toLong))
          case BooleanType => out.write(if (values.getBoolean(i)) 1 else 0)
          case DoubleType =>
            var b = 0; var v = java.lang.Double.doubleToLongBits(values.getDouble(i))
            while (b < 8) { out.write((v & 0xff).toInt); v >>>= 8; b += 1 }
          case FloatType =>
            var b = 0; var v = java.lang.Float.floatToIntBits(values.getFloat(i))
            while (b < 4) { out.write(v & 0xff); v >>>= 8; b += 1 }
          case StringType =>
            val bytes = values.getUTF8String(i).getBytes
            writeVarint(out, zigzag(bytes.length.toLong)); out.write(bytes)
          case BinaryType =>
            val bytes = values.getBinary(i)
            writeVarint(out, zigzag(bytes.length.toLong)); out.write(bytes)
          case st: StructType => // nested record: fields inline, spec order
            encodeInto(out, values.getStruct(i, st.length), st)
          case other => throw new IllegalArgumentException(
            s"avro codec: unsupported field type $other (arrays/maps are not supported; " +
              "nested records are)")
        }
      }
      i += 1
    }
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
      if (branch == 1L) schema.fields(i).dataType match {
        case LongType => row.update(i, r.readVarint())
        case IntegerType => row.update(i, r.readVarint().toInt)
        case BooleanType => row.update(i, r.readBoolean())
        case DoubleType => row.update(i, java.lang.Double.longBitsToDouble(r.readFixed(8)))
        case FloatType => row.update(i, java.lang.Float.intBitsToFloat(r.readFixed(4).toInt))
        case StringType => row.update(i, UTF8String.fromBytes(r.readBytes()))
        case BinaryType => row.update(i, r.readBytes())
        case st: StructType => row.update(i, decodeRecord(r, st))
        case other => throw new IllegalArgumentException(
          s"avro codec: unsupported field type $other (arrays/maps are not supported; " +
            "nested records are)")
      }
      i += 1
    }
    row
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
