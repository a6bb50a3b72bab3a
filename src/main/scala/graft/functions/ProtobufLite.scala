package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Dependency-free protobuf wire-format codec for flat messages — the
  * reference's protobuf converter (lf-edge/ekuiper
  * internal/converter/protobuf) without the protoc toolchain: the wire
  * format (varints, zigzag, length-delimited fields) is a public spec,
  * so scalar messages encode/decode in pure JVM code and run as
  * codegen expressions.
  *
  * Field numbering: schema field i ↔ protobuf field number i+1 (the
  * layout protoc generates for a message declared in schema order).
  * Supported field types: LONG/INT (varint), BOOLEAN (varint),
  * DOUBLE (fixed64), FLOAT (fixed32), STRING/BINARY
  * (length-delimited), STRUCT (length-delimited nested message,
  * encoded recursively with the same numbering convention), and ARRAY
  * for `repeated` fields (the reference handles these via protoc
  * descriptors, internal/converter/protobuf/converter.go): numeric/
  * bool elements encode packed (proto3 default — one length-delimited
  * payload of concatenated values) and decode from both packed and
  * unpacked tag streams; string/bytes/message elements are one
  * length-delimited tag per element, per the spec (those types cannot
  * be packed). Unknown field numbers in the input are skipped by wire
  * type; absent fields decode to null, except repeated fields which
  * decode to empty arrays (proto3 repeated semantics: absent and
  * empty are indistinguishable, so null arrays also encode to
  * nothing). Null array elements are rejected — protobuf has no
  * element-level null.
  */
object ProtobufLite {

  // ---- wire-format primitives ----

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** Encode one row (values aligned with `schema`) to message bytes. */
  def encode(values: InternalRow, schema: StructType): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    var i = 0
    while (i < schema.length) {
      if (!values.isNullAt(i)) {
        val fieldNo = i + 1
        schema.fields(i).dataType match {
          case LongType =>
            writeVarint(out, (fieldNo << 3) | 0); writeVarint(out, values.getLong(i))
          case IntegerType =>
            writeVarint(out, (fieldNo << 3) | 0); writeVarint(out, values.getInt(i).toLong)
          case BooleanType =>
            writeVarint(out, (fieldNo << 3) | 0)
            writeVarint(out, if (values.getBoolean(i)) 1L else 0L)
          case DoubleType =>
            writeVarint(out, (fieldNo << 3) | 1)
            val bits = java.lang.Double.doubleToLongBits(values.getDouble(i))
            var b = 0; var v = bits
            while (b < 8) { out.write((v & 0xff).toInt); v >>>= 8; b += 1 }
          case FloatType =>
            writeVarint(out, (fieldNo << 3) | 5)
            val bits = java.lang.Float.floatToIntBits(values.getFloat(i))
            var b = 0; var v = bits
            while (b < 4) { out.write(v & 0xff); v >>>= 8; b += 1 }
          case StringType =>
            writeVarint(out, (fieldNo << 3) | 2)
            val bytes = values.getUTF8String(i).getBytes
            writeVarint(out, bytes.length.toLong); out.write(bytes)
          case BinaryType =>
            writeVarint(out, (fieldNo << 3) | 2)
            val bytes = values.getBinary(i)
            writeVarint(out, bytes.length.toLong); out.write(bytes)
          case st: StructType => // nested message: length-delimited submessage
            writeVarint(out, (fieldNo << 3) | 2)
            val bytes = encode(values.getStruct(i, st.length), st)
            writeVarint(out, bytes.length.toLong); out.write(bytes)
          case at: ArrayType => // repeated field
            val arr = values.getArray(i)
            val n = arr.numElements()
            var j = 0
            while (j < n) {
              if (arr.isNullAt(j)) throw new IllegalArgumentException(
                s"protobuf codec: null element in repeated field ${schema.fields(i).name}")
              j += 1
            }
            at.elementType match {
              case StringType | BinaryType | _: StructType =>
                // cannot be packed: one length-delimited tag per element
                j = 0
                while (j < n) {
                  writeVarint(out, (fieldNo << 3) | 2)
                  val bytes = at.elementType match {
                    case StringType => arr.getUTF8String(j).getBytes
                    case BinaryType => arr.getBinary(j)
                    case st: StructType => encode(arr.getStruct(j, st.length), st)
                    case _ => throw new MatchError(at.elementType)
                  }
                  writeVarint(out, bytes.length.toLong); out.write(bytes)
                  j += 1
                }
              case elem => // packed numeric/bool payload (proto3 default)
                if (n > 0) {
                  val tmp = new java.io.ByteArrayOutputStream(16)
                  j = 0
                  while (j < n) {
                    elem match {
                      case LongType => writeVarint(tmp, arr.getLong(j))
                      case IntegerType => writeVarint(tmp, arr.getInt(j).toLong)
                      case BooleanType => writeVarint(tmp, if (arr.getBoolean(j)) 1L else 0L)
                      case DoubleType =>
                        var b = 0; var v = java.lang.Double.doubleToLongBits(arr.getDouble(j))
                        while (b < 8) { tmp.write((v & 0xff).toInt); v >>>= 8; b += 1 }
                      case FloatType =>
                        var b = 0; var v = java.lang.Float.floatToIntBits(arr.getFloat(j))
                        while (b < 4) { tmp.write(v & 0xff); v >>>= 8; b += 1 }
                      case other => throw new IllegalArgumentException(
                        s"protobuf codec: unsupported repeated element type $other")
                    }
                    j += 1
                  }
                  writeVarint(out, (fieldNo << 3) | 2)
                  writeVarint(out, tmp.size.toLong)
                  tmp.writeTo(out)
                }
            }
          case other => throw new IllegalArgumentException(
            s"protobuf codec: unsupported field type $other")
        }
      }
      i += 1
    }
    out.toByteArray
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < bytes.length
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        if (pos >= bytes.length)
          throw new IllegalArgumentException("protobuf codec: truncated varint")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    def readFixed(n: Int): Long = {
      if (pos + n > bytes.length)
        throw new IllegalArgumentException("protobuf codec: truncated fixed field")
      var v = 0L; var i = 0
      while (i < n) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += n; v
    }
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      if (n < 0 || pos + n > bytes.length)
        throw new IllegalArgumentException("protobuf codec: truncated bytes field")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n; out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => readFixed(8)
      case 2 => readBytes()
      case 5 => readFixed(4)
      case w => throw new IllegalArgumentException(s"protobuf codec: wire type $w")
    }
  }

  /** Decode message bytes to a row aligned with `schema`. */
  def decode(bytes: Array[Byte], schema: StructType): InternalRow = {
    val row = new GenericInternalRow(schema.length) // all-null start
    val r = new Reader(bytes)
    // repeated-field accumulators, allocated only when a message
    // actually carries arrays
    var lists: Array[scala.collection.mutable.ArrayBuffer[Any]] = null
    def listFor(idx: Int): scala.collection.mutable.ArrayBuffer[Any] = {
      if (lists == null)
        lists = new Array[scala.collection.mutable.ArrayBuffer[Any]](schema.length)
      if (lists(idx) == null) lists(idx) = scala.collection.mutable.ArrayBuffer.empty[Any]
      lists(idx)
    }
    while (r.hasMore) {
      val tag = r.readVarint()
      val fieldNo = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val idx = fieldNo - 1
      if (idx < 0 || idx >= schema.length) r.skip(wire)
      else schema.fields(idx).dataType match {
        case LongType if wire == 0 => row.update(idx, r.readVarint())
        case IntegerType if wire == 0 => row.update(idx, r.readVarint().toInt)
        case BooleanType if wire == 0 => row.update(idx, r.readVarint() != 0L)
        case DoubleType if wire == 1 =>
          row.update(idx, java.lang.Double.longBitsToDouble(r.readFixed(8)))
        case FloatType if wire == 5 =>
          row.update(idx, java.lang.Float.intBitsToFloat(r.readFixed(4).toInt))
        case StringType if wire == 2 =>
          row.update(idx, UTF8String.fromBytes(r.readBytes()))
        case BinaryType if wire == 2 => row.update(idx, r.readBytes())
        case st: StructType if wire == 2 => row.update(idx, decode(r.readBytes(), st))
        case at: ArrayType if wire == 2 => at.elementType match {
          case StringType => listFor(idx) += UTF8String.fromBytes(r.readBytes())
          case BinaryType => listFor(idx) += r.readBytes()
          case st: StructType => listFor(idx) += decode(r.readBytes(), st)
          case elem => // packed payload of concatenated numeric values
            val pr = new Reader(r.readBytes())
            val buf = listFor(idx)
            while (pr.hasMore) elem match {
              case LongType => buf += pr.readVarint()
              case IntegerType => buf += pr.readVarint().toInt
              case BooleanType => buf += (pr.readVarint() != 0L)
              case DoubleType => buf += java.lang.Double.longBitsToDouble(pr.readFixed(8))
              case FloatType => buf += java.lang.Float.intBitsToFloat(pr.readFixed(4).toInt)
              case other => throw new IllegalArgumentException(
                s"protobuf codec: unsupported repeated element type $other")
            }
        }
        // unpacked repeated numerics: one scalar tag per element
        case at: ArrayType if wire == 0 => at.elementType match {
          case LongType => listFor(idx) += r.readVarint()
          case IntegerType => listFor(idx) += r.readVarint().toInt
          case BooleanType => listFor(idx) += (r.readVarint() != 0L)
          case _ => r.skip(wire)
        }
        case at: ArrayType if wire == 1 && at.elementType == DoubleType =>
          listFor(idx) += java.lang.Double.longBitsToDouble(r.readFixed(8))
        case at: ArrayType if wire == 5 && at.elementType == FloatType =>
          listFor(idx) += java.lang.Float.intBitsToFloat(r.readFixed(4).toInt)
        case _ => r.skip(wire) // declared type and wire type disagree
      }
    }
    // repeated fields always materialize: absent → empty, proto3-style
    var i = 0
    while (i < schema.length) {
      schema.fields(i).dataType match {
        case _: ArrayType =>
          val vals = if (lists != null && lists(i) != null) lists(i).toArray
                     else Array.empty[Any]
          row.update(i, new GenericArrayData(vals))
        case _ => ()
      }
      i += 1
    }
    row
  }
}

/** Codegen decode of a binary protobuf message column to a struct. */
case class ProtoDecodeExpr(child: Expression, schema: StructType)
    extends UnaryExpression {
  override def dataType: DataType = schema
  override def prettyName: String = "proto_decode"
  override protected def nullSafeEval(input: Any): Any =
    ProtobufLite.decode(input.asInstanceOf[Array[Byte]], schema)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("protoSchema", schema,
      classOf[StructType].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.ProtobufLite.decode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): ProtoDecodeExpr =
    copy(child = newChild)
}

/** Codegen encode of a struct column to protobuf message bytes. */
case class ProtoEncodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "proto_encode"
  private lazy val structType = child.dataType.asInstanceOf[StructType]
  override protected def nullSafeEval(input: Any): Any =
    ProtobufLite.encode(input.asInstanceOf[InternalRow], structType)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("protoSchema", structType,
      classOf[StructType].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.ProtobufLite.encode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): ProtoEncodeExpr =
    copy(child = newChild)
}

object ProtobufFunctions {
  def proto_decode(data: Column, schema: StructType): Column =
    ColumnBridge.column(ProtoDecodeExpr(ColumnBridge.expression(data), schema))
  def proto_encode(struct: Column): Column =
    ColumnBridge.column(ProtoEncodeExpr(ColumnBridge.expression(struct)))
}
