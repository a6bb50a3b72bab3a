package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** zlib/gzip/flate/zstd byte kernels for the reference's
  * compress/decompress functions (lf-edge/ekuiper
  * internal/binder/function/funcs_misc.go:390) and the sink-level
  * `compression` / source-level `decompression` props
  * (internal/compressor/ext_compressor.go registers the same four).
  * zlib/gzip/flate ride java.util.zip; zstd rides the zstd-jni that
  * ships with Spark itself (parquet/shuffle codec) — no new
  * dependency. Static methods callable from generated code.
  */
object Compression {
  /** Codecs the expressions accept. Checked at construction: the codec
    * string is spliced into generated Java, so anything outside this
    * whitelist must be rejected before it can reach codegen.
    */
  val codecs: Set[String] = Set("zlib", "gzip", "flate", "zstd")

  private def deflate(data: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(32, data.length / 2))
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val inf = new java.util.zip.Inflater(nowrap)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(32, data.length * 2))
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new java.util.zip.DataFormatException("truncated deflate input")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  def compress(data: Array[Byte], codec: String): Array[Byte] = codec match {
    case "zlib" => deflate(data, nowrap = false)
    case "flate" => deflate(data, nowrap = true) // raw DEFLATE, Go compress/flate
    case "gzip" =>
      val bos = new java.io.ByteArrayOutputStream(math.max(32, data.length / 2))
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(data); g.close()
      bos.toByteArray
    case "zstd" =>
      val bos = new java.io.ByteArrayOutputStream(math.max(32, data.length / 2))
      val z = new com.github.luben.zstd.ZstdOutputStream(bos)
      z.write(data); z.close()
      bos.toByteArray
    case other => throw new IllegalArgumentException(s"unsupported codec $other")
  }

  def decompress(data: Array[Byte], codec: String): Array[Byte] = codec match {
    case "zlib" => inflate(data, nowrap = false)
    case "flate" => inflate(data, nowrap = true)
    case "gzip" =>
      val g = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(data))
      val out = new java.io.ByteArrayOutputStream(math.max(32, data.length * 2))
      val buf = new Array[Byte](4096)
      var n = g.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = g.read(buf) }
      out.toByteArray
    case "zstd" =>
      val z = new com.github.luben.zstd.ZstdInputStream(new java.io.ByteArrayInputStream(data))
      val out = new java.io.ByteArrayOutputStream(math.max(32, data.length * 2))
      val buf = new Array[Byte](4096)
      var n = z.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = z.read(buf) }
      out.toByteArray
    case other => throw new IllegalArgumentException(s"unsupported codec $other")
  }
}

case class CompressExpr(child: Expression, codec: String) extends UnaryExpression {
  require(Compression.codecs.contains(codec),
    s"unsupported codec '$codec' (expected one of ${Compression.codecs.mkString(", ")})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "compress"
  override protected def nullSafeEval(input: Any): Any =
    Compression.compress(input.asInstanceOf[Array[Byte]], codec)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"""graft.functions.Compression.compress($c, "$codec")""")
  override protected def withNewChildInternal(newChild: Expression): CompressExpr =
    copy(child = newChild)
}

case class DecompressExpr(child: Expression, codec: String) extends UnaryExpression {
  require(Compression.codecs.contains(codec),
    s"unsupported codec '$codec' (expected one of ${Compression.codecs.mkString(", ")})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "decompress"
  override protected def nullSafeEval(input: Any): Any =
    Compression.decompress(input.asInstanceOf[Array[Byte]], codec)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"""graft.functions.Compression.decompress($c, "$codec")""")
  override protected def withNewChildInternal(newChild: Expression): DecompressExpr =
    copy(child = newChild)
}

object CompressionFunctions {
  def compress(data: Column, codec: String): Column =
    ColumnBridge.column(CompressExpr(ColumnBridge.expression(data.cast("binary")), codec))
  def decompress(data: Column, codec: String): Column =
    ColumnBridge.column(DecompressExpr(ColumnBridge.expression(data), codec))
}
