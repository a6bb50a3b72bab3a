package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the §2.9 dedup/fingerprint hot path.
  * Each stays inside whole-stage codegen (doGenCode emits a single call
  * into graft.functions.TextHashing), so a scan→hash→explode pipeline
  * compiles to one generated loop — no interpreted lambda per element,
  * no UDF serialization. At 100 TB this is the difference between the
  * hash being scan-bound vs CPU-bound (round-2 bench: 688 s → ~2 s for
  * minhash at sf0.1).
  */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashing.shingleHashes(input.asInstanceOf[UTF8String].toString, n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHashing.shingleHashes($c.toString(), $n))")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashing.minhashSig(input.asInstanceOf[UTF8String].toString, n, k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHashing.minhashSig($c.toString(), $n, $k))")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** [[MinHashSigExpr]]'s oracle-replayable twin (md5 + LCG mod 2³¹−1,
  * see TextHashing.portableMinhashSig) — same codegen shape, one call
  * into the kernel per row.
  */
case class PortableMinhashSigExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashing.portableMinhashSig(input.asInstanceOf[UTF8String].toString, n, k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHashing.portableMinhashSig($c.toString(), $n, $k))")
  override protected def withNewChildInternal(newChild: Expression): PortableMinhashSigExpr =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextHashing.simhash64(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.simhash64($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** [[SimHash64Expr]]'s oracle-replayable twin (md5-derived token
  * hashes, see TextHashing.portableSimhash64) — same codegen shape.
  */
case class PortableSimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextHashing.portableSimhash64(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.portableSimhash64($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): PortableSimHash64Expr =
    copy(child = newChild)
}

case class FingerprintExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    TextHashing.fingerprintMin(input.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.fingerprintMin($c.toString(), $n)")
  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

/** [[FingerprintExpr]]'s oracle-replayable twin (md5-derived shingle
  * base hashes mod 2³¹−1, see TextHashing.portableFingerprintMin) —
  * same codegen shape.
  */
case class PortableFingerprintExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_doc_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    TextHashing.portableFingerprintMin(input.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashing.portableFingerprintMin($c.toString(), $n)")
  override protected def withNewChildInternal(newChild: Expression): PortableFingerprintExpr =
    copy(child = newChild)
}

case class LangIdExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextHashing.langId(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextHashing.langId($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** 8-hex-char slice → long at 1-based `pos` — the codegen form of
  * `conv(substring(h, pos, 8), 16, 10)` for hex inputs (md5 bucket
  * derivation). Byte-level parse of the UTF8String in place: no
  * substring allocation, no generic base conversion.
  */
case class HexSliceToLongExpr(child: Expression, pos: Int)
    extends UnaryExpression {
  require(pos >= 1, s"pos is 1-based, got $pos")
  override def dataType: DataType = LongType
  override def prettyName: String = "hex_slice_long"
  override protected def nullSafeEval(input: Any): Any =
    TextHashing.hexSliceToLong(input.asInstanceOf[UTF8String], pos)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashing.hexSliceToLong($c, $pos)")
  override protected def withNewChildInternal(newChild: Expression): HexSliceToLongExpr =
    copy(child = newChild)
}

/** Column-API lifts of the expressions above. */
object TextHashFunctions {
  def hex_slice_long(hex: Column, pos: Int): Column =
    ColumnBridge.column(HexSliceToLongExpr(ColumnBridge.expression(hex), pos))
  def shingle_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(text), n))
  def minhash_sig(text: Column, n: Int, k: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(text), n, k))
  def portable_minhash_sig(text: Column, n: Int, k: Int): Column =
    ColumnBridge.column(PortableMinhashSigExpr(ColumnBridge.expression(text), n, k))
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(text)))
  def portable_simhash64(text: Column): Column =
    ColumnBridge.column(PortableSimHash64Expr(ColumnBridge.expression(text)))
  def doc_fingerprint(text: Column, n: Int): Column =
    ColumnBridge.column(FingerprintExpr(ColumnBridge.expression(text), n))
  def portable_doc_fingerprint(text: Column, n: Int): Column =
    ColumnBridge.column(PortableFingerprintExpr(ColumnBridge.expression(text), n))
  def lang_id(text: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text)))
}
