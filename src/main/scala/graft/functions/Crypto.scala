package graft.functions

import java.security.SecureRandom
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, IvParameterSpec, SecretKeySpec}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** AES payload encryption for the sink-level `encryption` prop
  * (reference modules/encryptor: aes with mode cfb|gcm, key from
  * base64 `aesKey` config, optional constant base64 `iv` prop).
  *
  * Wire formats mirror the reference's aes/stream.go + aes/gcm.go
  * happy paths, so a reference consumer can decrypt graft output and
  * vice versa:
  *  - cfb: `iv(16) || ciphertext`, ALWAYS — the reference's
  *    message-level StreamEncrypter unconditionally prepends the IV
  *    on Encrypt and strips 16 bytes on Decrypt even when a constant
  *    IV is configured (stream.go:19-44; only the file-writer path,
  *    NewStreamWriter, elides it). A constant IV prop just pins the
  *    cipher IV instead of drawing a random one. CFB128, the same
  *    feedback size as Go's cipher.NewCFBEncrypter.
  *  - gcm: `nonce(12) || ciphertext || tag(16)` — Go's
  *    gcm.Seal(nonce, nonce, data, nil) layout (gcm.go:55-83); a
  *    constant nonce still carries the prefix, matching Seal's
  *    append-to-dst behavior.
  *
  * Static kernels callable from generated code; the expressions keep
  * per-row encryption inside whole-stage codegen on executors.
  */
object Crypto {
  private val rng = new SecureRandom()

  private def cipher(mode: Int, transform: String, key: Array[Byte],
                     spec: java.security.spec.AlgorithmParameterSpec): Cipher = {
    val c = Cipher.getInstance(transform)
    c.init(mode, new SecretKeySpec(key, "AES"), spec)
    c
  }

  /** cfb encrypt: always `iv || ct` (StreamEncrypter layout); a
    * constant IV is used as the cipher IV but still emitted.
    */
  def aesCfbEncrypt(data: Array[Byte], key: Array[Byte], constantIv: Array[Byte]): Array[Byte] = {
    val iv =
      if (constantIv != null) constantIv
      else { val v = new Array[Byte](16); rng.nextBytes(v); v }
    require(iv.length == 16, "cfb IV must be 16 bytes")
    val ct = cipher(Cipher.ENCRYPT_MODE, "AES/CFB/NoPadding", key,
      new IvParameterSpec(iv)).doFinal(data)
    val out = new Array[Byte](16 + ct.length)
    System.arraycopy(iv, 0, out, 0, 16)
    System.arraycopy(ct, 0, out, 16, ct.length)
    out
  }

  /** cfb decrypt: always strips the 16-byte IV prefix and uses it as
    * the cipher IV — `constantIv` is ignored for layout (it only
    * pins what the producer embedded), matching StreamDecrypter.
    */
  def aesCfbDecrypt(secret: Array[Byte], key: Array[Byte], constantIv: Array[Byte]): Array[Byte] = {
    require(secret.length >= 16, "ciphertext too short")
    cipher(Cipher.DECRYPT_MODE, "AES/CFB/NoPadding", key,
      new IvParameterSpec(secret, 0, 16))
      .doFinal(secret, 16, secret.length - 16)
  }

  /** gcm encrypt: `nonce || ct || tag` (JCE emits ct||tag in one go). */
  def aesGcmEncrypt(data: Array[Byte], key: Array[Byte], constantNonce: Array[Byte]): Array[Byte] = {
    val nonce =
      if (constantNonce != null) constantNonce
      else { val n = new Array[Byte](12); rng.nextBytes(n); n }
    val ct = cipher(Cipher.ENCRYPT_MODE, "AES/GCM/NoPadding", key,
      new GCMParameterSpec(128, nonce)).doFinal(data)
    val out = new Array[Byte](nonce.length + ct.length)
    System.arraycopy(nonce, 0, out, 0, nonce.length)
    System.arraycopy(ct, 0, out, nonce.length, ct.length)
    out
  }

  def aesGcmDecrypt(secret: Array[Byte], key: Array[Byte], nonceSize: Int = 12): Array[Byte] = {
    require(secret.length >= nonceSize + 16, "ciphertext too short")
    cipher(Cipher.DECRYPT_MODE, "AES/GCM/NoPadding", key,
      new GCMParameterSpec(128, secret, 0, nonceSize))
      .doFinal(secret, nonceSize, secret.length - nonceSize)
  }

  /** Dispatch on the reference's encProps `mode` (default cfb, like
    * GetEncryptor). Key/iv arrive base64 per the reference's `aesKey`
    * config and `iv` prop encodings.
    */
  def encrypt(data: Array[Byte], keyB64: String, mode: String, ivB64: String): Array[Byte] = {
    val key = java.util.Base64.getDecoder.decode(keyB64)
    val iv = if (ivB64 == null || ivB64.isEmpty) null else java.util.Base64.getDecoder.decode(ivB64)
    mode match {
      case "cfb" | "" | null => aesCfbEncrypt(data, key, iv)
      case "gcm" => aesGcmEncrypt(data, key, iv)
      case other => throw new IllegalArgumentException(s"unsupported AES encryption mode: $other")
    }
  }

  def decrypt(secret: Array[Byte], keyB64: String, mode: String, ivB64: String): Array[Byte] = {
    val key = java.util.Base64.getDecoder.decode(keyB64)
    val iv = if (ivB64 == null || ivB64.isEmpty) null else java.util.Base64.getDecoder.decode(ivB64)
    mode match {
      case "cfb" | "" | null => aesCfbDecrypt(secret, key, iv)
      case "gcm" => aesGcmDecrypt(secret, key)
      case other => throw new IllegalArgumentException(s"unsupported AES encryption mode: $other")
    }
  }
}

/** Per-row AES encryption as a codegen expression: the sink pipeline's
  * encrypt step runs distributed inside whole-stage codegen, not on
  * the driver (reference: encrypt_op.go per-tuple on one goroutine).
  */
case class AesEncryptExpr(child: Expression, keyB64: String, mode: String,
                          ivB64: String) extends UnaryExpression {
  // fail fast at plan time: bad key/mode must not wait for the first row
  Crypto.encrypt(Array.emptyByteArray, keyB64, mode, ivB64)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "aes_payload_encrypt"
  override protected def nullSafeEval(input: Any): Any =
    Crypto.encrypt(input.asInstanceOf[Array[Byte]], keyB64, mode, ivB64)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("keyB64", keyB64, "java.lang.String")
    val m = ctx.addReferenceObj("mode", mode, "java.lang.String")
    val iv = ctx.addReferenceObj("ivB64", ivB64, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.Crypto.encrypt($c, $k, $m, $iv)")
  }
  override protected def withNewChildInternal(newChild: Expression): AesEncryptExpr =
    copy(child = newChild)
}

case class AesDecryptExpr(child: Expression, keyB64: String, mode: String,
                          ivB64: String) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "aes_payload_decrypt"
  override protected def nullSafeEval(input: Any): Any =
    Crypto.decrypt(input.asInstanceOf[Array[Byte]], keyB64, mode, ivB64)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("keyB64", keyB64, "java.lang.String")
    val m = ctx.addReferenceObj("mode", mode, "java.lang.String")
    val iv = ctx.addReferenceObj("ivB64", ivB64, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.Crypto.decrypt($c, $k, $m, $iv)")
  }
  override protected def withNewChildInternal(newChild: Expression): AesDecryptExpr =
    copy(child = newChild)
}

object CryptoFunctions {
  def aesPayloadEncrypt(data: Column, keyB64: String, mode: String = "cfb",
                        ivB64: String = ""): Column =
    ColumnBridge.column(AesEncryptExpr(
      ColumnBridge.expression(data.cast("binary")), keyB64, mode, ivB64))
  def aesPayloadDecrypt(data: Column, keyB64: String, mode: String = "cfb",
                        ivB64: String = ""): Column =
    ColumnBridge.column(AesDecryptExpr(
      ColumnBridge.expression(data), keyB64, mode, ivB64))
}
