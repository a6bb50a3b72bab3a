package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.RegistryBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** External function services (reference: internal/service — REST
  * executor, executors.go httpExecutor): a registered service exposes
  * each of its methods as a SQL function; invoking the function POSTs
  * the arguments as JSON to `addr/uri` and returns the parsed
  * response. The reference also speaks gRPC/msgpack-rpc through
  * protoreflect — REST is the transport implemented here (the
  * schemaless-JSON mapping), the one a zero-dependency deployment can
  * actually reach.
  *
  * Each function registers as a Catalyst [[ServiceCallExpr]] — any
  * arity, usable directly in rule SQL — marked NON-DETERMINISTIC so
  * the optimizer never duplicates, reorders past filters, or
  * constant-folds a network side effect. Calls execute on the
  * EXECUTORS row-by-row like the reference's per-invocation POST;
  * wire cost is the service's, not the plan's.
  */
object Services {

  final case class FunctionDef(name: String, returnType: String = "string",
                               uri: Option[String] = None, method: String = "POST")
  /** protocol: rest (default) | msgpack (msgpack-RPC over tcp://, the
    * reference's executors_msgpack.go) | grpc (unary over h2c,
    * executors.go grpcExecutor — `uri` carries the full method path
    * `/pkg.Service/Method`, defaulting to `/<name>`).
    */
  final case class ServiceDef(name: String, addr: String,
                              functions: Seq[FunctionDef],
                              headers: Map[String, String] = Map.empty,
                              protocol: String = "rest") {
    require(Seq("rest", "msgpack", "grpc").contains(protocol),
      s"unsupported service protocol '$protocol'")
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ServiceDef]()

  def list: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSeq.sorted
  }
  def get(name: String): Option[ServiceDef] = Option(registry.get(name))
  def drop(name: String): Unit = registry.remove(name)

  /** Register the service and bind each function into the session's
    * function registry (same path as GraftFunctions — SQL sees them
    * like any other function).
    */
  def register(spark: SparkSession, svc: ServiceDef): Unit = {
    registry.put(svc.name, svc)
    svc.functions.foreach { f =>
      svc.protocol match {
        case "msgpack" =>
          val u = java.net.URI.create(svc.addr)
          RegistryBridge.register(spark, f.name,
            args => MsgpackCallExpr(f.name, u.getHost, u.getPort, f.returnType, args))
        case "grpc" =>
          val u = java.net.URI.create(svc.addr)
          val path = f.uri.getOrElse("/" + f.name)
          RegistryBridge.register(spark, f.name,
            args => GrpcCallExpr(f.name, u.getHost, u.getPort, path, f.returnType, args))
        case _ =>
          val url = svc.addr.stripSuffix("/") + f.uri.getOrElse("/" + f.name)
          RegistryBridge.register(spark, f.name,
            args => ServiceCallExpr(f.name, url, f.method, svc.headers, f.returnType, args))
      }
    }
  }

  /** Executor-side HTTP invocation; non-2xx raises (the rule fails
    * like the reference's executor error path).
    */
  private[rules] def invoke(url: String, method: String,
                            headers: Map[String, String], body: String): String = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setRequestProperty("Content-Type", "application/json")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      if (method != "GET") {
        conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"service call $url failed: HTTP $code")
      new String(conn.getInputStream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    } finally conn.disconnect()
  }
}

/** One external-service function call site. Children evaluate to the
  * call arguments, serialized as a JSON array (single-argument calls
  * send the bare value); the response parses per `returnType`
  * (string | bigint | double | boolean — JSON payload responses stay
  * strings for the caller's json functions to pick apart).
  */
final case class ServiceCallExpr(fnName: String, url: String, method: String,
                                 headers: Map[String, String], returnType: String,
                                 children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = false

  override def dataType: DataType = returnType match {
    case "bigint" | "long" => LongType
    case "double" | "float" => DoubleType
    case "boolean" => BooleanType
    case _ => StringType
  }

  private def jsonValue(dt: DataType, v: Any): String = (dt, v) match {
    case (_, null) => "null"
    case (StringType, s) =>
      val str = s.toString
      val b = new StringBuilder("\"")
      str.foreach {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.append('"').toString
    case (ArrayType(et, _), a: ArrayData) =>
      (0 until a.numElements()).map(i => jsonValue(et, a.get(i, et))).mkString("[", ",", "]")
    case (_, other) => String.valueOf(other)
  }

  override def eval(input: InternalRow): Any = {
    val rendered = children.map(c => jsonValue(c.dataType, c.eval(input)))
    val body =
      if (rendered.length == 1) rendered.head
      else rendered.mkString("[", ",", "]")
    val resp = Services.invoke(url, method, headers, body).trim
    returnType match {
      case "bigint" | "long" => resp.toLong
      case "double" | "float" => resp.toDouble
      case "boolean" => resp.toBoolean
      case _ =>
        // a JSON string response unquotes via the real JSON parser
        // (hand-rolled replace chains mis-order \\n vs \\\\ and miss
        // \t / \uXXXX); anything non-string passes through verbatim
        val s =
          if (resp.length >= 2 && resp.head == '"' && resp.last == '"')
            try org.json4s.jackson.JsonMethods.parse(resp) match {
              case org.json4s.JString(v) => v
              case _ => resp
            } catch { case _: Exception => resp }
          else resp
        UTF8String.fromString(s)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ServiceCallExpr =
    copy(children = newChildren)
}

/** Shared arg/result plumbing for the binary service transports. */
private[rules] object ServiceValues {
  /** Catalyst value → plain Scala value (msgpack/JSON-friendly). */
  def scalaValue(dt: DataType, v: Any): Any =
    if (v == null) null
    else dt match {
      case StringType => v.asInstanceOf[UTF8String].toString
      case ByteType | ShortType | IntegerType => v.asInstanceOf[Number].longValue()
      case LongType => v
      case FloatType => v.asInstanceOf[Float].toDouble
      case DoubleType => v
      case BooleanType => v
      case d: DecimalType => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
      case ArrayType(et, _) =>
        val a = v.asInstanceOf[ArrayData]
        (0 until a.numElements()).map(i => scalaValue(et, a.get(i, et)))
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        st.fields.zipWithIndex.map { case (f, i) =>
          f.name -> scalaValue(f.dataType, row.get(i, f.dataType))
        }.toMap
      case _ => String.valueOf(v)
    }

  /** Service result → the declared SQL return type. Structured
    * results JSON-render under `string` for the caller's json
    * functions to pick apart.
    */
  def toResult(returnType: String, v: Any): Any = returnType match {
    case "bigint" | "long" => v match {
      case null => null
      case l: Long => l
      case d: Double => d.toLong
      case s: String => s.toLong
      case b: Boolean => if (b) 1L else 0L
      case other => String.valueOf(other).toLong
    }
    case "double" | "float" => v match {
      case null => null
      case l: Long => l.toDouble
      case d: Double => d
      case s: String => s.toDouble
      case other => String.valueOf(other).toDouble
    }
    case "boolean" => v match {
      case null => null
      case b: Boolean => b
      case l: Long => l != 0
      case s: String => s.toBoolean
      case other => String.valueOf(other).toBoolean
    }
    case _ => v match {
      case null => null
      case s: String => UTF8String.fromString(s)
      case m: scala.collection.Map[_, _] => UTF8String.fromString(json(m))
      case xs: Seq[_] => UTF8String.fromString(json(xs))
      case other => UTF8String.fromString(String.valueOf(other))
    }
  }

  private def json(v: Any): String = v match {
    case null => "null"
    case s: String => org.json4s.jackson.JsonMethods.compact(org.json4s.JString(s))
    case d: Double => if (d == math.rint(d)) d.toLong.toString else d.toString
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) => json(String.valueOf(k)) + ":" + json(mv) }.mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(json).mkString("[", ",", "]")
    case other => String.valueOf(other)
  }
}

/** msgpack-RPC service call (reference executors_msgpack.go): args go
  * as the request's params array over a shared per-endpoint TCP
  * connection ON THE EXECUTOR; the spec's error member raises.
  */
final case class MsgpackCallExpr(fnName: String, host: String, port: Int,
                                 returnType: String, children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = false
  override def prettyName: String = fnName
  override def dataType: DataType = returnType match {
    case "bigint" | "long" => LongType
    case "double" | "float" => DoubleType
    case "boolean" => BooleanType
    case _ => StringType
  }

  override def eval(input: InternalRow): Any = {
    val params = children.map(c => ServiceValues.scalaValue(c.dataType, c.eval(input)))
    val result = graft.net.MsgpackRpcClient.callShared(host, port, fnName, params)
    ServiceValues.toResult(returnType, result)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MsgpackCallExpr =
    copy(children = newChildren)
}

/** Unary gRPC service call over graft's own h2c transport (reference
  * executors.go grpcExecutor via protoreflect): the schemaless
  * mapping encodes positional args as protobuf fields 1..n of the
  * request message and reads field 1 of the response per returnType —
  * `{"string" → LEN, integrals → varint, double → fixed64, boolean →
  * varint}` — the same wire bytes a proto with those field numbers
  * produces, without needing a descriptor file.
  */
final case class GrpcCallExpr(fnName: String, host: String, port: Int,
                              methodPath: String, returnType: String,
                              children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = false
  override def prettyName: String = fnName
  override def dataType: DataType = returnType match {
    case "bigint" | "long" => LongType
    case "double" | "float" => DoubleType
    case "boolean" => BooleanType
    case _ => StringType
  }

  private val reqSchema = StructType(children.zipWithIndex.map { case (c, i) =>
    StructField(s"p${i + 1}", c.dataType match {
      case ByteType | ShortType | IntegerType => LongType
      case FloatType => DoubleType
      case other => other
    })
  })
  private val respSchema = StructType(Seq(StructField("r", dataType match {
    case LongType => LongType
    case DoubleType => DoubleType
    case BooleanType => BooleanType
    case _ => StringType
  })))

  override def eval(input: InternalRow): Any = {
    val vals: Array[Any] = children.map { c =>
      val v = c.eval(input)
      if (v == null) null
      else c.dataType match {
        case ByteType | ShortType | IntegerType => v.asInstanceOf[Number].longValue()
        case FloatType => v.asInstanceOf[Float].toDouble
        case _ => v
      }
    }.toArray
    val reqBytes = graft.functions.ProtobufLite.encode(
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals), reqSchema)
    val respBytes = graft.net.GrpcClient.unary(host, port, methodPath, reqBytes)
    val row = graft.functions.ProtobufLite.decode(respBytes, respSchema)
    if (row.isNullAt(0)) null else row.get(0, respSchema.fields(0).dataType)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GrpcCallExpr =
    copy(children = newChildren)
}
