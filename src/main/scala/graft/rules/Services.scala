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
  final case class ServiceDef(name: String, addr: String,
                              functions: Seq[FunctionDef],
                              headers: Map[String, String] = Map.empty)

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
      val url = svc.addr.stripSuffix("/") + f.uri.getOrElse("/" + f.name)
      RegistryBridge.register(spark, f.name,
        args => ServiceCallExpr(f.name, url, f.method, svc.headers, f.returnType, args))
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
