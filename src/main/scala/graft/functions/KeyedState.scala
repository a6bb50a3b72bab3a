package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Process-wide keyed state (reference: internal/keyedstate/kv.go —
  * a shared KV the `get_keyed_state` SQL function reads; writers are
  * SDK/plugin-side, here the programmatic [[KeyedState.set]]).
  *
  * SCOPE: JVM-local, matching the reference's single-process store.
  * `GetKeyedStateExpr` evaluates on executors, so on a multi-JVM
  * cluster driver-side `set` calls are NOT visible there — back this
  * trait of the deployment with an external KV (e.g. the redis
  * connection, as the reference's redis store option does) or
  * broadcast the state into the plan instead.
  */
object KeyedState {
  private val store = new java.util.concurrent.ConcurrentHashMap[String, Any]()

  def set(key: String, value: Any): Unit = store.put(key, value)
  def get(key: String): Option[Any] = Option(store.get(key))
  def clear(): Unit = store.clear()
}

/** `get_keyed_state(key, 'type', default)` (reference funcs_misc.go:616):
  * reads the shared store, casting to the requested type name
  * (bigint | float | string | boolean — the reference's cast.ToType
  * names); a missing key returns the default. Non-deterministic: the
  * lookup must re-evaluate per row and never constant-fold.
  */
final case class GetKeyedStateExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 3, "the args must be three") // reference ValidateLen(3)

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = false

  private def typeName: String = children(1) match {
    case e if e.foldable => String.valueOf(e.eval(null)).toLowerCase
    case _ => "string"
  }

  override def dataType: DataType = typeName match {
    case "bigint" | "long" | "int" => LongType
    case "float" | "double" => DoubleType
    case "boolean" | "bool" => BooleanType
    case _ => StringType
  }

  override def eval(input: InternalRow): Any = {
    val key = String.valueOf(children(0).eval(input))
    KeyedState.get(key) match {
      case None => children(2).eval(input) match {
        // align the default with the declared type
        case null => null
        case d => coerce(d)
      }
      case Some(v) => coerce(v)
    }
  }

  private def coerce(v: Any): Any = dataType match {
    case LongType => v match {
      case n: Number => n.longValue()
      case other => String.valueOf(other).toLong
    }
    case DoubleType => v match {
      case n: Number => n.doubleValue()
      case other => String.valueOf(other).toDouble
    }
    case BooleanType => v match {
      case b: Boolean => b
      case other => String.valueOf(other).toBoolean
    }
    case _ => UTF8String.fromString(String.valueOf(v))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GetKeyedStateExpr =
    copy(children = newChildren)
}

/** Process-wide named counters (reference FunctionContext
  * IncrCounter/GetCounter — the rule-context state the sample
  * accumulateWordCount plugin uses). Same JVM-local scope caveat as
  * [[KeyedState]].
  */
object RuleCounters {
  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  def incrAndGet(key: String, by: Long): Long =
    counters.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong()).addAndGet(by)
  def get(key: String): Long =
    Option(counters.get(key)).map(_.get()).getOrElse(0L)
  def clear(): Unit = counters.clear()
}

/** `accumulateWordCount(col, sep)` (reference
  * extensions/functions/accumulateWordCount/accumulateWordCount.go:48-74):
  * per event, add the word count of `col` split by `sep` to the shared
  * "allwordcount" counter and return the running total. Side-effecting
  * and execution-order dependent by design (the reference's counter is
  * process state); never constant-folds.
  */
final case class AccumulateWordCountExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 2,
    s"wordCount function only supports 2 parameter but got ${children.length}")

  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = LongType

  override def eval(input: InternalRow): Any = {
    val colV = children(0).eval(input)
    // a NULL column is not a string (the reference errors the tuple);
    // Spark has no per-row error channel, so contribute zero words and
    // return the unchanged running total instead of counting "null"
    if (colV == null) return RuleCounters.get("allwordcount")
    val col = String.valueOf(colV)
    val sep = String.valueOf(children(1).eval(input))
    // Go strings.Split: empty separator splits into runes
    val n =
      if (sep.isEmpty) col.codePointCount(0, col.length)
      else col.split(java.util.regex.Pattern.quote(sep), -1).length
    RuleCounters.incrAndGet("allwordcount", n.toLong)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AccumulateWordCountExpr =
    copy(children = newChildren)
}
