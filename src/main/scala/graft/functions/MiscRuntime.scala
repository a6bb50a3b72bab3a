package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** `delay(ms, x)`: sleep `ms` milliseconds, then return `x` unchanged —
  * the reference's per-event rate limiter (internal/binder/function/
  * funcs_misc.go:595). Marked non-deterministic so Catalyst never
  * collapses duplicate calls or reorders the sleep past a filter — the
  * side effect IS the function. Evaluated per-row on executors, so at
  * scale the delay parallelizes per-partition exactly like the
  * reference's per-event sleep parallelizes per rule instance.
  */
final case class DelayExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 2, "delay expects 2 args (ms, value)")

  override def nullable: Boolean = children(1).nullable
  override def dataType: DataType = children(1).dataType
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = {
    val ms = children(0).eval(input) match {
      case null => 0L
      case n: Number => n.longValue()
      case other => String.valueOf(other).toDouble.toLong
    }
    if (ms > 0) Thread.sleep(ms)
    children(1).eval(input)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** Deployment-level configuration properties the `props(key)` SQL
  * function reads (reference: funcs_misc.go:60 props.SC.Get — the
  * server's kuiper.yaml props section). JVM-local and read at PLAN
  * time: a rule picks up the value current when it starts, the same
  * moment the reference's rule-context literals (rule_start) bind.
  * Missing keys resolve to NULL.
  */
object ConfProps {
  private val store = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def set(key: String, value: String): Unit = store.put(key, value)
  def get(key: String): Option[String] = Option(store.get(key))
  def remove(key: String): Unit = store.remove(key)
  def clear(): Unit = store.clear()
}
