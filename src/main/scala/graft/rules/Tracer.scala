package graft.rules

import org.json4s._
import org.json4s.jackson.JsonMethods

/** One timed span of a rule's execution; spans nest (the reference's
  * OpenTelemetry span tree, pkg/tracer/model.go LocalSpan with
  * ChildSpan nesting).
  */
final case class TraceSpan(name: String, startMs: Long, durationMs: Long,
                           attributes: Map[String, String] = Map.empty,
                           children: Seq[TraceSpan] = Nil) {
  def toJson: JValue = JObject(
    "name" -> JString(name),
    "startMs" -> JLong(startMs),
    "durationMs" -> JLong(durationMs),
    "attributes" -> JObject(attributes.toList.sortBy(_._1)
      .map { case (k, v) => k -> (JString(v): JValue) }),
    "children" -> JArray(children.map(_.toJson).toList))
}

/** One captured trace: a span tree for one unit of rule work (a
  * micro-batch, a batch run, or the plan snapshot taken at
  * trace/start).
  */
final case class RuleTrace(id: String, ruleId: String, startMs: Long,
                           root: TraceSpan) {
  def toJson: JValue = JObject(
    "id" -> JString(id),
    "ruleId" -> JString(ruleId),
    "startMs" -> JLong(startMs),
    "root" -> root.toJson)
}

/** Per-rule trace capture behind the reference's tracing surface
  * (internal/server/rest.go:216-217,247-249 — POST /rules/{name}/
  * trace/start|stop, GET /trace/{id}, GET /trace/rule/{ruleID};
  * storage shape from pkg/tracer/manager.go LocalSpanMemoryStorage):
  * when tracing is enabled for a rule, the engine records span trees
  * — the Catalyst plan snapshot at enable time, then one trace per
  * micro-batch (built from Structured Streaming's QueryProgress
  * timing breakdown) or per batch run — into a bounded FIFO ring.
  *
  * Scale note: the ring holds span metadata only (names, durations,
  * row counts — never data rows), so capacity × span size is a few
  * hundred KB on the driver regardless of corpus size; the oldest
  * trace evicts when `capacity` is reached, exactly like the
  * reference's bounded in-memory span storage.
  */
final class RuleTracer(capacity: Int = 256) {
  require(capacity > 0, "tracer capacity must be positive")

  private val enabled = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // rules tracing under the "head" strategy: remaining capture budget
  // (reference rest.go:905 strategy field — head sampling captures the
  // first N units of work per enable, "always" captures every one)
  private val headBudget = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()
  private val seq = new java.util.concurrent.atomic.AtomicLong()
  // insertion-ordered so eviction drops the oldest trace first
  private val traces = new java.util.LinkedHashMap[String, RuleTrace]() {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, RuleTrace]): Boolean = size() > capacity
  }

  /** Enable capture. strategy "always" (default) records every unit of
    * work until stop; "head" records only the first `headLimit` traces
    * of this enable (the plan snapshot counts), then goes quiet — the
    * knob for tracing a busy rule without drowning the ring.
    */
  def enable(ruleId: String, strategy: String = "always",
             headLimit: Int = 10): Unit = {
    strategy match {
      case "head" => headBudget.put(ruleId,
        new java.util.concurrent.atomic.AtomicInteger(math.max(1, headLimit)))
      case "always" => headBudget.remove(ruleId)
      case other => throw new IllegalArgumentException(
        s"unknown trace strategy '$other' (want always|head)")
    }
    enabled.add(ruleId)
  }
  def disable(ruleId: String): Unit = {
    enabled.remove(ruleId); headBudget.remove(ruleId)
  }
  def isEnabled(ruleId: String): Boolean = enabled.contains(ruleId)

  /** Record a span tree for the rule; returns the new trace id, or
    * None when a head-strategy budget is exhausted (nothing stored).
    */
  def record(ruleId: String, root: TraceSpan): Option[String] = {
    val budget = headBudget.get(ruleId)
    if (budget != null && budget.decrementAndGet() < 0) return None
    val id = s"$ruleId-${seq.incrementAndGet()}"
    traces.synchronized {
      traces.put(id, RuleTrace(id, ruleId, root.startMs, root))
    }
    Some(id)
  }

  def trace(id: String): Option[RuleTrace] =
    traces.synchronized(Option(traces.get(id)))

  /** Trace ids recorded for a rule, newest first (reference
    * GetTraceByRuleID with its limit parameter; limit <= 0 = all).
    */
  def traceIds(ruleId: String, limit: Int = 0): Seq[String] = {
    import scala.jdk.CollectionConverters._
    // one snapshot under one lock; filtering outside (the previous
    // per-id re-lock inside the filter was O(n²) lock acquisitions)
    val all = traces.synchronized(traces.values().asScala.toVector)
      .filter(_.ruleId == ruleId).map(_.id).reverse
    if (limit > 0) all.take(limit) else all
  }

  def traceJson(id: String): Option[String] =
    trace(id).map(t => JsonMethods.compact(JsonMethods.render(t.toJson)))
}

object RuleTracer {
  /** Span tree from one Structured Streaming micro-batch progress:
    * the root carries batch id / row counts, its children are Spark's
    * own phase timing breakdown (addBatch, getBatch, queryPlanning,
    * walCommit, …) plus one span per source with its offsets.
    */
  def fromProgress(p: org.apache.spark.sql.streaming.StreamingQueryProgress): TraceSpan = {
    import scala.jdk.CollectionConverters._
    val start =
      try java.time.Instant.parse(p.timestamp).toEpochMilli
      catch { case _: Exception => System.currentTimeMillis() }
    val total = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue()).getOrElse(0L)
    val phases = p.durationMs.asScala.toSeq.sortBy(_._1).map { case (k, v) =>
      TraceSpan(s"phase:$k", start, v.longValue())
    }
    val sources = p.sources.toSeq.map { s =>
      TraceSpan(s"source", start, 0L, Map(
        "description" -> String.valueOf(s.description),
        "numInputRows" -> s.numInputRows.toString,
        "startOffset" -> String.valueOf(s.startOffset),
        "endOffset" -> String.valueOf(s.endOffset)))
    }
    TraceSpan("microbatch", start, total, Map(
      "batchId" -> p.batchId.toString,
      "query" -> String.valueOf(p.name),
      "numInputRows" -> p.numInputRows.toString,
      "sink" -> String.valueOf(p.sink.description)),
      phases ++ sources)
  }
}
