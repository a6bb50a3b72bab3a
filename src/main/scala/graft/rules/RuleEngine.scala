package graft.rules

import graft.sinks.Sink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** A rule: one SQL query over catalog streams/tables plus sink
  * actions — the reference's core object (`internal/topo/rule`,
  * rule JSON {"sql": ..., "actions": [...]}).
  *
  * `streaming = false` runs the rule once over the bounded sources
  * (eKuiper's scan-table/batch rule); `true` compiles the same SQL
  * onto readStream sources and runs continuously.
  */
final case class Rule(id: String, sql: String, sinks: Seq[Sink],
                      streaming: Boolean = false,
                      triggerMs: Long = 0,
                      checkpointDir: Option[String] = None,
                      graphJson: Option[String] = None)

object Rule {
  /** Graph-API rule (JSON DAG; sinks come from the graph's sink nodes). */
  def graph(id: String, json: String, streaming: Boolean = false,
            checkpointDir: Option[String] = None): Rule =
    Rule(id, sql = "", sinks = Nil, streaming = streaming,
      checkpointDir = checkpointDir, graphJson = Some(json))
}

sealed trait RuleState
object RuleState {
  case object Created extends RuleState
  case object Running extends RuleState
  case object Stopped extends RuleState
  final case class Failed(err: String) extends RuleState
}

final case class RuleStatus(id: String, state: RuleState,
                            batchesProcessed: Long, rowsProcessed: Long)

/** Rule lifecycle engine (SURVEY §2.8; reference: internal/topo/
  * planner/planner.go + internal/server rule endpoints — create /
  * start / stop / delete / status / explain).
  *
  * Where the reference plans its own operator topology per rule and
  * executes it row-at-a-time on one node, graft compiles the rule's
  * SQL once through Catalyst and hands execution to Spark: batch rules
  * become jobs, streaming rules become Structured Streaming queries
  * whose state (windows, dedup, joins) lives in the distributed state
  * store and scales with executors.
  */
final class RuleEngine(spark: SparkSession, val catalog: Catalog = new Catalog) {

  // rule SQL gets the full eKuiper-named function surface
  graft.functions.GraftFunctions.registerAll(spark)

  private final class Slot(@volatile var rule: Rule) {
    @volatile var state: RuleState = RuleState.Created
    @volatile var queries: Seq[StreamingQuery] = Nil
    val batches = new java.util.concurrent.atomic.AtomicLong
    val rows = new java.util.concurrent.atomic.AtomicLong
  }
  private val slots = new java.util.concurrent.ConcurrentHashMap[String, Slot]()

  def create(rule: Rule): Unit =
    if (slots.putIfAbsent(rule.id, new Slot(rule)) != null)
      throw new IllegalStateException(s"rule ${rule.id} already exists")

  def createStream(ddl: String): StreamDef = catalog.executeDdl(ddl)

  /** Resolve every catalog stream referenced by the rule's SQL as a
    * temp view (stream mode per the rule), then parse the SQL.
    */
  private def plan(rule: Rule): DataFrame = {
    val referenced = catalog.list.filter(n =>
      java.util.regex.Pattern.compile(s"(?i)\\b$n\\b").matcher(rule.sql).find())
    referenced.foreach { name =>
      val d = catalog.get(name).get
      val base =
        if (rule.streaming && !d.isTable) d.source.stream(spark)
        else d.source.batch(spark)
      val withWm = (d.timestampCol, d.watermark) match {
        case (Some(ts), Some(wm)) if rule.streaming => base.withWatermark(ts, wm)
        case _ => base
      }
      withWm.createOrReplaceTempView(name)
    }
    // accept the reference's own SQL dialect (TUMBLINGWINDOW(ss,10) …)
    val sql =
      if (EkuiperSql.isEkuiperDialect(rule.sql)) {
        val tsCol = referenced.flatMap(n => catalog.get(n).flatMap(_.timestampCol))
          .headOption.getOrElse("ts")
        EkuiperSql.translate(rule.sql, tsCol)
      } else rule.sql
    spark.sql(sql)
  }

  def start(id: String): Unit = {
    val slot = lookup(id)
    val rule = slot.rule
    try {
      val outputs: Seq[(DataFrame, Sink)] = rule.graphJson match {
        case Some(json) =>
          GraphRule.compile(spark, catalog, json, rule.streaming)
            .map(c => c.df -> c.sink)
        case None =>
          val df = plan(rule)
          rule.sinks.map(df -> _)
      }
      if (rule.streaming) {
        slot.queries = outputs.zipWithIndex.map { case ((df, sink), i) =>
          sink.writeStream(df, s"${rule.id}_$i", rule.triggerMs,
            rule.checkpointDir.map(c => s"$c/$i"))
        }
      } else {
        // piggyback the row counter on the sink's own action via
        // observe(): the old df.count() re-ran the whole plan a second
        // time just for the metric.
        val observed = outputs.zipWithIndex.map {
          case ((df, sink), 0) =>
            val obs = new org.apache.spark.sql.Observation(s"rule_${rule.id}_rows")
            (Some(obs), df.observe(obs, count(lit(1)).as("rows")), sink)
          case ((df, sink), _) => (None, df, sink)
        }
        observed.foreach { case (_, df, sink) => sink.writeBatch(df) }
        slot.batches.incrementAndGet()
        observed.headOption.flatMap(_._1).foreach { obs =>
          // listener delivery is async; bounded poll instead of get()
          // (which would block forever under a sink that runs no action)
          val peek = org.apache.spark.sql.graft.ObservationBridge.getOrEmpty _
          var m = peek(obs)
          val deadline = System.nanoTime() + 5000L * 1000 * 1000
          while (m.isEmpty && System.nanoTime() < deadline) {
            Thread.sleep(10); m = peek(obs)
          }
          slot.rows.addAndGet(m.get("rows").map(_.asInstanceOf[Long]).getOrElse(0L))
        }
      }
      slot.state = RuleState.Running
      if (!rule.streaming) slot.state = RuleState.Stopped // one-shot done
    } catch {
      case e: Exception =>
        slot.state = RuleState.Failed(String.valueOf(e.getMessage))
        throw e
    }
  }

  def stop(id: String): Unit = {
    val slot = lookup(id)
    slot.queries.foreach(_.stop())
    slot.queries = Nil
    slot.state = RuleState.Stopped
  }

  def delete(id: String): Unit = {
    if (slots.containsKey(id)) stop(id)
    slots.remove(id)
  }

  def status(id: String): RuleStatus = {
    val slot = lookup(id)
    val (b, r) = slot.queries.foldLeft((slot.batches.get, slot.rows.get)) {
      case ((bb, rr), q) =>
        val p = Option(q.lastProgress)
        (bb + p.map(_.batchId + 1).getOrElse(0L),
         rr + p.map(_.numInputRows).getOrElse(0L))
    }
    RuleStatus(id, slot.state, b, r)
  }

  /** The reference's EXPLAIN endpoint: the Catalyst plan the rule
    * compiles to (formatted mode shows codegen spans + pushed filters).
    */
  def explain(id: String): String = {
    val rule = lookup(id).rule
    // explain on the batch form (streaming plans resolve per batch)
    val df = rule.graphJson match {
      case Some(json) => GraphRule.compile(spark, catalog, json, streaming = false).head.df
      case None => plan(rule.copy(streaming = false))
    }
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExtendedMode)
  }

  def list: Seq[String] = {
    import scala.jdk.CollectionConverters._
    slots.keySet().asScala.toSeq.sorted
  }

  /** Block until all streaming sinks of a rule are idle (test helper —
    * mirrors processAllAvailable).
    */
  def processAllAvailable(id: String): Unit =
    lookup(id).queries.foreach(_.processAllAvailable())

  private def lookup(id: String): Slot =
    Option(slots.get(id)).getOrElse(throw new NoSuchElementException(s"rule $id"))
}
