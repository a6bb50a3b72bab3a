package graft.rules

import graft.sinks._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, session_window, window}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Graph-API rules (SURVEY §2.8; reference docs/en_US/guide/rules/
  * graph_rule.md): a Node-RED-style JSON DAG of source → operator →
  * sink nodes, compiled onto the same Dataset combinators as SQL
  * rules — one Catalyst plan per sink, so the optimizer sees the
  * whole pipeline (filter pushdown across node boundaries is free).
  *
  * {{{
  * {"nodes": {
  *    "src":  {"type":"source", "stream":"demo"},
  *    "hot":  {"type":"operator", "op":"filter", "expr":"temp > 20"},
  *    "stat": {"type":"operator", "op":"aggregate",
  *             "groupBy":["device"], "aggs":["count(*) as n"]},
  *    "out":  {"type":"sink", "kind":"memory", "endpoint":"t_out"}},
  *  "edges": {"src":["hot"], "hot":["stat"], "stat":["out"]}}
  * }}}
  *
  * Operators: filter, project (select-exprs), expr (script-node
  * alternative: `name AS ...` expressions add/overwrite columns
  * sequentially, keeping the rest of the message), aggregate
  * (groupBy/aggs, optional tumbling window on a ts column), having,
  * orderby, limit, join (two inputs; on/how), dedup (keep-first by
  * keys), switch (condition routing: output edge i carries rows
  * matching cases[i]; stopAtFirstMatch=true — the default, like the
  * reference — makes branches disjoint by excluding earlier cases),
  * window, watermark — plus the reference's own node names
  * (graph_rule.md): pick (fields projection), function (one call
  * expression added as a field named after the function), groupby
  * (dimension marker) feeding aggfunc (aggregate expression over the
  * inherited grouping — dimensions and/or an upstream window key).
  *
  * The reference's JSON shape is accepted VERBATIM alongside graft's
  * flattened one: a rule wrapper with a `graph` property, `topo.edges`,
  * per-node `nodeType` + `props` (props hoist to the top level;
  * operator nodeType → op, source sourceName → stream, sink nodeType →
  * kind with endpoint assembled from server/topic/path/datasource).
  * Source nodes may also be INLINE — nodeType + stream-DDL props
  * (datasource/format/…) with no pre-registered stream — compiled
  * through the same [[Catalog.sourceFor]] the DDL uses.
  *
  * `window` is a first-class node like the reference's
  * (internal/topo/graph/io.go OpIO "window"; props per
  * internal/topo/graph/node.go Window and
  * internal/topo/planner/planner_graph.go parseWindow): props
  * windowType (tumblingwindow | hoppingwindow | sessionwindow), unit
  * (dd|hh|mi|ss|ms), size, interval, and optionally ts (event-time
  * column; defaults to the upstream stream's timestamp). It compiles to
  * the same `functions.window`/`session_window` grouping key the SQL
  * dialect produces, consumed by the downstream aggregate node, which
  * exposes the window struct as `w` (w.start / w.end projectable
  * downstream). slidingwindow / countwindow have no GROUP-BY
  * equivalent — same documented rejection as [[EkuiperSql]], pointing
  * at the operator API.
  *
  * `watermark` mirrors internal/topo/graph/node.go Watermark
  * (emitters, sendWatermark) plus a Spark-native `delay`; in streaming
  * mode it applies `withWatermark(ts, delay)`, in batch it is a
  * pass-through (the reference's watermark op is likewise a stream-only
  * event-time gate).
  */
object GraphRule {

  final case class Compiled(sinkNode: String, df: DataFrame, sink: Sink)

  /** Normalize a node to graft's flattened shape, accepting the
    * reference's JSON verbatim (graph_rule.md): `props` fields hoist
    * to the top level; operator `nodeType` becomes `op`; source
    * `sourceName` becomes `stream`; sink `nodeType` becomes `kind`
    * with `endpoint` assembled from server/topic/path/datasource.
    */
  private def normalize(v: JValue): JValue = {
    val fs = v match { case JObject(o) => o; case _ => return v }
    val hoisted = (v \ "props") match {
      case JObject(pf) => fs.filterNot(_._1 == "props") ++ pf
      case _ => fs
    }
    val m = hoisted.toMap
    def s(f: String): Option[String] = m.get(f).collect { case JString(x) => x }
    val extra = scala.collection.mutable.ListBuffer[JField]()
    s("type").getOrElse("") match {
      case "operator" if s("op").isEmpty =>
        s("nodeType").foreach(nt => extra += JField("op", JString(nt.toLowerCase)))
      case "source" if s("stream").isEmpty =>
        s("sourceName").foreach(sn => extra += JField("stream", JString(sn)))
      case "sink" =>
        if (s("kind").isEmpty)
          s("nodeType").foreach(nt => extra += JField("kind", JString(nt.toLowerCase)))
        if (s("endpoint").isEmpty) {
          val ep = (s("server"), s("topic")) match {
            case (Some(srv), Some(t)) => Some(srv.stripSuffix("/") + "/" + t)
            case (None, Some(t)) => Some(t)
            case _ => s("path").orElse(s("datasource"))
          }
          ep.foreach(e => extra += JField("endpoint", JString(e)))
        }
      case _ => ()
    }
    JObject(hoisted ++ extra.toList)
  }

  /** Node fields rendered to strings — reference props carry numbers
    * and booleans (interval/seed/count/…) that must not drop silently.
    */
  private def stringProps(v: JValue): Map[String, String] = v match {
    case JObject(fs) => fs.collect {
      case JField(k, JString(s)) => k -> s
      case JField(k, JInt(n)) => k -> n.toString
      case JField(k, JDouble(d)) => k -> d.toString
      case JField(k, JBool(b)) => k -> b.toString
    }.toMap
    case _ => Map.empty
  }

  def compile(spark: SparkSession, catalog: Catalog, json: String,
              streaming: Boolean = false): Seq[Compiled] = {
    val parsed = JsonMethods.parse(json)
    // accept both the bare graph object and the reference's rule wrapper
    val root = (parsed \ "graph") match {
      case o: JObject => o
      case _ => parsed
    }
    val nodes: Map[String, JValue] = (root \ "nodes") match {
      case JObject(fs) => fs.map { case JField(k, v) => k -> normalize(v) }.toMap
      case _ => throw new IllegalArgumentException("graph rule needs a nodes object")
    }
    // edges in declaration order — join input order follows it; the
    // reference nests them under "topo"
    val edgesJson = (root \ "edges") match {
      case o: JObject => o
      case _ => root \ "topo" \ "edges"
    }
    val edgeList: Seq[(String, String)] = edgesJson match {
      case JObject(fs) => fs.flatMap { case JField(from, JArray(tos)) =>
        tos.collect { case JString(to) => from -> to } }
      case _ => Seq.empty
    }
    val inputsOf: Map[String, Seq[String]] =
      edgeList.groupBy(_._2).map { case (to, es) => to -> es.map(_._1) }

    def str(v: JValue, field: String): String = (v \ field) match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException(s"node needs string '$field'")
    }
    def strSeq(v: JValue, field: String): Seq[String] = (v \ field) match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Seq.empty
    }
    def optStr(v: JValue, field: String): Option[String] = (v \ field) match {
      case JString(s) => Some(s)
      case _ => None
    }

    def optInt(v: JValue, field: String): Option[Int] = (v \ field) match {
      case JInt(n) => Some(n.toInt)
      case JString(s) if s.nonEmpty && s.forall(_.isDigit) => Some(s.toInt)
      case _ => None
    }

    def opIs(n: String, op: String): Boolean = nodes.get(n).exists(v =>
      (v \ "type") == JString("operator") && (v \ "op") == JString(op))
    def isSwitch(n: String): Boolean = opIs(n, "switch")
    def isWindow(n: String): Boolean = opIs(n, "window")
    def isGroupby(n: String): Boolean = opIs(n, "groupby")

    // time units per the reference's pkg/ast/window.go token set
    def unitName(u: String): String = u.toLowerCase match {
      case "dd" => "days"
      case "hh" => "hours"
      case "mi" => "minutes"
      case "ss" => "seconds"
      case "ms" => "milliseconds"
      case other => throw new IllegalArgumentException(s"invalid window unit '$other'")
    }

    /** Event-time column for a node: its own `ts` prop, else walk up to
      * the first source's declared timestamp column.
      */
    def tsOf(name: String): Option[String] = nodes.get(name).flatMap { v =>
      optStr(v, "ts").orElse {
        if ((v \ "type") == JString("source"))
          catalog.get(str(v, "stream")).flatMap(_.timestampCol)
        else inputsOf.getOrElse(name, Seq.empty).headOption.flatMap(tsOf)
      }
    }

    /** The grouping Column a window node contributes — validation rules
      * follow the reference's parseWindow
      * (internal/topo/planner/planner_graph.go:621).
      */
    def windowColOf(name: String): Column = {
      val v = nodes(name)
      val ts = tsOf(name).getOrElse(throw new IllegalArgumentException(
        s"window $name needs a 'ts' prop or an upstream stream with a declared timestamp"))
      val size = optInt(v, "size").getOrElse(
        throw new IllegalArgumentException(s"window $name needs integer 'size'"))
      require(size > 0, s"window $name: size $size is invalid")
      val interval = optInt(v, "interval").getOrElse(0)
      val unit = unitName(optStr(v, "unit").getOrElse("ss"))
      optStr(v, "windowType").getOrElse("tumblingwindow").toLowerCase match {
        case "tumblingwindow" =>
          require(interval == 0 || interval == size,
            s"window $name: tumbling window interval must equal size")
          window(col(ts), s"$size $unit")
        case "hoppingwindow" =>
          require(interval > 0, s"window $name: hopping window interval must be greater than 0")
          require(interval <= size, s"window $name: hopping window interval must be less than size")
          window(col(ts), s"$size $unit", s"$interval $unit")
        case "sessionwindow" =>
          // reference semantics: Interval is the session timeout; Size
          // (the max-length cap) has no session_window equivalent — the
          // same documented approximation as EkuiperSql SESSIONWINDOW
          require(interval > 0,
            s"window $name: session window interval (timeout) must be greater than 0")
          session_window(col(ts), s"$interval $unit")
        case t @ ("slidingwindow" | "countwindow") =>
          throw new IllegalArgumentException(
            s"window $name: $t has no GROUP-BY equivalent; use the operator API " +
              "(sliding: WindowQueries range frame; count: graft.streaming.CountWindowStream)")
        case other => throw new IllegalArgumentException(s"window $name: unknown window type $other")
      }
    }

    /** A switch's output toward one consumer: the rows matching that
      * edge's case (minus earlier cases under stopAtFirstMatch).
      */
    def branchOf(switchName: String, consumer: String): DataFrame = {
      val node = nodes(switchName)
      val cases = strSeq(node, "cases")
      require(cases.nonEmpty, s"switch $switchName needs a cases array")
      val outs = edgeList.filter(_._1 == switchName).map(_._2)
      val idx = outs.indexOf(consumer)
      require(idx >= 0 && idx < cases.size,
        s"switch $switchName: consumer $consumer has no matching case " +
          s"(${outs.size} outputs, ${cases.size} cases)")
      val in = inputDf(switchName)
      val stopAtFirst = (node \ "stopAtFirstMatch") != JBool(false)
      val cond =
        if (stopAtFirst && idx > 0)
          (cases.take(idx).map(c => s"NOT ($c)") :+ s"(${cases(idx)})").mkString(" AND ")
        else cases(idx)
      in.where(expr(cond))
    }

    /** Resolve `consumer`'s input named `inputName` — per-consumer for
      * switch nodes, shared otherwise.
      */
    def resolveInput(inputName: String, consumer: String): DataFrame =
      if (isSwitch(inputName)) branchOf(inputName, consumer)
      else if (isWindow(inputName) &&
          !Seq("aggregate", "aggfunc", "groupby").exists(opIs(consumer, _)))
        throw new IllegalArgumentException(
          s"window $inputName must feed an aggregate/aggfunc/groupby node, not $consumer — " +
            "windows group rows; only an aggregation can consume the grouping")
      else if (isGroupby(inputName) &&
          !Seq("aggregate", "aggfunc").exists(opIs(consumer, _)))
        throw new IllegalArgumentException(
          s"groupby $inputName must feed an aggfunc node, not $consumer — " +
            "its dimensions only mean something to an aggregation")
      else dfOf(inputName)

    /** Grouping context an aggregation inherits from its input chain:
      * groupby contributes its dimensions (and forwards a window key
      * from ITS input), a bare window contributes the window key.
      */
    def groupingFor(inputName: String): Seq[Column] =
      if (isGroupby(inputName)) {
        val g = nodes(inputName)
        val dims = strSeq(g, "dimensions") ++ strSeq(g, "groupBy")
        require(dims.nonEmpty, s"groupby $inputName needs a dimensions array")
        val up = inputsOf.getOrElse(inputName, Seq.empty).headOption
        val winKey = up.filter(isWindow).map(w => windowColOf(w).as("w"))
        winKey.toSeq ++ dims.map(expr)
      } else if (isWindow(inputName)) Seq(windowColOf(inputName).as("w"))
      else Seq.empty

    def inputDf(name: String): DataFrame = {
      val ins = inputsOf.getOrElse(name, Seq.empty)
      resolveInput(ins.headOption.getOrElse(
        throw new IllegalArgumentException(s"node $name has no input")), name)
    }

    lazy val memo = scala.collection.mutable.Map[String, DataFrame]()
    def dfOf(name: String): DataFrame = memo.getOrElseUpdate(name, {
      val node = nodes.getOrElse(name,
        throw new IllegalArgumentException(s"edge references unknown node $name"))
      val ins = inputsOf.getOrElse(name, Seq.empty)
      str(node, "type") match {
        case "source" =>
          val sd = optStr(node, "stream") match {
            case Some(streamName) => catalog.get(streamName).getOrElse(
              throw new NoSuchElementException(s"stream $streamName not in catalog"))
            case None =>
              // inline source: nodeType + the stream-DDL property set
              // (reference graph_rule.md source nodes without sourceName)
              val tpe = optStr(node, "nodeType").getOrElse(throw new IllegalArgumentException(
                s"source $name needs a 'stream' reference or an inline 'nodeType'"))
              val props = stringProps(node)
              StreamDef(name,
                Catalog.sourceFor(tpe.toLowerCase, name, new org.apache.spark.sql.types.StructType(),
                  props, isTable = optStr(node, "sourceType").contains("table")),
                isTable = optStr(node, "sourceType").contains("table"),
                timestampCol = optStr(node, "timestamp"),
                watermark = optStr(node, "watermark"))
          }
          if (streaming && !sd.isTable) {
            val base = sd.source.stream(spark)
            (sd.timestampCol, sd.watermark) match {
              case (Some(ts), Some(wm)) => base.withWatermark(ts, wm)
              case _ => base
            }
          } else sd.source.batch(spark)
        case "operator" if str(node, "op") == "switch" =>
          throw new IllegalArgumentException(
            s"switch $name resolves per output edge; route consumers through its edges")
        case "operator" =>
          lazy val in = resolveInput(ins.headOption.getOrElse(
            throw new IllegalArgumentException(s"operator $name has no input")), name)
          str(node, "op") match {
            case "filter" => in.where(expr(str(node, "expr")))
            case "project" => in.selectExpr(strSeq(node, "exprs"): _*)
            // reference "pick" (graph_rule.md): select fields to present
            case "pick" =>
              val fields = strSeq(node, "fields") ++ strSeq(node, "exprs")
              require(fields.nonEmpty, s"pick $name needs a fields array")
              in.selectExpr(fields: _*)
            // reference "function": one function-call expression added as
            // a new field named after the function (or its AS alias)
            case "function" =>
              val e = optStr(node, "expr").getOrElse(
                throw new IllegalArgumentException(s"function $name needs an expr"))
              val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
                .parseExpression(e)
              val alias = parsed match {
                case a: org.apache.spark.sql.catalyst.expressions.Alias => a.name
                case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
                  f.nameParts.last
                case _ => throw new IllegalArgumentException(
                  s"function $name: expr must be a function call or carry an AS name, got '$e'")
              }
              in.withColumn(alias, expr(e))
            // reference "groupby": dimension marker consumed by the
            // downstream aggfunc (validated + pass-through, like window)
            case "groupby" =>
              groupingFor(name) // eager validation of dimensions
              in
            // reference "aggfunc": aggregate expression(s) over the
            // grouping inherited from the input chain (groupby and/or
            // window), or the whole input when ungrouped
            case "aggfunc" =>
              val aggs = (optStr(node, "expr").toSeq ++ strSeq(node, "exprs")).map(expr)
              require(aggs.nonEmpty, s"aggfunc $name needs an expr")
              val keys = ins.headOption.map(groupingFor).getOrElse(Seq.empty)
              if (keys.isEmpty) in.agg(aggs.head, aggs.tail: _*)
              else in.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
            case "expr" =>
              // script-node alternative (reference internal/topo/graph/
              // io.go:165 "script" runs JS that mutates the message):
              // each `name AS ...` expression adds or overwrites that
              // column, sequentially, keeping everything else — the
              // message-mutation shape — but as Catalyst expressions
              // that stay inside whole-stage codegen instead of an
              // interpreted per-row script engine. CollapseProject
              // fuses the fold into one projection.
              val es = strSeq(node, "exprs")
              require(es.nonEmpty, s"expr $name needs a non-empty exprs array")
              es.foldLeft(in) { (df, e) =>
                val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
                  .parseExpression(e)
                val alias = parsed match {
                  case a: org.apache.spark.sql.catalyst.expressions.Alias => a.name
                  case _ => throw new IllegalArgumentException(
                    s"expr $name: every expression needs an AS name, got '$e'")
                }
                df.withColumn(alias, expr(e))
              }
            case "aggregate" =>
              val aggs = strSeq(node, "aggs").map(expr)
              val keys = strSeq(node, "groupBy").map(expr)
              // a dedicated upstream window node wins over the inline
              // windowTs shorthand; both surface the struct as `w`
              val winKeys = ins.headOption.filter(isWindow) match {
                case Some(winNode) => windowColOf(winNode).as("w") +: keys
                case None => optStr(node, "windowTs") match {
                  case Some(ts) => window(col(ts),
                    optStr(node, "windowSize").getOrElse("60 seconds")).as("w") +: keys
                  case None => keys
                }
              }
              in.groupBy(winKeys: _*).agg(aggs.head, aggs.tail: _*)
            case "having" => in.where(expr(str(node, "expr")))
            case "orderby" => in.orderBy(strSeq(node, "exprs").map(expr): _*)
            case "limit" => in.limit(str(node, "n").toInt)
            case "dedup" => in.dropDuplicates(strSeq(node, "keys"))
            case "window" =>
              windowColOf(name) // validate props eagerly, even pre-aggregate
              in // pass-through: the consuming aggregate applies the grouping
            case "watermark" =>
              // reference Watermark props: emitters + sendWatermark
              // (internal/topo/graph/node.go:30); delay is the Spark
              // lateness bound. Batch mode has no event-time clock, so
              // the node is a pass-through there, like the reference's
              // stream-only watermark op.
              val emitters = strSeq(node, "emitters")
              emitters.foreach { e =>
                require(nodes.get(e).exists(v => (v \ "type") == JString("source")),
                  s"watermark $name: emitter $e does not exist as a source node")
              }
              if (streaming) {
                val ts = tsOf(name).getOrElse(throw new IllegalArgumentException(
                  s"watermark $name needs a 'ts' prop or an upstream stream with a declared timestamp"))
                in.withWatermark(ts, optStr(node, "delay").getOrElse("0 seconds"))
              } else in
            case "join" =>
              require(ins.size == 2, s"join $name needs exactly 2 inputs, got $ins")
              resolveInput(ins(0), name).alias("l")
                .join(resolveInput(ins(1), name).alias("r"),
                  expr(str(node, "on")), optStr(node, "how").getOrElse("inner"))
            case other => throw new IllegalArgumentException(s"unknown op $other")
          }
        case "sink" => resolveInput(ins.headOption.getOrElse(
          throw new IllegalArgumentException(s"sink $name has no input")), name)
        case other => throw new IllegalArgumentException(s"unknown node type $other")
      }
    })

    val opts: JValue => Map[String, String] = v => (v \ "options") match {
      case JObject(fs) => fs.collect { case JField(k, JString(s)) => k -> s }.toMap
      case _ => Map.empty
    }
    val compiled = nodes.collect { case (name, node) if (node \ "type") == JString("sink") =>
      // every sink kind routes through the shared factory, so graph
      // sink nodes reach sql/influx/image exactly like REST actions
      val sink: Sink = SinkFactory.forKind(str(node, "kind"),
        stringProps(node) ++ opts(node))
      Compiled(name, dfOf(name), sink)
    }.toSeq
    if (compiled.isEmpty)
      throw new IllegalArgumentException("graph rule needs at least one sink node")
    compiled
  }
}
