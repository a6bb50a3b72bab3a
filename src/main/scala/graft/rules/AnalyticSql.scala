package graft.rules

/** The reference's stateful analytic scalar functions — `lag`,
  * `latest`, `changed_col`, `had_changed`, `acc_sum/min/max/avg/count`
  * — made callable from rule SQL by rewriting each call into a Spark
  * window expression over the stream's event-time order.
  *
  * Reference semantics (internal/binder/function/funcs_analytic.go,
  * funcs_acc.go): every analytic call carries implicit trailing args —
  * a `validData` bool (the `OVER (... WHEN cond)` gate, default true)
  * and a partition key from `OVER (PARTITION BY ...)` — and its state
  * updates in arrival order only on valid rows. The reference's
  * planner pre-projects each call as a `$$aN` column before the WHERE
  * (AnalyticPrefix, internal/binder/function/function.go:88), which is
  * exactly the shape this rewriter emits: a derived table computing
  * each distinct call as `__aN`, with every call site replaced by its
  * alias — so analytic calls work in SELECT, WHERE, HAVING and GROUP
  * BY alike, and Spark's no-window-functions-in-WHERE restriction
  * never applies.
  *
  * Arrival order is the stream's event-time column (`tsCol`), the same
  * convention as the typed operators in queries/AnalyticQueries.scala.
  * State-per-partition maps to `PARTITION BY` in the window spec — at
  * scale each key's history stays on one executor, no global sort.
  *
  * The `WHEN cond` gate becomes a CASE gate on the aggregated value;
  * "last valid update" state reads use a named_struct wrapper so a
  * genuinely-null stored value is distinguishable from "no update yet"
  * (funcs_analytic.go keeps the raw value in rule state; SQL needs the
  * wrapper to tell nil-state from nil-value).
  */
object AnalyticSql {

  private val accNames = Set("acc_sum", "acc_min", "acc_max", "acc_avg", "acc_count")
  private val names: Set[String] =
    Set("lag", "latest", "changed_col", "had_changed") ++ accNames

  private val nameAlt = names.toSeq.sorted.mkString("|")
  private val quickProbe = s"(?i)\\b($nameAlt)\\s*\\(".r

  /** One parsed analytic call occupying sql[start, end). */
  private final case class Call(start: Int, end: Int, name: String,
                                args: Seq[String], partition: Seq[String],
                                when: Option[String])

  /** True if the SQL (outside string literals) calls any analytic
    * function — i.e. `rewrite` would change it.
    */
  def hasAnalytic(sql: String): Boolean =
    findCalls(sql).nonEmpty

  /** Positions inside single-quoted literals / backquoted identifiers. */
  private def literalMask(sql: String): Array[Boolean] = {
    val mask = new Array[Boolean](sql.length)
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '`') {
        mask(i) = true; i += 1
        var closed = false
        while (i < sql.length && !closed) {
          mask(i) = true
          if (sql.charAt(i) == c) {
            if (c == '\'' && i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
              mask(i + 1) = true; i += 2
            } else { i += 1; closed = true }
          } else i += 1
        }
      } else i += 1
    }
    mask
  }

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '$'

  /** Index just past the ')' matching the '(' at `open`. */
  private def matchParen(sql: String, mask: Array[Boolean], open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      if (!mask(i)) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) return i + 1
          case _ =>
        }
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parentheses in: $sql")
  }

  /** Split `s` (a paren-free-at-top-level span of sql) on top-level commas. */
  private def splitTop(s: String): Seq[String] = {
    val mask = literalMask(s)
    val out = Seq.newBuilder[String]
    var depth = 0
    var last = 0
    var i = 0
    while (i < s.length) {
      if (!mask(i)) {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 =>
            out += s.substring(last, i).trim; last = i + 1
          case _ =>
        }
      }
      i += 1
    }
    val tail = s.substring(last).trim
    if (tail.nonEmpty || last > 0) out += tail
    out.result().filter(_.nonEmpty)
  }

  /** Find a keyword at top level (depth 0, outside literals) of `s`;
    * returns its index or -1.
    */
  private def findTopKeyword(s: String, word: String): Int = {
    val mask = literalMask(s)
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val w = word.toLowerCase(java.util.Locale.ROOT)
    var depth = 0
    var i = 0
    while (i < s.length) {
      if (!mask(i)) {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
            if (depth == 0 && lower.startsWith(w, i) &&
              (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
              (i + w.length >= s.length || !isIdentChar(s.charAt(i + w.length))))
              return i
        }
      }
      i += 1
    }
    -1
  }

  private def findCalls(sql: String): Seq[Call] = {
    val mask = literalMask(sql)
    val calls = Seq.newBuilder[Call]
    quickProbe.findAllMatchIn(sql).foreach { m =>
      val s = m.start
      val ok = !mask(s) && (s == 0 || !isIdentChar(sql.charAt(s - 1)))
      if (ok) {
        val name = m.group(1).toLowerCase(java.util.Locale.ROOT)
        val open = sql.indexOf('(', s + name.length)
        val close = matchParen(sql, mask, open)
        val args = splitTop(sql.substring(open + 1, close - 1))
        // optional OVER ( PARTITION BY ... [WHEN ...] ) — the
        // reference's analytic grammar (xsql/parser.go parseOver).
        // An OVER with a top-level ORDER BY is Spark window syntax
        // (only possible for lag) and is left untouched.
        var end = close
        var partition: Seq[String] = Nil
        var when: Option[String] = None
        var sparkForm = false
        val overM = """(?is)\A\s*OVER\s*\(""".r.findFirstMatchIn(sql.substring(close))
        overM.foreach { om =>
          val overOpen = close + om.end - 1
          val overClose = matchParen(sql, mask, overOpen)
          val inner = sql.substring(overOpen + 1, overClose - 1)
          if (findTopKeyword(inner, "order") >= 0) sparkForm = true
          else {
            val whenAt = findTopKeyword(inner, "when")
            val partSpan = if (whenAt >= 0) inner.substring(0, whenAt) else inner
            if (whenAt >= 0)
              when = Some(inner.substring(whenAt + 4).trim)
            val pm = """(?is)\A\s*PARTITION\s+BY\b""".r.findFirstMatchIn(partSpan)
            pm match {
              case Some(p) => partition = splitTop(partSpan.substring(p.end))
              case None =>
                if (partSpan.trim.nonEmpty)
                  throw new IllegalArgumentException(
                    s"expected PARTITION BY or WHEN in OVER clause of $name: ($inner)")
            }
            end = overClose
          }
        }
        if (!sparkForm) calls += Call(s, end, name, args, partition, when)
      }
    }
    calls.result().sortBy(_.start)
  }

  private def boolLiteral(s: String, fn: String, pos: String): Boolean =
    s.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "true" => true
      case "false" => false
      case other => throw new IllegalArgumentException(
        s"$fn: $pos argument must be a true/false literal, got '$other'")
    }

  /** Window-spec text: running frame over arrival order. */
  private def overRunning(p: Seq[String], tsCol: String): String = {
    val part = if (p.isEmpty) "" else s"PARTITION BY ${p.mkString(", ")} "
    s"OVER (${part}ORDER BY $tsCol ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
  }

  private def overOffset(p: Seq[String], tsCol: String): String = {
    val part = if (p.isEmpty) "" else s"PARTITION BY ${p.mkString(", ")} "
    s"OVER (${part}ORDER BY $tsCol)"
  }

  /** Value gated by the WHEN condition: rows where the gate is false
    * contribute NULL (= no state update once paired with an
    * ignore-nulls read).
    */
  private def gated(when: Option[String], e: String): String =
    when match {
      case Some(c) => s"CASE WHEN ($c) THEN ($e) END"
      case None => s"($e)"
    }

  /** "Last valid update strictly before this row", null-value-safe:
    * valid updates are wrapped in a struct so a stored NULL value
    * differs from no-update-yet. Read result with `.v`.
    */
  private def prevState(value: String, valid: String, p: Seq[String], tsCol: String): String = {
    val part = if (p.isEmpty) "" else s"PARTITION BY ${p.mkString(", ")} "
    s"last(CASE WHEN ($valid) THEN named_struct('v', ($value)) END, true) " +
      s"OVER (${part}ORDER BY $tsCol ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
  }

  /** The Spark SQL expression for one analytic call. */
  private def expression(c: Call, tsCol: String): String = c.name match {
    case "latest" =>
      // latest(x[, default]): most recent non-null valid value incl.
      // the current row; default when none yet (funcs_analytic.go:208)
      if (c.args.isEmpty || c.args.length > 2)
        throw new IllegalArgumentException("latest expects 1 or 2 args")
      val base = s"last(${gated(c.when, c.args.head)}, true) ${overRunning(c.partition, tsCol)}"
      if (c.args.length == 2) s"coalesce($base, (${c.args(1)}))" else base

    case n if accNames(n) =>
      // acc_*(x): running aggregate of valid values, 0 when no state
      // yet (funcs_acc.go; 3-arg onBegin/onReset form is the typed
      // streaming operator's job — rejected here)
      if (c.args.length != 1)
        throw new IllegalArgumentException(
          s"$n: only the 1-arg form is supported in SQL rules (the " +
            "3-arg begin/reset form needs cross-event state — use " +
            "graft.streaming.AnalyticStream)")
      val v = gated(c.when, c.args.head)
      n match {
        case "acc_count" => s"count($v) ${overRunning(c.partition, tsCol)}"
        case _ =>
          val fn = n.stripPrefix("acc_")
          s"coalesce($fn(CAST($v AS DOUBLE)) ${overRunning(c.partition, tsCol)}, CAST(0 AS DOUBLE))"
      }

    case "lag" =>
      // lag(x[, size[, default[, ignoreNull]]]) — size-th most recent
      // valid update before this row; ignoreNull defaults TRUE
      // (funcs_analytic.go:124: only non-null values enter the ring)
      if (c.args.isEmpty || c.args.length > 4)
        throw new IllegalArgumentException("lag expects 1 to 4 args")
      val size = if (c.args.length >= 2) c.args(1).trim else "1"
      val dft = if (c.args.length >= 3) c.args(2) else "NULL"
      val ignoreNull = c.args.length < 4 || boolLiteral(c.args(3), "lag", "fourth")
      if (ignoreNull)
        s"lag(${gated(c.when, c.args.head)}, $size, ($dft)) IGNORE NULLS ${overOffset(c.partition, tsCol)}"
      else c.when match {
        case None =>
          s"lag((${c.args.head}), $size, ($dft)) ${overOffset(c.partition, tsCol)}"
        case Some(_) if size == "1" =>
          // respect-nulls + WHEN: ring holds every valid value incl.
          // nulls — the struct wrapper keeps gated-out rows (no
          // update) distinct from valid null values
          val prev = prevState(c.args.head, c.when.get, c.partition, tsCol)
          s"coalesce(($prev).v, CASE WHEN ($prev) IS NULL THEN ($dft) END)"
        case Some(_) =>
          throw new IllegalArgumentException(
            "lag: WHEN with ignoreNull=false and size>1 is not " +
              "expressible as a window rewrite - use graft.streaming.AnalyticStream")
      }

    case "changed_col" =>
      // changed_col(ignoreNull, x): x when it differs from the last
      // valid update, else NULL (funcs_analytic.go:31)
      if (c.args.length != 2)
        throw new IllegalArgumentException("changed_col expects 2 args")
      val ignoreNull = boolLiteral(c.args.head, "changed_col", "first")
      val x = c.args(1)
      val whenC = c.when.getOrElse("TRUE")
      val valid = if (ignoreNull) s"($whenC) AND ($x) IS NOT NULL" else whenC
      val prev = prevState(x, valid, c.partition, tsCol)
      s"CASE WHEN ($valid) AND (($x) IS DISTINCT FROM ($prev).v) THEN ($x) END"

    case "had_changed" =>
      // had_changed(ignoreNull, x1, ..., xn): true when any column
      // differs from its last valid update (funcs_analytic.go:73);
      // null columns are skipped when ignoreNull
      if (c.args.length < 3)
        throw new IllegalArgumentException("had_changed expects 3+ args (ignoreNull, col, col, ...)")
      val ignoreNull = boolLiteral(c.args.head, "had_changed", "first")
      val whenC = c.when.getOrElse("TRUE")
      val perCol = c.args.tail.map { x =>
        val valid = if (ignoreNull) s"($whenC) AND ($x) IS NOT NULL" else whenC
        val prev = prevState(x, valid, c.partition, tsCol)
        if (ignoreNull)
          s"(($x) IS NOT NULL AND (($x) IS DISTINCT FROM ($prev).v))"
        else
          s"(($x) IS DISTINCT FROM ($prev).v)"
      }
      s"CASE WHEN ($whenC) THEN (${perCol.mkString(" OR ")}) END"

    case other =>
      throw new IllegalStateException(s"unexpected analytic function $other")
  }

  /** The FROM clause's single source: (sourceText, visibleName).
    * Joined/multi-source FROMs are rejected — the reference computes
    * analytic funcs per-source pre-join; express those rules with the
    * typed operators instead.
    */
  private def parseFrom(sql: String): (Int, Int, String, String) = {
    val fromAt = findTopKeyword(sql, "from")
    if (fromAt < 0)
      throw new IllegalArgumentException("analytic functions need a FROM clause")
    val afterFrom = fromAt + 4
    val stops = Seq("where", "group", "having", "order", "limit", "union", "intersect", "except")
    val rest = sql.substring(afterFrom)
    val stopAt = stops.map(findTopKeyword(rest, _)).filter(_ >= 0) match {
      case Nil => rest.length
      case xs => xs.min
    }
    val srcText = rest.substring(0, stopAt).trim
    val srcEnd = afterFrom + stopAt
    if (findTopKeyword(srcText, "join") >= 0 || splitTop(srcText).length > 1 || srcText.startsWith("("))
      throw new IllegalArgumentException(
        "analytic functions over joins/subqueries are not supported in SQL rules - " +
          "use the typed operators (graft.queries.AnalyticQueries / graft.streaming.AnalyticStream)")
    val parts = srcText.split("\\s+")
    val visible = parts.last // alias when present, else the source name
    (afterFrom, srcEnd, srcText, visible)
  }

  /** Rewrite every analytic call in `sql` into a pre-projected window
    * expression over `tsCol` arrival order; no-op when none appear.
    */
  def rewrite(sql: String, tsCol: String): String = {
    val calls = findCalls(sql)
    if (calls.isEmpty) return sql
    // nested analytic calls are not supported — detect via args
    calls.foreach { c =>
      if (c.args.exists(a => quickProbe.findFirstIn(a).isDefined))
        throw new IllegalArgumentException(
          s"nested analytic calls are not supported: ${c.name}(${c.args.mkString(", ")})")
    }
    val (_, srcEnd, srcText, visible) = parseFrom(sql)
    // one alias per distinct call text
    val aliasOf = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val exprOf = scala.collection.mutable.LinkedHashMap.empty[String, String]
    calls.foreach { c =>
      val key = sql.substring(c.start, c.end).replaceAll("\\s+", " ")
      if (!aliasOf.contains(key)) {
        val a = s"__a${aliasOf.size}"
        aliasOf(key) = a
        exprOf(a) = expression(c, tsCol)
      }
    }
    // replace call sites back-to-front so earlier offsets stay valid
    var out = sql
    calls.sortBy(-_.start).foreach { c =>
      val key = out.substring(c.start, c.end).replaceAll("\\s+", " ")
      out = out.substring(0, c.start) + aliasOf(key) + out.substring(c.end)
    }
    // wrap the source in the pre-projection derived table, keeping the
    // original name visible so qualified references still resolve
    val derived = exprOf.map { case (a, e) => s"$e AS $a" }.mkString(", ")
    val fromAt2 = findTopKeyword(out, "from")
    val srcSpanLen = srcEnd - (findTopKeyword(sql, "from") + 4)
    val afterFrom2 = fromAt2 + 4
    out.substring(0, afterFrom2) +
      s" (SELECT *, $derived FROM $srcText) $visible " +
      out.substring(afterFrom2 + srcSpanLen)
  }
}
