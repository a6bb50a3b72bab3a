package graft.rules

/** eKuiper SQL dialect → Spark SQL translation, so a rule written for
  * the reference runs unchanged (docs/en_US/sqls/windows.md syntax):
  *
  *   SELECT device, count(*) FROM demo
  *   WHERE temp > 20 GROUP BY device, TUMBLINGWINDOW(ss, 10)
  *
  * becomes
  *
  *   ... GROUP BY device, window(ts, '10 seconds')
  *
  * Windows: TUMBLINGWINDOW(unit, size), HOPPINGWINDOW(unit, size,
  * hop), SESSIONWINDOW(unit, size, timeout) → session gap,
  * SLIDINGWINDOW/COUNTWINDOW have no GROUP-BY equivalent in Spark SQL
  * (they are per-event / arrival-order operators) → rejected with a
  * pointer to the operator API (WindowQueries q_win_slide /
  * CountWindowStream).
  *
  * window_start() / window_end() project the grouped window struct.
  * Time units (pkg/ast/window.go): dd hh mi ss ms.
  */
object EkuiperSql {

  private val units = Map(
    "dd" -> "days", "hh" -> "hours", "mi" -> "minutes",
    "ss" -> "seconds", "ms" -> "milliseconds")

  private def dur(unit: String, n: String): String = {
    val u = units.getOrElse(unit.toLowerCase.trim,
      throw new IllegalArgumentException(s"unknown window time unit '$unit'"))
    s"'${n.trim} $u'"
  }

  /** Apply `f` to every span of `sql` OUTSIDE single-quoted string
    * literals (with `''` escapes) and backquoted identifiers, which are
    * copied through verbatim. Keeps the translator's regex rewrites
    * from corrupting literals like 'a->b'.
    */
  private[rules] def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '`') {
        out.append(f(seg.toString)); seg.clear()
        val start = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (sql.charAt(i) == c) {
            if (c == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') i += 2 // '' escape
            else { i += 1; closed = true }
          } else i += 1
        }
        out.append(sql.substring(start, i))
      } else { seg.append(c); i += 1 }
    }
    out.append(f(seg.toString))
    out.toString
  }

  /** `sql` with literal/backquoted spans blanked — what dialect
    * detection and rewrites should look at.
    */
  private def withoutLiterals(sql: String): String = {
    // each masked literal becomes ONE space, not nothing — deleting the
    // span would merge the tokens around it (TUMBLING'x'WINDOW( →
    // TUMBLINGWINDOW() and false-trigger detection/rejection regexes.
    val b = new StringBuilder
    var first = true
    mapOutsideLiterals(sql) { seg =>
      if (!first) b.append(' ')
      first = false
      b.append(seg); seg
    }
    b.toString
  }

  /** True if the SQL uses any eKuiper-only syntax this translator
    * handles (used by RuleEngine to auto-detect the dialect). String
    * literals are excluded, so `WHERE note = 'a->b'` alone does not
    * trigger translation.
    */
  def isEkuiperDialect(sql: String): Boolean = {
    val code = withoutLiterals(sql)
    """(?i)\b(TUMBLING|HOPPING|SESSION|SLIDING|COUNT)WINDOW\s*\(""".r
      .findFirstIn(code).isDefined ||
      """(?i)\bwindow_(start|end|trigger)\s*\(\s*\)""".r.findFirstIn(code).isDefined ||
      """(?i)\b(meta|mqtt)\s*\(\s*[A-Za-z_]""".r.findFirstIn(code).isDefined ||
      """\w->\w""".r.findFirstIn(code).isDefined
  }

  /** Translate eKuiper rule SQL to Spark SQL; `tsCol` is the stream's
    * event-time column (StreamDef.timestampCol, default "ts").
    */
  def translate(sql: String, tsCol: String = "ts"): String = {
    // every rewrite and rejection check runs OUTSIDE string literals —
    // a quoted 'TUMBLINGWINDOW(ss,5)' or 'a->b' is data, not syntax.
    // (The durations the window rewrites insert are themselves quoted,
    // so later passes skip them too.)
    var out = sql

    out = mapOutsideLiterals(out) { seg =>
      var s = seg
      s = """(?i)\bTUMBLINGWINDOW\s*\(\s*(\w+)\s*,\s*(\d+)\s*\)""".r
        .replaceAllIn(s, m => s"window($tsCol, ${dur(m.group(1), m.group(2))})")
      s = """(?i)\bHOPPINGWINDOW\s*\(\s*(\w+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)""".r
        .replaceAllIn(s, m =>
          s"window($tsCol, ${dur(m.group(1), m.group(2))}, ${dur(m.group(1), m.group(3))})")
      // SESSIONWINDOW(unit, size, timeout): Spark sessionizes on the gap
      // (= timeout); the reference's max-duration cap has no SQL
      // equivalent and is intentionally dropped (documented divergence).
      s = """(?i)\bSESSIONWINDOW\s*\(\s*(\w+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)""".r
        .replaceAllIn(s, m => s"session_window($tsCol, ${dur(m.group(1), m.group(3))})")
      s
    }

    val code = withoutLiterals(out)
    for (bad <- Seq("SLIDINGWINDOW", "COUNTWINDOW"))
      if (s"(?i)\\b$bad\\s*\\(".r.findFirstIn(code).isDefined)
        throw new IllegalArgumentException(
          s"$bad has no GROUP BY equivalent in Spark SQL - use the operator API " +
            "(sliding: WindowQueries range frame; count: graft.streaming.CountWindowStream)")

    out = mapOutsideLiterals(out) { seg =>
      // window_trigger(): the window's trigger time (collection.go:608
      // returns windowTrigger for both event_time-in-window and
      // window_trigger) — for event-time windows the trigger is the
      // window close, i.e. window.end
      """(?i)\bwindow_(end|trigger)\s*\(\s*\)""".r.replaceAllIn(
        """(?i)\bwindow_start\s*\(\s*\)""".r.replaceAllIn(seg, "window.start"),
        "window.end")
    }

    // meta(topic) — eKuiper parses the bare identifier as the metadata
    // KEY, not a column (funcs_misc.go meta()); quote it so Spark's
    // analyzer never tries to resolve it as an attribute. mqtt(key) is
    // the mqtt-specific accessor for the same metadata, restricted to
    // topic/messageid (funcs_misc.go:450).
    out = mapOutsideLiterals(out) { seg =>
      var s = """(?i)\bmeta\s*\(\s*([A-Za-z_]\w*)\s*\)""".r
        .replaceAllIn(seg, m => s"meta('${m.group(1)}')")
      s = """(?i)\bmqtt\s*\(\s*([A-Za-z_]\w*)\s*\)""".r.replaceAllIn(s, m => {
        val key = m.group(1).toLowerCase
        if (key != "topic" && key != "messageid")
          throw new IllegalArgumentException(
            "Parameter of mqtt function can be only topic or messageid.")
        s"meta('$key')"
      })
      s
    }

    // arrow access (json_expr.md): a->b->c → a['b']['c'] — works for
    // struct and map columns. Only the space-free form is eKuiper's;
    // a spaced " -> " is a Spark lambda and is left alone. Rewrites run
    // outside string literals only, so 'a->b' survives untouched.
    val q = java.util.regex.Matcher.quoteReplacement _
    out = mapOutsideLiterals(out) { seg =>
      var s = """(\w)->(\w+)""".r.replaceAllIn(seg, m => q(s"${m.group(1)}['${m.group(2)}']"))
      // repeat for chains (each pass rewrites one arrow hop)
      while ("""]->\w""".r.findFirstIn(s).isDefined)
        s = """]->(\w+)""".r.replaceAllIn(s, m => q(s"]['${m.group(1)}']"))
      s
    }
    out
  }
}
