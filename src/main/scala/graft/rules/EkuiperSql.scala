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

  /** True if the SQL uses any eKuiper-only syntax this translator
    * handles (used by RuleEngine to auto-detect the dialect).
    */
  def isEkuiperDialect(sql: String): Boolean =
    """(?i)\b(TUMBLING|HOPPING|SESSION|SLIDING|COUNT)WINDOW\s*\(""".r
      .findFirstIn(sql).isDefined ||
      """(?i)\bwindow_(start|end)\s*\(\s*\)""".r.findFirstIn(sql).isDefined ||
      """\w->\w""".r.findFirstIn(sql).isDefined

  /** Translate eKuiper rule SQL to Spark SQL; `tsCol` is the stream's
    * event-time column (StreamDef.timestampCol, default "ts").
    */
  def translate(sql: String, tsCol: String = "ts"): String = {
    var out = sql

    out = """(?i)\bTUMBLINGWINDOW\s*\(\s*(\w+)\s*,\s*(\d+)\s*\)""".r
      .replaceAllIn(out, m => s"window($tsCol, ${dur(m.group(1), m.group(2))})")

    out = """(?i)\bHOPPINGWINDOW\s*\(\s*(\w+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)""".r
      .replaceAllIn(out, m =>
        s"window($tsCol, ${dur(m.group(1), m.group(2))}, ${dur(m.group(1), m.group(3))})")

    // SESSIONWINDOW(unit, size, timeout): Spark sessionizes on the gap
    // (= timeout); the reference's max-duration cap has no SQL
    // equivalent and is intentionally dropped (documented divergence).
    out = """(?i)\bSESSIONWINDOW\s*\(\s*(\w+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)""".r
      .replaceAllIn(out, m => s"session_window($tsCol, ${dur(m.group(1), m.group(3))})")

    for (bad <- Seq("SLIDINGWINDOW", "COUNTWINDOW"))
      if (s"(?i)\\b$bad\\s*\\(".r.findFirstIn(out).isDefined)
        throw new IllegalArgumentException(
          s"$bad has no GROUP BY equivalent in Spark SQL - use the operator API " +
            "(sliding: WindowQueries range frame; count: graft.streaming.CountWindowStream)")

    out = """(?i)\bwindow_start\s*\(\s*\)""".r.replaceAllIn(out, "window.start")
    out = """(?i)\bwindow_end\s*\(\s*\)""".r.replaceAllIn(out, "window.end")

    // arrow access (json_expr.md): a->b->c → a['b']['c'] — works for
    // struct and map columns. Only the space-free form is eKuiper's;
    // a spaced " -> " is a Spark lambda and is left alone.
    val q = java.util.regex.Matcher.quoteReplacement _
    out = """(\w)->(\w+)""".r.replaceAllIn(out, m => q(s"${m.group(1)}['${m.group(2)}']"))
    // repeat for chains (each pass rewrites one arrow hop)
    while ("""]->\w""".r.findFirstIn(out).isDefined)
      out = """]->(\w+)""".r.replaceAllIn(out, m => q(s"]['${m.group(1)}']"))
    out
  }
}
