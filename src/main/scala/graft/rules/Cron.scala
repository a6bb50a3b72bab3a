package graft.rules

import java.time.{Instant, ZoneId, ZonedDateTime}

/** Standard 5-field cron expressions (minute hour day-of-month month
  * day-of-week) for periodic rules — the reference's cron rule options
  * (internal/topo/rule: options "cron" + "duration", optionally gated
  * by cronDatetimeRange windows). Supports `*`, lists `a,b`, ranges
  * `a-b`, and step suffixes (slash-n on a star or range); day-of-week
  * 0-7 with 7 = Sunday. Day semantics follow robfig/cron (the
  * reference's parser): when both day fields are explicitly restricted
  * a day matches if either matches (standard cron OR); when either is
  * star-prefixed (a bare star or a slash-step star) a day must match both.
  */
object Cron {

  final case class Spec(minutes: Set[Int], hours: Set[Int], dom: Set[Int],
                        months: Set[Int], dow: Set[Int],
                        domStar: Boolean, dowStar: Boolean)

  def parse(expr: String): Spec = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5,
      s"cron expression needs 5 fields (minute hour dom month dow), got '$expr'")
    def field(s: String, lo: Int, hi: Int, names: Map[String, Int] = Map.empty): Set[Int] =
      s.split(",").flatMap { part =>
        val (rangePart, step) = part.split("/") match {
          case Array(r) => (r, 1)
          case Array(r, st) => (r, st.toInt)
          case _ => throw new IllegalArgumentException(s"bad cron field '$part'")
        }
        require(step >= 1, s"cron step must be >= 1 in '$part'")
        def resolve(tok: String): Int =
          names.getOrElse(tok.toLowerCase, tok.toInt)
        val (from, to) = rangePart match {
          case "*" => (lo, hi)
          case r if r.contains("-") =>
            val Array(a, b) = r.split("-"); (resolve(a), resolve(b))
          case single => val v = resolve(single); (v, v)
        }
        require(from >= lo && to <= hi && from <= to,
          s"cron field '$part' out of range [$lo,$hi]")
        (from to to by step)
      }.toSet
    val monthNames = Seq("jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec").zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
    val dowNames = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")
      .zipWithIndex.toMap
    Spec(
      minutes = field(fields(0), 0, 59),
      hours = field(fields(1), 0, 23),
      dom = field(fields(2), 1, 31),
      months = field(fields(3), 1, 12, monthNames),
      dow = field(fields(4), 0, 7, dowNames).map(d => if (d == 7) 0 else d),
      // robfig/cron (the reference's parser) treats any field that
      // *starts* with `*` (e.g. `*/2`) as a star for day-matching
      // purposes, so `0 0 */2 * mon` gets dow-only semantics there.
      domStar = fields(2).startsWith("*"),
      dowStar = fields(4).startsWith("*"))
  }

  /** robfig-style day matching: if either day field is star-prefixed,
    * a day must satisfy BOTH sets (a plain `*` resolves to the full
    * set, so this degrades to the usual single-field check); only when
    * both fields are explicitly restricted does standard cron OR apply.
    */
  private def dayMatches(spec: Spec, t: ZonedDateTime): Boolean = {
    val domOk = spec.dom(t.getDayOfMonth)
    val dowOk = spec.dow(t.getDayOfWeek.getValue % 7)
    if (spec.domStar || spec.dowStar) domOk && dowOk else domOk || dowOk
  }


  /** First fire time (minute-aligned epoch ms) at or after `fromMs`,
    * or None within a 4-year search horizon (e.g. Feb 30 never fires).
    * Minute-stepping with day-level skipping keeps the worst case
    * (a far-off month/day) cheap.
    */
  def nextFire(spec: Spec, fromMs: Long, zone: ZoneId = ZoneId.systemDefault()): Option[Long] = {
    var t = Instant.ofEpochMilli(fromMs).atZone(zone)
      .withSecond(0).withNano(0)
    if (t.toInstant.toEpochMilli < fromMs) t = t.plusMinutes(1)
    val horizon = t.plusYears(4)
    while (t.isBefore(horizon)) {
      // fast-skip whole days when the date can't match
      val dayOk = spec.months(t.getMonthValue) && dayMatches(spec, t)
      if (!dayOk) t = t.plusDays(1).withHour(0).withMinute(0)
      else if (!spec.hours(t.getHour)) t = t.plusHours(1).withMinute(0)
      else if (!spec.minutes(t.getMinute)) t = t.plusMinutes(1)
      else return Some(t.toInstant.toEpochMilli)
    }
    None
  }

  /** Go-style duration strings the reference's rule options use:
    * "90s", "10m", "1h30m", "500ms", or a bare number of seconds.
    */
  def parseDuration(s: String): Long = {
    val trimmed = s.trim
    if (trimmed.matches("\\d+")) trimmed.toLong * 1000
    else {
      val re = "(\\d+)(ms|s|m|h)".r
      val parts = re.findAllMatchIn(trimmed).toSeq
      require(parts.nonEmpty && parts.map(_.matched).mkString == trimmed,
        s"cannot parse duration '$s' (use e.g. 90s, 10m, 1h30m, 500ms)")
      parts.map { m =>
        val n = m.group(1).toLong
        m.group(2) match {
          case "ms" => n
          case "s" => n * 1000
          case "m" => n * 60000
          case "h" => n * 3600000
        }
      }.sum
    }
  }
}

/** A periodic run plan: at every cron fire the rule runs for
  * `durationMs`. Mirrors the reference's {"cron": "...", "duration":
  * "..."} rule options; when the rule also carries datetime
  * `ScheduleRange`s they gate the cron — a fire only counts if it
  * begins inside one of them (reference cronDatetimeRange).
  */
final case class CronSchedule(expr: String, durationMs: Long,
                              zone: ZoneId = ZoneId.systemDefault()) {
  require(durationMs > 0, "cron schedule needs a positive duration")
  private val spec = Cron.parse(expr) // validate eagerly at rule create

  private def gated(fireMs: Long, gates: Seq[ScheduleRange]): Boolean =
    gates.isEmpty || gates.exists(g => fireMs >= g.beginMs && fireMs < g.endMs)

  /** The window containing `nowMs`, if a (gate-valid) fire is live. */
  def windowAt(nowMs: Long, gates: Seq[ScheduleRange] = Nil): Option[ScheduleRange] = {
    var from = nowMs - durationMs + 1
    while (from <= nowMs) {
      Cron.nextFire(spec, from, zone) match {
        case Some(f) if f <= nowMs =>
          if (gated(f, gates)) return Some(ScheduleRange(f, f + durationMs))
          from = f + 1 // fire exists but outside every gate — try later fires
        case _ => return None
      }
    }
    None
  }

  /** Epoch ms of the next (gate-valid) fire strictly after `nowMs`. */
  def nextBegin(nowMs: Long, gates: Seq[ScheduleRange] = Nil): Option[Long] = {
    var from = nowMs + 1
    while (true) {
      Cron.nextFire(spec, from, zone) match {
        case Some(f) =>
          if (gated(f, gates)) return Some(f)
          // f fails every gate: gates already ended (f >= endMs) are dead
          // forever, so the next possible valid fire is at the earliest
          // gate opening after f — jump there instead of stepping
          // fire-by-fire (a `* * * * *` cron gated by a range weeks out
          // would otherwise exhaust any step budget).
          val nextGateOpen = gates.collect { case g if g.beginMs > f => g.beginMs }
          if (nextGateOpen.isEmpty) return None // no gate lies ahead
          from = nextGateOpen.min
        case None => return None
      }
    }
    None // unreachable
  }
}
