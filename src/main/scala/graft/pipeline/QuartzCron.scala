package graft.pipeline

import java.time.{DayOfWeek, Instant, LocalDate, LocalTime, ZoneId, ZonedDateTime}

/** Quartz cron-expression schedule — the analog of the reference job's
  * `schedule.quartz_cron_expression` + `timezone_id`
  * (resources/sdp_job.job.yml:17-19: `"0 0 6 * * ?"` in
  * America/Los_Angeles).
  *
  * Supported grammar (the documented Quartz core): 6 or 7
  * whitespace-separated fields `sec min hour day-of-month month
  * day-of-week [year]`, each a comma-list of `*`, `?` (dom/dow only),
  * `a`, `a-b`, `a/step`, `a-b/step`, and step-from-`*`; month names
  * JAN..DEC and
  * day names SUN..SAT; Quartz day-of-week numbering 1=SUN..7=SAT.
  * Exactly like Quartz, at most one of dom/dow may be restricted — the
  * other must be `?` (or both `*` = every day). The calendar-special
  * tokens `L`/`W`/`#` are NOT supported and fail loud at parse time —
  * a schedule silently firing on the wrong day would be worse than a
  * config error.
  *
  * Fire times are computed in the schedule's zone; a time that falls in
  * a DST gap resolves forward (java.time's ZonedDateTime rule).
  */
final class QuartzCron private (
    expr: String,
    seconds: Array[Int], minutes: Array[Int], hours: Array[Int],
    dom: Option[Set[Int]],   // None = unrestricted (* or ?)
    months: Set[Int],
    dow: Option[Set[Int]],   // Quartz 1=SUN..7=SAT; None = unrestricted
    years: Option[Set[Int]]) {

  private def dayMatches(d: LocalDate): Boolean = {
    if (!months.contains(d.getMonthValue)) return false
    if (!years.forall(_.contains(d.getYear))) return false
    val quartzDow = (d.getDayOfWeek.getValue % 7) + 1 // java MON=1 → quartz SUN=1
    dom.forall(_.contains(d.getDayOfMonth)) &&
      dow.forall(_.contains(quartzDow))
  }

  /** First fire time strictly after `after`, in `zone`; None when none
    * exists within the 4-year search horizon (possible only for
    * year-restricted expressions — an unbounded cron always fires within
    * 4 years since every supported field recurs annually modulo leap
    * years). */
  def nextAfter(after: Instant, zone: ZoneId): Option[Instant] = {
    // truncate to whole seconds BEFORE stepping: candidate times carry
    // nano = 0, so an untruncated fractional `after` (Instant.now()) would
    // let a candidate in the same second slip through the >= floor check
    // while actually preceding `after`
    val start = after.atZone(zone)
      .truncatedTo(java.time.temporal.ChronoUnit.SECONDS).plusSeconds(1)
    val startDate = start.toLocalDate
    var date = startDate
    val horizon = startDate.plusYears(4)
    while (!date.isAfter(horizon)) {
      if (dayMatches(date)) {
        val floor: Option[LocalTime] =
          if (date == startDate) Some(start.toLocalTime) else None
        firstTimeAtOrAfter(floor) match {
          case Some(t) =>
            // DST fall-back overlap: ZonedDateTime.of resolves an
            // ambiguous local time to the EARLIER offset, which can land
            // at or before `after` (the schedule loop would then sleep 0
            // and re-fire back-to-back for the rest of the repeated
            // hour). Taking the later offset restores the strictly-after
            // contract; if even that is not after (overlap edge), keep
            // searching forward instead of violating it.
            val zdt = ZonedDateTime.of(date, t, zone)
            val candidate =
              if (zdt.toInstant.isAfter(after)) zdt.toInstant
              else zdt.withLaterOffsetAtOverlap().toInstant
            if (candidate.isAfter(after)) return Some(candidate)
          case None => ()
        }
      }
      date = date.plusDays(1)
    }
    None
  }

  /** Earliest (hour, minute, second) in the field sets that is >= the
    * floor (None = start of day). Sets are sorted ascending. */
  private def firstTimeAtOrAfter(floor: Option[LocalTime]): Option[LocalTime] = {
    val f = floor.getOrElse(LocalTime.MIN)
    for (h <- hours; if h >= f.getHour) {
      val minFloor = if (h == f.getHour) f.getMinute else 0
      for (m <- minutes; if m >= minFloor) {
        val secFloor =
          if (h == f.getHour && m == f.getMinute) f.getSecond else 0
        for (s <- seconds; if s >= secFloor)
          return Some(LocalTime.of(h, m, s))
      }
    }
    None
  }

  override def toString: String = s"QuartzCron($expr)"
}

object QuartzCron {

  private val MonthNames = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
  private val DayNames = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")

  def parse(expr: String): QuartzCron = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 6 || fields.length == 7,
      s"quartz cron needs 6 or 7 fields (sec min hour dom month dow " +
        s"[year]), got ${fields.length} in '$expr'")
    val Array(fSec, fMin, fHour, fDom, fMonth, fDow) = fields.take(6)
    Seq(fSec, fMin, fHour, fMonth).foreach { f =>
      require(!f.contains("?"), s"'?' is only valid in day-of-month/" +
        s"day-of-week, got '$f' in '$expr'") }
    Seq(fDom, fDow).foreach { f =>
      require(!f.exists(c => c == 'L' || c == 'W' || c == '#'),
        s"unsupported quartz token in '$f' ('L'/'W'/'#' are not " +
          s"implemented — use an explicit day list)") }
    // Quartz rule: dom and dow may not BOTH be restricted; `* *` is the
    // accepted every-day spelling
    val domRestricted = fDom != "*" && fDom != "?"
    val dowRestricted = fDow != "*" && fDow != "?"
    require(!(domRestricted && dowRestricted),
      s"day-of-month and day-of-week cannot both be restricted in " +
        s"'$expr' — set one to '?'")
    // unrestricted (`*`) time/month fields mean the full range
    def all(o: Option[Set[Int]], lo: Int, hi: Int): Set[Int] =
      o.getOrElse((lo to hi).toSet)
    new QuartzCron(expr,
      seconds = all(field(fSec, 0, 59, Nil, "second"), 0, 59).toArray.sorted,
      minutes = all(field(fMin, 0, 59, Nil, "minute"), 0, 59).toArray.sorted,
      hours = all(field(fHour, 0, 23, Nil, "hour"), 0, 23).toArray.sorted,
      dom = field(fDom, 1, 31, Nil, "day-of-month"),
      months = all(field(fMonth, 1, 12, MonthNames, "month"), 1, 12),
      dow = field(fDow, 1, 7, DayNames, "day-of-week"),
      years = if (fields.length == 7) field(fields(6), 1970, 2099, Nil, "year")
        else None)
  }

  /** One field → Some(value set), or None for unrestricted (`*`/`?`).
    * `names` maps symbolic values (JAN.., SUN..) to `lo`-based numbers. */
  private def field(f: String, lo: Int, hi: Int, names: Seq[String],
      what: String): Option[Set[Int]] = {
    if (f == "*" || f == "?") return None
    def atom(a: String): Int = {
      val i = names.indexOf(a.toUpperCase)
      if (i >= 0) lo + i
      else a.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"bad $what value '$a'"))
    }
    val out = f.split(",").toSeq.flatMap { part =>
      val (rangePart, step) = part.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, s) => (r, s.toIntOption.filter(_ > 0).getOrElse(
          throw new IllegalArgumentException(s"bad $what step '$s'")))
        case _ => throw new IllegalArgumentException(s"bad $what part '$part'")
      }
      val (a, b) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(x, y) = r.split("-", 2)
          (atom(x), atom(y))
        // bare value with a step means "from value to max" (Quartz rule)
        case r if step > 1 => (atom(r), hi)
        case r => val v = atom(r); (v, v)
      }
      require(a >= lo && b <= hi && a <= b,
        s"$what range $a-$b outside [$lo, $hi] in '$f'")
      a to b by step
    }.toSet
    Some(out)
  }
}
