package graft.operators

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

/** Rule-based NYSE full-day holiday generation for any year — the engine's
  * stand-in for `pandas_market_calendars.get_calendar('NYSE')` (reference
  * `stock_pipeline/scripts/utils/dates.py:14-16`), which the five calendar
  * functions in [[CalendarOps]] lean on. Generating from the exchange's
  * published rules (instead of a hard-coded year list) means 2023 or 2025
  * data gets correct `prev_trading_day` / backfill windows, not silent
  * "holiday counts as trading day" drift.
  *
  * Rules encoded (valid for 1998+, the modern NYSE schedule: MLK was added
  * in 1998, Juneteenth in 2022):
  *   - New Year's Day (Jan 1; Sunday → observed Monday; Saturday → NOT
  *     observed — the exchange does not move a holiday into the prior year,
  *     e.g. the market was open Fri 2021-12-31)
  *   - Martin Luther King Jr. Day (3rd Monday of January, since 1998)
  *   - Washington's Birthday (3rd Monday of February)
  *   - Good Friday (2 days before Easter Sunday, Gregorian computus)
  *   - Memorial Day (last Monday of May)
  *   - Juneteenth (June 19, since 2022; Sat → Friday, Sun → Monday)
  *   - Independence Day (July 4; Sat → Friday, Sun → Monday)
  *   - Labor Day (1st Monday of September)
  *   - Thanksgiving (4th Thursday of November)
  *   - Christmas (Dec 25; Sat → Friday, Sun → Monday)
  * plus the ad-hoc full-day closures since 1998 (September 11 2001 week,
  * presidential mourning days, Hurricane Sandy). Early closes (half days)
  * generate from the modern rules too ([[earlyCloses]]) — they still COUNT
  * as trading days for all date math (matching the reference, which only
  * consumes full-day schedules); the flag serves volume/session-end
  * analytics.
  */
object NyseCalendar {

  /** Anonymous Gregorian computus — Easter Sunday of `year`. */
  def easterSunday(year: Int): LocalDate = {
    val a = year % 19
    val b = year / 100
    val c = year % 100
    val d = b / 4
    val e = b % 4
    val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4
    val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = (h + l - 7 * m + 114) % 31 + 1
    LocalDate.of(year, month, day)
  }

  private def nthWeekday(year: Int, month: Int, dow: DayOfWeek, n: Int): LocalDate =
    LocalDate.of(year, month, 1).`with`(TemporalAdjusters.dayOfWeekInMonth(n, dow))

  private def lastWeekday(year: Int, month: Int, dow: DayOfWeek): LocalDate =
    LocalDate.of(year, month, 1).`with`(TemporalAdjusters.lastInMonth(dow))

  /** Sat → preceding Friday, Sun → following Monday (the exchange's
    * weekend-observance rule for date-fixed holidays).
    */
  private def observed(d: LocalDate): LocalDate = d.getDayOfWeek match {
    case DayOfWeek.SATURDAY => d.minusDays(1)
    case DayOfWeek.SUNDAY => d.plusDays(1)
    case _ => d
  }

  /** Ad-hoc full-day closures since 1998 (national days of mourning,
    * September 11, Hurricane Sandy) — the part of the schedule no rule
    * generates; `pandas_market_calendars` carries the same list.
    */
  val specialClosures: Seq[LocalDate] = Seq(
    "2001-09-11", "2001-09-12", "2001-09-13", "2001-09-14", // September 11
    "2004-06-11", // mourning: Reagan
    "2007-01-02", // mourning: Ford
    "2012-10-29", "2012-10-30", // Hurricane Sandy
    "2018-12-05", // mourning: G.H.W. Bush
    "2025-01-09"  // mourning: Carter
  ).map(LocalDate.parse)

  /** Rule-generated full-day holidays of `year` (sorted, unique; excludes
    * [[specialClosures]] — see [[holidaysBetween]] for the merged schedule).
    */
  def ruleHolidays(year: Int): Seq[LocalDate] = {
    val newYear = {
      val jan1 = LocalDate.of(year, 1, 1)
      jan1.getDayOfWeek match {
        case DayOfWeek.SATURDAY => None // not moved into the prior year
        case DayOfWeek.SUNDAY => Some(jan1.plusDays(1))
        case _ => Some(jan1)
      }
    }
    val juneteenth =
      if (year >= 2022) Some(observed(LocalDate.of(year, 6, 19))) else None
    (newYear.toSeq ++ Seq(
      nthWeekday(year, 1, DayOfWeek.MONDAY, 3), // MLK
      nthWeekday(year, 2, DayOfWeek.MONDAY, 3), // Washington's Birthday
      easterSunday(year).minusDays(2), // Good Friday
      lastWeekday(year, 5, DayOfWeek.MONDAY) // Memorial Day
    ) ++ juneteenth.toSeq ++ Seq(
      observed(LocalDate.of(year, 7, 4)), // Independence Day
      nthWeekday(year, 9, DayOfWeek.MONDAY, 1), // Labor Day
      nthWeekday(year, 11, DayOfWeek.THURSDAY, 4), // Thanksgiving
      observed(LocalDate.of(year, 12, 25)) // Christmas
    )).sorted
  }

  /** Full-day NYSE closures in [from, to] inclusive: rule holidays plus
    * special closures, sorted and de-duplicated.
    */
  def holidaysBetween(from: LocalDate, to: LocalDate): Seq[LocalDate] =
    ((from.getYear to to.getYear).flatMap(ruleHolidays) ++ specialClosures)
      .filter(d => !d.isBefore(from) && !d.isAfter(to))
      .distinct.sorted

  /** [[holidaysBetween]] as ISO strings — the shape [[CalendarOps]] and SQL
    * interpolation consume.
    */
  def holidayStrings(fromYear: Int, toYear: Int): Seq[String] =
    holidaysBetween(LocalDate.of(fromYear, 1, 1), LocalDate.of(toYear, 12, 31))
      .map(_.toString)

  /** 1:00 pm early-close days (half days) of `year` — the modern schedule,
    * stable since 2013: July 3 when it falls Mon–Thu (when July 4 is
    * observed Friday/Monday, the 3rd is a weekend or the full holiday
    * itself), the Friday after Thanksgiving, and December 24 when it falls
    * Mon–Thu. Never overlaps the full-day schedule by construction.
    * Pre-2013 half-day schedules varied ad hoc and are out of scope, like
    * pre-1998 holidays.
    */
  def earlyCloses(year: Int): Seq[LocalDate] = {
    val jul3 = LocalDate.of(year, 7, 3)
    val dec24 = LocalDate.of(year, 12, 24)
    (Option.when(jul3.getDayOfWeek.getValue <= 4)(jul3).toSeq ++
      Seq(nthWeekday(year, 11, DayOfWeek.THURSDAY, 4).plusDays(1)) ++
      Option.when(dec24.getDayOfWeek.getValue <= 4)(dec24).toSeq).sorted
  }

  /** Early closes in [from, to] inclusive, sorted. */
  def earlyClosesBetween(from: LocalDate, to: LocalDate): Seq[LocalDate] =
    (from.getYear to to.getYear).flatMap(earlyCloses)
      .filter(d => !d.isBefore(from) && !d.isAfter(to)).distinct.sorted

  /** [[earlyClosesBetween]] as ISO strings. */
  def earlyCloseStrings(fromYear: Int, toYear: Int): Seq[String] =
    earlyClosesBetween(LocalDate.of(fromYear, 1, 1), LocalDate.of(toYear, 12, 31))
      .map(_.toString)
}
