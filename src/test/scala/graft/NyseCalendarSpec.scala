package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CalendarOps, NyseCalendar}

/** Known-day pins for the rule-generated NYSE schedule (reference
  * `utils/dates.py` delegates these to pandas_market_calendars; the
  * expected dates below are the exchange's published schedule, so a rule
  * regression can't hide behind "both sides used the same generator").
  */
class NyseCalendarSpec extends AnyFunSuite {

  private def holidays(year: Int): Seq[String] =
    NyseCalendar.ruleHolidays(year).map(_.toString)

  test("Easter computus matches known Easter Sundays") {
    val known = Map(
      2008 -> "2008-03-23", 2011 -> "2011-04-24", 2016 -> "2016-03-27",
      2021 -> "2021-04-04", 2024 -> "2024-03-31", 2025 -> "2025-04-20",
      2038 -> "2038-04-25")
    known.foreach { case (y, d) =>
      assert(NyseCalendar.easterSunday(y).toString == d, s"year $y")
    }
  }

  test("2024 rule holidays reproduce the published NYSE schedule") {
    assert(holidays(2024) == Seq(
      "2024-01-01", "2024-01-15", "2024-02-19", "2024-03-29",
      "2024-05-27", "2024-06-19", "2024-07-04", "2024-09-02",
      "2024-11-28", "2024-12-25"))
  }

  test("2023 rule holidays (New Year on Sunday observed Monday)") {
    assert(holidays(2023) == Seq(
      "2023-01-02", "2023-01-16", "2023-02-20", "2023-04-07",
      "2023-05-29", "2023-06-19", "2023-07-04", "2023-09-04",
      "2023-11-23", "2023-12-25"))
  }

  test("2025 rule holidays; mourning closure joins via holidaysBetween") {
    assert(holidays(2025) == Seq(
      "2025-01-01", "2025-01-20", "2025-02-17", "2025-04-18",
      "2025-05-26", "2025-06-19", "2025-07-04", "2025-09-01",
      "2025-11-27", "2025-12-25"))
    val withSpecial = NyseCalendar.holidaysBetween(
      LocalDate.parse("2025-01-01"), LocalDate.parse("2025-12-31"))
    assert(withSpecial.map(_.toString).contains("2025-01-09")) // Carter
    assert(withSpecial.size == 11)
  }

  test("2021: no Juneteenth yet; July 4 Sunday -> Monday; Christmas Saturday -> Friday") {
    assert(holidays(2021) == Seq(
      "2021-01-01", "2021-01-18", "2021-02-15", "2021-04-02",
      "2021-05-31", "2021-07-05", "2021-09-06", "2021-11-25",
      "2021-12-24"))
  }

  test("2022: Saturday New Year NOT observed; Juneteenth and Christmas shift to Monday") {
    assert(holidays(2022) == Seq(
      "2022-01-17", "2022-02-21", "2022-04-15", "2022-05-30",
      "2022-06-20", "2022-07-04", "2022-09-05", "2022-11-24",
      "2022-12-26"))
  }

  test("Saturday July 4 observed the preceding Friday (2026)") {
    assert(holidays(2026).contains("2026-07-03"))
    assert(!holidays(2026).contains("2026-07-04"))
  }

  test("holidaysBetween clips to the range and merges special closures sorted") {
    val h = NyseCalendar.holidaysBetween(
      LocalDate.parse("2018-11-01"), LocalDate.parse("2019-01-31"))
    assert(h.map(_.toString) == Seq(
      "2018-11-22", "2018-12-05", "2018-12-25", "2019-01-01", "2019-01-21"))
  }

  test("early closes: modern-rule half days match known years, never overlap holidays") {
    def ec(y: Int) = NyseCalendar.earlyCloses(y).map(_.toString)
    assert(ec(2024) == Seq("2024-07-03", "2024-11-29", "2024-12-24"))
    assert(ec(2023) == Seq("2023-07-03", "2023-11-24")) // Dec 24 Sunday
    assert(ec(2022) == Seq("2022-11-25")) // Jul 3 Sunday, Dec 24 Saturday
    assert(ec(2025) == Seq("2025-07-03", "2025-11-28", "2025-12-24"))
    assert(ec(2021) == Seq("2021-11-26")) // Jul 3 Sat; Dec 24 = observed Christmas
    // half days are trading days: never in the full-day schedule
    (2013 to 2035).foreach { y =>
      assert(NyseCalendar.earlyCloses(y).intersect(NyseCalendar.ruleHolidays(y)).isEmpty, s"year $y")
    }
  }

  test("calendar dimension flags early closes as trading days") {
    val spark = TestSpark.spark
    val cal = CalendarOps.calendar(
        spark.sql("SELECT DATE'2024-11-01' AS d0, DATE'2024-12-31' AS d1"))
      .filter(col("is_early_close")).collect()
      .map(_.getAs[java.sql.Date]("cal_day").toString)
    assert(cal.toSeq.sorted == Seq("2024-11-29", "2024-12-24"))
  }

  test("backfill window: holiday anchor resolves snapshot to the previous trading day") {
    val spark = TestSpark.spark
    // 2025-07-04 is a Friday holiday → snapshot 2025-07-03; 30-day window
    val rows = CalendarOps.backfillWindow(spark, "2025-07-04", 30).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[java.sql.Date]("snapshot_date").toString == "2025-07-03"))
    val days = rows.map(_.getAs[java.sql.Date]("backfill_day").toString).sorted
    assert(days.head == "2025-06-04" && days.last == "2025-07-03")
    assert(!days.contains("2025-06-19")) // Juneteenth excluded
    assert(days.length == 21) // 23 weekdays minus Juneteenth and July 4th
    assert(rows.forall(_.getAs[java.sql.Date]("backfill_from").toString == "2025-06-04"))
    // a trading-day anchor resolves to itself
    val td = CalendarOps.backfillWindow(spark, "2025-07-03", 5).collect()
    assert(td.forall(_.getAs[java.sql.Date]("snapshot_date").toString == "2025-07-03"))
  }

  test("multi-year calendar: prev_trading_day crosses an unobserved Saturday New Year and a mourning closure") {
    val spark = TestSpark.spark
    val cal = CalendarOps.calendar(
        spark.sql("SELECT DATE'2021-12-20' AS d0, DATE'2025-01-15' AS d1"))
      .filter(col("cal_day").isin("2021-12-31", "2022-01-03", "2025-01-09", "2025-01-10"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("cal_day").toString -> r).toMap
    // Friday 2021-12-31 was a trading day (Saturday Jan 1 not moved back)
    assert(cal("2021-12-31").getAs[Boolean]("is_trading_day"))
    // ... so Monday 2022-01-03 trades and looks back to it
    assert(cal("2022-01-03").getAs[Boolean]("is_trading_day"))
    assert(cal("2022-01-03").getAs[java.sql.Date]("prev_trading_day").toString
      == "2021-12-31")
    // 2025-01-09 mourning closure: not a trading day, and the next day
    // looks back across it to Wednesday the 8th
    assert(!cal("2025-01-09").getAs[Boolean]("is_trading_day"))
    assert(cal("2025-01-10").getAs[java.sql.Date]("prev_trading_day").toString
      == "2025-01-08")
  }
}
