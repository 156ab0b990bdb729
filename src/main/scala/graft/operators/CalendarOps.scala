package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trading-calendar dimension and calendar queries.
  *
  * The reference leans on `pandas_market_calendars` for five NYSE-calendar
  * functions (`stock_pipeline/scripts/utils/dates.py`): `get_trading_days`
  * (:63-79), `is_trading_day` (:135-148), `get_previous_trading_day`
  * (:151-179), `get_last_n_trading_days` (:82-132), and
  * `split_date_range_by_month` (:19-60). Spark has no market calendar, so we
  * generate a date dimension (`sequence` + explode) with weekday + fixed
  * holiday flags and express all five as queries over it — a broadcast-sized
  * table (366 rows/year) that joins against facts for free.
  */
object CalendarOps {

  /** NYSE full-day closures for any year the rule generator covers
    * ([[NyseCalendar]], 1998–open-ended) — replaces the round-2 hard-coded
    * 2024 list, whose 10 dates this reproduces exactly for 2024.
    */
  def usMarketHolidays(fromYear: Int = 1998, toYear: Int = 2100): Seq[String] =
    NyseCalendar.holidayStrings(fromYear, toYear)

  /** NYSE 1:00 pm early closes (half days — still trading days). */
  def usEarlyCloses(fromYear: Int = 2013, toYear: Int = 2100): Seq[String] =
    NyseCalendar.earlyCloseStrings(fromYear, toYear)

  /** Date dimension spanning [start, end] (inclusive), one row per day:
    * `cal_day date, dow int (Mon=0), is_holiday, is_trading_day,
    * is_early_close, prev_trading_day date` — prev_trading_day is the
    * latest strictly-earlier trading day (`get_previous_trading_day`
    * semantics); early-close half days count as trading days throughout.
    *
    * Holidays and early closes arrive as generated dimensions (~1k rows
    * for a century) and flag via broadcast left joins — the config-table
    * shape a deployment would swap its own exchange schedule into.
    */
  def calendar(bounds: DataFrame,
      holidays: Seq[String] = usMarketHolidays(),
      earlyCloses: Seq[String] = usEarlyCloses()): DataFrame = {
    val spark = bounds.sparkSession
    import spark.implicits._
    // bounds: single row (d0 date, d1 date)
    val days = bounds.select(explode(sequence(col("d0"), col("d1"))).as("cal_day"))
    val holDim = holidays.toDF("h").select(to_date(col("h")).as("__hol"))
    val ecDim = earlyCloses.toDF("e").select(to_date(col("e")).as("__ec"))
    val flagged = days
      .join(broadcast(holDim), col("cal_day") === col("__hol"), "left")
      .join(broadcast(ecDim), col("cal_day") === col("__ec"), "left")
      .withColumn("dow", expr("weekday(cal_day)"))
      .withColumn("is_holiday", col("__hol").isNotNull)
      .withColumn("is_trading_day", col("dow") <= 4 && col("__hol").isNull)
      .withColumn("is_early_close", col("__ec").isNotNull)
      .drop("__hol", "__ec")
    // single-partition window by DESIGN: the frame is the whole O(days)
    // dimension, broadcast-small. (A lit(1) partition key doesn't silence
    // WindowExec's warning — EliminateWindowPartitions folds it away — so
    // log4j2.properties scopes that logger down instead.)
    val w = Window
      .orderBy(col("cal_day")).rowsBetween(Window.unboundedPreceding, -1)
    flagged.withColumn(
      "prev_trading_day",
      last(when(col("is_trading_day"), col("cal_day")), ignoreNulls = true).over(w))
  }

  /** Calendar over the day-span of `df`'s `dayCol`. */
  def calendarOver(df: DataFrame, dayCol: String): DataFrame =
    calendar(df.agg(min(col(dayCol)).as("d0"), max(col(dayCol)).as("d1")))

  /** `get_last_n_trading_days` (reference `utils/dates.py:82-132`): the n
    * most recent trading days of the calendar, rn=1 newest. The calendar is
    * O(days) so the unpartitioned window is broadcast-cheap.
    */
  def lastNTradingDays(cal: DataFrame, n: Int): DataFrame = {
    // single-partition by design, same note as [[calendar]]
    val w = Window.orderBy(col("cal_day").desc)
    cal.filter(col("is_trading_day"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select("cal_day", "rn")
  }

  /** `is_trading_day` as a set-filter (reference `utils/dates.py:135-148`,
    * used as a gate before ingest): keep only fact rows whose `dayCol` is a
    * trading day. The calendar side is broadcast — a left-semi join that
    * never shuffles the fact table.
    */
  def filterToTradingDays(facts: DataFrame, dayCol: String, cal: DataFrame): DataFrame =
    facts.join(
      broadcast(cal.filter(col("is_trading_day")).select(col("cal_day"))),
      facts(dayCol) === col("cal_day"), "left_semi")

  /** Backfill-window resolution (reference `fmp_dump_raw.py:628-651`): the
    * anchor date resolves to its snapshot date — itself if a trading day,
    * else the previous trading day (the "runs after market close" rule) —
    * and `--backfill-days N` yields the calendar-day window
    * [anchor − N, anchor]. Returns the window's TRADING days (what a
    * per-date feed backfill iterates), each row carrying the resolved
    * snapshot date and the window bounds.
    *
    * The calendar spans a ~2-week pad before the window so the anchor's
    * prev_trading_day always resolves inside it (the longest NYSE closure
    * streak is far shorter).
    */
  def backfillWindow(spark: SparkSession, anchor: String, backfillDays: Int,
      holidays: Seq[String] = usMarketHolidays()): DataFrame = {
    val bounds = spark.sql(
      s"SELECT date_sub(DATE'$anchor', ${backfillDays + 14}) AS d0, DATE'$anchor' AS d1")
    val cal = calendar(bounds, holidays)
    val snap = cal.filter(col("cal_day") === to_date(lit(anchor)))
      .select(when(col("is_trading_day"), col("cal_day"))
        .otherwise(col("prev_trading_day")).as("snapshot_date"))
    cal.filter(col("is_trading_day") &&
        col("cal_day") >= date_sub(to_date(lit(anchor)), backfillDays))
      .crossJoin(broadcast(snap)) // one resolved row
      .select(col("cal_day").as("backfill_day"), col("snapshot_date"),
        date_sub(to_date(lit(anchor)), backfillDays).as("backfill_from"),
        to_date(lit(anchor)).as("backfill_to"))
  }

  /** `split_date_range_by_month` as a query: month chunks with first/last
    * observed day and distinct-day counts (reference `utils/dates.py:19-60`).
    */
  def monthChunks(df: DataFrame, dayCol: String): DataFrame =
    df.groupBy(trunc(col(dayCol), "month").as("month_start"))
      .agg(
        min(col(dayCol)).as("chunk_start"),
        max(col(dayCol)).as("chunk_end"),
        countDistinct(col(dayCol)).as("n_days"),
        count(lit(1)).as("n_rows"))
}
