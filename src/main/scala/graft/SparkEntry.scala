package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 is registered here as a query over
  * the driver testdata, with a DuckDB-runnable SQL twin in [[oracleSql]]
  * (omitted only for ops that SQL can't express — those get rows-only checks
  * and ScalaTest coverage instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The medallion end-to-end slice: normalize → validate → gold window
    * features (SURVEY.md §7.1 step 1).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.goldFeatures(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_norm_events" -> (Queries.normEvents _),
    "q_dedup_keeplast" -> (Queries.dedupKeepLast _),
    "q_gold_features" -> (Queries.goldFeatures _),
    "q_silver_merge" -> (Queries.silverMerge _),
    "q_dq_audit" -> (Queries.dqAudit _),
    "q_quarantine" -> (Queries.quarantine _),
    "q_count_by_type" -> (Queries.countByType _),
    "q_dup_props" -> (Queries.dupProps _),
    "q_coverage" -> (Queries.coverage _),
    "q_topk_users" -> (Queries.topkUsers _),
    "q_latest_day_monitor" -> (Queries.latestDayMonitor _),
    "q1_pricing_summary" -> (Queries.pricingSummary _),
    "q6_revenue_filter" -> (Queries.revenueFilter _),
    "q_revenue_by_nation" -> (Queries.revenueByNation _),
    "q_asof_purchase" -> (Queries.asofPurchase _),
    "q_trading_calendar" -> (Queries.tradingCalendar _),
    "q_month_chunks" -> (Queries.monthChunks _),
    "q_envelope" -> (Queries.envelope _),
    "q_day_filehash" -> (Queries.dayFileHash _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_norm_events" ->
      """SELECT event_id, ts, CAST(ts AS DATE) AS day, user_id,
         upper(trim(event_type)) AS event_type, value
         FROM events
         WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value >= 0""",

    "q_dedup_keeplast" ->
      """SELECT user_id, event_type, ts, event_id, value FROM (
           SELECT user_id, event_type, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t
         WHERE rn = 1""",

    "q_gold_features" ->
      """WITH norm AS (
           SELECT event_id, ts, CAST(ts AS DATE) AS day, user_id,
                  upper(trim(event_type)) AS event_type, value
           FROM events
           WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value >= 0)
         SELECT event_id, ts, day, user_id, event_type, value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w20 AS DOUBLE) / count(*) OVER w20 AS ma_20,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w50 AS DOUBLE) / count(*) OVER w50 AS ma_50,
           CASE WHEN count(*) OVER w20 > 1 THEN sqrt(greatest(
             (CAST(sum(CAST(value*value AS DECIMAL(18,4))) OVER w20 AS DOUBLE)
              - CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w20 AS DOUBLE)
                * CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w20 AS DOUBLE)
                / (count(*) OVER w20))
             / (count(*) OVER w20 - 1), 0.0)) END AS vol_20,
           lag(value, 1) OVER w AS prev_value,
           (value - lag(value, 1) OVER w) / nullif(lag(value, 1) OVER w, 0) AS daily_return
         FROM norm
         WINDOW
           w AS (PARTITION BY user_id ORDER BY ts, event_id),
           w20 AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
           w50 AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)""",

    "q_silver_merge" ->
      """WITH t AS (
           SELECT user_id, event_type, ts, event_id, value FROM (
             SELECT user_id, event_type, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
             FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15') x
           WHERE rn = 1),
         u AS (
           SELECT user_id, event_type, ts, event_id, value FROM (
             SELECT user_id, event_type, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
             FROM events WHERE CAST(ts AS DATE) > DATE '2024-01-15') x
           WHERE rn = 1)
         SELECT
           coalesce(u.user_id, t.user_id) AS user_id,
           coalesce(u.event_type, t.event_type) AS event_type,
           CASE WHEN u.user_id IS NOT NULL THEN u.ts ELSE t.ts END AS ts,
           CASE WHEN u.user_id IS NOT NULL THEN u.event_id ELSE t.event_id END AS event_id,
           CASE WHEN u.user_id IS NOT NULL THEN u.value ELSE t.value END AS value
         FROM t FULL OUTER JOIN u
           ON t.user_id = u.user_id AND t.event_type = u.event_type""",

    "q_dq_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN NOT coalesce(user_id IS NOT NULL, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_not_null_user,
           CAST(sum(CASE WHEN NOT coalesce(value >= 0, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_nonneg_value,
           CAST(sum(CASE WHEN NOT coalesce(value <= 300, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_value_le_300,
           CAST(sum(CASE WHEN NOT coalesce(ts IS NOT NULL, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_not_null_ts
         FROM events""",

    "q_quarantine" ->
      """SELECT event_id, user_id, event_type, value,
           CASE WHEN NOT coalesce(user_id IS NOT NULL, false) THEN 'not_null_user'
                WHEN NOT coalesce(value >= 0, false) THEN 'nonneg_value'
                WHEN NOT coalesce(value <= 300, false) THEN 'value_le_300'
           END AS dq_reason
         FROM events
         WHERE NOT coalesce(user_id IS NOT NULL, false)
            OR NOT coalesce(value >= 0, false)
            OR NOT coalesce(value <= 300, false)""",

    "q_count_by_type" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events GROUP BY event_type""",

    "q_dup_props" ->
      """SELECT rec_hash, n_dups FROM (
           SELECT sha256(event_type || '|' || props) AS rec_hash,
             CAST(count(*) AS BIGINT) AS n_dups
           FROM events GROUP BY 1) t
         WHERE n_dups > 1""",

    "q_coverage" ->
      """SELECT user_id, min(day) AS first_day, max(day) AS last_day,
           CAST(count(DISTINCT day) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_rows
         FROM (SELECT user_id, CAST(ts AS DATE) AS day FROM events) t
         GROUP BY user_id""",

    "q_topk_users" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY user_id
         ORDER BY n DESC, user_id ASC LIMIT 20""",

    "q_latest_day_monitor" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n, max(ts) AS latest_ts
         FROM events
         WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)
         GROUP BY user_id""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q6_revenue_filter" ->
      """SELECT
           CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.03 AND l_discount <= 0.07
           AND l_quantity < 24""",

    "q_revenue_by_nation" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",

    "q_asof_purchase" ->
      """SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value,
           p.value AS last_purchase_value
         FROM events e
         ASOF LEFT JOIN
           (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
           ON e.user_id = p.user_id AND e.ts >= p.ts""",

    "q_trading_calendar" ->
      """WITH bounds AS (
           SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
         days AS (
           SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                  CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS cal_day
           FROM bounds),
         flagged AS (
           SELECT cal_day, CAST(isodow(cal_day) - 1 AS INT) AS dow,
             cal_day IN (DATE '2024-01-01', DATE '2024-01-15', DATE '2024-02-19',
                         DATE '2024-03-29', DATE '2024-05-27', DATE '2024-06-19',
                         DATE '2024-07-04', DATE '2024-09-02', DATE '2024-11-28',
                         DATE '2024-12-25') AS is_holiday,
             ((isodow(cal_day) - 1) <= 4 AND cal_day NOT IN (
                         DATE '2024-01-01', DATE '2024-01-15', DATE '2024-02-19',
                         DATE '2024-03-29', DATE '2024-05-27', DATE '2024-06-19',
                         DATE '2024-07-04', DATE '2024-09-02', DATE '2024-11-28',
                         DATE '2024-12-25')) AS is_trading_day
           FROM days)
         SELECT cal_day, dow, is_holiday, is_trading_day,
           last_value(CASE WHEN is_trading_day THEN cal_day END IGNORE NULLS)
             OVER (ORDER BY cal_day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_trading_day
         FROM flagged""",

    "q_month_chunks" ->
      """SELECT CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS month_start,
           min(CAST(ts AS DATE)) AS chunk_start,
           max(CAST(ts AS DATE)) AS chunk_end,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_rows
         FROM events GROUP BY 1""",

    "q_envelope" ->
      """SELECT CAST(user_id AS VARCHAR) AS symbol,
           CAST(ts AS DATE) AS as_of_date,
           event_type AS endpoint,
           props AS payload,
           ts AS fetched_at,
           'EVENTS' AS source,
           CAST(200 AS INT) AS http_status,
           coalesce(json_extract_string(props, '$.k'),
                    json_extract_string(props, '$.key')) AS k_value,
           sha256(props) AS payload_hash
         FROM events""",

    "q_day_filehash" ->
      """SELECT CAST(ts AS DATE) AS day,
           sha256(string_agg(props, chr(10) ORDER BY props)) AS file_hash,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1""",
  )
}
