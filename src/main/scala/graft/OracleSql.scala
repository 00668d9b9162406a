package graft

/** DuckDB oracle SQL, one statement per `SparkEntry.queries` key.
  *
  * Parity rules (see SURVEY.md §5): identical aliases, identical rounding
  * (4dp scalars / 2dp large sums), guarded divisions, BIGINT casts where
  * DuckDB would widen (sum of ints → HUGEINT, row_number → BIGINT),
  * double-literal constants written as `a::DOUBLE / b::DOUBLE` (bare
  * `2.0/13.0` is DECIMAL division in DuckDB), and window frames that
  * mirror the Spark `rowsBetween` frames exactly.
  */
object OracleSql {

  /** Mirror of [[graft.operators.Bars.ohlcv]]: exact integer bucket math. */
  val barsCte: String = """
    bars AS (
      SELECT event_type AS symbol,
             make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS bar_ts,
             arg_min(value, ts) AS "open",
             max(value) AS high,
             min(value) AS low,
             arg_max(value, ts) AS "close",
             count(*) AS volume,
             sum(value) AS vsum
      FROM events GROUP BY 1, 2)"""

  private val rnCte: String = """
    b AS (
      SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY bar_ts) AS rn
      FROM bars)"""

  private def wf(frame: String) =
    s"OVER (PARTITION BY symbol ORDER BY bar_ts $frame)"
  private val w20 = wf("ROWS BETWEEN 19 PRECEDING AND CURRENT ROW")

  val all: Map[String, String] = Map(
    "q_bars_ohlcv" -> s"""
      WITH $barsCte
      SELECT symbol, bar_ts, "open", high, low, "close", volume, round(vsum + 5e-9, 4) AS vsum
      FROM bars ORDER BY symbol, bar_ts""",

    "q_preprocess_mavg" -> s"""
      WITH $barsCte
      SELECT symbol, bar_ts, CAST(bar_ts AS DATE) AS bar_date, "close",
        round(sum(CAST("close" AS DECIMAL(18,6))) OVER (PARTITION BY symbol, CAST(bar_ts AS DATE) ORDER BY bar_ts
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)::DOUBLE
          / count("close") OVER (PARTITION BY symbol, CAST(bar_ts AS DATE) ORDER BY bar_ts
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) + 5e-9, 4) AS mavg5,
        round(sum(CAST("close" AS DECIMAL(18,6))) OVER (PARTITION BY symbol, CAST(bar_ts AS DATE) ORDER BY bar_ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
          / count("close") OVER (PARTITION BY symbol, CAST(bar_ts AS DATE) ORDER BY bar_ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 5e-9, 4) AS cumavg
      FROM bars ORDER BY symbol, bar_ts""",

    "q_sma" -> s"""
      WITH $barsCte, $rnCte
      SELECT symbol, bar_ts, "close",
        CASE WHEN rn >= 20 THEN round(sum(CAST("close" AS DECIMAL(18,6))) $w20::DOUBLE / 20 + 5e-9, 4) END AS sma20,
        CASE WHEN rn >= 50 THEN round(sum(CAST("close" AS DECIMAL(18,6))) ${wf("ROWS BETWEEN 49 PRECEDING AND CURRENT ROW")}::DOUBLE / 50 + 5e-9, 4) END AS sma50,
        CASE WHEN rn >= 200 THEN round(sum(CAST("close" AS DECIMAL(18,6))) ${wf("ROWS BETWEEN 199 PRECEDING AND CURRENT ROW")}::DOUBLE / 200 + 5e-9, 4) END AS sma200
      FROM b ORDER BY symbol, bar_ts""",

    "q_bollinger" -> s"""
      WITH $barsCte, $rnCte
      SELECT symbol, bar_ts, "close",
        CASE WHEN rn >= 20 THEN round(sum(CAST("close" AS DECIMAL(18,6))) $w20::DOUBLE / 20 + 5e-9, 4) END AS sma20,
        CASE WHEN rn >= 20 THEN round(sum(CAST("close" AS DECIMAL(18,6))) $w20::DOUBLE / 20 + stddev_samp("close") $w20 * 2 + 5e-9, 4) END AS bb_upper,
        CASE WHEN rn >= 20 THEN round(sum(CAST("close" AS DECIMAL(18,6))) $w20::DOUBLE / 20 - stddev_samp("close") $w20 * 2 + 5e-9, 4) END AS bb_lower
      FROM b ORDER BY symbol, bar_ts""",

    "q_rsi" -> s"""
      WITH $barsCte, $rnCte,
      d AS (
        SELECT symbol, bar_ts, "close", rn,
          "close" - lag("close", 1) ${wf("")} AS delta
        FROM b),
      g AS (
        SELECT symbol, bar_ts, "close", rn,
          CASE WHEN delta > 0 THEN delta ELSE 0.0 END AS gain,
          CASE WHEN delta < 0 THEN -delta ELSE 0.0 END AS loss
        FROM d),
      a AS (
        SELECT symbol, bar_ts, "close", rn,
          avg(gain) ${wf("ROWS BETWEEN 13 PRECEDING AND CURRENT ROW")} AS avg_gain,
          avg(loss) ${wf("ROWS BETWEEN 13 PRECEDING AND CURRENT ROW")} AS avg_loss
        FROM g)
      SELECT symbol, bar_ts, "close",
        CASE WHEN rn < 14 THEN NULL
             WHEN avg_loss = 0 THEN 100.0
             ELSE round(100 - 100 / (1 + avg_gain / avg_loss) + 5e-9, 4) END AS rsi
      FROM a ORDER BY symbol, bar_ts""",

    "q_macd" -> s"""
      WITH $barsCte,
      w1 AS (
        SELECT symbol, bar_ts,
          list("close") ${wf("ROWS BETWEEN 499 PRECEDING AND CURRENT ROW")} AS lst
        FROM bars),
      m AS (
        SELECT symbol, bar_ts,
          list_reduce(lst, (acc, x) -> x * (2::DOUBLE / 13::DOUBLE) + acc * (11::DOUBLE / 13::DOUBLE))
          - list_reduce(lst, (acc, x) -> x * (2::DOUBLE / 27::DOUBLE) + acc * (25::DOUBLE / 27::DOUBLE)) AS macd
        FROM w1),
      w2 AS (
        SELECT symbol, bar_ts, macd,
          list(macd) ${wf("ROWS BETWEEN 499 PRECEDING AND CURRENT ROW")} AS mlst
        FROM m),
      s AS (
        SELECT symbol, bar_ts, macd,
          list_reduce(mlst, (acc, x) -> x * (2::DOUBLE / 10::DOUBLE) + acc * (8::DOUBLE / 10::DOUBLE)) AS sig
        FROM w2)
      SELECT symbol, bar_ts, round(macd + 5e-9, 4) AS macd, round(sig + 5e-9, 4) AS macd_signal,
        round(macd - sig + 5e-9, 4) AS macd_hist
      FROM s ORDER BY symbol, bar_ts""",

    "q_atr" -> s"""
      WITH $barsCte, $rnCte,
      t AS (
        SELECT symbol, bar_ts, rn,
          CASE WHEN lag("close", 1) ${wf("")} IS NULL THEN NULL
               ELSE greatest(high - low,
                             abs(high - lag("close", 1) ${wf("")}),
                             abs(low - lag("close", 1) ${wf("")})) END AS tr
        FROM b)
      SELECT symbol, bar_ts, round(tr + 5e-9, 4) AS tr,
        CASE WHEN rn >= 15 THEN round(avg(tr) ${wf("ROWS BETWEEN 13 PRECEDING AND CURRENT ROW")} + 5e-9, 4) END AS atr
      FROM t ORDER BY symbol, bar_ts""",

    "q_stochastic" -> s"""
      WITH $barsCte, $rnCte,
      k AS (
        SELECT symbol, bar_ts, rn,
          CASE WHEN rn < 14 THEN NULL
               WHEN max(high) ${wf("ROWS BETWEEN 13 PRECEDING AND CURRENT ROW")} = min(low) ${wf("ROWS BETWEEN 13 PRECEDING AND CURRENT ROW")} THEN NULL
               ELSE ("close" - min(low) ${wf("ROWS BETWEEN 13 PRECEDING AND CURRENT ROW")})
                    / (max(high) ${wf("ROWS BETWEEN 13 PRECEDING AND CURRENT ROW")} - min(low) ${wf("ROWS BETWEEN 13 PRECEDING AND CURRENT ROW")}) * 100 END AS k_raw
        FROM b)
      SELECT symbol, bar_ts, round(k_raw + 5e-9, 4) AS stoch_k,
        CASE WHEN rn >= 16 AND count(k_raw) ${wf("ROWS BETWEEN 2 PRECEDING AND CURRENT ROW")} = 3
             THEN round(avg(k_raw) ${wf("ROWS BETWEEN 2 PRECEDING AND CURRENT ROW")} + 5e-9, 4) END AS stoch_d
      FROM k ORDER BY symbol, bar_ts""",

    "q_vwap" -> s"""
      WITH $barsCte
      SELECT symbol, bar_ts, "close", volume,
        round(sum(CAST("close" AS DECIMAL(18,6)) * volume) ${wf("ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")}::DOUBLE
              / sum(volume) ${wf("ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")} + 5e-9, 4) AS vwap
      FROM bars ORDER BY symbol, bar_ts""",

    "q_momentum" -> s"""
      WITH $barsCte,
      l AS (
        SELECT symbol, bar_ts, "close", lag("close", 10) ${wf("")} AS lag10
        FROM bars)
      SELECT symbol, bar_ts, "close",
        CASE WHEN lag10 IS NOT NULL AND lag10 <> 0
             THEN round(("close" / lag10 - 1) * 100 + 5e-9, 4) END AS roc,
        round("close" - lag10 + 5e-9, 4) AS mom
      FROM l ORDER BY symbol, bar_ts""",

    "q_summary_stats" -> s"""
      WITH $barsCte
      SELECT symbol,
        min("open") AS min_open, round(sum(CAST("open" AS DECIMAL(18,6)))::DOUBLE / count(*) + 5e-9, 4) AS avg_open, max("open") AS max_open,
        min(high) AS min_high, round(sum(CAST(high AS DECIMAL(18,6)))::DOUBLE / count(*) + 5e-9, 4) AS avg_high, max(high) AS max_high,
        min(low) AS min_low, round(sum(CAST(low AS DECIMAL(18,6)))::DOUBLE / count(*) + 5e-9, 4) AS avg_low, max(low) AS max_low,
        min("close") AS min_close, round(sum(CAST("close" AS DECIMAL(18,6)))::DOUBLE / count(*) + 5e-9, 4) AS avg_close, max("close") AS max_close,
        min(volume) AS min_volume, round(sum(volume)::DOUBLE / count(*) + 5e-9, 4) AS avg_volume, max(volume) AS max_volume
      FROM bars GROUP BY symbol ORDER BY symbol""",

    "q_weekly_range" -> s"""
      WITH $barsCte,
      r AS (
        SELECT symbol,
          CAST(bar_ts AS DATE) - CAST(dayofweek(bar_ts) AS INTEGER) AS week_start,
          high - low AS rng
        FROM bars)
      SELECT symbol, week_start, count(*) AS n_bars,
        round(min(rng) + 5e-9, 4) AS min_range,
        round(quantile_cont(rng, 0.25) + 5e-9, 4) AS q1_range,
        round(quantile_cont(rng, 0.5) + 5e-9, 4) AS med_range,
        round(quantile_cont(rng, 0.75) + 5e-9, 4) AS q3_range,
        round(max(rng) + 5e-9, 4) AS max_range
      FROM r GROUP BY 1, 2 ORDER BY symbol, week_start""",

    "q_volume_heatmap" -> s"""
      WITH $barsCte
      SELECT dayname(bar_ts) AS day_name, hour(bar_ts)::BIGINT AS hour,
        round(sum(volume)::DOUBLE / count(*) + 5e-9, 4) AS avg_volume, sum(volume)::BIGINT AS total_volume
      FROM bars GROUP BY 1, 2 ORDER BY day_name, hour""",

    "q_latest_metrics" -> s"""
      WITH $barsCte,
      a AS (
        SELECT symbol,
          arg_max("close", bar_ts) AS last_close,
          arg_max("open", bar_ts) AS last_open,
          arg_max(volume, bar_ts) AS last_volume,
          sum(volume)::DOUBLE / count(*) AS mean_volume,
          count(*) AS n_bars
        FROM bars GROUP BY symbol)
      SELECT symbol, last_close, n_bars,
        CASE WHEN last_open <> 0
             THEN round((last_close - last_open) / last_open * 100 + 5e-9, 4) END AS price_change_pct,
        last_volume,
        CASE WHEN mean_volume <> 0
             THEN round((last_volume - mean_volume) / mean_volume * 100 + 5e-9, 4) END AS volume_change_pct
      FROM a ORDER BY symbol""",

    "q1_agg" -> """
      WITH li AS (
        SELECT l_returnflag, l_linestatus,
          CAST(l_quantity AS DECIMAL(18,6)) AS qty,
          CAST(l_extendedprice AS DECIMAL(18,6)) AS price,
          CAST(l_discount AS DECIMAL(18,6)) AS disc,
          CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS disc_price,
          CAST(l_tax AS DECIMAL(18,6)) AS tax
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
      SELECT l_returnflag, l_linestatus,
        round(sum(qty), 2)::DOUBLE AS sum_qty,
        round(sum(price), 2)::DOUBLE AS sum_base_price,
        round(sum(disc_price), 2)::DOUBLE AS sum_disc_price,
        round(sum(CAST(disc_price * (1 + tax) AS DECIMAL(18,6))), 2)::DOUBLE AS sum_charge,
        round(sum(qty)::DOUBLE / count(*) + 5e-9, 4) AS avg_qty,
        round(sum(price)::DOUBLE / count(*) + 5e-9, 4) AS avg_price,
        round(sum(disc)::DOUBLE / count(*) + 5e-9, 4) AS avg_disc,
        count(*) AS count_order
      FROM li
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q_join_agg" -> """
      SELECT r_name, n_name,
        round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS revenue,
        round(sum(CAST(o_totalprice AS DECIMAL(18,6)))::DOUBLE / count(*) + 5e-9, 4) AS avg_order,
        count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""",

    "q_topk_per_group" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders) t
      WHERE rk <= 3 ORDER BY o_custkey, rk""",

    "q_dedup_latest" -> """
      SELECT event_id, ts, user_id, event_type, value
      FROM events
      QUALIFY row_number() OVER (PARTITION BY event_type, ts ORDER BY event_id) = 1
      ORDER BY event_type, ts""",

    "q_latest_ts" -> """
      SELECT event_type, max(ts) AS latest_ts, count(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_time_filter" -> """
      SELECT event_id, ts, event_type, value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
      ORDER BY event_id""",

    "q_validate_clean" -> """
      SELECT event_id, ts, user_id, event_type, value,
        TRY_CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k
      FROM events
      WHERE value IS NOT NULL AND value >= 0
        AND TRY_CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) IS NOT NULL
        AND TRY_CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) >= 0
      ORDER BY event_id""",

    "q_sessionize" -> """
      WITH x AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
               THEN 1 ELSE 0 END AS is_new
        FROM events),
      y AS (
        SELECT user_id, ts, value,
          (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
        FROM x)
      SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
        count(*) AS n_events, round(sum(value) + 5e-9, 4) AS total_value
      FROM y GROUP BY 1, 2 ORDER BY user_id, session_id"""
  )
}
