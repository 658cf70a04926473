package graft.queries

import graft.Tables
import graft.ops.TimeSeries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Time-series diagnostics over the events stream: EWMA smoothing,
  * CUSUM changepoint detection, autocorrelation. The sequential
  * recurrences run over the DOMAIN-sized daily series (one count per
  * calendar day), so the only full-data pass is a map-side-combinable
  * count — the shape that survives 100 TB. The oracles replay the
  * recurrences with recursive CTEs and match bit-for-bit before the
  * final 6dp rounding (see [[graft.ops.TimeSeries]] for why the EWMA
  * update form uses a single alpha literal and CUSUM pins mu/k/h to 6dp
  * before the fold).
  */
object TimeSeriesQueries {

  /** EWMA (alpha = 0.3) of daily event counts. */
  private def evEwmaDaily(s: SparkSession, dir: String): DataFrame =
    TimeSeries.ewmaDaily(Tables.events(s, dir), "ts", alpha = 0.3)

  /** Kalman local-level filter of the daily count (q=4, r=25 —
    * steady-state gain ≈ 0.33): adaptive-gain smoothing with an honest
    * per-day variance readout. See
    * [[graft.ops.TimeSeries.kalmanLocalLevel]].
    */
  private def evKalmanLevel(s: SparkSession, dir: String): DataFrame =
    TimeSeries.kalmanLocalLevel(Tables.events(s, dir), "ts",
      q = 4.0, r = 25.0)

  private val evKalmanLevelSql =
    """WITH RECURSIVE d AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*)::DOUBLE AS x
      |  FROM events GROUP BY 1),
      |r AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
      |e AS (
      |  -- anchor literals MUST be DOUBLE: bare 25.0 infers DECIMAL(3,1)
      |  -- and the whole recursion column quantizes to one decimal
      |  SELECT rn, day, x, x AS l, CAST(25.0 AS DOUBLE) AS p,
      |         CAST(1.0 AS DOUBLE) AS kg
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.rn, r.day, r.x,
      |    e.l + ((e.p + 4.0) / ((e.p + 4.0) + 25.0)) * (r.x - e.l),
      |    (1.0 - ((e.p + 4.0) / ((e.p + 4.0) + 25.0))) * (e.p + 4.0),
      |    (e.p + 4.0) / ((e.p + 4.0) + 25.0)
      |  FROM e JOIN r ON r.rn = e.rn + 1)
      |SELECT day, x, round(l, 6) AS level, round(p, 6) AS p_var,
      |       round(kg, 6) AS gain
      |FROM e""".stripMargin

  private val evEwmaDailySql =
    """WITH RECURSIVE d AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*)::DOUBLE AS x
      |  FROM events GROUP BY 1),
      |r AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
      |e AS (
      |  SELECT rn, day, x, x AS ewma FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.rn, r.day, r.x, e.ewma + 0.3 * (r.x - e.ewma)
      |  FROM e JOIN r ON r.rn = e.rn + 1)
      |SELECT day, x, round(ewma, 6) AS ewma FROM e""".stripMargin

  /** Two-sided CUSUM on daily counts: slack k = 0.5 sigma, threshold
    * h = 4 sigma (the standard fast-detection parameterization).
    */
  private def evCusum(s: SparkSession, dir: String): DataFrame =
    TimeSeries.cusumChangepoint(Tables.events(s, dir), "ts",
      kSigmas = 0.5, hSigmas = 4.0)

  private val evCusumSql =
    """WITH RECURSIVE d AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*)::DOUBLE AS x
      |  FROM events GROUP BY 1),
      |st AS (SELECT round(avg(x), 6) AS mu,
      |              round(round(stddev_samp(x), 6) * 0.5, 6) AS k,
      |              round(round(stddev_samp(x), 6) * 4.0, 6) AS h
      |       FROM d),
      |r AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
      |c AS (
      |  SELECT r.rn, r.day, r.x,
      |         greatest(0.0, r.x - st.mu - st.k) AS sp,
      |         least(0.0, r.x - st.mu + st.k) AS sn
      |  FROM r CROSS JOIN st WHERE r.rn = 1
      |  UNION ALL
      |  SELECT r.rn, r.day, r.x,
      |         greatest(0.0, c.sp + (r.x - st.mu - st.k)),
      |         least(0.0, c.sn + (r.x - st.mu + st.k))
      |  FROM c JOIN r ON r.rn = c.rn + 1 CROSS JOIN st)
      |SELECT c.day, c.x, round(c.sp, 6) AS sp, round(c.sn, 6) AS sn,
      |       (round(c.sp, 6) > st.h OR round(c.sn, 6) < -st.h) AS flag
      |FROM c CROSS JOIN st""".stripMargin

  /** Pettitt rank-based change-point over daily counts — the
    * nonparametric twin of `ev_cusum_changepoint`. See
    * [[graft.ops.TimeSeries.pettittTest]].
    */
  private def evPettitt(s: SparkSession, dir: String): DataFrame =
    TimeSeries.pettittTest(Tables.events(s, dir), "ts")

  private val evPettittSql =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
      |v AS (SELECT a.day, CAST(sum(CASE WHEN a.x > b.x THEN 1
      |        WHEN a.x < b.x THEN -1 ELSE 0 END) AS BIGINT) AS v
      |      FROM d a JOIN d b ON a.day <> b.day GROUP BY 1),
      |u AS (SELECT day, CAST(sum(v) OVER (ORDER BY day) AS BIGINT) AS u
      |      FROM v),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      |best AS (SELECT *, row_number() OVER
      |    (ORDER BY abs(u) DESC, day) AS rn FROM u)
      |SELECT nn.n, day AS cp_day, u AS u_at_cp, abs(u) AS k,
      |  round(2.0 * exp((-6.0 * abs(u) * abs(u)) /
      |    (CAST(nn.n AS DOUBLE) * nn.n * nn.n +
      |     CAST(nn.n AS DOUBLE) * nn.n)), 6) AS p_approx
      |FROM best CROSS JOIN nn WHERE rn = 1""".stripMargin

  /** ACF of daily counts at lags 1..7. */
  private def evAutocorr(s: SparkSession, dir: String): DataFrame =
    TimeSeries.autocorrDaily(Tables.events(s, dir), "ts", maxLag = 7)

  /** Lead-lag cross-correlation between daily click and purchase
    * volumes at lags −7..7 — which side leads, and by how many days.
    * See [[graft.ops.TimeSeries.crossCorrDaily]].
    */
  private def evCrossCorr(s: SparkSession, dir: String): DataFrame =
    TimeSeries.crossCorrDaily(Tables.events(s, dir), "ts", "event_type",
      "click", "purchase", maxLag = 7)

  private val evCrossCorrSql =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1),
      |l AS (SELECT CAST(unnest(range(-7, 8)) AS INT) AS lag),
      |m AS (SELECT l.lag, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(a.x) AS BIGINT) AS sx, CAST(sum(b.y) AS BIGINT) AS sy,
      |    CAST(sum(a.x * a.x) AS HUGEINT) AS sxx,
      |    CAST(sum(b.y * b.y) AS HUGEINT) AS syy,
      |    CAST(sum(a.x * b.y) AS HUGEINT) AS sxy
      |  FROM d a CROSS JOIN l JOIN d b
      |    ON datediff('day', a.day, b.day) = l.lag
      |  GROUP BY 1)
      |SELECT lag, n,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |    AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
      |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      |  THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |       CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
      |       CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) END AS r
      |FROM m""".stripMargin

  private val evAutocorrSql =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*)::DOUBLE AS x
      |           FROM events GROUP BY 1),
      |m AS (SELECT avg(x) AS mu FROM d),
      |r AS (SELECT row_number() OVER (ORDER BY day) AS rn, x - m.mu AS dev
      |      FROM d CROSS JOIN m),
      |den AS (SELECT sum(dev * dev) AS den FROM r)
      |SELECT b.rn - a.rn AS lag,
      |       round(sum(a.dev * b.dev) / den.den, 6) AS acf
      |FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 7
      |CROSS JOIN den
      |GROUP BY 1, den.den""".stripMargin

  /** Day-of-week seasonality + chi-square uniformity. The weekday is
    * `epoch_day mod 7` on BOTH sides — engine `dayofweek()` origins
    * differ (Spark 1=Sunday, DuckDB 0=Sunday); integer arithmetic
    * can't. See [[graft.ops.TimeSeries.dowSeasonality]].
    */
  private def evDowSeasonality(s: SparkSession, dir: String): DataFrame =
    TimeSeries.dowSeasonality(Tables.events(s, dir), "ts")

  private val evDowSeasonalitySql =
    """WITH c AS (
      |  SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
      |           AS dow,
      |         count(*)::DOUBLE AS cnt
      |  FROM events GROUP BY 1),
      |e AS (SELECT sum(cnt) / 7 AS e FROM c),
      |x AS (SELECT dow, cnt, e.e,
      |        (cnt - e.e) * (cnt - e.e) / e.e AS c2
      |      FROM c CROSS JOIN e),
      |t AS (SELECT sum(c2) AS chi2 FROM x)
      |SELECT dow, cnt, round(x.e, 6) AS expected, round(c2, 6) AS contrib,
      |       round(t.chi2, 6) AS chi2
      |FROM x CROSS JOIN t""".stripMargin

  /** Before/after Welch-t impact per event type around 2024-01-15 —
    * the quantify step after CUSUM's detect. See
    * [[graft.ops.TimeSeries.impactWelch]].
    */
  private def evImpactWelch(s: SparkSession, dir: String): DataFrame =
    TimeSeries.impactWelch(Tables.events(s, dir), "event_type", "ts",
      "value", pivot = "2024-01-15")

  private val evImpactWelchSql =
    """SELECT event_type,
      |  count(*) FILTER (ts < TIMESTAMP '2024-01-15') AS n_before,
      |  count(*) FILTER (ts >= TIMESTAMP '2024-01-15') AS n_after,
      |  round(avg(value) FILTER (ts < TIMESTAMP '2024-01-15'), 6)
      |    AS mean_before,
      |  round(avg(value) FILTER (ts >= TIMESTAMP '2024-01-15'), 6)
      |    AS mean_after,
      |  CASE WHEN count(*) FILTER (ts < TIMESTAMP '2024-01-15') >= 2
      |        AND count(*) FILTER (ts >= TIMESTAMP '2024-01-15') >= 2
      |       THEN round(
      |         (avg(value) FILTER (ts >= TIMESTAMP '2024-01-15') -
      |          avg(value) FILTER (ts < TIMESTAMP '2024-01-15')) /
      |         sqrt(var_samp(value) FILTER (ts < TIMESTAMP '2024-01-15') /
      |                count(*) FILTER (ts < TIMESTAMP '2024-01-15') +
      |              var_samp(value) FILTER (ts >= TIMESTAMP '2024-01-15') /
      |                count(*) FILTER (ts >= TIMESTAMP '2024-01-15')), 6)
      |  END AS t_welch
      |FROM events GROUP BY 1""".stripMargin

  /** Holt level+trend smoothing (alpha = 0.3, beta = 0.1) of daily
    * counts — see [[graft.ops.TimeSeries.holtDaily]] for the update
    * forms and the l_1 = x_1, b_1 = 0 init.
    */
  private def evHoltDaily(s: SparkSession, dir: String): DataFrame =
    TimeSeries.holtDaily(Tables.events(s, dir), "ts",
      alpha = 0.3, beta = 0.1)

  private val evHoltDailySql =
    """WITH RECURSIVE d AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*)::DOUBLE AS x
      |  FROM events GROUP BY 1),
      |r AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
      |h AS (
      |  SELECT rn, day, x, x AS l, CAST(0.0 AS DOUBLE) AS b
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.rn, r.day, r.x,
      |         (h.l + h.b) + 0.3 * (r.x - (h.l + h.b)),
      |         h.b + 0.1 *
      |           ((h.l + h.b) + 0.3 * (r.x - (h.l + h.b)) - h.l - h.b)
      |  FROM h JOIN r ON r.rn = h.rn + 1)
      |SELECT day, x, round(l, 6) AS level, round(b, 6) AS trend,
      |       round(l + b, 6) AS forecast FROM h""".stripMargin

  /** Theil-Sen robust trend of the daily count series — see
    * [[graft.ops.TimeSeries.theilSenTrend]].
    */
  private def evTheilSen(s: SparkSession, dir: String): DataFrame =
    TimeSeries.theilSenTrend(Tables.events(s, dir), "ts")

  private val evTheilSenSql =
    """WITH d AS (
      |  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |           AS DOUBLE) AS t,
      |         CAST(count(*) AS DOUBLE) AS x
      |  FROM events GROUP BY 1),
      |p AS (SELECT (b.x - a.x) / (b.t - a.t) AS sl
      |      FROM d a JOIN d b ON b.t > a.t),
      |s AS (SELECT round(quantile_cont(sl, 0.5), 6) AS slope,
      |             CAST(count(*) AS BIGINT) AS n_pairs FROM p)
      |SELECT CAST(count(*) AS BIGINT) AS n_days, s.n_pairs, s.slope,
      |       round(quantile_cont(d.x - s.slope * d.t, 0.5), 6)
      |         AS intercept
      |FROM d CROSS JOIN s GROUP BY s.n_pairs, s.slope""".stripMargin

  /** Fano burstiness per event type (zero-filled calendar) — see
    * [[graft.ops.TimeSeries.fanoFactor]].
    */
  private def evFano(s: SparkSession, dir: String): DataFrame =
    TimeSeries.fanoFactor(Tables.events(s, dir), "event_type", "ts")

  private val evFanoSql =
    """WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |                  CAST(count(*) AS DOUBLE) AS x
      |           FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
      |g AS (SELECT DISTINCT event_type FROM c),
      |cells AS (SELECT g.event_type, days.day, coalesce(c.x, 0.0) AS x
      |          FROM g CROSS JOIN days
      |          LEFT JOIN c ON c.event_type = g.event_type
      |                     AND c.day = days.day)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |       round(avg(x), 6) AS mean_daily,
      |       round(var_samp(x), 6) AS var_daily,
      |       round(round(var_samp(x), 6) / round(avg(x), 6), 6) AS fano
      |FROM cells GROUP BY 1""".stripMargin

  /** Per-type OLS daily trend (slope/intercept/R² over centered days) —
    * see [[graft.ops.TimeSeries.olsTrendByGroup]].
    */
  private def evOlsTrend(s: SparkSession, dir: String): DataFrame =
    TimeSeries.olsTrendByGroup(Tables.events(s, dir), "event_type", "ts")

  private val evOlsTrendSql =
    """WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |                  CAST(count(*) AS DOUBLE) AS y
      |           FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
      |mn AS (SELECT min(day) AS d0 FROM days),
      |g AS (SELECT DISTINCT event_type FROM c),
      |cells AS (SELECT g.event_type,
      |            CAST(datediff('day', mn.d0, days.day) AS DOUBLE) AS t,
      |            coalesce(c.y, 0.0) AS y
      |          FROM g CROSS JOIN days CROSS JOIN mn
      |          LEFT JOIN c ON c.event_type = g.event_type
      |                     AND c.day = days.day),
      |m AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
      |             sum(t) AS st, sum(y) AS sy, sum(t * y) AS sty,
      |             sum(t * t) AS stt, sum(y * y) AS syy
      |      FROM cells GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days,
      |  CASE WHEN n * stt - st * st != 0
      |       THEN round((n * sty - st * sy) / (n * stt - st * st), 6)
      |  END AS slope,
      |  CASE WHEN n * stt - st * st != 0
      |       THEN round((sy - (n * sty - st * sy) / (n * stt - st * st)
      |                   * st) / n, 6)
      |  END AS intercept,
      |  CASE WHEN n * stt - st * st != 0 AND n * syy - sy * sy != 0
      |       THEN round((n * sty - st * sy) * (n * sty - st * sy)
      |                  / ((n * stt - st * st) * (n * syy - sy * sy)), 6)
      |  END AS r2
      |FROM m""".stripMargin

  /** Additive seasonal decomposition of daily counts (trend = centered
    * 7-day MA, weekday seasonal, residual) — see
    * [[graft.ops.TimeSeries.seasonalDecompose]] for the exact-integer
    * detrending that keeps every aggregate order-stable.
    */
  private def evSeasonal(s: SparkSession, dir: String): DataFrame =
    TimeSeries.seasonalDecompose(Tables.events(s, dir), "ts")

  private val evSeasonalSql =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS c
      |           FROM events GROUP BY 1),
      |w AS (SELECT day, c,
      |        sum(c) OVER win AS s7, count(*) OVER win AS n7,
      |        datediff('day', DATE '1970-01-01', day) % 7 AS dow
      |      FROM d WINDOW win AS
      |        (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |t AS (SELECT day, c, dow, n7,
      |        CASE WHEN n7 = 7
      |             THEN round(CAST(s7 AS DOUBLE) / 7.0, 6) END AS trend
      |      FROM w),
      |sr AS (SELECT dow,
      |         round(CAST(sum(7 * c - s7) AS DOUBLE)
      |               / (7.0 * count(*)), 6) AS sraw
      |       FROM w WHERE n7 = 7 GROUP BY 1),
      |sm AS (SELECT CAST(sum(CAST(round(sraw * 1000000.0, 0) AS BIGINT))
      |                AS DOUBLE) / (1000000.0 * count(*)) AS sm FROM sr),
      |se AS (SELECT dow, round(sraw - sm.sm, 6) AS seasonal
      |       FROM sr CROSS JOIN sm)
      |SELECT t.day, CAST(t.c AS DOUBLE) AS x, CAST(t.dow AS INT) AS dow,
      |       t.trend, se.seasonal,
      |       CASE WHEN t.trend IS NOT NULL AND se.seasonal IS NOT NULL
      |            THEN round(t.c - t.trend - se.seasonal, 6)
      |       END AS residual
      |FROM t LEFT JOIN se ON se.dow = t.dow""".stripMargin

  /** Holt-Winters additive level+trend+weekly-seasonal smoothing
    * (alpha 0.3, beta 0.1, gamma 0.2) — see
    * [[graft.ops.TimeSeries.holtWintersDaily]] for the rotating-list
    * seasonal state and per-step 6dp pins the oracle replays.
    */
  private def evHoltWinters(s: SparkSession, dir: String): DataFrame =
    TimeSeries.holtWintersDaily(Tables.events(s, dir), "ts",
      alpha = 0.3, beta = 0.1, gamma = 0.2)

  private val evHoltWintersSql = {
    // l_t inlined wherever the Spark fold uses the ROUNDED l_t
    val lNew = "round((h.l + h.b) + 0.3 * (r.x - h.s[1] - (h.l + h.b)), 6)"
    s"""WITH RECURSIVE d AS (
       |  SELECT CAST(ts AS DATE) AS day, count(*)::DOUBLE AS x
       |  FROM events GROUP BY 1),
       |r AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn
       |      FROM d),
       |nn AS (SELECT count(*) AS n FROM d),
       |i1 AS (SELECT round(avg(x) FILTER (rn BETWEEN 1 AND 7), 6) AS l0
       |       FROM r),
       |i2 AS (SELECT round((avg(x) FILTER (rn BETWEEN 8 AND 14)
       |                     - i1.l0) / 7.0, 6) AS b0
       |       FROM r CROSS JOIN i1 GROUP BY i1.l0),
       |s0 AS (SELECT list(round(x - i1.l0, 6) ORDER BY rn) AS s
       |       FROM r CROSS JOIN i1 WHERE rn <= 7),
       |h AS (
       |  SELECT 0 AS rn, CAST(NULL AS DATE) AS day,
       |         CAST(0.0 AS DOUBLE) AS x, CAST(0.0 AS DOUBLE) AS f,
       |         i1.l0 AS l, i2.b0 AS b, s0.s AS s
       |  FROM i1 CROSS JOIN i2 CROSS JOIN s0 CROSS JOIN nn
       |  WHERE nn.n >= 14
       |  UNION ALL
       |  SELECT r.rn, r.day, r.x,
       |         round(h.l + h.b + h.s[1], 6),
       |         $lNew,
       |         round(h.b + 0.1 * ($lNew - (h.l + h.b)), 6),
       |         list_concat(h.s[2:7],
       |           [round(h.s[1] + 0.2 * (r.x - $lNew - h.s[1]), 6)])
       |  FROM h JOIN r ON r.rn = h.rn + 1)
       |SELECT day, x, f AS forecast, l AS level, b AS trend,
       |       s[7] AS seasonal
       |FROM h WHERE rn >= 1""".stripMargin
  }

  /** Naive / seasonal-naive forecast backtest with MASE, per event
    * type, 7-day holdout, weekly season — see
    * [[graft.ops.TimeSeries.forecastBacktest]].
    */
  private def evForecastBacktest(s: SparkSession, dir: String): DataFrame =
    TimeSeries.forecastBacktest(Tables.events(s, dir), "event_type",
      "ts", horizon = 7, season = 7)

  private val evForecastBacktestSql =
    """WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |         CAST(count(*) AS BIGINT) AS x
      |       FROM events GROUP BY 1, 2),
      |cut AS (SELECT max(day) - 7 AS cut FROM daily),
      |tr AS (SELECT daily.* FROM daily CROSS JOIN cut WHERE day <= cut),
      |te AS (SELECT daily.* FROM daily CROSS JOIN cut WHERE day > cut),
      |lt AS (SELECT g, arg_max(x, day) AS fnaive FROM tr GROUP BY 1),
      |lg AS (SELECT g, day + 7 AS day, x AS xlag FROM daily),
      |st AS (SELECT te.g, te.day, te.x, lg.xlag
      |       FROM te JOIN lg USING (g, day)),
      |ins AS (SELECT tr.g, tr.day, tr.x, lg.xlag
      |        FROM tr JOIN lg USING (g, day)),
      |mt AS (SELECT st.g, CAST(count(*) AS BIGINT) AS n_test,
      |         CAST(sum(abs(st.x - lt.fnaive)) AS BIGINT) AS saen,
      |         CAST(sum(abs(st.x - st.xlag)) AS BIGINT) AS saes
      |       FROM st JOIN lt USING (g) GROUP BY 1),
      |mi AS (SELECT g, CAST(count(*) AS BIGINT) AS n_in,
      |         CAST(sum(abs(x - xlag)) AS BIGINT) AS saei
      |       FROM ins GROUP BY 1)
      |SELECT mt.g AS event_type, n_test, n_in,
      |       round(CAST(saen AS DOUBLE) / n_test, 6) AS mae_naive,
      |       round(CAST(saes AS DOUBLE) / n_test, 6) AS mae_snaive,
      |       CASE WHEN saei = 0 THEN NULL
      |            ELSE round((CAST(saes AS DOUBLE) / n_test) /
      |                       (CAST(saei AS DOUBLE) / n_in), 6) END
      |         AS mase_snaive
      |FROM mt JOIN mi USING (g)""".stripMargin

  /** Split-conformal 80% intervals around the seasonal-naive daily
    * forecast, per event type: 14-day calibration window, 7-day test
    * horizon, weekly season — see
    * [[graft.ops.TimeSeries.conformalSnaiveIntervals]].
    */
  private def evForecastConformal(s: SparkSession, dir: String): DataFrame =
    TimeSeries.conformalSnaiveIntervals(Tables.events(s, dir),
      "event_type", "ts", horizon = 7, season = 7, calib = 14,
      alphaPct = 20)

  private val evForecastConformalSql =
    """WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |         CAST(count(*) AS BIGINT) AS x
      |       FROM events GROUP BY 1, 2),
      |cut AS (SELECT max(day) - 7 AS tcut, max(day) - 21 AS ccut
      |        FROM daily),
      |lg AS (SELECT g, day + 7 AS day, x AS xlag FROM daily),
      |cal AS (SELECT daily.g, daily.day, abs(daily.x - lg.xlag) AS r
      |        FROM daily CROSS JOIN cut JOIN lg USING (g, day)
      |        WHERE daily.day > ccut AND daily.day <= tcut),
      |rk AS (SELECT g, r,
      |         row_number() OVER (PARTITION BY g ORDER BY r, day) AS rk,
      |         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
      |       FROM cal),
      |q AS (SELECT g, n AS n_cal, r AS q_resid FROM rk
      |      WHERE rk = least(n, (80 * (n + 1) + 99) // 100)),
      |te AS (SELECT daily.g, daily.x, lg.xlag
      |       FROM daily CROSS JOIN cut JOIN lg USING (g, day)
      |       WHERE daily.day > tcut)
      |SELECT te.g AS event_type, q.n_cal, q.q_resid,
      |       CAST(count(*) AS BIGINT) AS n_test,
      |       CAST(sum(CASE WHEN abs(te.x - te.xlag) <= q.q_resid
      |         THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
      |       round(CAST(sum(CASE WHEN abs(te.x - te.xlag) <= q.q_resid
      |         THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS coverage,
      |       round(CAST(0.8 AS DOUBLE), 6) AS target
      |FROM te JOIN q USING (g)
      |GROUP BY 1, 2, 3""".stripMargin

  /** Top-5 periodogram frequencies of the daily count series — the
    * dominant seasonality periods in days. See
    * [[graft.ops.TimeSeries.periodogram]] for the integer-exact DFT
    * recipe (×10⁶ BIGINT weights, N-scaled centering).
    */
  private def evPeriodogram(s: SparkSession, dir: String): DataFrame =
    TimeSeries.periodogram(Tables.events(s, dir), "ts", topK = 5)

  private val evPeriodogramSql =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
      |i AS (SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT)
      |    AS t, x FROM d),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx FROM i),
      |ks AS (SELECT n, sx, CAST(unnest(generate_series(1,
      |    CAST(n // 2 AS BIGINT))) AS BIGINT) AS k FROM tot),
      |terms AS (SELECT ks.k, ks.n, ks.n * i.x - ks.sx AS y,
      |    CAST(round(cos(2 * pi() * (CAST((ks.k * i.t) % ks.n AS DOUBLE)
      |      / CAST(ks.n AS DOUBLE))) * 1000000.0) AS BIGINT) AS wc,
      |    CAST(round(sin(2 * pi() * (CAST((ks.k * i.t) % ks.n AS DOUBLE)
      |      / CAST(ks.n AS DOUBLE))) * 1000000.0) AS BIGINT) AS ws
      |  FROM ks CROSS JOIN i),
      |coef AS (SELECT k, max(n) AS n,
      |    CAST(sum(y * wc) AS BIGINT) AS c,
      |    CAST(sum(y * ws) AS BIGINT) AS s
      |  FROM terms GROUP BY 1),
      |sc AS (SELECT k, n,
      |    round(CAST(n AS DOUBLE) / CAST(k AS DOUBLE), 6) AS period_days,
      |    round(((CAST(c AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)) *
      |           (CAST(c AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)) +
      |           (CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)) *
      |           (CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)))
      |          / CAST(n AS DOUBLE), 6) AS power
      |  FROM coef)
      |SELECT k, period_days, power,
      |  CAST(row_number() OVER (ORDER BY power DESC, k) AS BIGINT) AS rank
      |FROM sc QUALIFY rank <= 5""".stripMargin

  /** Hurst exponent (R/S over dyadic windows) of daily event counts —
    * long-range dependence in traffic. See
    * [[graft.ops.TimeSeries.hurstRs]].
    */
  private def evHurst(s: SparkSession, dir: String): DataFrame =
    TimeSeries.hurstRs(Tables.events(s, dir), "ts")

  private val evHurstSql =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
      |i AS (SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT)
      |    AS t, x FROM d),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM i),
      |ws AS (SELECT CAST(u.w AS BIGINT) AS w, tot.n
      |       FROM (SELECT unnest([4, 8, 16, 32]) AS w) u CROSS JOIN tot
      |       WHERE u.w * 2 <= tot.n),
      |bl AS (SELECT ws.w, i.t // ws.w AS b, i.t, i.x
      |       FROM ws CROSS JOIN i WHERE i.t < ws.w * (ws.n // ws.w)),
      |bs AS (SELECT w, b, CAST(sum(x) AS BIGINT) AS sx
      |       FROM bl GROUP BY 1, 2),
      |dv AS (SELECT bl.w, bl.b, bl.t, bl.w * bl.x - bs.sx AS dd
      |       FROM bl JOIN bs USING (w, b)),
      |cm AS (SELECT w, b, dd,
      |         CAST(sum(dd) OVER (PARTITION BY w, b ORDER BY t)
      |           AS BIGINT) AS cy
      |       FROM dv),
      |pb AS (SELECT w, b, CAST(max(cy) - min(cy) AS BIGINT) AS rsc,
      |         CAST(sum(dd * dd) AS BIGINT) AS ssd
      |       FROM cm GROUP BY 1, 2),
      |rs AS (SELECT w, CAST(round(((CAST(rsc AS DOUBLE) /
      |           CAST(w AS DOUBLE)) /
      |         sqrt(CAST(ssd AS DOUBLE) / (CAST(w AS DOUBLE) *
      |           CAST(w AS DOUBLE) * CAST(w AS DOUBLE)))) *
      |         1000000000.0) AS BIGINT) AS rsp
      |       FROM pb WHERE ssd > 0),
      |aw AS (SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
      |         CAST(sum(rsp) AS BIGINT) AS srs
      |       FROM rs GROUP BY 1),
      |pts AS (SELECT w, n_blocks,
      |    round((CAST(srs AS DOUBLE) / 1000000000.0) /
      |      CAST(n_blocks AS DOUBLE), 6) AS avg_rs,
      |    CAST(round(ln(CAST(w AS DOUBLE)) * 1000000000.0) AS HUGEINT)
      |      AS lx,
      |    CAST(round(ln((CAST(srs AS DOUBLE) / 1000000000.0) /
      |      CAST(n_blocks AS DOUBLE)) * 1000000000.0) AS HUGEINT) AS ly
      |  FROM aw),
      |mom AS (SELECT CAST(count(*) AS HUGEINT) AS np,
      |    CAST(sum(lx) AS HUGEINT) AS slx,
      |    CAST(sum(ly) AS HUGEINT) AS sly,
      |    CAST(sum(lx * lx) AS HUGEINT) AS slxx,
      |    CAST(sum(lx * ly) AS HUGEINT) AS slxy
      |  FROM pts),
      |h AS (SELECT CASE WHEN np >= 2 AND np * slxx - slx * slx <> 0
      |    THEN round(CAST(np * slxy - slx * sly AS DOUBLE) /
      |      CAST(np * slxx - slx * slx AS DOUBLE), 6) END AS hurst
      |  FROM mom)
      |SELECT pts.w, pts.n_blocks, pts.avg_rs, h.hurst
      |FROM pts CROSS JOIN h""".stripMargin

  /** Top-20 Poisson burst-surprise days per event type — exact
    * KL/Chernoff spike scores. See
    * [[graft.ops.TimeSeries.burstSurprise]].
    */
  private def evBurstSurprise(s: SparkSession, dir: String): DataFrame =
    TimeSeries.burstSurprise(Tables.events(s, dir), "ts", "event_type",
      topK = 20)

  private val evBurstSurpriseSql =
    """WITH d AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
      |cal AS (SELECT CAST(datediff('day', min(CAST(ts AS DATE)),
      |    max(CAST(ts AS DATE))) + 1 AS BIGINT) AS n_days FROM events),
      |t AS (SELECT g, CAST(sum(x) AS BIGINT) AS tx FROM d GROUP BY 1),
      |s AS (SELECT d.g, d.day, d.x,
      |    round(CAST(tx AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
      |      AS lambda,
      |    CASE WHEN CAST(d.x AS DOUBLE) >
      |        CAST(tx AS DOUBLE) / CAST(n_days AS DOUBLE)
      |      THEN round(CAST(d.x AS DOUBLE) * ln(CAST(d.x AS DOUBLE) /
      |          (CAST(tx AS DOUBLE) / CAST(n_days AS DOUBLE))) -
      |        (CAST(d.x AS DOUBLE) -
      |          CAST(tx AS DOUBLE) / CAST(n_days AS DOUBLE)), 6)
      |      ELSE 0.0 END AS surprise
      |  FROM d JOIN t USING (g) CROSS JOIN cal)
      |SELECT g, day, x, lambda, surprise,
      |  CAST(row_number() OVER (ORDER BY surprise DESC, g, day)
      |    AS BIGINT) AS rank
      |FROM s QUALIFY rank <= 20""".stripMargin

  /** Granger LR screen between daily click and purchase volumes, both
    * directions — does the lead PREDICT, incrementally over the
    * target's own AR(1) history. See
    * [[graft.ops.TimeSeries.grangerLr]].
    */
  private def evGranger(s: SparkSession, dir: String): DataFrame =
    TimeSeries.grangerLr(Tables.events(s, dir), "ts", "event_type",
      "click", "purchase")

  private val evGrangerSql =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1),
      |r AS (SELECT row_number() OVER (ORDER BY day) AS rn, a, b FROM d),
      |l AS (SELECT c.a, c.b, p.a AS ap, p.b AS bp
      |      FROM r c JOIN r p ON p.rn + 1 = c.rn),
      |mom AS (
      |  SELECT 'click->purchase' AS direction,
      |    CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(bp) AS BIGINT) AS s1, CAST(sum(ap) AS BIGINT) AS s2,
      |    CAST(sum(b) AS BIGINT) AS sy,
      |    CAST(sum(CAST(bp AS HUGEINT) * bp) AS HUGEINT) AS s11,
      |    CAST(sum(CAST(ap AS HUGEINT) * ap) AS HUGEINT) AS s22,
      |    CAST(sum(CAST(bp AS HUGEINT) * ap) AS HUGEINT) AS s12,
      |    CAST(sum(CAST(bp AS HUGEINT) * b) AS HUGEINT) AS s1y,
      |    CAST(sum(CAST(ap AS HUGEINT) * b) AS HUGEINT) AS s2y,
      |    CAST(sum(CAST(b AS HUGEINT) * b) AS HUGEINT) AS syy
      |  FROM l
      |  UNION ALL
      |  SELECT 'purchase->click',
      |    CAST(count(*) AS BIGINT),
      |    CAST(sum(ap) AS BIGINT), CAST(sum(bp) AS BIGINT),
      |    CAST(sum(a) AS BIGINT),
      |    CAST(sum(CAST(ap AS HUGEINT) * ap) AS HUGEINT),
      |    CAST(sum(CAST(bp AS HUGEINT) * bp) AS HUGEINT),
      |    CAST(sum(CAST(ap AS HUGEINT) * bp) AS HUGEINT),
      |    CAST(sum(CAST(ap AS HUGEINT) * a) AS HUGEINT),
      |    CAST(sum(CAST(bp AS HUGEINT) * a) AS HUGEINT),
      |    CAST(sum(CAST(a AS HUGEINT) * a) AS HUGEINT)
      |  FROM l),
      |f1 AS (SELECT direction, m, CAST(m AS DOUBLE) AS md,
      |    CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
      |    CAST(sy AS DOUBLE) AS syd, CAST(s11 AS DOUBLE) AS s11d,
      |    CAST(s22 AS DOUBLE) AS s22d, CAST(s12 AS DOUBLE) AS s12d,
      |    CAST(s1y AS DOUBLE) AS s1yd, CAST(s2y AS DOUBLE) AS s2yd,
      |    CAST(syy AS DOUBLE) AS syyd
      |  FROM mom),
      |f2 AS (SELECT *,
      |    md * s11d - s1d * s1d AS denr,
      |    md * (s11d * s22d - s12d * s12d) -
      |      s1d * (s1d * s22d - s12d * s2d) +
      |      s2d * (s1d * s12d - s11d * s2d) AS det,
      |    syd * (s11d * s22d - s12d * s12d) -
      |      s1d * (s1yd * s22d - s12d * s2yd) +
      |      s2d * (s1yd * s12d - s11d * s2yd) AS det0,
      |    md * (s1yd * s22d - s12d * s2yd) -
      |      syd * (s1d * s22d - s12d * s2d) +
      |      s2d * (s1d * s2yd - s1yd * s2d) AS det1,
      |    md * (s11d * s2yd - s1yd * s12d) -
      |      s1d * (s1d * s2yd - s1yd * s2d) +
      |      syd * (s1d * s12d - s11d * s2d) AS det2
      |  FROM f1),
      |f3 AS (SELECT *, (md * s1yd - s1d * syd) / denr AS br,
      |    det0 / det AS b0, det1 / det AS b1, det2 / det AS b2
      |  FROM f2),
      |f4 AS (SELECT *, (syd - br * s1d) / md AS ar FROM f3),
      |f5 AS (SELECT direction, m, md, denr, det,
      |    syyd - ar * syd - br * s1yd AS rssr,
      |    syyd - b0 * syd - b1 * s1yd - b2 * s2yd AS rssu
      |  FROM f4),
      |f6 AS (SELECT direction, m AS n_obs,
      |    CASE WHEN m > 3 AND denr <> 0 AND det <> 0 AND rssu > 0
      |      THEN round(md * ln(rssr / rssu), 6) END AS lr_stat
      |  FROM f5)
      |SELECT direction, n_obs, lr_stat, lr_stat > 3.841459 AS reject
      |FROM f6""".stripMargin

  /** Ljung–Box whiteness test on each type's daily counts (h=7,
    * α=0.05) — which event streams can be treated as i.i.d. and which
    * carry autocorrelation structure. See
    * [[graft.ops.TimeSeries.ljungBox]].
    */
  private def evLjungBox(s: SparkSession, dir: String): DataFrame =
    TimeSeries.ljungBox(Tables.events(s, dir), "ts", "event_type")

  private val evLjungBoxSql =
    """WITH obs AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |              CAST(count(*) AS BIGINT) AS x
      |            FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
      |grp AS (SELECT DISTINCT g FROM obs),
      |d AS (SELECT grp.g, days.day, coalesce(obs.x, 0) AS x
      |      FROM grp CROSS JOIN days
      |      LEFT JOIN obs ON obs.g = grp.g AND obs.day = days.day),
      |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS s
      |       FROM d GROUP BY 1 HAVING count(*) > 8),
      |r AS (SELECT d.g, st.n,
      |        row_number() OVER (PARTITION BY d.g ORDER BY day) AS rn,
      |        st.n * d.x - st.s AS dev
      |      FROM d JOIN st ON st.g = d.g),
      |den AS (SELECT g, CAST(sum(CAST(dev AS HUGEINT) * dev) AS HUGEINT)
      |          AS den
      |        FROM r GROUP BY 1),
      |rho AS (SELECT a.g, b.rn - a.rn AS k,
      |          CASE WHEN den.den > 0 THEN CAST(round(1e6 *
      |            CAST(sum(CAST(a.dev AS HUGEINT) * b.dev) AS DOUBLE) /
      |            CAST(den.den AS DOUBLE)) AS BIGINT) END AS rho6
      |        FROM r a JOIN r b ON a.g = b.g
      |          AND b.rn - a.rn BETWEEN 1 AND 7
      |        JOIN den ON den.g = a.g
      |        GROUP BY a.g, b.rn - a.rn, den.den),
      |t AS (SELECT rho.g, st.n,
      |        CASE WHEN rho6 IS NOT NULL THEN
      |          CAST(round(CAST(rho6 * rho6 AS DOUBLE) /
      |            (1e3 * CAST(st.n - rho.k AS DOUBLE))) AS BIGINT)
      |        END AS t9
      |      FROM rho JOIN st ON st.g = rho.g),
      |q AS (SELECT g, n, CAST(sum(t9) AS BIGINT) AS s9, count(t9) AS n_t
      |      FROM t GROUP BY 1, 2),
      |f AS (SELECT g AS event_type, n AS n_days,
      |        CASE WHEN n_t = 7 THEN
      |          round(CAST(n * (n + 2) AS DOUBLE) *
      |            (CAST(s9 AS DOUBLE) / 1e9), 6) END AS q_stat
      |      FROM q)
      |SELECT event_type, n_days, q_stat,
      |       q_stat > 14.067140 AS lb_reject
      |FROM f""".stripMargin

  def qs: Seq[QueryDef] = Seq(
    QueryDef("ev_ljung_box", evLjungBox, Some(evLjungBoxSql)),
    QueryDef("ev_granger_leadlag", evGranger, Some(evGrangerSql)),
    QueryDef("ev_periodogram", evPeriodogram, Some(evPeriodogramSql)),
    QueryDef("ev_hurst_rs", evHurst, Some(evHurstSql)),
    QueryDef("ev_burst_surprise", evBurstSurprise,
      Some(evBurstSurpriseSql)),
    QueryDef("ev_forecast_conformal", evForecastConformal,
      Some(evForecastConformalSql)),
    QueryDef("ev_holt_winters_daily", evHoltWinters,
      Some(evHoltWintersSql)),
    QueryDef("ev_seasonal_decompose", evSeasonal, Some(evSeasonalSql)),
    QueryDef("ev_ols_trend_by_type", evOlsTrend, Some(evOlsTrendSql)),
    QueryDef("ev_fano_burstiness", evFano, Some(evFanoSql)),
    QueryDef("ev_holt_daily", evHoltDaily, Some(evHoltDailySql)),
    QueryDef("ev_theilsen_trend", evTheilSen, Some(evTheilSenSql)),
    QueryDef("ev_forecast_backtest", evForecastBacktest,
      Some(evForecastBacktestSql)),
    QueryDef("ev_impact_welch", evImpactWelch, Some(evImpactWelchSql)),
    QueryDef("ev_dow_seasonality", evDowSeasonality,
      Some(evDowSeasonalitySql)),
    QueryDef("ev_ewma_daily", evEwmaDaily, Some(evEwmaDailySql)),
    QueryDef("ev_kalman_level", evKalmanLevel, Some(evKalmanLevelSql)),
    QueryDef("ev_cusum_changepoint", evCusum, Some(evCusumSql)),
    QueryDef("ev_autocorr_daily", evAutocorr, Some(evAutocorrSql)),
    QueryDef("ev_crosscorr_leadlag", evCrossCorr, Some(evCrossCorrSql)),
    QueryDef("ev_pettitt_changepoint", evPettitt, Some(evPettittSql)),
  )
}
