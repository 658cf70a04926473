package graft.queries

import graft.Tables
import graft.ops.{Analytics, Forget, Graph, Incremental, Skew}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-analytics shapes over the events table that round out the
  * warehouse surface: pivot (long→wide), time-range rolling windows,
  * population-statistics outlier flagging, and a Deequ-style data-quality
  * constraint suite. All exact, all hash-gated against DuckDB.
  */
object AnalyticsQueries {

  /** Daily event counts pivoted to one column per event type. The pivot
    * value list is EXPLICIT: with pinned values Spark compiles the pivot
    * to a single map-side-combinable groupBy over `pivot_count`
    * conditionals — one shuffle on `day`, schema fixed at plan time. An
    * unpinned pivot first runs a distinct job to discover values and
    * collects them to the driver — never do that over 100 TB when the
    * domain is known (and when it isn't, a long-format groupBy is the
    * honest shape; the wide layout only exists for humans).
    */
  private def evPivotDayType(s: SparkSession, dir: String): DataFrame =
    Analytics.pivotCounts(Tables.events(s, dir), to_date(col("ts")), "day",
      "event_type", Seq("click", "error", "purchase", "signup", "view"))

  private val evPivotDayTypeSql =
    """SELECT CAST(ts AS DATE) AS day,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY 1""".stripMargin

  /** Per-user trailing-7-day activity at every event: count and value
    * sum over the time-RANGE frame [ts − 7 d, ts]. The frame is over
    * epoch MICROSECONDS on both engines — a seconds-granularity cast
    * would disagree with the oracle on events sharing a boundary
    * second. One shuffle on `user_id`; the frame scan is linear per
    * partition (two pointers), and per-user history is bounded by human
    * activity — the partition key that grows with corpus size is users,
    * not events-per-user, so the shape holds at 100 TB.
    */
  private def evUserRolling7d(s: SparkSession, dir: String): DataFrame =
    Analytics.rollingByKey(Tables.events(s, dir), "user_id", "ts", "value",
      windowMicros = 7L * 24 * 3600 * 1000000,
      outCols = Seq("event_id", "user_id"))

  private val evUserRolling7dSql =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS roll_cnt,
      |  round(sum(value) OVER w, 6) AS roll_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Population z-score outliers: events whose value sits >= 2.5
    * sample standard deviations from their type's mean. The per-type
    * statistics table is tiny (one row per event type) and BROADCAST to
    * the second scan, so flagging is map-side — no second shuffle, no
    * window over the full stream. The filter compares the ROUNDED score
    * so the oracle cannot disagree on a boundary ulp.
    */
  private def evAnomalyZscore(s: SparkSession, dir: String): DataFrame =
    Analytics.zscoreOutliers(Tables.events(s, dir), "event_type", "value",
      minZ = 2.5, outCols = Seq("event_id", "event_type", "value"))
      .withColumn("value", round(col("value"), 6))

  private val evAnomalyZscoreSql =
    """WITH s AS (SELECT event_type, avg(value) AS m,
      |                  stddev_samp(value) AS sd
      |           FROM events GROUP BY 1)
      |SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
      |       round((e.value - s.m) / s.sd, 6) AS z
      |FROM events e JOIN s ON s.event_type = e.event_type
      |WHERE abs(round((e.value - s.m) / s.sd, 6)) >= 2.5""".stripMargin

  /** Deequ-style data-quality constraint suite, one row per constraint:
    * (`constraint`, `metric` value, `passed`). Completeness, key
    * uniqueness, value bounds, domain conformance, and freshness — the
    * standard pre-ingest gate — computed in ONE full scan (a single
    * multi-aggregate; `count_distinct` rides the same job) and
    * unpivoted with `stack`. At 100 TB the scan is the cost floor for
    * any audit; this suite adds nothing beyond it.
    */
  private def dqConstraintsEvents(s: SparkSession, dir: String): DataFrame = {
    import Analytics.Constraint
    val allowed = Seq("click", "error", "purchase", "signup", "view")
    Analytics.dqSuite(Tables.events(s, dir),
      aggs = Seq(
        (count(col("user_id")) / count(lit(1))).as("uid_complete"),
        (count_distinct(col("event_id")) === count(lit(1)))
          .cast("double").as("eid_unique"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"),
        sum(when(!col("event_type").isin(allowed: _*), 1L).otherwise(0L))
          .cast("double").as("bad_domain"),
        max(col("ts")).cast("date").cast("string").as("max_day")),
      constraints = Seq(
        Constraint("completeness_user_id", round(col("uid_complete"), 6),
          col("uid_complete") === 1.0),
        Constraint("unique_event_id", col("eid_unique"),
          col("eid_unique") === 1.0),
        Constraint("value_in_bounds", round(col("v_max"), 6),
          col("v_min") >= 0.0 && col("v_max") <= 1000.0),
        Constraint("domain_event_type", col("bad_domain"),
          col("bad_domain") === 0.0),
        Constraint("freshness_max_day", lit(null),
          col("max_day") >= "2024-01-25")))
  }

  private val dqConstraintsEventsSql =
    """WITH a AS (
      |  SELECT count(user_id)::DOUBLE / count(*) AS uid_complete,
      |         CASE WHEN count(DISTINCT event_id) = count(*)
      |              THEN 1.0 ELSE 0.0 END AS eid_unique,
      |         min(value) AS v_min, max(value) AS v_max,
      |         sum(CASE WHEN event_type NOT IN
      |               ('click','error','purchase','signup','view')
      |             THEN 1 ELSE 0 END)::DOUBLE AS bad_domain,
      |         CAST(CAST(max(ts) AS DATE) AS VARCHAR) AS max_day
      |  FROM events)
      |SELECT 'completeness_user_id' AS constraint,
      |       round(uid_complete, 6) AS metric,
      |       uid_complete = 1.0 AS passed FROM a
      |UNION ALL SELECT 'unique_event_id', eid_unique, eid_unique = 1.0 FROM a
      |UNION ALL SELECT 'value_in_bounds', round(v_max, 6),
      |       v_min >= 0.0 AND v_max <= 1000.0 FROM a
      |UNION ALL SELECT 'domain_event_type', bad_domain, bad_domain = 0.0 FROM a
      |UNION ALL SELECT 'freshness_max_day', NULL, max_day >= '2024-01-25' FROM a""".stripMargin

  /** Curriculum decile bins over the document quality score — the
    * "order the corpus easy→hard" assignment done the scale-correct
    * way: 9 exact global thresholds broadcast, binning scan-side. A
    * `ntile(10) OVER (ORDER BY quality)` would sort the corpus on one
    * partition. The score is [[graft.ops.TextAnalysis.qualityScore]]
    * (already 6dp-rounded — the same cross-engine parity the
    * `text_quality_gate` oracle pins).
    */
  private def docCurriculumBins(s: SparkSession, dir: String): DataFrame =
    Analytics.quantileBins(Tables.documents(s, dir),
      graft.ops.TextAnalysis.qualityScore(col("text")), k = 10,
      outCols = Seq("doc_id"))

  private val docCurriculumBinsSql =
    """WITH b AS (
      |  SELECT doc_id, trim(text) AS t,
      |    CAST(greatest(length(trim(text)), 1) AS DOUBLE) AS len,
      |    CAST(greatest(length(string_split_regex(lower(trim(text)), '\s+')), 1)
      |         AS DOUBLE) AS ntoks
      |  FROM documents),
      |q AS (SELECT doc_id,
      |  round(((len - length(regexp_replace(t, '[a-zA-Z]', '', 'g'))) / len) * 0.5
      |    + (CASE WHEN length(regexp_replace(t, '\s+', '', 'g')) / ntoks
      |            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.25
      |    + (CASE WHEN length(t) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.25,
      |    6) AS score
      |  FROM b),
      |thr AS (SELECT list_transform(
      |          quantile_cont(score, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
      |          t -> round(t, 6)) AS ts
      |        FROM q)
      |SELECT q.doc_id, q.score,
      |       CAST(length(list_filter(thr.ts, t -> t < q.score)) AS INT) AS bin
      |FROM q, thr""".stripMargin

  /** GDPR erasure audit over the TPC-H FK chain: a deterministic 2%
    * of customers file deletion requests (the same portable
    * md5-threshold predicate as [[graft.ops.Sampling]], so the seed is
    * reproducible in any engine), and the cascade walks
    * customer → orders → lineitem reporting per-table deleted/kept
    * counts.
    */
  private def gdprForgetCascade(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Forget, Sampling}
    val cust = Tables.customer(s, dir)
    val seed = cust
      .filter(Sampling.keepExpr(col("c_custkey"), 0.02, "gdpr"))
      .select("c_custkey")
    Forget.cascadeCounts(seed, Seq(
      Forget.Level("customer", cust, "c_custkey", "c_custkey"),
      Forget.Level("orders", Tables.orders(s, dir), "o_custkey", "o_orderkey"),
      Forget.Level("lineitem", Tables.lineitem(s, dir), "l_orderkey", "l_orderkey")))
  }

  private val gdprForgetCascadeSql = {
    val thr = graft.ops.Sampling.hexThreshold(0.02)
    s"""WITH f AS (
       |  SELECT c_custkey FROM customer
       |  WHERE md5('gdpr:' || CAST(c_custkey AS VARCHAR)) < '$thr'),
       |od AS (SELECT DISTINCT o_orderkey FROM orders
       |       WHERE o_custkey IN (SELECT c_custkey FROM f))
       |SELECT 'customer' AS "table",
       |       (SELECT count(*) FROM f) AS n_deleted,
       |       (SELECT count(*) FROM customer) - (SELECT count(*) FROM f) AS n_kept
       |UNION ALL SELECT 'orders',
       |       (SELECT count(*) FROM od),
       |       (SELECT count(*) FROM orders) - (SELECT count(*) FROM od)
       |UNION ALL SELECT 'lineitem',
       |       (SELECT count(*) FROM lineitem WHERE l_orderkey IN
       |          (SELECT o_orderkey FROM od)),
       |       (SELECT count(*) FROM lineitem) -
       |       (SELECT count(*) FROM lineitem WHERE l_orderkey IN
       |          (SELECT o_orderkey FROM od))""".stripMargin
  }

  /** Subject-access (DSAR) manifest for the same pinned 2% seed set as
    * `gdpr_forget_cascade`: per subject, the row count held in each
    * table along the FK chain — the read counterpart of the erasure
    * audit. See [[graft.ops.Forget.subjectAccessReport]].
    */
  private def gdprSubjectAccess(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Forget, Sampling}
    val cust = Tables.customer(s, dir)
    val seed = cust
      .filter(Sampling.keepExpr(col("c_custkey"), 0.02, "gdpr"))
      .select("c_custkey")
    val orders = Tables.orders(s, dir)
    // lineitem is keyed by orderkey; carry the subject through the
    // parent's (subject, orderkey) projection
    val liWithSubject = Tables.lineitem(s, dir)
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("li_subject"))
    Forget.subjectAccessReport(seed, Seq(
      ("customer", cust, "c_custkey"),
      ("orders", orders, "o_custkey"),
      ("lineitem", liWithSubject, "li_subject")))
  }

  private val gdprSubjectAccessSql = {
    val thr = graft.ops.Sampling.hexThreshold(0.02)
    s"""WITH f AS (
       |  SELECT c_custkey FROM customer
       |  WHERE md5('gdpr:' || CAST(c_custkey AS VARCHAR)) < '$thr')
       |SELECT c_custkey AS subject, 'customer' AS "table",
       |       CAST(count(*) AS BIGINT) AS n_rows
       |FROM customer JOIN f USING (c_custkey) GROUP BY 1
       |UNION ALL
       |SELECT o_custkey, 'orders', CAST(count(*) AS BIGINT)
       |FROM orders JOIN f ON o_custkey = c_custkey GROUP BY 1
       |UNION ALL
       |SELECT o_custkey, 'lineitem', CAST(count(*) AS BIGINT)
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN f ON o_custkey = c_custkey GROUP BY 1""".stripMargin
  }

  /** Rebalance the document corpus to a uniform language mixture (the
    * synthetic corpus is en-heavy ~3.4:1): data-derived per-language
    * rates, pinned md5 keep decision — see
    * [[graft.ops.Sampling.rebalanceGroups]].
    */
  private def docLangRebalance(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.rebalanceGroups(
      Tables.documents(s, dir).select("doc_id", "lang"), "doc_id", "lang")

  private val docLangRebalanceSql =
    """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      |m AS (SELECT min(n) AS mn FROM c)
      |SELECT d.lang, d.doc_id
      |FROM documents d JOIN c ON c.lang = d.lang, m
      |WHERE CAST(m.mn AS DOUBLE) / CAST(c.n AS DOUBLE) >= 1.0
      |   OR md5('mix:' || CAST(d.doc_id AS VARCHAR)) <
      |      lpad(lower(hex(CAST(floor(CAST(m.mn AS DOUBLE) / CAST(c.n AS DOUBLE)
      |                                * 4294967296.0) AS BIGINT))), 8, '0')""".stripMargin

  /** Gap-filled daily error counts with a running total — absent days
    * are explicit zeros from a generated date spine, so "no errors"
    * and "no data" stop aliasing. See
    * [[graft.ops.Analytics.dailySpineCumulative]].
    */
  private def evDailyErrorCumulative(s: SparkSession, dir: String): DataFrame =
    Analytics.dailySpineCumulative(
      Tables.events(s, dir).filter(col("event_type") === "error"), col("ts"))

  private val evDailyErrorCumulativeSql =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
      |           FROM events WHERE event_type = 'error' GROUP BY 1),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
      |s AS (SELECT CAST(unnest(generate_series(b.d0, b.d1,
      |               INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      |f AS (SELECT s.day, coalesce(d.n, 0) AS n
      |      FROM s LEFT JOIN d USING (day))
      |SELECT day, n,
      |       CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
      |            AS BIGINT) AS cum_n
      |FROM f""".stripMargin

  /** SCD Type-2 history build over the event stream: per user,
    * consecutive duplicate event types collapse (a re-stated value is
    * not a new version) and each surviving change carries its
    * [valid_from, valid_to) interval, null-terminated for the current
    * row. See [[graft.ops.Merge.scd2]].
    */
  private def evScd2(s: SparkSession, dir: String): DataFrame =
    graft.ops.Merge.scd2(
        Tables.events(s, dir)
          .select("user_id", "event_id", "ts", "event_type"),
        "user_id", "ts", "event_id", "event_type")
      .select("user_id", "event_id", "event_type", "valid_from",
        "valid_to", "is_current")

  private val evScd2Sql =
    """WITH c AS (SELECT user_id, event_id, event_type, ts,
      |             lag(event_type) OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS prev
      |           FROM events),
      |ch AS (SELECT user_id, event_id, event_type, ts FROM c
      |       WHERE prev IS NULL OR event_type <> prev)
      |SELECT user_id, event_id, event_type, ts AS valid_from,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |         AS valid_to,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |         IS NULL AS is_current
      |FROM ch""".stripMargin

  /** Referential-integrity audit over the TPC-H star schema's six FK
    * edges: orphaned child rows (violations — 0 on healthy fixtures)
    * and unreferenced parent keys (the dead-dimension / truncated-load
    * signal — live numbers here: customers without orders exist by
    * construction). See [[graft.ops.Analytics.refIntegrity]].
    */
  private def dqFkIntegrity(s: SparkSession, dir: String): DataFrame =
    Analytics.refIntegrity(Seq(
      ("lineitem.l_orderkey->orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey"),
      ("lineitem.l_partkey->part", Tables.lineitem(s, dir), "l_partkey",
        Tables.part(s, dir), "p_partkey"),
      ("lineitem.l_suppkey->supplier", Tables.lineitem(s, dir), "l_suppkey",
        Tables.supplier(s, dir), "s_suppkey"),
      ("orders.o_custkey->customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"),
      ("customer.c_nationkey->nation", Tables.customer(s, dir), "c_nationkey",
        Tables.nation(s, dir), "n_nationkey"),
      ("nation.n_regionkey->region", Tables.nation(s, dir), "n_regionkey",
        Tables.region(s, dir), "r_regionkey")))

  private val dqFkIntegritySql = Seq(
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
    .map { case (name, c, fk, p, pk) =>
      s"""SELECT '$name' AS edge,
         |  (SELECT count(*) FROM $c WHERE $fk IS NOT NULL AND NOT EXISTS
         |     (SELECT 1 FROM $p WHERE $pk = $c.$fk)) AS orphan_fk_rows,
         |  (SELECT count(*) FROM (SELECT DISTINCT $pk AS k FROM $p) pp
         |   WHERE NOT EXISTS (SELECT 1 FROM $c WHERE $fk = pp.k))
         |    AS unreferenced_parents""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Per-user next-event transition matrix (first-order Markov):
    * adjacent event-type steps ordered by (ts, event_id) — the tie
    * column pins simultaneous events so both engines see the same
    * sequences — with row-normalized probabilities. See
    * [[graft.ops.Analytics.transitionMatrix]].
    */
  private def evTransitionMatrix(s: SparkSession, dir: String): DataFrame =
    Analytics.transitionMatrix(Tables.events(s, dir), "user_id", "ts",
      "event_id", "event_type")

  private val evTransitionMatrixSql =
    """WITH o AS (SELECT event_type AS from_type,
      |             lead(event_type) OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS to_type
      |           FROM events),
      |c AS (SELECT from_type, to_type, count(*) AS cnt
      |      FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS n
      |        FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.cnt,
      |       round(c.cnt * 1.0 / tot.n, 6) AS prob
      |FROM c JOIN tot USING (from_type)""".stripMargin

  /** Last-click attribution of purchases to the most recent
    * click/view/signup touch within 24h, else "direct" — see
    * [[graft.ops.Analytics.lastTouchAttribution]].
    */
  private def evAttribution(s: SparkSession, dir: String): DataFrame =
    Analytics.lastTouchAttribution(Tables.events(s, dir), "user_id",
      "ts", "event_id", "event_type", conversionType = "purchase",
      touchTypes = Seq("click", "view", "signup"), windowSec = 86400L)

  private val evAttributionSql =
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         max(CASE WHEN event_type IN ('click', 'view', 'signup')
      |                  THEN {'ts': ts, 'tie': event_id,
      |                        'ch': event_type} END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS lt
      |  FROM events),
      |p AS (SELECT CASE WHEN lt IS NULL
      |               OR epoch(ts)::BIGINT - epoch(lt.ts)::BIGINT > 86400
      |             THEN 'direct' ELSE lt.ch END AS channel
      |      FROM o WHERE event_type = 'purchase'),
      |t AS (SELECT count(*) AS tot FROM p)
      |SELECT channel, count(*) AS conversions,
      |       round(count(*) * 1.0 / t.tot, 6) AS share
      |FROM p CROSS JOIN t GROUP BY 1, t.tot""".stripMargin

  /** Cohort LTV triangle (signup epoch-week × weeks-since) — see
    * [[graft.ops.Analytics.cohortLtv]].
    */
  private def evCohortLtv(s: SparkSession, dir: String): DataFrame =
    Analytics.cohortLtv(Tables.events(s, dir), "user_id", "ts",
      "event_type", "signup", "purchase", "value")

  private val evCohortLtvSql =
    """WITH s AS (SELECT user_id AS u, min(CAST(ts AS DATE)) AS sd
      |           FROM events WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT u, sd,
      |         datediff('day', DATE '1970-01-01', sd) // 7 AS cw
      |       FROM s),
      |sz AS (SELECT cw, count(*) AS n_users FROM s2 GROUP BY 1),
      |p AS (SELECT user_id AS u, CAST(ts AS DATE) AS pd, value AS v
      |      FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT s2.cw, datediff('day', s2.sd, p.pd) // 7
      |        AS weeks_since,
      |        round(sum(p.v), 2) AS revenue
      |      FROM p JOIN s2 USING (u) WHERE p.pd >= s2.sd GROUP BY 1, 2),
      |w AS (SELECT c.cw, c.weeks_since, sz.n_users, c.revenue,
      |        round(sum(c.revenue) OVER (PARTITION BY c.cw
      |          ORDER BY c.weeks_since), 2) AS cum_revenue
      |      FROM c JOIN sz USING (cw))
      |SELECT cw AS cohort_week, weeks_since, n_users, revenue,
      |       cum_revenue, round(cum_revenue / n_users, 6) AS ltv_per_user
      |FROM w""".stripMargin

  /** Linear multi-touch attribution twin of the last-click report —
    * see [[graft.ops.Analytics.linearAttribution]].
    */
  private def evAttributionLinear(s: SparkSession, dir: String): DataFrame =
    Analytics.linearAttribution(Tables.events(s, dir), "user_id", "ts",
      "event_id", "event_type", conversionType = "purchase",
      touchTypes = Seq("click", "view", "signup"), windowSec = 86400L)

  private val evAttributionLinearSql =
    """WITH c AS (SELECT user_id AS k, ts AS cts, event_id AS ctie
      |           FROM events WHERE event_type = 'purchase'),
      |t AS (SELECT user_id AS k, ts AS tts, event_id AS ttie,
      |             event_type AS ch
      |      FROM events WHERE event_type IN ('click', 'view', 'signup')),
      |j AS (SELECT c.k, c.cts, c.ctie, t.ch
      |      FROM c LEFT JOIN t ON c.k = t.k
      |        AND (t.tts < c.cts
      |             OR (t.tts = c.cts AND t.ttie < c.ctie))
      |        AND epoch(c.cts)::BIGINT - epoch(t.tts)::BIGINT <= 86400),
      |n AS (SELECT k, cts, ctie, ch,
      |        count(ch) OVER (PARTITION BY k, cts, ctie) AS nt
      |      FROM j),
      |cr AS (SELECT coalesce(ch, 'direct') AS channel,
      |         CASE WHEN nt = 0 THEN 1.0 ELSE 1.0 / nt END AS credit
      |       FROM n)
      |SELECT channel, CAST(count(*) AS BIGINT) AS touches,
      |       round(sum(credit), 6) AS credited
      |FROM cr GROUP BY 1""".stripMargin

  /** Position-based (U-shaped 40/20/40) attribution — see
    * [[graft.ops.Analytics.positionAttribution]].
    */
  private def evAttributionUshape(s: SparkSession, dir: String): DataFrame =
    Analytics.positionAttribution(Tables.events(s, dir), "user_id", "ts",
      "event_id", "event_type", conversionType = "purchase",
      touchTypes = Seq("click", "view", "signup"), windowSec = 86400L)

  private val evAttributionUshapeSql =
    """WITH c AS (SELECT user_id AS k, ts AS cts, event_id AS ctie
      |           FROM events WHERE event_type = 'purchase'),
      |t AS (SELECT user_id AS k, ts AS tts, event_id AS ttie,
      |             event_type AS ch
      |      FROM events WHERE event_type IN ('click', 'view', 'signup')),
      |j AS (SELECT c.k, c.cts, c.ctie, t.tts, t.ttie, t.ch
      |      FROM c LEFT JOIN t ON c.k = t.k
      |        AND (t.tts < c.cts
      |             OR (t.tts = c.cts AND t.ttie < c.ctie))
      |        AND epoch(c.cts)::BIGINT - epoch(t.tts)::BIGINT <= 86400),
      |n AS (SELECT k, cts, ctie, ch,
      |        count(ch) OVER (PARTITION BY k, cts, ctie) AS nt,
      |        row_number() OVER (PARTITION BY k, cts, ctie
      |          ORDER BY tts, ttie) AS pos
      |      FROM j),
      |cr AS (SELECT coalesce(ch, 'direct') AS channel,
      |         CASE WHEN nt <= 1 THEN 1.0
      |              WHEN nt = 2 THEN 0.5
      |              WHEN pos = 1 OR pos = nt THEN 0.4
      |              ELSE 0.2 / (nt - 2) END AS credit
      |       FROM n)
      |SELECT channel, CAST(count(*) AS BIGINT) AS touches,
      |       round(sum(credit), 6) AS credited
      |FROM cr GROUP BY 1""".stripMargin

  /** Time-decay attribution with exact power-of-two half-life decay —
    * see [[graft.ops.Analytics.timeDecayAttribution]]. Half-life 6 h
    * inside the 24 h window: exponents 0..4, all weights dyadic.
    */
  private def evAttributionTimeDecay(s: SparkSession,
                                     dir: String): DataFrame =
    Analytics.timeDecayAttribution(Tables.events(s, dir), "user_id", "ts",
      "event_id", "event_type", conversionType = "purchase",
      touchTypes = Seq("click", "view", "signup"), windowSec = 86400L,
      halfLifeSec = 21600L)

  private val evAttributionTimeDecaySql =
    """WITH c AS (SELECT user_id AS k, ts AS cts, event_id AS ctie
      |           FROM events WHERE event_type = 'purchase'),
      |t AS (SELECT user_id AS k, ts AS tts, event_id AS ttie,
      |             event_type AS ch
      |      FROM events WHERE event_type IN ('click', 'view', 'signup')),
      |j AS (SELECT c.k, c.cts, c.ctie, t.ch,
      |        CASE WHEN t.ch IS NULL THEN 0.0
      |             ELSE pow(2.0, -floor(
      |               (epoch(c.cts)::BIGINT - epoch(t.tts)::BIGINT)
      |                 / 21600.0)) END AS w
      |      FROM c LEFT JOIN t ON c.k = t.k
      |        AND (t.tts < c.cts
      |             OR (t.tts = c.cts AND t.ttie < c.ctie))
      |        AND epoch(c.cts)::BIGINT - epoch(t.tts)::BIGINT <= 86400),
      |n AS (SELECT ch, w,
      |        sum(w) OVER (PARTITION BY k, cts, ctie) AS tot
      |      FROM j),
      |cr AS (SELECT coalesce(ch, 'direct') AS channel,
      |         CASE WHEN tot = 0 THEN 1.0 ELSE w / tot END AS credit
      |       FROM n)
      |SELECT channel, CAST(count(*) AS BIGINT) AS touches,
      |       round(sum(credit), 6) AS credited
      |FROM cr GROUP BY 1""".stripMargin

  /** Stationary distribution of the event-type chain (12 pinned power
    * iterations, dangling mass renormalized) — see
    * [[graft.ops.Analytics.markovStationary]]. The oracle unrolls the
    * identical 6dp-pinned trajectory as generated CTEs.
    */
  private def evMarkovStationary(s: SparkSession, dir: String): DataFrame =
    Analytics.markovStationary(Tables.events(s, dir), "user_id", "ts",
      "event_id", "event_type", iters = 12)

  private val evMarkovStationarySql = {
    // MATERIALIZED: DuckDB inlines plain CTEs, and each iterate
    // references its step twice (cells + total) — the same 2^iters
    // plan doubling the Spark side avoids with localCheckpoint
    val iterCtes = (1 to 12).map { i =>
      s"""s$i AS MATERIALIZED (SELECT tm.to_type AS state,
         |  sum(p${i - 1}.p * tm.prob) AS pr
         |  FROM p${i - 1} JOIN tm ON tm.from_type = p${i - 1}.state
         |  GROUP BY 1),
         |t$i AS (SELECT sum(pr) AS tot FROM s$i),
         |p$i AS MATERIALIZED (SELECT states.state,
         |  round(coalesce(s$i.pr, 0.0) / t$i.tot, 6) AS p
         |  FROM states LEFT JOIN s$i USING (state) CROSS JOIN t$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH o AS (SELECT event_type AS from_type,
       |             lead(event_type) OVER (PARTITION BY user_id
       |               ORDER BY ts, event_id) AS to_type
       |           FROM events),
       |c AS (SELECT from_type, to_type, count(*) AS cnt
       |      FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |tot AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS n
       |        FROM c GROUP BY 1),
       |tm AS MATERIALIZED (SELECT c.from_type, c.to_type,
       |         round(c.cnt * 1.0 / tot.n, 6) AS prob
       |       FROM c JOIN tot USING (from_type)),
       |states AS MATERIALIZED (SELECT from_type AS state FROM tm
       |           UNION SELECT to_type FROM tm),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM states),
       |p0 AS (SELECT state, round(1.0 / nn.n, 6) AS p
       |       FROM states CROSS JOIN nn),
       |$iterCtes
       |SELECT state, p AS pi FROM p12""".stripMargin
  }

  /** Token-budget mixture allocation: 15k-token target corpus at a
    * pinned (30% en / 17.5% each de,es,fr,zh) TOKEN mixture — the
    * production dataset-mixing contract (budgets are specified in
    * tokens, not documents). Per-group rates derive in-plan from one
    * token-sum aggregate; both engines evaluate the identical
    * `least(1.0, budget·w / avail)` → floor-threshold arithmetic, so
    * the kept set replays exactly. See
    * [[graft.ops.Sampling.tokenBudgetMix]].
    */
  private def docTokenBudgetMix(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.tokenBudgetMix(Tables.documents(s, dir),
      "doc_id", "lang", "text",
      weights = Seq("en" -> 0.30, "de" -> 0.175, "es" -> 0.175,
        "fr" -> 0.175, "zh" -> 0.175),
      budgetTokens = 15000)

  private val docTokenBudgetMixSql =
    """WITH d AS (SELECT doc_id, lang,
      |             length(string_split_regex(lower(trim(text)), '\s+'))
      |               AS n_toks
      |           FROM documents),
      |a AS (SELECT lang, CAST(sum(n_toks) AS BIGINT) AS avail
      |      FROM d GROUP BY 1),
      |r AS (SELECT lang,
      |        least(1.0, 15000.0 *
      |          (CASE lang WHEN 'en' THEN 0.30 WHEN 'de' THEN 0.175
      |                     WHEN 'es' THEN 0.175 WHEN 'fr' THEN 0.175
      |                     WHEN 'zh' THEN 0.175 ELSE 0.0 END) / avail)
      |          AS rate
      |      FROM a)
      |SELECT d.doc_id, d.lang, d.n_toks, round(r.rate, 6) AS rate
      |FROM d JOIN r USING (lang)
      |WHERE r.rate >= 1.0
      |   OR md5('budget:' || CAST(d.doc_id AS VARCHAR)) <
      |      lpad(lower(hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT))),
      |           8, '0')""".stripMargin

  /** Temperature-based mixture resampling at α=0.5 over language (the
    * published low-resource-boost recipe): kept mixture ∝ n_lang^0.5,
    * smallest language kept whole. α=0.5 rides `sqrt` — correctly
    * rounded per IEEE-754 in every engine, unlike `pow` — so the kept
    * SET replays exactly. See
    * [[graft.ops.Sampling.temperatureResample]].
    */
  private def docTemperatureResample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.temperatureResample(
      Tables.documents(s, dir).select("doc_id", "lang"), "doc_id", "lang",
      alpha = 0.5)

  private val docTemperatureResampleSql =
    """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      |m AS (SELECT min(n) AS mn FROM c)
      |SELECT d.lang, d.doc_id
      |FROM documents d JOIN c ON c.lang = d.lang, m
      |WHERE sqrt(CAST(m.mn AS DOUBLE) / CAST(c.n AS DOUBLE)) >= 1.0
      |   OR md5('temp:' || CAST(d.doc_id AS VARCHAR)) <
      |      lpad(lower(hex(CAST(floor(sqrt(CAST(m.mn AS DOUBLE) /
      |                                     CAST(c.n AS DOUBLE))
      |                                * 4294967296.0) AS BIGINT))), 8, '0')""".stripMargin

  /** Temperature-α source MIXING at α=0.5 over source with a 300-doc
    * target: normalized mixture weights w_g ∝ √n_g realized by pinned
    * md5 draws — the data-mixing step between `doc_lang_rebalance`
    * and packing, stated the way a training config states it (target
    * size + α). Per-source √n is ×10⁹-BIGINT-pinned before the
    * normalizer sum, so the oracle replays the weights exactly in any
    * aggregation order. See [[graft.ops.Sampling.temperatureMix]].
    */
  private def docTemperatureMix(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.temperatureMix(
      Tables.documents(s, dir).select("doc_id", "source"), "doc_id",
      "source", alpha = 0.5, targetRows = 300)

  private val docTemperatureMixSql =
    """WITH c AS (SELECT source, count(*) AS n,
      |             CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * 1e9)
      |               AS BIGINT) AS wa9
      |           FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(wa9) AS BIGINT) AS wt9 FROM c),
      |r AS (SELECT source,
      |        CAST(wa9 AS DOUBLE) / CAST(wt9 AS DOUBLE) AS w,
      |        least(1.0, 300.0 * (CAST(wa9 AS DOUBLE) / CAST(wt9 AS DOUBLE))
      |          / CAST(n AS DOUBLE)) AS rate
      |      FROM c, t)
      |SELECT d.doc_id, d.source, round(r.w, 6) AS mix_w,
      |       round(r.rate, 6) AS rate
      |FROM documents d JOIN r USING (source)
      |WHERE r.rate >= 1.0
      |   OR md5('tmix:' || CAST(d.doc_id AS VARCHAR)) <
      |      lpad(lower(hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT))),
      |           8, '0')""".stripMargin

  /** Temperature-mixing planning curve over the quarter-α grid with
    * target 300 and the SAME salt as `doc_temperature_mix`, so the
    * α=0.5 row's kept set is exactly the mixing query's draw. See
    * [[graft.ops.Sampling.temperatureMixPlan]].
    */
  private def docTemperaturePlan(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.temperatureMixPlan(Tables.documents(s, dir),
      "doc_id", "source", targetRows = 300)

  /** UniMax epoch-capped uniform token allocation
    * ([[graft.ops.Sampling.unimaxPlan]]) at maxEpochs = 1 and budget =
    * 95% of the corpus's tokens — a budget that leaves the small-half
    * sources saturated and the rest on the common water level at every
    * gate scale, keeping both predicate branches live. The total-token
    * scalar is ONE driver-side one-row aggregate (bounded — the same
    * class as the documented probe/centroid collects); the oracle
    * re-derives it as a scalar subquery.
    */
  private def docUnimaxPlan(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val total = docs.select(
        sum(graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")))
      .head.getLong(0)
    graft.ops.Sampling.unimaxPlan(docs, "source", "text",
      budgetTokens = total * 19 / 20, maxEpochs = 1)
  }

  private val docUnimaxPlanSql =
    """WITH tok AS (SELECT source,
      |        CAST(sum(length(string_split_regex(lower(trim(text)),
      |          '\s+'))) AS BIGINT) AS n_tokens
      |      FROM documents GROUP BY 1),
      |b AS (SELECT CAST(sum(n_tokens) * 19 // 20 AS BIGINT) AS bt FROM tok),
      |o AS (SELECT source, n_tokens, n_tokens * 1 AS cap,
      |        row_number() OVER (ORDER BY n_tokens * 1, source) AS i,
      |        CAST(sum(n_tokens * 1) OVER (ORDER BY n_tokens * 1, source)
      |          AS BIGINT) AS pfx,
      |        count(*) OVER () AS k
      |      FROM tok),
      |s AS (SELECT o.*, bt,
      |        cap * (k - i + 1) < bt - (pfx - cap) AS sat
      |      FROM o CROSS JOIN b),
      |m AS (SELECT s.*,
      |        CAST(sum(CASE WHEN sat THEN 1 ELSE 0 END) OVER ()
      |          AS BIGINT) AS msat,
      |        CAST(sum(CASE WHEN sat THEN cap ELSE 0 END) OVER ()
      |          AS BIGINT) AS ssum
      |      FROM s),
      |a AS (SELECT m.*, CASE WHEN sat THEN cap
      |        ELSE CAST(round(CAST(bt - ssum AS DOUBLE) /
      |          CAST(greatest(k - msat, 1) AS DOUBLE)) AS BIGINT)
      |        END AS alloc
      |      FROM m)
      |SELECT source, n_tokens, CAST(cap AS BIGINT) AS capacity_tokens,
      |       sat AS saturated, CAST(alloc AS BIGINT) AS alloc_tokens,
      |       CASE WHEN n_tokens > 0 THEN round(CAST(alloc AS DOUBLE) /
      |         CAST(n_tokens AS DOUBLE), 6) END AS epochs,
      |       round(CAST(alloc AS DOUBLE) / CAST(bt AS DOUBLE), 6) AS share
      |FROM a""".stripMargin

  private val docTemperaturePlanSql =
    """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |g AS (
      |  SELECT CAST(0.0 AS DOUBLE) AS alpha, source, n,
      |         CAST(round(1.0 * 1e9) AS BIGINT) AS wa9 FROM c
      |  UNION ALL SELECT CAST(0.25 AS DOUBLE), source, n,
      |    CAST(round(sqrt(sqrt(CAST(n AS DOUBLE))) * 1e9) AS BIGINT) FROM c
      |  UNION ALL SELECT CAST(0.5 AS DOUBLE), source, n,
      |    CAST(round(sqrt(CAST(n AS DOUBLE)) * 1e9) AS BIGINT) FROM c
      |  UNION ALL SELECT CAST(0.75 AS DOUBLE), source, n,
      |    CAST(round(sqrt(CAST(n AS DOUBLE)) *
      |      sqrt(sqrt(CAST(n AS DOUBLE))) * 1e9) AS BIGINT) FROM c
      |  UNION ALL SELECT CAST(1.0 AS DOUBLE), source, n,
      |    CAST(round(CAST(n AS DOUBLE) * 1e9) AS BIGINT) FROM c),
      |t AS (SELECT alpha, CAST(sum(wa9) AS BIGINT) AS wt9,
      |        sum(CAST(wa9 AS HUGEINT) * CAST(wa9 AS HUGEINT)) AS sq,
      |        CAST(max(wa9) AS BIGINT) AS mx9
      |      FROM g GROUP BY 1),
      |r AS (SELECT g.alpha, g.source, g.n, t.wt9, t.sq, t.mx9,
      |        CAST(g.wa9 AS DOUBLE) / CAST(t.wt9 AS DOUBLE) AS w,
      |        least(1.0, 300.0 *
      |          (CAST(g.wa9 AS DOUBLE) / CAST(t.wt9 AS DOUBLE)) /
      |          CAST(g.n AS DOUBLE)) AS rate
      |      FROM g JOIN t USING (alpha)),
      |k AS (SELECT r.alpha, d.source, count(*) AS kept
      |      FROM documents d JOIN r ON r.source = d.source
      |      WHERE r.rate >= 1.0
      |         OR md5('tmix:' || CAST(d.doc_id AS VARCHAR)) <
      |            lpad(lower(hex(CAST(floor(r.rate * 4294967296.0)
      |              AS BIGINT))), 8, '0')
      |      GROUP BY 1, 2)
      |SELECT r.alpha, r.source, CAST(r.n AS BIGINT) AS n_docs,
      |  round(r.w, 6) AS mix_w, round(r.rate, 6) AS rate,
      |  CAST(coalesce(k.kept, 0) AS BIGINT) AS kept_docs,
      |  round(CAST(r.wt9 AS DOUBLE) * CAST(r.wt9 AS DOUBLE) /
      |    CAST(r.sq AS DOUBLE), 6) AS ess_sources,
      |  round(CAST(r.mx9 AS DOUBLE) / CAST(r.wt9 AS DOUBLE), 6)
      |    AS max_share
      |FROM r LEFT JOIN k ON k.alpha = r.alpha AND k.source = r.source""".stripMargin

  /** Composed corpus-governance pipeline, one Catalyst tree: GDPR
    * erasure scrub (deterministic 2% request set, scan-side predicate)
    * → uniform language rebalance with rates derived from the
    * POST-scrub counts → stable train/val/test split bands →
    * curriculum quartile bins over the surviving corpus. Every stage
    * is the registry operator it names; every stage is deterministic,
    * so the WHOLE composition is hash-gated end-to-end against one
    * DuckDB CTE chain — compositions are where silent stage-order bugs
    * (rates from pre-scrub counts, bins from pre-rebalance scores)
    * actually live, and the oracle pins the order.
    */
  private def governancePipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Sampling, TextAnalysis}
    val scrubbed = Tables.documents(s, dir)
      .filter(!Sampling.keepExpr(col("doc_id"), 0.02, "gdpr"))
    val balanced = Sampling.rebalanceGroups(
      scrubbed.select("doc_id", "lang", "text"), "doc_id", "lang")
    val split = Sampling.splitAssign(balanced, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    Analytics.quantileBins(split, TextAnalysis.qualityScore(col("text")),
      k = 4, outCols = Seq("doc_id", "lang", "split"))
  }

  private val governancePipelineSql = {
    import graft.ops.Sampling
    val gdprThr = Sampling.hexThreshold(0.02)
    val cut1 = Sampling.hexThreshold(0.8)
    val cut2 = Sampling.hexThreshold(0.9)
    s"""WITH scrub AS (
       |  SELECT doc_id, lang, text FROM documents
       |  WHERE NOT md5('gdpr:' || CAST(doc_id AS VARCHAR)) < '$gdprThr'),
       |c AS (SELECT lang, count(*) AS n FROM scrub GROUP BY 1),
       |m AS (SELECT min(n) AS mn FROM c),
       |bal AS (
       |  SELECT d.doc_id, d.lang, d.text
       |  FROM scrub d JOIN c ON c.lang = d.lang, m
       |  WHERE CAST(m.mn AS DOUBLE) / CAST(c.n AS DOUBLE) >= 1.0
       |     OR md5('mix:' || CAST(d.doc_id AS VARCHAR)) <
       |        lpad(lower(hex(CAST(floor(CAST(m.mn AS DOUBLE) / CAST(c.n AS DOUBLE)
       |                                  * 4294967296.0) AS BIGINT))), 8, '0')),
       |sp AS (
       |  SELECT doc_id, lang, text,
       |    CASE WHEN md5('split:' || CAST(doc_id AS VARCHAR)) < '$cut1' THEN 'train'
       |         WHEN md5('split:' || CAST(doc_id AS VARCHAR)) < '$cut2' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM bal),
       |b AS (
       |  SELECT doc_id, lang, split, trim(text) AS t,
       |    CAST(greatest(length(trim(text)), 1) AS DOUBLE) AS len,
       |    CAST(greatest(length(string_split_regex(lower(trim(text)), '\\s+')), 1)
       |         AS DOUBLE) AS ntoks
       |  FROM sp),
       |q AS (SELECT doc_id, lang, split,
       |  round(((len - length(regexp_replace(t, '[a-zA-Z]', '', 'g'))) / len) * 0.5
       |    + (CASE WHEN length(regexp_replace(t, '\\s+', '', 'g')) / ntoks
       |            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.25
       |    + (CASE WHEN length(t) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.25,
       |    6) AS score
       |  FROM b),
       |thr AS (SELECT list_transform(quantile_cont(score, [0.25, 0.5, 0.75]),
       |                              t -> round(t, 6)) AS ts
       |        FROM q)
       |SELECT q.doc_id, q.lang, q.split, q.score,
       |       CAST(length(list_filter(thr.ts, t -> t < q.score)) AS INT) AS bin
       |FROM q, thr""".stripMargin
  }

  /** CDC upsert over the document corpus: the base snapshot at version
    * 0 merged with a deterministic update batch (every 37th doc
    * re-crawled: text re-prefixed, version 1). Last-writer-wins per
    * doc_id; ties go to the update side — see
    * [[graft.ops.Merge.upsertMerge]].
    */
  private def docUpsertMerge(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), lit(0L).as("version"))
    val updates = base.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"),
        concat(lit("RECRAWLED: "), col("text")).as("text"),
        lit(1L).as("version"))
    graft.ops.Merge.upsertMerge(base, updates, "doc_id", "version")
      .select(col("doc_id"), col("version"),
        length(col("text")).as("n_chars_merged"))
  }

  private val docUpsertMergeSql =
    """WITH base AS (SELECT doc_id, text, 0 AS version FROM documents),
      |upd AS (SELECT doc_id, 'RECRAWLED: ' || text AS text, 1 AS version
      |        FROM base WHERE doc_id % 37 = 0),
      |u AS (SELECT *, 0 AS src FROM base
      |      UNION ALL SELECT *, 1 AS src FROM upd)
      |SELECT doc_id, CAST(version AS BIGINT) AS version,
      |       CAST(length(text) AS INT) AS n_chars_merged
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY doc_id ORDER BY version DESC, src DESC) AS rn
      |      FROM u) t
      |WHERE rn = 1""".stripMargin

  /** k-anonymity audit over the release quasi-identifiers (language,
    * source, 256-char length band): any combination held by fewer than
    * 5 documents is a re-identification risk. At sf0.01 this flags 164
    * of 194 combinations — the fixture corpus is small enough that
    * most cells are sparse, which is exactly the regime the audit
    * exists for. See [[graft.ops.Analytics.kAnonymity]].
    */
  private def govKAnonymity(s: SparkSession, dir: String): DataFrame =
    Analytics.kAnonymity(Tables.documents(s, dir),
      Seq(col("lang"), col("source"),
        floor(col("n_chars") / 256).as("len_band")), k = 5)

  private val govKAnonymitySql =
    """SELECT lang, source, n_chars // 256 AS len_band, count(*) AS cnt
      |FROM documents GROUP BY 1, 2, 3 HAVING count(*) < 5""".stripMargin

  /** l-diversity audit with the same release quasi-identifiers as
    * `gov_k_anonymity` minus source — source IS the sensitive
    * attribute here (which provider contributed a document): any
    * (lang, length-band) group drawing on fewer than 10 of the
    * corpus's 20 sources leans too hard on too few providers — the
    * low-diversity tail where the homogeneity attack (and single-
    * provider bias) lives even when the group is k-anonymous. See
    * [[graft.ops.Analytics.lDiversity]].
    */
  private def govLDiversity(s: SparkSession, dir: String): DataFrame =
    Analytics.lDiversity(Tables.documents(s, dir),
      Seq(col("lang"), floor(col("n_chars") / 256).as("len_band")),
      col("source"), l = 10)

  private val govLDiversitySql =
    """WITH cells AS (SELECT lang, n_chars // 256 AS len_band, source,
      |                      CAST(count(*) AS BIGINT) AS c
      |               FROM documents GROUP BY 1, 2, 3)
      |SELECT lang, len_band, CAST(sum(c) AS BIGINT) AS cnt,
      |       CAST(count(*) AS BIGINT) AS n_sensitive,
      |       round(log2(CAST(sum(c) AS DOUBLE)) -
      |         sum(c * log2(CAST(c AS DOUBLE)))
      |           / CAST(sum(c) AS DOUBLE), 6) AS sens_entropy
      |FROM cells GROUP BY 1, 2 HAVING count(*) < 10""".stripMargin

  /** t-closeness audit with the same release frame as `gov_l_diversity`
    * (QI = language × 256-char length band, sensitive = source): flags
    * groups whose source mix deviates from the corpus-wide source
    * distribution by more than 0.2 in total variation distance — the
    * skew leak that k-anonymity and l-diversity both miss. The TVD sum
    * runs on integer numerators, so Spark and the oracle agree exactly.
    * See [[graft.ops.Analytics.tCloseness]].
    */
  private def govTCloseness(s: SparkSession, dir: String): DataFrame =
    Analytics.tCloseness(Tables.documents(s, dir),
      Seq(col("lang"), floor(col("n_chars") / 256).as("len_band")),
      col("source"), t = 0.2)

  private val govTClosenessSql =
    """WITH cells AS (SELECT lang, n_chars // 256 AS len_band, source,
      |                      CAST(count(*) AS BIGINT) AS c
      |               FROM documents GROUP BY 1, 2, 3),
      |grp AS (SELECT lang, len_band, CAST(sum(c) AS BIGINT) AS cnt
      |        FROM cells GROUP BY 1, 2),
      |gsrc AS (SELECT source, CAST(sum(c) AS BIGINT) AS g
      |         FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(g) AS BIGINT) AS n FROM gsrc),
      |j AS (SELECT grp.lang, grp.len_band, grp.cnt, tot.n, gsrc.g,
      |             COALESCE(cells.c, 0) AS c
      |      FROM grp CROSS JOIN gsrc CROSS JOIN tot
      |      LEFT JOIN cells ON cells.lang = grp.lang
      |        AND cells.len_band = grp.len_band
      |        AND cells.source = gsrc.source)
      |SELECT lang, len_band, cnt,
      |       round(CAST(sum(abs(c * n - g * cnt)) AS DOUBLE)
      |             / (2.0 * cnt * n), 6) AS tvd
      |FROM j GROUP BY 1, 2, 3, n
      |HAVING round(CAST(sum(abs(c * n - g * cnt)) AS DOUBLE)
      |             / (2.0 * cnt * n), 6) > 0.2""".stripMargin

  /** Winsorize event values at the exact [p01, p99] band; every row's
    * clipped value and verdict replay (values and thresholds rounded to
    * 6dp; `percentile` == `quantile_cont` linear interpolation). See
    * [[graft.ops.Analytics.winsorize]].
    */
  private def evWinsorize(s: SparkSession, dir: String): DataFrame =
    Analytics.winsorize(Tables.events(s, dir), col("value"),
      pLow = 0.01, pHigh = 0.99, outCols = Seq("event_id"))

  private val evWinsorizeSql =
    """WITH v AS (SELECT event_id, round(value, 6) AS value FROM events),
      |thr AS (SELECT round(quantile_cont(value, 0.01), 6) AS lo,
      |               round(quantile_cont(value, 0.99), 6) AS hi
      |        FROM v)
      |SELECT event_id, value,
      |       least(greatest(value, thr.lo), thr.hi) AS value_w,
      |       CASE WHEN value < thr.lo THEN 'low'
      |            WHEN value > thr.hi THEN 'high'
      |            ELSE 'in' END AS clip
      |FROM v, thr""".stripMargin

  /** Market-basket association rules over user-day baskets (a user's
    * distinct event types within one calendar day): pair counts,
    * support, confidence, and lift for every co-occurring type pair
    * seen in ≥100 baskets. Per-user-lifetime baskets are degenerate on
    * this stream (every user eventually does everything — all
    * confidences 1.0); the day grain is where "users who X also Y"
    * actually discriminates. See [[graft.ops.Analytics.assocRules]].
    */
  private def evAssocRules(s: SparkSession, dir: String): DataFrame =
    Analytics.assocRules(
      Tables.events(s, dir).select(
        concat_ws(":", col("user_id"),
          to_date(col("ts")).cast("string")).as("basket"),
        col("event_type")),
      "basket", "event_type", minPairCount = 100)

  private val evAssocRulesSql =
    """WITH bi AS (SELECT DISTINCT
      |    CAST(user_id AS VARCHAR) || ':' ||
      |      CAST(CAST(ts AS DATE) AS VARCHAR) AS b,
      |    event_type AS i
      |  FROM events),
      |n AS (SELECT count(DISTINCT b) AS nb FROM bi),
      |ic AS (SELECT i, count(*) AS c FROM bi GROUP BY 1),
      |p AS (SELECT l.i AS a, r.i AS c2, count(*) AS pair_cnt
      |      FROM bi l JOIN bi r ON l.b = r.b AND l.i < r.i
      |      GROUP BY 1, 2 HAVING count(*) >= 100),
      |b2 AS (SELECT a, c2, pair_cnt FROM p
      |       UNION ALL SELECT c2, a, pair_cnt FROM p)
      |SELECT b2.a AS antecedent, b2.c2 AS consequent, b2.pair_cnt,
      |  round(b2.pair_cnt * 1.0 / n.nb, 6) AS support,
      |  round(b2.pair_cnt * 1.0 / ca.c, 6) AS confidence,
      |  round((b2.pair_cnt * n.nb) * 1.0 / (ca.c * cc.c), 6) AS lift
      |FROM b2 CROSS JOIN n
      |JOIN ic ca ON ca.i = b2.a
      |JOIN ic cc ON cc.i = b2.c2""".stripMargin

  /** Signup→purchase conversion latency per user: first signup, first
    * purchase at or after it (null = signed up, never converted), and
    * the exact integer-microsecond latency. See
    * [[graft.ops.Analytics.timeToConversion]].
    */
  private def evTimeToConversion(s: SparkSession, dir: String): DataFrame =
    Analytics.timeToConversion(Tables.events(s, dir), "user_id", "ts",
      "event_type", fromVal = "signup", toVal = "purchase")

  private val evTimeToConversionSql =
    """WITH s AS (SELECT user_id, min(ts) AS from_ts FROM events
      |           WHERE event_type = 'signup' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS to_ts
      |      FROM events e JOIN s ON s.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts >= s.from_ts
      |      GROUP BY 1)
      |SELECT s.user_id, s.from_ts, c.to_ts,
      |       epoch_us(c.to_ts) - epoch_us(s.from_ts) AS latency_us
      |FROM s LEFT JOIN c USING (user_id)""".stripMargin

  /** Rolling active users: exact distinct user count per 24-hour window
    * sliding every 6 hours (epoch-aligned starts, every event in
    * exactly 4 windows). The window start is emitted both as a
    * timestamp and as integer epoch micros so the alignment arithmetic
    * replays. See [[graft.ops.Analytics.slidingDistinct]].
    */
  private def evSlidingActiveUsers(s: SparkSession, dir: String): DataFrame =
    Analytics.slidingDistinct(Tables.events(s, dir), "ts", "user_id",
      windowDur = "24 hours", slideDur = "6 hours")

  private val evSlidingActiveUsersSql =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
      |w AS (SELECT user_id,
      |        (t // 21600000000) * 21600000000 - k.k * 21600000000 AS ws
      |      FROM e, unnest([0, 1, 2, 3]) AS k(k))
      |SELECT make_timestamp(ws) AS window_start, ws AS ws_us,
      |       count(DISTINCT user_id) AS n_distinct
      |FROM w GROUP BY 1, 2""".stripMargin

  /** Robust (median/MAD modified z-score) outliers per event type at
    * the published 3.5 cutoff — the heavy-tail-immune complement of
    * `ev_anomaly_zscore`. See [[graft.ops.Analytics.madOutliers]].
    */
  private def evMadOutliers(s: SparkSession, dir: String): DataFrame =
    Analytics.madOutliers(Tables.events(s, dir), "event_type", "value",
      minScore = 3.5, outCols = Seq("event_id", "event_type"))

  private val evMadOutliersSql =
    """WITH v AS (SELECT event_id, event_type, round(value, 6) AS value
      |           FROM events),
      |med AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      |        FROM v GROUP BY 1),
      |mad AS (SELECT v.event_type,
      |          round(quantile_cont(abs(v.value - med.med), 0.5), 6) AS mad
      |        FROM v JOIN med USING (event_type) GROUP BY 1),
      |sc AS (SELECT v.event_id, v.event_type, v.value,
      |         round(0.6745 * (v.value - med.med) /
      |               CASE WHEN mad.mad = 0 THEN NULL ELSE mad.mad END, 6)
      |           AS score
      |       FROM v JOIN med USING (event_type) JOIN mad USING (event_type))
      |SELECT event_id, event_type, value, score
      |FROM sc WHERE abs(score) >= 3.5""".stripMargin

  /** Top 25 event-type trigram paths corpus-wide — second-order
    * sequence mining on top of the first-order `ev_transition_matrix`.
    * See [[graft.ops.Analytics.topPaths]].
    */
  private def evTopPaths(s: SparkSession, dir: String): DataFrame =
    Analytics.topPaths(Tables.events(s, dir), "user_id", "ts", "event_id",
      "event_type", topK = 25)

  private val evTopPathsSql =
    """WITH s AS (SELECT event_type AS t1,
      |             lead(event_type, 1) OVER w AS t2,
      |             lead(event_type, 2) OVER w AS t3
      |           FROM events
      |           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT t1, t2, t3, count(*) AS cnt FROM s WHERE t3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY cnt DESC, t1, t2, t3 LIMIT 25""".stripMargin

  /** Three pinned PageRank iterations (damping 0.85) over the weighted
    * event-type transition digraph — which states the stream
    * gravitates to, computed with the join-per-iteration shape that
    * scales to a 100 TB edge table. Edges are the first-order
    * transition counts; see [[graft.ops.Graph.pagerank]].
    */
  /** Triangle census of the co-purchase graph (parts joined by
    * appearing in the same order) — see
    * [[graft.ops.Graph.triangleStats]].
    */
  private def liTriangles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = li.as("x").join(li.as("y"),
      col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("pa"), col("y.p").as("pb"))
    Graph.triangleStats(pairs, "pa", "pb")
  }

  private val liTrianglesSql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |            FROM lineitem),
      |e AS (SELECT DISTINCT x.p AS u, y.p AS v
      |      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
      |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d
      |        FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e)
      |        GROUP BY 1),
      |o AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
      |               THEN e.u ELSE e.v END AS a,
      |             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
      |               THEN e.v ELSE e.u END AS b,
      |             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
      |               THEN dv.d ELSE du.d END AS db
      |      FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v),
      |w AS (SELECT w1.b AS x1, w2.b AS x2
      |      FROM o w1 JOIN o w2 ON w1.a = w2.a
      |        AND (w1.db < w2.db OR (w1.db = w2.db AND w1.b < w2.b))),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
      |      FROM w JOIN o ON o.a = w.x1 AND o.b = w.x2),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
      |             CAST(sum(d) / 2 AS BIGINT) AS n_edges,
      |             CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges
      |      FROM deg)
      |SELECT n_nodes, n_edges, n_triangles, n_wedges,
      |       CASE WHEN n_wedges = 0 THEN 0.0
      |            ELSE round(3.0 * n_triangles / n_wedges, 6) END
      |         AS global_clustering
      |FROM s CROSS JOIN t""".stripMargin

  /** Per-node local clustering of the top-50 co-purchase hubs — broker
    * vs community hubs. See [[graft.ops.Graph.localClustering]].
    */
  private def liLocalClustering(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = li.as("x").join(li.as("y"),
      col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("pa"), col("y.p").as("pb"))
    Graph.localClustering(pairs, "pa", "pb", topK = 50)
  }

  private val liLocalClusteringSql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |            FROM lineitem),
      |e AS (SELECT DISTINCT x.p AS u, y.p AS v
      |      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
      |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d
      |        FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e)
      |        GROUP BY 1),
      |o AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
      |               THEN e.u ELSE e.v END AS a,
      |             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
      |               THEN e.v ELSE e.u END AS b,
      |             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
      |               THEN dv.d ELSE du.d END AS db
      |      FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v),
      |w AS (SELECT w1.a AS a, w1.b AS x1, w2.b AS x2
      |      FROM o w1 JOIN o w2 ON w1.a = w2.a
      |        AND (w1.db < w2.db OR (w1.db = w2.db AND w1.b < w2.b))),
      |tn AS (SELECT x, CAST(count(*) AS BIGINT) AS t
      |       FROM (SELECT unnest([w.a, w.x1, w.x2]) AS x
      |             FROM w JOIN o ON o.a = w.x1 AND o.b = w.x2)
      |       GROUP BY 1),
      |r AS (SELECT deg.x AS node, deg.d AS degree,
      |        coalesce(tn.t, 0) AS n_triangles,
      |        CAST(row_number() OVER (ORDER BY deg.d DESC, deg.x)
      |          AS BIGINT) AS degree_rank
      |      FROM deg LEFT JOIN tn ON tn.x = deg.x)
      |SELECT node, degree, n_triangles, degree_rank,
      |  CASE WHEN degree < 2 THEN 0.0
      |       ELSE round(2.0 * n_triangles /
      |         (CAST(degree AS DOUBLE) * (degree - 1)), 6) END
      |    AS local_clustering
      |FROM r WHERE degree_rank <= 50""".stripMargin

  /** Degree assortativity of the co-purchase graph — do hub parts
    * co-occur with other hubs (social shape) or with leaves
    * (star/infrastructure shape). See
    * [[graft.ops.Graph.degreeAssortativity]].
    */
  private def liAssortativity(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = li.as("x").join(li.as("y"),
      col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("pa"), col("y.p").as("pb"))
    Graph.degreeAssortativity(pairs, "pa", "pb")
  }

  private val liAssortativitySql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |            FROM lineitem),
      |e AS (SELECT DISTINCT x.p AS u, y.p AS v
      |      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
      |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d
      |        FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e)
      |        GROUP BY 1),
      |ends AS (SELECT du.d AS x, dv.d AS y
      |         FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
      |         UNION ALL
      |         SELECT dv.d, du.d
      |         FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v),
      |mom AS (SELECT CAST(count(*) AS HUGEINT) AS m,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |  FROM ends),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
      |    CAST(sum(d) / 2 AS BIGINT) AS n_edges FROM deg)
      |SELECT n_nodes, n_edges,
      |  CASE WHEN sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |    sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) -
      |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0 THEN NULL
      |  ELSE round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |     sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) -
      |       CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) END
      |    AS assortativity
      |FROM st CROSS JOIN mom""".stripMargin

  /** Modularity Q of the 3-round label-prop partition of the
    * co-purchase graph — is the community structure real or noise.
    * See [[graft.ops.Graph.modularity]].
    */
  private def liModularity(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = li.as("x").join(li.as("y"),
      col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("pa"), col("y.p").as("pb"))
    Graph.modularity(pairs, "pa", "pb", rounds = 3)
  }

  private val liModularitySql = {
    val rounds = (1 to 3).map { r =>
      s"""l$r AS MATERIALIZED (SELECT node, lbl FROM (
         |  SELECT node, lbl, row_number() OVER (PARTITION BY node
         |    ORDER BY c DESC, lbl ASC) AS rn
         |  FROM (SELECT u.n AS node, l.lbl,
         |          CAST(count(*) AS BIGINT) AS c
         |        FROM u JOIN l${r - 1} l ON l.node = u.m
         |        GROUP BY 1, 2)) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       |            FROM lineitem),
       |e AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
       |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
       |u AS (SELECT a AS n, b AS m FROM e
       |      UNION ALL SELECT b, a FROM e),
       |l0 AS (SELECT DISTINCT n AS node, n AS lbl FROM u),
       |$rounds,
       |deg AS (SELECT n AS node, CAST(count(*) AS BIGINT) AS d
       |        FROM u GROUP BY 1),
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
       |dc AS (SELECT l.lbl, CAST(sum(deg.d) AS BIGINT) AS d_c
       |       FROM l3 l JOIN deg ON deg.node = l.node GROUP BY 1),
       |ec AS (SELECT la.lbl, CAST(count(*) AS BIGINT) AS e_c
       |       FROM e JOIN l3 la ON la.node = e.a
       |              JOIN l3 lb ON lb.node = e.b
       |       WHERE la.lbl = lb.lbl GROUP BY 1),
       |t AS (SELECT CAST(4 * mm.m * coalesce(ec.e_c, 0) -
       |               dc.d_c * dc.d_c AS HUGEINT) AS t
       |      FROM dc LEFT JOIN ec ON ec.lbl = dc.lbl CROSS JOIN mm),
       |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
       |          CAST(sum(t) AS HUGEINT) AS num FROM t)
       |SELECT n_communities, mm.m AS n_edges,
       |  CASE WHEN mm.m > 0 THEN
       |    round(CAST(num AS DOUBLE) /
       |      (4.0 * CAST(mm.m AS DOUBLE) * CAST(mm.m AS DOUBLE)), 6) END
       |    AS modularity
       |FROM agg CROSS JOIN mm""".stripMargin
  }

  /** Top-20 Adamic–Adar predicted links over the co-purchase graph —
    * the part pairs most likely to be bought together NEXT, scored by
    * shared rare co-purchase neighbors. See
    * [[graft.ops.Graph.adamicAdar]].
    */
  private def liAdamicAdar(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = li.as("x").join(li.as("y"),
      col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("pa"), col("y.p").as("pb"))
    Graph.adamicAdar(pairs, "pa", "pb", topK = 20)
  }

  private val liAdamicAdarSql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |            FROM lineitem),
      |e AS (SELECT DISTINCT x.p AS u, y.p AS v
      |      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
      |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d
      |        FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e)
      |        GROUP BY 1),
      |adj AS (SELECT w, n,
      |          CAST(round(1e9 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS w9
      |        FROM (SELECT u AS w, v AS n FROM e
      |              UNION ALL SELECT v, u FROM e) a
      |        JOIN deg ON deg.x = a.w
      |        WHERE d >= 2 AND d <= 10000),
      |sc AS (SELECT s1.n AS u, s2.n AS v,
      |         CAST(sum(s1.w9) AS BIGINT) AS score9
      |       FROM adj s1 JOIN adj s2 ON s1.w = s2.w AND s1.n < s2.n
      |       GROUP BY 1, 2),
      |nonedge AS (SELECT sc.* FROM sc
      |            ANTI JOIN e ON e.u = sc.u AND e.v = sc.v),
      |top AS (SELECT *, CAST(row_number() OVER
      |          (ORDER BY score9 DESC, u, v) AS BIGINT) AS rank
      |        FROM nonedge)
      |SELECT u, v, round(CAST(score9 AS DOUBLE) / 1e9, 6) AS aa_score,
      |       rank
      |FROM top WHERE rank <= 20""".stripMargin

  /** ε-DP Laplace release of the (event_type × day) histogram — see
    * [[graft.ops.Forget.dpLaplaceHistogram]], ε = 1.
    */
  private def govDpHistogram(s: SparkSession, dir: String): DataFrame =
    Forget.dpLaplaceHistogram(Tables.events(s, dir),
      concat(col("event_type"), lit(":"),
        to_date(col("ts")).cast("string")),
      epsilon = 1.0)
      .withColumnRenamed("key", "bucket")

  private val govDpHistogramSql =
    """WITH c AS (SELECT event_type || ':' ||
      |             CAST(CAST(ts AS DATE) AS VARCHAR) AS bucket,
      |             CAST(count(*) AS BIGINT) AS n
      |           FROM events GROUP BY 1),
      |x AS (SELECT bucket, n,
      |        (CAST(CAST('0x' || substr(md5('dpnoise:' || bucket), 1, 13)
      |           AS BIGINT) AS DOUBLE) + 0.5) / 4503599627370496.0 - 0.5
      |          AS cc
      |      FROM c)
      |SELECT bucket, n,
      |       round(n + (-sign(cc) * ln(1.0 - 2.0 * abs(cc))), 6)
      |         AS noisy_n,
      |       round(abs(-sign(cc) * ln(1.0 - 2.0 * abs(cc))), 6)
      |         AS abs_noise,
      |       CAST(1.0 AS DOUBLE) AS epsilon
      |FROM x""".stripMargin

  /** Item-item collaborative-filtering recommendations over order
    * baskets — see [[graft.ops.Ranking.itemItemCf]].
    */
  private def liItemItemCf(s: SparkSession, dir: String): DataFrame =
    graft.ops.Ranking.itemItemCf(
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", k = 5)

  private val liItemItemCfSql =
    """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
      |            FROM lineitem),
      |n AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY 1),
      |co AS (SELECT x.i AS i1, y.i AS i2, CAST(count(*) AS BIGINT) AS co
      |       FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
      |       GROUP BY 1, 2),
      |d AS (SELECT i1 AS item_id, i2 AS rec_id, co FROM co
      |      UNION ALL SELECT i2, i1, co FROM co),
      |s AS (SELECT d.item_id, d.rec_id, d.co,
      |        round(CAST(d.co AS DOUBLE) /
      |              sqrt(CAST(ni.n * nj.n AS DOUBLE)), 6) AS score
      |      FROM d JOIN n ni ON ni.i = d.item_id
      |             JOIN n nj ON nj.i = d.rec_id),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY item_id
      |        ORDER BY score DESC, rec_id ASC) AS INT) AS rank
      |      FROM s)
      |SELECT item_id, rec_id, rank, co, score FROM r WHERE rank <= 5"""
      .stripMargin

  /** k-core peeling profile of the co-purchase graph, k = 80, 6 pinned
    * rounds — see [[graft.ops.Graph.kCorePeeling]]. At sf0.01 the
    * cascade shrinks 1903 → 1857 nodes over 5 rounds then fixes; at
    * sf0.001 the whole graph peels away — both certified by the
    * repeated final row.
    */
  private def liKcoreProfile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = li.as("x").join(li.as("y"),
      col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("pa"), col("y.p").as("pb"))
    Graph.kCorePeeling(pairs, "pa", "pb", k = 80, rounds = 6)
  }

  private val liKcoreProfileSql = {
    val rounds = (1 to 6).map { r =>
      s"""d$r AS (SELECT x, count(*) AS d FROM
         |  (SELECT u AS x FROM e${r - 1} UNION ALL SELECT v FROM e${r - 1})
         |  GROUP BY 1),
         |k$r AS (SELECT x FROM d$r WHERE d >= 80),
         |e$r AS MATERIALIZED (SELECT e${r - 1}.u, e${r - 1}.v
         |  FROM e${r - 1}
         |  JOIN k$r a ON a.x = e${r - 1}.u
         |  JOIN k$r b ON b.x = e${r - 1}.v)""".stripMargin
    }.mkString(",\n")
    val stats = (1 to 6).map { r =>
      s"""SELECT $r AS round,
         |  (SELECT CAST(count(DISTINCT x) AS BIGINT) FROM
         |    (SELECT u AS x FROM e$r UNION ALL SELECT v FROM e$r))
         |    AS n_nodes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM e$r) AS n_edges"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       |            FROM lineitem),
       |e0 AS MATERIALIZED (SELECT DISTINCT x.p AS u, y.p AS v
       |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
       |$rounds
       |$stats""".stripMargin
  }

  /** Exact Shapley-value attribution over the four touch channels
    * (click/error/signup/view; conversion = purchase): the coalition
    * domain is 2⁴ masks, so the axiomatic credit split is computed
    * exactly, no sampling — the data-driven complement to the
    * position-heuristic attribution family. See
    * [[graft.ops.Analytics.shapleyAttribution]].
    */
  private def evShapley(s: SparkSession, dir: String): DataFrame =
    Analytics.shapleyAttribution(Tables.events(s, dir), "user_id",
      "event_type", "purchase", Seq("click", "view", "signup", "error"))

  private val evShapleySql =
    """WITH users AS (SELECT user_id,
      |    CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) +
      |         max(CASE WHEN event_type = 'error' THEN 2 ELSE 0 END) +
      |         max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END) +
      |         max(CASE WHEN event_type = 'view' THEN 8 ELSE 0 END)
      |      AS INT) AS mask,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS conv
      |  FROM events GROUP BY 1),
      |vt AS (SELECT mask, CAST(count(*) AS BIGINT) AS nu,
      |         CAST(sum(conv) AS BIGINT) AS nc FROM users GROUP BY 1),
      |sp AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS mask),
      |v9 AS (SELECT sp.mask,
      |         CAST(round(coalesce(CAST(nc AS DOUBLE) / nu, 0.0) * 1e9,
      |           0) AS BIGINT) AS v9
      |       FROM sp LEFT JOIN vt USING (mask)),
      |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
      |         ('signup', 4), ('view', 8)) AS t(channel, bit)),
      |pairs AS (SELECT ch.channel, s.v9 AS vs, si.v9 AS vsi,
      |            CASE bit_count(s.mask) WHEN 0 THEN 6 WHEN 1 THEN 2
      |              WHEN 2 THEN 2 WHEN 3 THEN 6 END AS m
      |          FROM ch JOIN v9 s ON (s.mask & ch.bit) = 0
      |          JOIN v9 si ON si.mask = s.mask + ch.bit)
      |SELECT channel,
      |  round(CAST(sum(m * (vsi - vs)) AS DOUBLE) / (24 * 1e9), 6)
      |    AS phi
      |FROM pairs GROUP BY 1""".stripMargin

  /** Synchronous label-propagation communities over the part
    * co-purchase graph (3 pinned rounds, smallest-label ties),
    * reported as the community size histogram — the mesoscale
    * structure readout between `li_triangle_census` (local) and
    * `li_bfs_reach` (global). See
    * [[graft.ops.Graph.labelPropagation]].
    */
  private def liLabelProp(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = li.as("x").join(li.as("y"),
      col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("pa"), col("y.p").as("pb"))
    Graph.labelPropagation(pairs, "pa", "pb", rounds = 3)
  }

  private val liLabelPropSql = {
    val rounds = (1 to 3).map { r =>
      s"""l$r AS MATERIALIZED (SELECT node, lbl FROM (
         |  SELECT node, lbl, row_number() OVER (PARTITION BY node
         |    ORDER BY c DESC, lbl ASC) AS rn
         |  FROM (SELECT u.n AS node, l.lbl,
         |          CAST(count(*) AS BIGINT) AS c
         |        FROM u JOIN l${r - 1} l ON l.node = u.m
         |        GROUP BY 1, 2)) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       |            FROM lineitem),
       |e AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
       |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
       |u AS (SELECT a AS n, b AS m FROM e
       |      UNION ALL SELECT b, a FROM e),
       |l0 AS (SELECT DISTINCT n AS node, n AS lbl FROM u),
       |$rounds
       |SELECT size, CAST(count(*) AS BIGINT) AS n_communities
       |FROM (SELECT lbl, CAST(count(*) AS BIGINT) AS size
       |      FROM l3 GROUP BY 1)
       |GROUP BY 1""".stripMargin
  }

  /** Entropy rate of the event-type chain vs the marginal next-event
    * entropy — see [[graft.ops.Analytics.chainEntropyRate]].
    */
  private def evChainEntropy(s: SparkSession, dir: String): DataFrame =
    Analytics.chainEntropyRate(Tables.events(s, dir), "user_id", "ts",
      "event_id", "event_type")

  private val evChainEntropySql =
    """WITH o AS (SELECT event_type AS from_type,
      |             lead(event_type) OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS to_type
      |           FROM events),
      |cells AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS c
      |          FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |st AS (SELECT from_type, CAST(sum(c) AS BIGINT) AS n,
      |         CAST(sum(CAST(round(c * log2(c) * 1e9) AS BIGINT))
      |           AS BIGINT) AS e9
      |       FROM cells GROUP BY 1),
      |st2 AS (SELECT from_type, n,
      |          log2(n) - CAST(e9 AS DOUBLE) / 1e9 / n AS hs
      |        FROM st),
      |nn AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM st2),
      |r AS (SELECT CAST(sum(CAST(round((CAST(n AS DOUBLE) / nn.nn) *
      |        hs * 1e9) AS BIGINT)) AS BIGINT) AS r9
      |      FROM st2 CROSS JOIN nn),
      |mg AS (SELECT CAST(sum(CAST(round(m * log2(m) * 1e9) AS BIGINT))
      |         AS BIGINT) AS me9
      |       FROM (SELECT to_type, CAST(sum(c) AS BIGINT) AS m
      |             FROM cells GROUP BY 1)),
      |sc AS (SELECT
      |         round(CAST(r9 AS DOUBLE) / 1e9, 6) AS entropy_rate,
      |         round(log2(nn.nn) - CAST(me9 AS DOUBLE) / 1e9 / nn.nn, 6)
      |           AS h_marginal,
      |         round((log2(nn.nn) - CAST(me9 AS DOUBLE) / 1e9 / nn.nn) -
      |           (CAST(r9 AS DOUBLE) / 1e9), 6) AS info_gain
      |       FROM r CROSS JOIN mg CROSS JOIN nn)
      |SELECT from_type, n AS n_out, round(hs, 6) AS h_state,
      |       sc.entropy_rate, sc.h_marginal, sc.info_gain
      |FROM st2 CROSS JOIN sc""".stripMargin

  /** BFS reach profile from the top-degree part in the co-purchase
    * graph, 4 hops — see [[graft.ops.Graph.bfsReach]].
    */
  private def liBfsReach(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = li.as("x").join(li.as("y"),
      col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("pa"), col("y.p").as("pb"))
    Graph.bfsReach(pairs, "pa", "pb", hops = 4)
  }

  private val liBfsReachSql = {
    val hopCtes = (1 to 4).map { h =>
      s"""f$h AS MATERIALIZED (SELECT DISTINCT adj.t AS x
         |  FROM adj JOIN f${h - 1} ON f${h - 1}.x = adj.s
         |  WHERE adj.t NOT IN (SELECT x FROM r${h - 1})),
         |r$h AS MATERIALIZED (SELECT x FROM r${h - 1}
         |  UNION ALL SELECT x FROM f$h)""".stripMargin
    }.mkString(",\n")
    val stats = (1 to 4).map { h =>
      s"""SELECT $h AS hop,
         |  (SELECT CAST(count(*) AS BIGINT) FROM f$h) AS frontier,
         |  (SELECT CAST(count(*) AS BIGINT) FROM r$h) AS reached"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       |            FROM lineitem),
       |canon AS MATERIALIZED (SELECT DISTINCT x.p AS u, y.p AS v
       |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
       |adj AS MATERIALIZED (SELECT u AS s, v AS t FROM canon
       |  UNION ALL SELECT v, u FROM canon),
       |deg AS (SELECT s, count(*) AS d FROM adj GROUP BY 1),
       |seed AS (SELECT s AS x FROM (
       |  SELECT s, row_number() OVER (ORDER BY d DESC, s ASC) AS rn
       |  FROM deg) t WHERE rn = 1),
       |r0 AS MATERIALIZED (SELECT x FROM seed),
       |f0 AS MATERIALIZED (SELECT x FROM seed),
       |$hopCtes
       |$stats""".stripMargin
  }

  private def evTypePagerank(s: SparkSession, dir: String): DataFrame =
    Graph.pagerank(
      Analytics.transitionMatrix(Tables.events(s, dir), "user_id", "ts",
        "event_id", "event_type")
        .select(col("from_type"), col("to_type"), col("cnt")),
      "from_type", "to_type", "cnt",
      damping = 0.85, teleport = 0.15, iters = 3)

  private val evTypePagerankSql =
    """WITH s AS (SELECT event_type AS src,
      |             lead(event_type, 1) OVER
      |               (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      |           FROM events),
      |e AS (SELECT src, dst, count(*)::DOUBLE AS w FROM s
      |      WHERE dst IS NOT NULL GROUP BY 1, 2),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
      |ow AS (SELECT src, sum(w) AS outw FROM e GROUP BY 1),
      |p AS (SELECT e.src, e.dst, e.w / ow.outw AS p
      |      FROM e JOIN ow USING (src)),
      |r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
      |r1 AS (SELECT nodes.node,
      |         0.15 / nn.n + 0.85 * coalesce(sum(p.p * r0.pr), 0.0) AS pr
      |       FROM nodes CROSS JOIN nn
      |       LEFT JOIN p ON p.dst = nodes.node
      |       LEFT JOIN r0 ON r0.node = p.src
      |       GROUP BY nodes.node, nn.n),
      |r2 AS (SELECT nodes.node,
      |         0.15 / nn.n + 0.85 * coalesce(sum(p.p * r1.pr), 0.0) AS pr
      |       FROM nodes CROSS JOIN nn
      |       LEFT JOIN p ON p.dst = nodes.node
      |       LEFT JOIN r1 ON r1.node = p.src
      |       GROUP BY nodes.node, nn.n),
      |r3 AS (SELECT nodes.node,
      |         0.15 / nn.n + 0.85 * coalesce(sum(p.p * r2.pr), 0.0) AS pr
      |       FROM nodes CROSS JOIN nn
      |       LEFT JOIN p ON p.dst = nodes.node
      |       LEFT JOIN r2 ON r2.node = p.src
      |       GROUP BY nodes.node, nn.n)
      |SELECT node, round(pr, 6) AS pr FROM r3""".stripMargin

  /** Per-user inter-arrival gap quantiles in exact integer micros —
    * the feed-health metric behind watermark sizing. See
    * [[graft.ops.Analytics.interarrivalQuantiles]].
    */
  private def evInterarrival(s: SparkSession, dir: String): DataFrame =
    Analytics.interarrivalQuantiles(Tables.events(s, dir), "user_id", "ts",
      "event_id")

  private val evInterarrivalSql =
    """WITH g AS (
      |  SELECT epoch_us(ts) -
      |         lag(epoch_us(ts)) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |SELECT count(*) AS n_gaps,
      |       round(quantile_cont(gap_us, 0.5), 6) AS p50_us,
      |       round(quantile_cont(gap_us, 0.9), 6) AS p90_us,
      |       round(quantile_cont(gap_us, 0.99), 6) AS p99_us
      |FROM g WHERE gap_us IS NOT NULL""".stripMargin

  /** Incremental aggregation via mergeable moment states: the stream is
    * split into two "daily batches" (before/after Jan 15), each reduced
    * to a per-type state, states MERGED, then finalized to
    * n/avg/stddev/min/max — proving the merge path gives the same
    * answer as a full rescan (which is what the oracle computes). See
    * [[graft.ops.Incremental]].
    */
  private def evIncrementalMoments(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val pivot = lit("2024-01-15").cast("timestamp")
    val batch1 = Incremental.momentState(
      ev.filter(col("ts") < pivot), Seq("event_type"), "value")
    val batch2 = Incremental.momentState(
      ev.filter(col("ts") >= pivot), Seq("event_type"), "value")
    Incremental.finalizeMoments(
      Incremental.mergeStates(Seq(batch1, batch2), Seq("event_type")),
      Seq("event_type"))
  }

  private val evIncrementalMomentsSql =
    """SELECT event_type, count(value) AS n,
      |       round(avg(value), 6) AS avg,
      |       round(stddev_samp(value), 6) AS stddev,
      |       min(value) AS vmin, max(value) AS vmax
      |FROM events GROUP BY 1""".stripMargin

  /** The quantile complement of `ev_incremental_moments`: the same two
    * "daily batches" each reduce to a pinned-range equi-width histogram
    * state (0..600, 24 bins — the contract, not data-derived), states
    * merge by addition, and p50/p90/p99 are estimated from the merged
    * histogram. The oracle rescans the full stream into the same
    * histogram — merge == rescan is the property under test. See
    * [[graft.ops.Incremental.histogramState]].
    */
  private def evIncrementalHistogram(s: SparkSession,
                                     dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val pivot = lit("2024-01-15").cast("timestamp")
    val b1 = Incremental.histogramState(ev.filter(col("ts") < pivot),
      Seq("event_type"), "value", lo = 0.0, hi = 600.0, bins = 24)
    val b2 = Incremental.histogramState(ev.filter(col("ts") >= pivot),
      Seq("event_type"), "value", lo = 0.0, hi = 600.0, bins = 24)
    Incremental.histogramQuantiles(
      Incremental.mergeHistograms(Seq(b1, b2), Seq("event_type")),
      Seq("event_type"), lo = 0.0, hi = 600.0, bins = 24,
      ps = Seq(0.5, 0.9, 0.99))
  }

  private val evIncrementalHistogramSql =
    """WITH b AS (
      |  SELECT event_type,
      |         least(greatest(CAST(floor((value - 0.0) / (600.0 - 0.0)
      |           * 24) AS INT), 0), 23) AS h_bin
      |  FROM events),
      |g AS (SELECT event_type, h_bin, CAST(count(*) AS BIGINT) AS c
      |      FROM b GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, h_bin, c,
      |         CAST(coalesce(sum(c) OVER (PARTITION BY event_type
      |           ORDER BY h_bin ROWS BETWEEN UNBOUNDED PRECEDING AND
      |           1 PRECEDING), 0) AS BIGINT) AS bef,
      |         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT)
      |           AS n
      |  FROM g),
      |p AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p)
      |SELECT event_type, p.p AS p, cum.n AS n,
      |       round(0.0 + h_bin * ((600.0 - 0.0) / 24)
      |             + (p.p * cum.n - bef) / c * ((600.0 - 0.0) / 24), 6)
      |         AS estimate
      |FROM cum JOIN p
      |  ON bef < p.p * cum.n AND bef + c >= p.p * cum.n""".stripMargin

  /** Daily new-vs-returning active users + the cumulative user curve —
    * see [[graft.ops.Analytics.newVsReturning]].
    */
  private def evNewVsReturning(s: SparkSession, dir: String): DataFrame =
    Analytics.newVsReturning(Tables.events(s, dir), "user_id", "ts")

  private val evNewVsReturningSql =
    """WITH dk AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      |            FROM events),
      |f AS (SELECT user_id, min(day) AS fd FROM dk GROUP BY 1),
      |d AS (SELECT day, CAST(count(*) AS BIGINT) AS active,
      |             CAST(count(*) FILTER (day = fd) AS BIGINT) AS new_keys
      |      FROM dk JOIN f USING (user_id) GROUP BY 1)
      |SELECT day, active, new_keys, active - new_keys AS returning,
      |       CAST(sum(new_keys) OVER (ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS cum_keys
      |FROM d""".stripMargin

  /** Join/group-key skew audit of orders.o_custkey: max/avg/p99 per-key
    * counts and the skew ratio — the measurement that decides whether a
    * salted join/aggregate (or AQE skew split) is warranted BEFORE
    * shipping the shuffle. See [[graft.ops.Skew.keySkewAudit]].
    */
  private def dqKeySkewOrders(s: SparkSession, dir: String): DataFrame =
    Skew.keySkewAudit(Tables.orders(s, dir), Seq("o_custkey"))

  private val dqKeySkewOrdersSql =
    """WITH c AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1)
      |SELECT count(*) AS n_keys, max(cnt) AS max_cnt,
      |       round(avg(cnt), 6) AS avg_cnt,
      |       round(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
      |       round(max(cnt) / avg(cnt), 6) AS skew_ratio
      |FROM c""".stripMargin

  /** Benford first-digit audit of order totals (pinned cents) — the
    * fabricated-/truncated-amount DQ screen with its chi-square
    * statistic. See [[graft.ops.Stats.benfordAudit]]; the expectation
    * literals are shared with the oracle via `Stats.BenfordPpb`.
    */
  private def dqBenfordOrders(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.benfordAudit(Tables.orders(s, dir),
      round(col("o_totalprice") * 100).cast("long"))

  private val dqBenfordOrdersSql = {
    val vals = graft.ops.Stats.BenfordPpb
      .map { case (d, p) => s"($d, $p)" }.mkString(", ")
    s"""WITH src AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
       |             FROM orders),
       |cnt AS (SELECT CAST(substring(CAST(v AS VARCHAR), 1, 1) AS INT)
       |          AS digit,
       |          CAST(count(*) AS BIGINT) AS n
       |        FROM src WHERE v > 0 GROUP BY 1),
       |dom AS (SELECT unnest(generate_series(1, 9)) AS digit),
       |fil AS (SELECT dom.digit, coalesce(n, 0) AS n
       |        FROM dom LEFT JOIN cnt ON dom.digit = cnt.digit),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM fil),
       |ppb AS (SELECT digit, p FROM (VALUES $vals) t(digit, p)),
       |cells AS (SELECT f.digit, n, tot,
       |    CASE WHEN tot > 0 THEN CAST(round(CAST(n AS DOUBLE) /
       |      CAST(tot AS DOUBLE) * 1000000.0) AS BIGINT)
       |      ELSE 0 END AS obs_ppm,
       |    CAST(round(CAST(p AS DOUBLE) / 1000.0) AS BIGINT) AS exp_ppm,
       |    CASE WHEN tot > 0 THEN CAST(round(
       |      (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) *
       |        (CAST(p AS DOUBLE) / 1e9)) *
       |      (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) *
       |        (CAST(p AS DOUBLE) / 1e9)) /
       |      (CAST(tot AS DOUBLE) * (CAST(p AS DOUBLE) / 1e9)) *
       |      1000000.0) AS BIGINT) ELSE NULL END AS chi2_contrib_x6
       |  FROM fil f JOIN ppb ON f.digit = ppb.digit CROSS JOIN tot),
       |chi AS (SELECT round(CAST(sum(chi2_contrib_x6) AS DOUBLE) /
       |          1000000.0, 6) AS chi2 FROM cells)
       |SELECT digit, n, obs_ppm, exp_ppm, chi2_contrib_x6, chi2
       |FROM cells CROSS JOIN chi""".stripMargin
  }

  /** RFM lifecycle segments over users: tercile bins on
    * recency/frequency/monetary, 27-cell report. See
    * [[graft.ops.Analytics.rfmSegments]].
    */
  private def evRfmSegments(s: SparkSession, dir: String): DataFrame =
    Analytics.rfmSegments(Tables.events(s, dir), "user_id", "ts", "value")

  private val evRfmSegmentsSql =
    """WITH mx AS (SELECT max(epoch_us(ts)) AS maxus FROM events),
      |pk AS (SELECT user_id,
      |         (mx.maxus - max(epoch_us(ts))) / 86400000000.0 AS r,
      |         count(*)::DOUBLE AS f,
      |         round(sum(value), 6) AS m
      |       FROM events CROSS JOIN mx GROUP BY user_id, mx.maxus),
      |thr AS (SELECT
      |    round(quantile_cont(round(r, 6), 1.0/3), 6) AS r1,
      |    round(quantile_cont(round(r, 6), 2.0/3), 6) AS r2,
      |    round(quantile_cont(round(f, 6), 1.0/3), 6) AS f1,
      |    round(quantile_cont(round(f, 6), 2.0/3), 6) AS f2,
      |    round(quantile_cont(round(m, 6), 1.0/3), 6) AS m1,
      |    round(quantile_cont(round(m, 6), 2.0/3), 6) AS m2
      |  FROM pk)
      |SELECT
      |  (CASE WHEN round(r, 6) > r1 THEN 1 ELSE 0 END +
      |   CASE WHEN round(r, 6) > r2 THEN 1 ELSE 0 END) AS r_bin,
      |  (CASE WHEN round(f, 6) > f1 THEN 1 ELSE 0 END +
      |   CASE WHEN round(f, 6) > f2 THEN 1 ELSE 0 END) AS f_bin,
      |  (CASE WHEN round(m, 6) > m1 THEN 1 ELSE 0 END +
      |   CASE WHEN round(m, 6) > m2 THEN 1 ELSE 0 END) AS m_bin,
      |  count(*) AS n_keys
      |FROM pk CROSS JOIN thr GROUP BY 1, 2, 3""".stripMargin

  /** Daily peak concurrent sessions (30-min idle rule, same as
    * `ev_sessionize`): sweep-line with midnight carryover. See
    * [[graft.ops.Analytics.maxConcurrencyDaily]].
    */
  private def evMaxConcurrency(s: SparkSession, dir: String): DataFrame =
    Analytics.maxConcurrencyDaily(Tables.events(s, dir), "user_id", "ts",
      gapMinutes = 30)

  private val evMaxConcurrencySql =
    """WITH e AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
      |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |           THEN 1
      |         ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts, sum(new_s) OVER
      |        (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
      |        AS sid FROM e),
      |sess AS (SELECT min(epoch_us(ts)) AS s_us,
      |                max(epoch_us(ts)) + 1 AS e_excl_us
      |         FROM s GROUP BY user_id, sid),
      |d2 AS (SELECT us, delta, us // 86400000000 AS day FROM (
      |         SELECT s_us AS us, 1 AS delta FROM sess
      |         UNION ALL SELECT e_excl_us, -1 FROM sess) d),
      |sw AS (SELECT day, max(run) AS max_run FROM (
      |         SELECT day, sum(delta) OVER
      |           (PARTITION BY day ORDER BY us, delta
      |            ROWS UNBOUNDED PRECEDING) AS run
      |         FROM d2) t GROUP BY 1),
      |cyd AS (SELECT unnest(range(s_us // 86400000000 + 1,
      |                            (e_excl_us - 1) // 86400000000 + 1))
      |          AS day
      |        FROM sess),
      |cy AS (SELECT day, count(*) AS carry FROM cyd GROUP BY 1)
      |SELECT strftime(make_timestamp(sw.day * 86400000000), '%Y-%m-%d')
      |         AS day,
      |       CAST(greatest(coalesce(cy.carry, 0),
      |                coalesce(cy.carry, 0) + sw.max_run) AS BIGINT)
      |         AS max_concurrency
      |FROM sw LEFT JOIN cy USING (day)""".stripMargin

  /** Benford first-digit audit on event values — see
    * [[graft.ops.Analytics.benfordAudit]]; the synthetic uniform values
    * deviate hugely, which is the audit working.
    */
  private def dqBenford(s: SparkSession, dir: String): DataFrame =
    Analytics.benfordAudit(Tables.events(s, dir), "value")

  private val dqBenfordSql =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(value * 1000000.0)
      |           AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM events WHERE CAST(round(value * 1000000.0) AS BIGINT) > 0),
      |c AS (SELECT digit, count(*) AS cnt FROM d GROUP BY 1),
      |tot AS (SELECT sum(cnt)::DOUBLE AS tot FROM c),
      |cells AS (
      |  SELECT s.digit, coalesce(c.cnt, 0) AS cnt,
      |         tot.tot * (ln(1.0 + 1.0 / s.digit) / ln(10.0)) AS expected
      |  FROM (SELECT unnest(range(1, 10)) AS digit) s
      |  LEFT JOIN c ON c.digit = s.digit CROSS JOIN tot),
      |x AS (SELECT digit, cnt, expected,
      |        (cnt - expected) * (cnt - expected) / expected AS c2
      |      FROM cells),
      |t2 AS (SELECT sum(c2) AS chi2 FROM x)
      |SELECT digit, cnt, round(expected, 6) AS expected,
      |       round(c2, 6) AS contrib, round(t2.chi2, 6) AS chi2
      |FROM x CROSS JOIN t2""".stripMargin

  def qs: Seq[QueryDef] = Seq(
    QueryDef("dq_benford_values", dqBenford, Some(dqBenfordSql)),
    QueryDef("ev_max_concurrency_daily", evMaxConcurrency,
      Some(evMaxConcurrencySql)),
    QueryDef("ev_rfm_segments", evRfmSegments, Some(evRfmSegmentsSql)),
    QueryDef("dq_key_skew_orders", dqKeySkewOrders, Some(dqKeySkewOrdersSql)),
    QueryDef("dq_benford_orders", dqBenfordOrders, Some(dqBenfordOrdersSql)),
    QueryDef("ev_interarrival_quantiles", evInterarrival,
      Some(evInterarrivalSql)),
    QueryDef("ev_incremental_histogram", evIncrementalHistogram,
      Some(evIncrementalHistogramSql)),
    QueryDef("ev_new_vs_returning", evNewVsReturning,
      Some(evNewVsReturningSql)),
    QueryDef("ev_incremental_moments", evIncrementalMoments,
      Some(evIncrementalMomentsSql)),
    QueryDef("ev_top_paths", evTopPaths, Some(evTopPathsSql)),
    QueryDef("ev_type_pagerank", evTypePagerank, Some(evTypePagerankSql)),
    QueryDef("li_triangle_census", liTriangles, Some(liTrianglesSql)),
    QueryDef("li_local_clustering", liLocalClustering,
      Some(liLocalClusteringSql)),
    QueryDef("li_degree_assortativity", liAssortativity,
      Some(liAssortativitySql)),
    QueryDef("li_adamic_adar", liAdamicAdar, Some(liAdamicAdarSql)),
    QueryDef("li_community_modularity", liModularity,
      Some(liModularitySql)),
    QueryDef("gov_dp_histogram", govDpHistogram, Some(govDpHistogramSql)),
    QueryDef("li_item_item_cf", liItemItemCf, Some(liItemItemCfSql)),
    QueryDef("li_kcore_profile", liKcoreProfile, Some(liKcoreProfileSql)),
    QueryDef("li_label_prop_communities", liLabelProp, Some(liLabelPropSql)),
    QueryDef("ev_chain_entropy_rate", evChainEntropy,
      Some(evChainEntropySql)),
    QueryDef("li_bfs_reach", liBfsReach, Some(liBfsReachSql)),
    QueryDef("ev_assoc_rules", evAssocRules, Some(evAssocRulesSql)),
    QueryDef("ev_time_to_conversion", evTimeToConversion,
      Some(evTimeToConversionSql)),
    QueryDef("ev_sliding_active_users", evSlidingActiveUsers,
      Some(evSlidingActiveUsersSql)),
    QueryDef("ev_mad_outliers", evMadOutliers, Some(evMadOutliersSql)),
    QueryDef("gov_k_anonymity", govKAnonymity, Some(govKAnonymitySql)),
    QueryDef("gov_l_diversity", govLDiversity, Some(govLDiversitySql)),
    QueryDef("gov_t_closeness", govTCloseness, Some(govTClosenessSql)),
    QueryDef("ev_pivot_day_type", evPivotDayType, Some(evPivotDayTypeSql)),
    QueryDef("ev_user_rolling_7d", evUserRolling7d, Some(evUserRolling7dSql)),
    QueryDef("ev_anomaly_zscore", evAnomalyZscore, Some(evAnomalyZscoreSql)),
    QueryDef("ev_winsorize", evWinsorize, Some(evWinsorizeSql)),
    QueryDef("ev_markov_stationary", evMarkovStationary,
      Some(evMarkovStationarySql)),
    QueryDef("ev_attribution_lastclick", evAttribution,
      Some(evAttributionSql)),
    QueryDef("ev_attribution_linear", evAttributionLinear,
      Some(evAttributionLinearSql)),
    QueryDef("ev_attribution_shapley", evShapley, Some(evShapleySql)),
    QueryDef("ev_attribution_ushape", evAttributionUshape,
      Some(evAttributionUshapeSql)),
    QueryDef("ev_attribution_timedecay", evAttributionTimeDecay,
      Some(evAttributionTimeDecaySql)),
    QueryDef("ev_cohort_ltv", evCohortLtv, Some(evCohortLtvSql)),
    QueryDef("ev_transition_matrix", evTransitionMatrix,
      Some(evTransitionMatrixSql)),
    QueryDef("dq_fk_integrity", dqFkIntegrity, Some(dqFkIntegritySql)),
    QueryDef("ev_scd2_intervals", evScd2, Some(evScd2Sql)),
    QueryDef("ev_daily_error_cumulative", evDailyErrorCumulative,
      Some(evDailyErrorCumulativeSql)),
    QueryDef("dq_constraints_events", dqConstraintsEvents,
      Some(dqConstraintsEventsSql)),
    QueryDef("doc_curriculum_bins", docCurriculumBins,
      Some(docCurriculumBinsSql)),
    QueryDef("gdpr_forget_cascade", gdprForgetCascade,
      Some(gdprForgetCascadeSql)),
    QueryDef("gdpr_subject_access", gdprSubjectAccess,
      Some(gdprSubjectAccessSql)),
    QueryDef("doc_lang_rebalance", docLangRebalance,
      Some(docLangRebalanceSql)),
    QueryDef("doc_temperature_resample", docTemperatureResample,
      Some(docTemperatureResampleSql)),
    QueryDef("doc_temperature_plan", docTemperaturePlan,
      Some(docTemperaturePlanSql)),
    QueryDef("doc_unimax_plan", docUnimaxPlan, Some(docUnimaxPlanSql)),
    QueryDef("doc_temperature_mix", docTemperatureMix,
      Some(docTemperatureMixSql)),
    QueryDef("doc_token_budget_mix", docTokenBudgetMix,
      Some(docTokenBudgetMixSql)),
    QueryDef("pipeline_governance", governancePipeline,
      Some(governancePipelineSql)),
    QueryDef("doc_upsert_merge", docUpsertMerge, Some(docUpsertMergeSql)),
  )
}
