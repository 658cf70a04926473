package graft.queries

import graft.Tables
import graft.ops.Sketches
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch-backed frequency statistics over the events stream. Each
  * query is deterministic and hash-gated: either the sketch only
  * *narrows* an exact computation (heavy hitters) or its randomness is
  * pinned to engine-portable md5-derived constants the oracle can
  * replay.
  */
object SketchQueries {

  /** Exact heavy hitters (users with >= 0.8% of all events) via the
    * Misra–Gries candidate phase + exact verification recount.
    * phi=0.008 with k=128 > 1/phi=125 preserves the superset
    * guarantee at every scale factor (the threshold is relative, so
    * the query's semantics are SF-independent).
    */
  private def evHeavyHitters(s: SparkSession, dir: String): DataFrame =
    Sketches.heavyHitters(Tables.events(s, dir), "user_id",
      phi = 0.008, k = 128)
      .select(col("key").cast("long").as("user_id"), col("cnt"))

  private val evHeavyHittersSql =
    """WITH n AS (SELECT count(*) AS total FROM events)
      |SELECT user_id, count(*) AS cnt
      |FROM events, n
      |GROUP BY user_id, n.total
      |HAVING count(*) >= CAST(ceil(0.008 * n.total) AS BIGINT)""".stripMargin

  /** Per-group heavy hitters: users holding >= 0.8% of each event
    * type's traffic, via per-group MG pruning — the "top keys per
    * language/domain at unbounded key cardinality" shape where a full
    * (group, key) groupBy is the 100 TB bottleneck.
    */
  private def evHeavyHittersByType(s: SparkSession, dir: String): DataFrame =
    Sketches.heavyHittersByGroup(Tables.events(s, dir), "event_type",
      "user_id", phi = 0.008, k = 128)
      .select(col("grp").as("event_type"),
        col("key").cast("long").as("user_id"), col("cnt"))

  private val evHeavyHittersByTypeSql =
    """WITH g AS (SELECT event_type, count(*) AS n_g FROM events GROUP BY 1),
      |c AS (SELECT event_type, user_id, count(*) AS cnt
      |      FROM events GROUP BY 1, 2)
      |SELECT c.event_type, c.user_id, c.cnt
      |FROM c JOIN g ON g.event_type = c.event_type
      |WHERE c.cnt >= ceil(0.008 * g.n_g)""".stripMargin

  /** Exponentially decayed activity mass per user — the standard
    * recency-weighted feature signal: each event contributes
    * exp(-(T−t)/τ) with T the corpus max timestamp and τ = 7 days.
    * Scan-side arithmetic + one groupBy; T comes from a single-row
    * broadcast aggregate, not a second pass over grouped state.
    */
  private def evRecencyScore(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"),
      unix_micros(col("ts")).as("us"))
    val tMax = ev.agg(max("us").as("t_max"))
    val tau = 7.0 * 86400000000.0
    ev.crossJoin(broadcast(tMax))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum(exp((col("us") - col("t_max")) / tau)), 6)
          .as("recency_score"))
  }

  private val evRecencyScoreSql =
    """WITH t AS (SELECT max(epoch_us(ts)) AS t_max FROM events)
      |SELECT user_id, count(*) AS n_events,
      |  round(sum(exp((epoch_us(ts) - t_max) / 604800000000.0)), 6)
      |    AS recency_score
      |FROM events, t GROUP BY user_id""".stripMargin

  /** CMS point estimates joined against exact counts for every user:
    * (user_id, cms_est, cnt) with cms_est >= cnt always. d=4, w=64 so
    * 150 users at sf0.01 genuinely collide (the sketch is doing work,
    * not memorizing). Fully deterministic: cells are additive and the
    * hash family is pinned md5 — the oracle replays the entire sketch.
    */
  private def evFreqCms(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val est = Sketches.cmsEstimates(ev, "user_id", d = 4, w = 64)
    val exact = ev.groupBy(col("user_id").cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    est.join(exact, "key")
      .select(col("key").cast("long").as("user_id"), col("cms_est"),
        col("cnt"))
  }

  private val evFreqCmsSql =
    """WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
      |js AS (SELECT unnest(range(4)) AS j),
      |cells AS (
      |  SELECT j,
      |         CAST('0x' || substr(md5(j || ':' || key), 1, 8) AS BIGINT) % 64 AS bucket,
      |         count(*) AS cnt
      |  FROM ev CROSS JOIN js GROUP BY 1, 2),
      |probes AS (
      |  SELECT DISTINCT key, j,
      |         CAST('0x' || substr(md5(j || ':' || key), 1, 8) AS BIGINT) % 64 AS bucket
      |  FROM ev CROSS JOIN js),
      |est AS (
      |  SELECT p.key, min(c.cnt) AS cms_est
      |  FROM probes p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
      |  GROUP BY 1),
      |exact AS (SELECT key, count(*) AS cnt FROM ev GROUP BY 1)
      |SELECT CAST(est.key AS BIGINT) AS user_id, est.cms_est, exact.cnt
      |FROM est JOIN exact ON est.key = exact.key""".stripMargin

  /** KMV distinct-count estimate over event_id (the high-cardinality
    * column — the case where exact countDistinct is the 100 TB
    * bottleneck), reported against the exact count. k=256 gives
    * ~1/sqrt(k) ≈ 6% expected relative error; the estimate itself is
    * deterministic (pinned hashes, set semantics) so the oracle
    * replays it to the digit.
    */
  private def evDistinctKmv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    Sketches.kmvDistinctEstimate(ev, "event_id", k = 256)
      .crossJoin(ev.agg(count_distinct(col("event_id")).as("dv_exact")))
  }

  private val evDistinctKmvSql =
    """WITH hs AS (
      |  SELECT DISTINCT
      |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
      |  FROM events),
      |topk AS (SELECT h FROM hs ORDER BY h LIMIT 256),
      |agg AS (SELECT count(*) AS k_used, max(h) AS kth_hash FROM topk),
      |tot AS (SELECT count(DISTINCT event_id) AS dv_exact FROM events)
      |SELECT CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
      |            ELSE round((k_used - 1) * 4294967296.0 / kth_hash, 6)
      |       END AS dv_est,
      |       kth_hash, dv_exact
      |FROM agg CROSS JOIN tot""".stripMargin

  /** αm·m² for the b=7 (m=128) HLL used by both HLL gates, computed
    * with the exact operation sequence [[Sketches.hllEstimateByGroup]]
    * uses, then interpolated into the oracle SQL as a round-tripping
    * double literal — so both engines divide by bit-identical
    * constants.
    */
  private val hllAlphaM2: Double = {
    val m = 128
    (0.7213 / (1.0 + 1.079 / m)) * m * m
  }

  /** HyperLogLog distinct-count estimate for the high-cardinality
    * event_id column (b=7 ⇒ 128 six-bit registers — the state/error
    * trade KMV loses at equal memory), beside the exact count. Every
    * register and the dyadic-sum estimator are pinned integer/exact-
    * double arithmetic, so the oracle replays the sketch to the digit;
    * at sf0.01 the raw-estimate branch is the one exercised (all
    * registers occupied).
    */
  private def evDistinctHll(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    Sketches.hllDistinctEstimate(ev, "event_id", b = 7)
      .crossJoin(ev.agg(count_distinct(col("event_id")).as("dv_exact")))
  }

  private val evDistinctHllSql =
    s"""WITH h AS (
       |  SELECT CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
       |  FROM events WHERE event_id IS NOT NULL),
       |r AS (SELECT h // 33554432 AS bucket,
       |             CASE WHEN h % 33554432 = 0 THEN 26
       |                  ELSE 26 - length(bin(h % 33554432)) END AS rank
       |      FROM h),
       |cells AS (SELECT bucket, max(rank) AS reg FROM r GROUP BY 1),
       |agg AS (SELECT sum(1.0::DOUBLE / (1::BIGINT << reg)) AS sp,
       |               count(*) AS cnt FROM cells),
       |est AS (SELECT 128 - cnt AS v,
       |               $hllAlphaM2::DOUBLE / (sp + (128 - cnt)) AS raw
       |        FROM agg)
       |SELECT round(CASE WHEN raw <= 320.0::DOUBLE AND v > 0
       |                  THEN 128.0::DOUBLE * ln(128.0::DOUBLE / v)
       |                  ELSE raw END, 6) AS hll_est,
       |       (SELECT count(DISTINCT event_id) FROM events) AS dv_exact
       |FROM est""".stripMargin

  /** Per-type HLL distinct users: one register table per group
    * (≤ groups×128 cells after map-side max — the per-group
    * countDistinct that never shuffles raw keys), beside exact counts.
    * At 150 users per type the small-range linear-counting branch
    * m·ln(m/V) is the one exercised, pinning the correction path the
    * global gate doesn't reach.
    */
  private def evDistinctHllByType(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val est = Sketches.hllEstimateByGroup(
      Sketches.hllCellsByGroup(ev, "event_type", "user_id", b = 7), b = 7)
    val exact = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("dv_exact"))
    est.select(col("grp").as("event_type"), col("hll_est"))
      .join(exact, "event_type")
  }

  private val evDistinctHllByTypeSql =
    s"""WITH h AS (
       |  SELECT event_type,
       |         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
       |  FROM events WHERE user_id IS NOT NULL),
       |r AS (SELECT event_type, h // 33554432 AS bucket,
       |             CASE WHEN h % 33554432 = 0 THEN 26
       |                  ELSE 26 - length(bin(h % 33554432)) END AS rank
       |      FROM h),
       |cells AS (SELECT event_type, bucket, max(rank) AS reg
       |          FROM r GROUP BY 1, 2),
       |agg AS (SELECT event_type,
       |               sum(1.0::DOUBLE / (1::BIGINT << reg)) AS sp,
       |               count(*) AS cnt FROM cells GROUP BY 1),
       |est AS (SELECT event_type, 128 - cnt AS v,
       |               $hllAlphaM2::DOUBLE / (sp + (128 - cnt)) AS raw
       |        FROM agg),
       |hll AS (SELECT event_type,
       |          round(CASE WHEN raw <= 320.0::DOUBLE AND v > 0
       |                     THEN 128.0::DOUBLE * ln(128.0::DOUBLE / v)
       |                     ELSE raw END, 6) AS hll_est
       |        FROM est),
       |ex AS (SELECT event_type, count(DISTINCT user_id) AS dv_exact
       |       FROM events GROUP BY 1)
       |SELECT hll.event_type, hll.hll_est, ex.dv_exact
       |FROM hll JOIN ex USING (event_type)""".stripMargin

  /** Histogram-sketch quantiles of events.value (p50/p90/p99) next to
    * the exact interpolated percentiles. 256 bins over [0, 640) bound
    * the estimate error at one bin width (2.5) independent of N; both
    * the sketch walk and the exact values are replayed by the oracle
    * in pinned double arithmetic.
    */
  private def evValueQuantiles(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val qsArr = Seq(0.5, 0.9, 0.99)
    val est = Sketches.histQuantiles(ev, "value", lo = 0.0, hi = 640.0,
      bins = 256, qs = qsArr)
    val exact = ev
      .select(expr("percentile(value, array(0.5D, 0.9D, 0.99D))").as("ps"))
      .select(posexplode(col("ps")).as(Seq("i", "ex")))
      .select(element_at(typedLit(qsArr), col("i") + 1).as("q"),
        round(col("ex"), 6).as("exact_q"))
    est.join(exact, "q").select(col("q"), col("hist_est"), col("exact_q"))
  }

  private val evValueQuantilesSql =
    """WITH h AS (
      |  SELECT CAST(least(greatest(floor(value / 2.5::DOUBLE), 0), 255) AS BIGINT) AS bin,
      |         count(*) AS cnt
      |  FROM events GROUP BY 1),
      |c AS (SELECT bin, cnt,
      |        sum(cnt) OVER (ORDER BY bin) AS cum,
      |        sum(cnt) OVER () AS n
      |      FROM h),
      |qs AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q),
      |sel AS (SELECT q, min(bin) AS bin
      |        FROM qs JOIN c ON c.cum >= q * c.n GROUP BY q),
      |est AS (SELECT q,
      |          round(2.5::DOUBLE * (c.bin + (q * c.n - (c.cum - c.cnt)) / c.cnt), 6) AS hist_est
      |        FROM sel JOIN c USING (bin)),
      |ex AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q,
      |              unnest(quantile_cont(value, [0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE])) AS exq
      |       FROM events)
      |SELECT est.q, est.hist_est, round(ex.exq, 6) AS exact_q
      |FROM est JOIN ex ON est.q = ex.q""".stripMargin

  /** One composed table-profiler over events — the pre-training data-
    * quality dashboard: per-column null counts, exact + KMV distinct,
    * MG-pruned top values with exact recounts, histogram p50, min/max.
    * Long format (col, metric, val_num, val_str); every metric is a
    * sketch-family composition the oracle replays exactly. KMV on 150
    * users also pins the below-k exactness path in a registry gate.
    */
  private def profileEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val nullStr = lit(null).cast("string")

    // all six scalar metrics from ONE scan, unpivoted to long format
    val basics = ev.agg(
        (count(lit(1)) - count(col("user_id"))).cast("double").as("uid_nulls"),
        count_distinct(col("user_id")).cast("double").as("uid_distinct"),
        (count(lit(1)) - count(col("value"))).cast("double").as("val_nulls"),
        round(min(col("value")), 6).as("val_min"),
        round(max(col("value")), 6).as("val_max"),
        (count(lit(1)) - count(col("event_type"))).cast("double")
          .as("et_nulls"))
      .selectExpr("""stack(6,
          'user_id', 'null_cnt', uid_nulls,
          'user_id', 'distinct_exact', uid_distinct,
          'value', 'null_cnt', val_nulls,
          'value', 'min', val_min,
          'value', 'max', val_max,
          'event_type', 'null_cnt', et_nulls) AS (col, metric, val_num)""")
      .withColumn("val_str", nullStr)

    val kmv = Sketches.kmvDistinctEstimate(ev, "user_id", k = 256)
      .select(lit("user_id").as("col"), lit("distinct_kmv").as("metric"),
        col("dv_est").cast("double").as("val_num"), nullStr.as("val_str"))

    val p50 = Sketches.histQuantiles(ev, "value", lo = 0.0, hi = 640.0,
      bins = 256, qs = Seq(0.5))
      .select(lit("value").as("col"), lit("p50_hist").as("metric"),
        col("hist_est").as("val_num"), nullStr.as("val_str"))

    // top-3 values: MG pruning (k=64 ⇒ any value with > 1.6% share
    // survives — far below any plausible 3rd-ranked share; the oracle's
    // unconditional top-3 assumes exactly that) + exact recount
    val candKeys = Sketches.mgCandidates(ev, "event_type", 64)
      .collect().map(_.getString(0)).toIndexedSeq
    val byCount = Window.orderBy(col("cnt").desc, col("key").asc)
    val top3 = ev.filter(col("event_type").isin(candKeys: _*))
      .groupBy(col("event_type").as("key")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(byCount))
      .filter(col("rn") <= 3)
      .select(lit("event_type").as("col"),
        concat(lit("top"), col("rn")).as("metric"),
        col("cnt").cast("double").as("val_num"), col("key").as("val_str"))

    basics.unionByName(kmv).unionByName(p50).unionByName(top3)
  }

  /** One-scan profiler for the documents table (the corpus-side sibling
    * of `profile_events`): row count, null counts, id uniqueness,
    * domain cardinalities, and length statistics — all riding a single
    * global aggregate, unpivoted with `stack` to the long
    * (col, metric, val_num) audit format.
    */
  private def profileDocuments(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).agg(
        count(lit(1)).cast("double").as("n_rows"),
        (count(lit(1)) - count_distinct(col("doc_id"))).cast("double")
          .as("id_dups"),
        (count(lit(1)) - count(col("text"))).cast("double").as("text_nulls"),
        count_distinct(col("lang")).cast("double").as("lang_distinct"),
        count_distinct(col("source")).cast("double").as("source_distinct"),
        round(avg(length(col("text"))), 6).as("text_len_avg"),
        min(col("n_chars")).cast("double").as("nchars_min"),
        max(col("n_chars")).cast("double").as("nchars_max"))
      .selectExpr("""stack(8,
          '_table', 'row_cnt', n_rows,
          'doc_id', 'dup_cnt', id_dups,
          'text', 'null_cnt', text_nulls,
          'lang', 'distinct_exact', lang_distinct,
          'source', 'distinct_exact', source_distinct,
          'text', 'len_avg', text_len_avg,
          'n_chars', 'min', nchars_min,
          'n_chars', 'max', nchars_max) AS (col, metric, val_num)""")

  private val profileDocumentsSql =
    """WITH a AS (SELECT count(*)::DOUBLE AS n_rows,
      |    (count(*) - count(DISTINCT doc_id))::DOUBLE AS id_dups,
      |    (count(*) - count(text))::DOUBLE AS text_nulls,
      |    count(DISTINCT lang)::DOUBLE AS lang_distinct,
      |    count(DISTINCT source)::DOUBLE AS source_distinct,
      |    round(avg(length(text)), 6) AS text_len_avg,
      |    min(n_chars)::DOUBLE AS nchars_min,
      |    max(n_chars)::DOUBLE AS nchars_max
      |  FROM documents)
      |SELECT '_table' AS col, 'row_cnt' AS metric, n_rows AS val_num FROM a
      |UNION ALL SELECT 'doc_id', 'dup_cnt', id_dups FROM a
      |UNION ALL SELECT 'text', 'null_cnt', text_nulls FROM a
      |UNION ALL SELECT 'lang', 'distinct_exact', lang_distinct FROM a
      |UNION ALL SELECT 'source', 'distinct_exact', source_distinct FROM a
      |UNION ALL SELECT 'text', 'len_avg', text_len_avg FROM a
      |UNION ALL SELECT 'n_chars', 'min', nchars_min FROM a
      |UNION ALL SELECT 'n_chars', 'max', nchars_max FROM a""".stripMargin

  private val profileEventsSql =
    """WITH hs AS (
      |  SELECT DISTINCT
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
      |  FROM events),
      |kagg AS (SELECT count(*) AS k_used, max(h) AS kth
      |         FROM (SELECT h FROM hs ORDER BY h LIMIT 256)),
      |hist AS (
      |  SELECT CAST(least(greatest(floor(value / 2.5::DOUBLE), 0), 255) AS BIGINT) AS bin,
      |         count(*) AS cnt
      |  FROM events GROUP BY 1),
      |hc AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum,
      |              sum(cnt) OVER () AS n FROM hist),
      |hsel AS (SELECT min(bin) AS bin FROM hc WHERE cum >= 0.5::DOUBLE * n),
      |p50 AS (SELECT round(2.5::DOUBLE * (hc.bin +
      |            (0.5::DOUBLE * hc.n - (hc.cum - hc.cnt)) / hc.cnt), 6) AS est
      |        FROM hsel JOIN hc USING (bin)),
      |top3 AS (SELECT event_type AS v, count(*) AS c,
      |                row_number() OVER (ORDER BY count(*) DESC, event_type) AS rn
      |         FROM events GROUP BY event_type
      |         ORDER BY c DESC, v LIMIT 3)
      |SELECT 'user_id' AS col, 'null_cnt' AS metric,
      |       CAST(count(*) - count(user_id) AS DOUBLE) AS val_num,
      |       NULL AS val_str FROM events
      |UNION ALL SELECT 'user_id', 'distinct_exact',
      |       CAST(count(DISTINCT user_id) AS DOUBLE), NULL FROM events
      |UNION ALL SELECT 'value', 'null_cnt',
      |       CAST(count(*) - count(value) AS DOUBLE), NULL FROM events
      |UNION ALL SELECT 'value', 'min', round(min(value), 6), NULL FROM events
      |UNION ALL SELECT 'value', 'max', round(max(value), 6), NULL FROM events
      |UNION ALL SELECT 'event_type', 'null_cnt',
      |       CAST(count(*) - count(event_type) AS DOUBLE), NULL FROM events
      |UNION ALL SELECT 'user_id', 'distinct_kmv',
      |       CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
      |            ELSE round((k_used - 1) * 4294967296.0 / kth, 6) END,
      |       NULL FROM kagg
      |UNION ALL SELECT 'value', 'p50_hist', est, NULL FROM p50
      |UNION ALL SELECT 'event_type', 'top' || rn, CAST(c AS DOUBLE), v
      |FROM top3""".stripMargin

  /** Per-type median of events.value: histogram cells partitioned by
    * group (≤ groups×bins cells, one shuffle) next to the exact
    * per-group interpolated median.
    */
  private def evP50ByType(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val est = Sketches.histQuantileByGroup(ev, "event_type", "value",
      lo = 0.0, hi = 640.0, bins = 256, q = 0.5)
    val exact = ev.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5D)"), 6).as("p50_exact"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("hist_est").as("p50_hist"),
        col("p50_exact"))
  }

  private val evP50ByTypeSql =
    """WITH h AS (
      |  SELECT event_type,
      |         CAST(least(greatest(floor(value / 2.5::DOUBLE), 0), 255) AS BIGINT) AS bin,
      |         count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |c AS (SELECT event_type, bin, cnt,
      |        sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
      |        sum(cnt) OVER (PARTITION BY event_type) AS n
      |      FROM h),
      |sel AS (SELECT event_type, min(bin) AS bin FROM c
      |        WHERE cum >= 0.5::DOUBLE * n GROUP BY 1),
      |est AS (SELECT c.event_type,
      |          round(2.5::DOUBLE * (c.bin +
      |            (0.5::DOUBLE * c.n - (c.cum - c.cnt)) / c.cnt), 6) AS p50_hist
      |        FROM sel JOIN c ON c.event_type = sel.event_type
      |                       AND c.bin = sel.bin),
      |ex AS (SELECT event_type,
      |              round(quantile_cont(value, 0.5::DOUBLE), 6) AS p50_exact
      |       FROM events GROUP BY 1)
      |SELECT est.event_type, est.p50_hist, ex.p50_exact
      |FROM est JOIN ex ON est.event_type = ex.event_type""".stripMargin

  /** KMV set algebra: distinct users who click, who purchase, their
    * union via summary MERGE (k-sized state, no second corpus pass),
    * and the intersection by inclusion–exclusion — all beside exact
    * counts. At this cardinality the summaries are below k, so the
    * oracle pins merge correctness exactly.
    */
  private def evKmvSetops(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val k = 256
    def users(t: String) =
      ev.filter(col("event_type") === t).select("user_id")
    // each ≤k-row summary feeds two consumers (estimate + merge);
    // eager localCheckpoint computes the corpus sketch pass once
    val ska = Sketches.kmvMinHashes(users("click"), "user_id", k)
      .localCheckpoint(true)
    val skb = Sketches.kmvMinHashes(users("purchase"), "user_id", k)
      .localCheckpoint(true)
    val dvA = Sketches.kmvEstimate(ska, k).select(col("dv_est").as("dv_click"))
    val dvB = Sketches.kmvEstimate(skb, k).select(col("dv_est").as("dv_purchase"))
    val dvU = Sketches.kmvEstimate(Sketches.kmvMerge(ska, skb, k), k)
      .select(col("dv_est").as("dv_union"))
    val exact = ev.agg(
      count_distinct(when(col("event_type") === "click", col("user_id")))
        .as("exact_click"),
      count_distinct(when(col("event_type") === "purchase", col("user_id")))
        .as("exact_purchase"))
    val exactU = users("click").union(users("purchase"))
      .agg(count_distinct(col("user_id")).as("exact_union"))
    dvA.crossJoin(dvB).crossJoin(dvU)
      .select(col("dv_click"), col("dv_purchase"), col("dv_union"),
        round(col("dv_click") + col("dv_purchase") - col("dv_union"), 6)
          .as("dv_intersect"))
      .crossJoin(exact).crossJoin(exactU)
  }

  private val evKmvSetopsSql =
    """WITH ha AS (SELECT DISTINCT
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
      |  FROM events WHERE event_type = 'click'),
      |hb AS (SELECT DISTINCT
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
      |  FROM events WHERE event_type = 'purchase'),
      |ska AS (SELECT h FROM ha ORDER BY h LIMIT 256),
      |skb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
      |sku AS (SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
      |        ORDER BY h LIMIT 256),
      |ea AS (SELECT count(*) AS k_used, max(h) AS kth FROM ska),
      |eb AS (SELECT count(*) AS k_used, max(h) AS kth FROM skb),
      |eu AS (SELECT count(*) AS k_used, max(h) AS kth FROM sku),
      |est AS (SELECT
      |  CASE WHEN ea.k_used < 256 THEN CAST(ea.k_used AS DOUBLE)
      |       ELSE round((ea.k_used - 1) * 4294967296.0 / ea.kth, 6) END AS dv_click,
      |  CASE WHEN eb.k_used < 256 THEN CAST(eb.k_used AS DOUBLE)
      |       ELSE round((eb.k_used - 1) * 4294967296.0 / eb.kth, 6) END AS dv_purchase,
      |  CASE WHEN eu.k_used < 256 THEN CAST(eu.k_used AS DOUBLE)
      |       ELSE round((eu.k_used - 1) * 4294967296.0 / eu.kth, 6) END AS dv_union
      |  FROM ea, eb, eu)
      |SELECT dv_click, dv_purchase, dv_union,
      |  round(dv_click + dv_purchase - dv_union, 6) AS dv_intersect,
      |  (SELECT count(DISTINCT user_id) FROM events
      |    WHERE event_type = 'click') AS exact_click,
      |  (SELECT count(DISTINCT user_id) FROM events
      |    WHERE event_type = 'purchase') AS exact_purchase,
      |  (SELECT count(DISTINCT user_id) FROM events
      |    WHERE event_type IN ('click', 'purchase')) AS exact_union
      |FROM est""".stripMargin

  /** Ordered funnel: per user, did signup → click → purchase happen in
    * strict first-occurrence order? One groupBy(user) with conditional
    * min-timestamp aggregates — no joins, no window, one shuffle.
    */
  private def evFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def firstTs(t: String) =
      min(when(col("event_type") === t, unix_micros(col("ts"))))
    ev.groupBy("user_id")
      .agg(firstTs("signup").as("t_signup"), firstTs("click").as("t_click"),
        firstTs("purchase").as("t_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("t_signup")).as("n_signup"),
        count(when(col("t_signup") < col("t_click"), 1))
          .as("n_signup_then_click"),
        count(when(col("t_signup") < col("t_click") &&
          col("t_click") < col("t_purchase"), 1)).as("n_full_funnel"))
  }

  private val evFunnelSql =
    """WITH f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
      |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
      |  FROM events GROUP BY 1)
      |SELECT count(*) AS n_users,
      |  count(t_signup) AS n_signup,
      |  count(CASE WHEN t_signup < t_click THEN 1 END) AS n_signup_then_click,
      |  count(CASE WHEN t_signup < t_click AND t_click < t_purchase THEN 1 END)
      |    AS n_full_funnel
      |FROM f""".stripMargin

  /** The funnel's step-conversion rates with 95% Wilson score
    * intervals — the uncertainty-honest readout: a 3-of-7 step is NOT
    * "43%", it is "10–82%", and Wilson (unlike the Wald interval)
    * stays inside [0,1] and behaves at small counts and extreme
    * rates. z is pinned to the 6dp literal 1.959964 on both engines;
    * the interval is one fixed-order double expression over the exact
    * integer step counts, so the bounds replay bit-for-bit. Same
    * single-pass two-level aggregate as `ev_funnel`; the interval math
    * runs on the 3-row step domain.
    */
  private def evFunnelWilson(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def firstTs(t: String) =
      min(when(col("event_type") === t, unix_micros(col("ts"))))
    val base = ev.groupBy("user_id")
      .agg(firstTs("signup").as("t_signup"), firstTs("click").as("t_click"),
        firstTs("purchase").as("t_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("t_signup")).as("n_signup"),
        count(when(col("t_signup") < col("t_click"), 1))
          .as("n_signup_then_click"),
        count(when(col("t_signup") < col("t_click") &&
          col("t_click") < col("t_purchase"), 1)).as("n_full_funnel"))
    val steps = base.select(explode(array(
      struct(lit("1_signup").as("step"), col("n_users").as("n_prev"),
        col("n_signup").as("n_conv")),
      struct(lit("2_click_after_signup").as("step"),
        col("n_signup").as("n_prev"),
        col("n_signup_then_click").as("n_conv")),
      struct(lit("3_purchase_after_click").as("step"),
        col("n_signup_then_click").as("n_prev"),
        col("n_full_funnel").as("n_conv")))).as("s"))
      .select(col("s.step").as("step"), col("s.n_prev").as("n_prev"),
        col("s.n_conv").as("n_conv"))
    val z = lit(1.959964)
    val nD = col("n_prev").cast("double")
    val p = col("n_conv").cast("double") / nD
    val denom = lit(1.0) + z * z / nD
    val center = p + z * z / (lit(2.0) * nD)
    val rad = z * sqrt((p * (lit(1.0) - p) + z * z / (lit(4.0) * nD)) / nD)
    steps.select(col("step"), col("n_prev"), col("n_conv"),
      when(col("n_prev") === 0, lit(null).cast("double"))
        .otherwise(round(p, 6)).as("rate"),
      when(col("n_prev") === 0, lit(null).cast("double"))
        .otherwise(round((center - rad) / denom, 6)).as("wilson_lo"),
      when(col("n_prev") === 0, lit(null).cast("double"))
        .otherwise(round((center + rad) / denom, 6)).as("wilson_hi"))
  }

  private val evFunnelWilsonSql =
    """WITH f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
      |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
      |  FROM events GROUP BY 1),
      |a AS (SELECT count(*) AS n_users,
      |    count(t_signup) AS n_signup,
      |    count(CASE WHEN t_signup < t_click THEN 1 END)
      |      AS n_signup_then_click,
      |    count(CASE WHEN t_signup < t_click AND t_click < t_purchase
      |      THEN 1 END) AS n_full_funnel
      |  FROM f),
      |st AS (SELECT '1_signup' AS step,
      |         CAST(n_users AS BIGINT) AS n_prev,
      |         CAST(n_signup AS BIGINT) AS n_conv FROM a
      |  UNION ALL SELECT '2_click_after_signup',
      |         CAST(n_signup AS BIGINT), CAST(n_signup_then_click AS BIGINT)
      |    FROM a
      |  UNION ALL SELECT '3_purchase_after_click',
      |         CAST(n_signup_then_click AS BIGINT),
      |         CAST(n_full_funnel AS BIGINT) FROM a)
      |SELECT step, n_prev, n_conv,
      |  CASE WHEN n_prev = 0 THEN NULL ELSE
      |    round(CAST(n_conv AS DOUBLE) / CAST(n_prev AS DOUBLE), 6) END
      |    AS rate,
      |  CASE WHEN n_prev = 0 THEN NULL ELSE
      |    round(((CAST(n_conv AS DOUBLE) / CAST(n_prev AS DOUBLE)
      |        + 1.959964 * 1.959964 / (2.0 * CAST(n_prev AS DOUBLE)))
      |      - 1.959964 * sqrt(((CAST(n_conv AS DOUBLE) /
      |          CAST(n_prev AS DOUBLE)) * (1.0 - CAST(n_conv AS DOUBLE) /
      |          CAST(n_prev AS DOUBLE)) + 1.959964 * 1.959964 /
      |          (4.0 * CAST(n_prev AS DOUBLE))) / CAST(n_prev AS DOUBLE)))
      |      / (1.0 + 1.959964 * 1.959964 / CAST(n_prev AS DOUBLE)), 6) END
      |    AS wilson_lo,
      |  CASE WHEN n_prev = 0 THEN NULL ELSE
      |    round(((CAST(n_conv AS DOUBLE) / CAST(n_prev AS DOUBLE)
      |        + 1.959964 * 1.959964 / (2.0 * CAST(n_prev AS DOUBLE)))
      |      + 1.959964 * sqrt(((CAST(n_conv AS DOUBLE) /
      |          CAST(n_prev AS DOUBLE)) * (1.0 - CAST(n_conv AS DOUBLE) /
      |          CAST(n_prev AS DOUBLE)) + 1.959964 * 1.959964 /
      |          (4.0 * CAST(n_prev AS DOUBLE))) / CAST(n_prev AS DOUBLE)))
      |      / (1.0 + 1.959964 * 1.959964 / CAST(n_prev AS DOUBLE)), 6) END
      |    AS wilson_hi
      |FROM st""".stripMargin

  /** Conversion-window funnel signup → click (≤7d) → purchase (≤7d
    * after the bound click): greedy earliest-qualifying chaining, the
    * product-analytics semantics where a conversion must happen inside
    * the window — a different operator from `ev_funnel`'s
    * first-occurrence ordering. See
    * [[graft.ops.Analytics.windowedFunnel]].
    */
  private def evFunnelWindowed(s: SparkSession, dir: String): DataFrame =
    graft.ops.Analytics.windowedFunnel(Tables.events(s, dir), "user_id",
      "ts", "event_type", Seq("signup", "click", "purchase"),
      windowMicros = 7L * 24 * 3600 * 1000000)

  private val evFunnelWindowedSql =
    """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      |       FROM events e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
      |         AND epoch_us(e.ts) <= s1.t1 + 604800000000 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      |       FROM events e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
      |         AND epoch_us(e.ts) <= s2.t2 + 604800000000 GROUP BY 1)
      |SELECT (SELECT count(*) FROM s1) AS n_1,
      |       (SELECT count(*) FROM s2) AS n_2,
      |       (SELECT count(*) FROM s3) AS n_3,
      |       round((SELECT count(*) FROM s2) * 1.0 /
      |             (SELECT count(*) FROM s1), 6) AS rate_2,
      |       round((SELECT count(*) FROM s3) * 1.0 /
      |             (SELECT count(*) FROM s1), 6) AS rate_3""".stripMargin

  /** Weekly retention cohorts: users bucketed by first-seen week,
    * counted per (cohort_week, active_week) — the training-data-ops
    * equivalent of "is my event feed complete per cohort". Two
    * aggregations and one broadcast-sized join on user first-weeks.
    */
  private def evRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(604800000000L)).as("week"))
    val cohorts = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.distinct() // (user_id, week) unique ⇒ plain count below is distinct
      .join(cohorts, "user_id")
      .groupBy("cohort_week", "week")
      .agg(count(lit(1)).as("active_users"))
  }

  private val evRetentionSql =
    """WITH ev AS (
      |  SELECT user_id,
      |         CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS week
      |  FROM events),
      |cohorts AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1)
      |SELECT c.cohort_week, e.week, count(*) AS active_users
      |FROM (SELECT DISTINCT user_id, week FROM ev) e
      |JOIN cohorts c ON c.user_id = e.user_id
      |GROUP BY 1, 2""".stripMargin

  /** Semi-structured extraction: pull a typed field out of the JSON
    * props column scan-side (`get_json_object` stays inside whole-
    * stage codegen — no UDF, no schema-inference pass) and aggregate
    * it per type.
    */
  private def evJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), count(col("k")).as("k_present"),
        sum("k").as("sum_k"), round(avg("k"), 6).as("avg_k"))

  private val evJsonExtractSql =
    """SELECT event_type, count(*) AS cnt,
      |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_present,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
      |FROM events GROUP BY 1""".stripMargin

  /** Per-type moment statistics: mean, sample variance/stddev, and the
    * spread, all map-side-combinable (sum/sum-of-squares partials) in
    * one shuffle. Rounded 6dp on both engines for IEEE parity.
    */
  private def evTypeStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        round(avg("value"), 6).as("mean_v"),
        round(var_samp("value"), 6).as("var_v"),
        round(stddev_samp("value"), 6).as("sd_v"),
        round(max("value") - min("value"), 6).as("range_v"))

  private val evTypeStatsSql =
    """SELECT event_type, count(*) AS cnt,
      |  round(avg(value), 6) AS mean_v,
      |  round(var_samp(value), 6) AS var_v,
      |  round(stddev_samp(value), 6) AS sd_v,
      |  round(max(value) - min(value), 6) AS range_v
      |FROM events GROUP BY 1""".stripMargin

  /** AMS tug-of-war F2 (self-join size on user_id) vs the exact fold:
    * 16 signed counters price the user-key shuffle skew from O(1)
    * state. Signs are the pinned md5 parity family, cells additive —
    * the oracle replays the sketch AND the estimator exactly (group
    * means have a .25 grain, median-of-4 is (sum−min−max)/2; no
    * order-dependent float sum). See [[graft.ops.Sketches.amsF2Estimate]].
    */
  private def evF2Ams(s: SparkSession, dir: String): DataFrame =
    Sketches.amsF2Estimate(Tables.events(s, dir), "user_id", r = 16)

  private val evF2AmsSql =
    """WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events
      |            WHERE user_id IS NOT NULL),
      |js AS (SELECT unnest(range(16)) AS j),
      |cells AS (
      |  SELECT j, CAST(sum(
      |      CAST('0x' || substr(md5(j || ':' || key), 1, 8) AS BIGINT)
      |        % 2 * 2 - 1) AS BIGINT) AS z
      |  FROM ev CROSS JOIN js GROUP BY 1),
      |means AS (
      |  SELECT CAST(j // 4 AS INT) AS g,
      |         CAST(sum(z * z) AS BIGINT) / 4.0 AS m
      |  FROM cells GROUP BY 1),
      |est AS (SELECT (sum(m) - min(m) - max(m)) / 2.0 AS f2_ams
      |        FROM means),
      |exact AS (
      |  SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS f2_exact
      |  FROM (SELECT count(*) AS c FROM ev GROUP BY key))
      |SELECT f2_exact, round(f2_ams, 6) AS f2_ams,
      |       round(abs(f2_ams - f2_exact) / f2_exact, 6) AS rel_err
      |FROM exact CROSS JOIN est""".stripMargin

  def qs: Seq[QueryDef] = Seq(
    QueryDef("ev_f2_ams", evF2Ams, Some(evF2AmsSql)),
    QueryDef("ev_type_stats", evTypeStats, Some(evTypeStatsSql)),
    QueryDef("ev_json_extract", evJsonExtract, Some(evJsonExtractSql)),
    QueryDef("ev_funnel", evFunnel, Some(evFunnelSql)),
    QueryDef("ev_funnel_wilson", evFunnelWilson, Some(evFunnelWilsonSql)),
    QueryDef("ev_funnel_windowed", evFunnelWindowed,
      Some(evFunnelWindowedSql)),
    QueryDef("ev_retention_cohorts", evRetention, Some(evRetentionSql)),
    QueryDef("ev_heavy_hitters", evHeavyHitters, Some(evHeavyHittersSql)),
    QueryDef("ev_heavy_hitters_by_type", evHeavyHittersByType,
      Some(evHeavyHittersByTypeSql)),
    QueryDef("ev_recency_score", evRecencyScore, Some(evRecencyScoreSql)),
    QueryDef("ev_freq_cms", evFreqCms, Some(evFreqCmsSql)),
    QueryDef("ev_distinct_kmv", evDistinctKmv, Some(evDistinctKmvSql)),
    QueryDef("ev_distinct_hll", evDistinctHll, Some(evDistinctHllSql)),
    QueryDef("ev_distinct_hll_by_type", evDistinctHllByType,
      Some(evDistinctHllByTypeSql)),
    QueryDef("ev_value_quantiles", evValueQuantiles,
      Some(evValueQuantilesSql)),
    QueryDef("profile_events", profileEvents, Some(profileEventsSql)),
    QueryDef("profile_documents", profileDocuments,
      Some(profileDocumentsSql)),
    QueryDef("ev_p50_by_type", evP50ByType, Some(evP50ByTypeSql)),
    QueryDef("ev_kmv_setops", evKmvSetops, Some(evKmvSetopsSql)),
  )
}
