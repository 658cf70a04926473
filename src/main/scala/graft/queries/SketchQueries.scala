package graft.queries

import graft.Tables
import graft.ops.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def qs: Seq[QueryDef] = Seq(
    QueryDef("ev_heavy_hitters", evHeavyHitters, Some(evHeavyHittersSql)),
    QueryDef("ev_freq_cms", evFreqCms, Some(evFreqCmsSql)),
    QueryDef("ev_distinct_kmv", evDistinctKmv, Some(evDistinctKmvSql)),
    QueryDef("ev_value_quantiles", evValueQuantiles,
      Some(evValueQuantilesSql)),
  )
}
