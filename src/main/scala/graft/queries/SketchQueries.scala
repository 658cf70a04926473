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

  def qs: Seq[QueryDef] = Seq(
    QueryDef("ev_heavy_hitters", evHeavyHitters, Some(evHeavyHittersSql)),
  )
}
