package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Bounded-memory streaming summaries for frequency statistics over
  * corpora too large to group exactly: Misra–Gries heavy hitters with
  * an exact verification join-back.
  *
  * Reference behavior: the reference engine materializes full per-key
  * count tables (`CNT` relations) before thresholding; at 100 TB a
  * full groupBy over a high-cardinality key (URL, user id, shingle)
  * shuffles one record per distinct key. The sketch path caps the
  * candidate phase at O(partitions × k) state and only recounts the
  * surviving candidates exactly, so the answer is still exact — the
  * sketch narrows the work, it never decides the output.
  */
object Sketches {

  /** Per-partition Misra–Gries candidate keys for frequency > n/k.
    *
    * Classic MG (Misra & Gries 1982; merge analysis in Agarwal et al.,
    * "Mergeable Summaries", PODS 2012): k counters per partition; a key
    * absent from a full counter table decrements every counter by one.
    * Any key with partition frequency f_p > n_p/k ends with a positive
    * counter. Globally, if f > N/k then some partition has
    * f_p > n_p/k (pigeonhole over f = Σf_p, N = Σn_p), so the UNION of
    * per-partition survivors is a superset of the global >N/k keys —
    * no cross-partition merge step needed for the candidate phase.
    *
    * Returns ≤ numPartitions × k distinct keys as strings. The
    * surviving counter values are partition-order-dependent lower
    * bounds, so they are deliberately NOT returned — only the key set
    * is, and the exact join-back recounts it deterministically.
    */
  def mgCandidates(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string")).as[String]
      .mapPartitions { it =>
        val counters = mutable.HashMap.empty[String, Long]
        it.foreach { x =>
          counters.get(x) match {
            case Some(c) => counters.update(x, c + 1L)
            case None if counters.size < k => counters.update(x, 1L)
            case None =>
              // decrement-all; snapshot first (no mutation mid-iterate)
              counters.toArray.foreach { case (key, c) =>
                if (c == 1L) counters.remove(key)
                else counters.update(key, c - 1L)
              }
          }
        }
        counters.keysIterator
      }
      .toDF("key").distinct()
  }

  /** Exact heavy hitters — keys with count >= ceil(phi × N) — computed
    * with MG candidate pruning instead of a full-cardinality groupBy.
    *
    * Requires k > 1/phi so every qualifying key has f >= ceil(phi·N)
    * >= phi·N > N/k and therefore survives [[mgCandidates]]; keys the
    * sketch over-admits are removed by the exact count filter, so the
    * output is invariant to partitioning even though the candidate set
    * is not.
    *
    * Execution: one sketch pass (no shuffle — candidates are collected,
    * ≤ partitions × k strings), then ONE exact pass that folds the
    * total-count scan and the candidate recount into a single
    * aggregation: non-candidate rows are grouped under NULL (scan-side
    * `isin` on the broadcast candidate set, InSet O(1) per row), so N
    * is the sum of all group counts and no third scan is needed.
    * Null-valued keys therefore cannot be heavy hitters by this
    * operator's contract (they fold into the catch-all group).
    */
  def heavyHitters(df: DataFrame, keyCol: String, phi: Double,
                   k: Int): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0,1), got $phi")
    require(k > 1.0 / phi,
      s"k=$k too small for phi=$phi: need k > ${1.0 / phi} for the MG superset guarantee")
    val cand = mgCandidates(df, keyCol, k).as[String](
      org.apache.spark.sql.Encoders.STRING).collect()

    val keyStr = col(keyCol).cast("string")
    val grouped = df
      .groupBy(when(keyStr.isin(cand.toIndexedSeq: _*), keyStr)
        .otherwise(lit(null)).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .cache()
    try {
      // ≤ |cand|+1 rows; total N recovered without a separate scan
      val n = grouped.agg(sum("cnt")).head.getLong(0)
      val threshold = math.ceil(phi * n).toLong
      grouped.filter(col("key").isNotNull && col("cnt") >= threshold)
        .select(col("key"), col("cnt"))
        // materialize off the cached plan before unpersist
        .localCheckpoint(true)
    } finally grouped.unpersist()
  }
}
