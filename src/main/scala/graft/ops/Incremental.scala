package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-aggregation state: the mergeable-moments pattern behind
  * every warehouse's incremental rollup. A batch reduces to a tiny
  * per-group STATE (count, sum, sum of squares, min, max); states from
  * any number of batches merge by plain addition/min/max — associative
  * and commutative, so daily jobs, backfills, and late data all compose
  * without rereading history; finalize derives avg/stddev from the
  * merged moments. At 100 TB this is the difference between "aggregate
  * the delta and add it" and "rescan the world".
  */
object Incremental {

  /** Per-group moment state of `valCol`: one combinable aggregate. */
  def momentState(df: DataFrame, groupCols: Seq[String],
                  valCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(col(valCol)).as("m_n"),
        sum(col(valCol)).as("m_sum"),
        sum(col(valCol) * col(valCol)).as("m_sumsq"),
        min(col(valCol)).as("m_min"),
        max(col(valCol)).as("m_max"))

  /** Merge any number of compatible states: addition for the moments,
    * min/max for the extremes — associative, so merge order is free.
    */
  def mergeStates(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("m_n")).as("m_n"), sum(col("m_sum")).as("m_sum"),
        sum(col("m_sumsq")).as("m_sumsq"),
        min(col("m_min")).as("m_min"), max(col("m_max")).as("m_max"))
  }

  /** Finalize a state to (n, avg, stddev_samp, min, max). The sample
    * stddev comes from the moment identity
    * s² = (Σx² − (Σx)²/n) / (n−1); at warehouse magnitudes the
    * cancellation error sits orders below the 6dp output rounding (and
    * a negative epsilon from cancellation clamps to 0). Singleton
    * groups have no sample stddev — null.
    */
  def finalizeMoments(state: DataFrame, groupCols: Seq[String]): DataFrame = {
    val variance = greatest(
      (col("m_sumsq") - col("m_sum") * col("m_sum") / col("m_n")) /
        (col("m_n") - 1), lit(0d))
    state.select(groupCols.map(col) ++ Seq(
      col("m_n").as("n"),
      round(col("m_sum") / col("m_n"), 6).as("avg"),
      round(when(col("m_n") >= 2, sqrt(variance)), 6).as("stddev"),
      col("m_min").as("vmin"), col("m_max").as("vmax")): _*)
  }
}
