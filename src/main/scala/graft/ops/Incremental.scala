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

  /** Per-group equi-width histogram STATE of `valCol`: one row per
    * (group, bin) with the bin's count — the mergeable complement of
    * [[momentState]] for quantiles, which moments can't answer. The
    * [lo, hi) range and bin count are CALLER-PINNED, never derived from
    * the batch: data-dependent bounds would make states from different
    * days non-mergeable, which is the entire point. Out-of-range values
    * clamp into the edge bins (the state's own min/max audit is
    * `momentState`, which shares the scan). One combinable aggregate;
    * empty bins are simply absent rows.
    */
  def histogramState(df: DataFrame, groupCols: Seq[String], valCol: String,
                     lo: Double, hi: Double, bins: Int): DataFrame = {
    require(hi > lo && bins >= 1, s"need hi > lo and bins >= 1")
    val bin = least(greatest(
      floor((col(valCol) - lit(lo)) / (lit(hi) - lit(lo)) * lit(bins))
        .cast("int"), lit(0)), lit(bins - 1))
    df.groupBy((groupCols.map(col) :+ bin.as("h_bin")): _*)
      .agg(count(lit(1)).as("h_cnt"))
  }

  /** Merge histogram states: union + per-(group, bin) count addition —
    * associative and commutative like the moments merge.
    */
  def mergeHistograms(states: Seq[DataFrame],
                      groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("h_bin")): _*)
      .agg(sum(col("h_cnt")).as("h_cnt"))
  }

  /** Quantile estimates from a merged histogram state: for each
    * requested p, the first bin whose cumulative count reaches p·N,
    * linearly interpolated inside the bin — the classic equi-width
    * estimator, deterministic given the pinned (lo, hi, bins) contract
    * (error bounded by bin width; tighten by raising `bins`, the state
    * stays tiny). The cumulative window runs over groups × bins rows —
    * state-sized, never data-sized. Output one row per (group, p).
    */
  def histogramQuantiles(state: DataFrame, groupCols: Seq[String],
                         lo: Double, hi: Double, bins: Int,
                         ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val wBefore = Window.partitionBy(gcols: _*).orderBy(col("h_bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val wAll = Window.partitionBy(gcols: _*)
    val cum = state.select(gcols ++ Seq(col("h_bin"), col("h_cnt"),
      coalesce(sum(col("h_cnt")).over(wBefore), lit(0L)).as("__before"),
      sum(col("h_cnt")).over(wAll).as("__n")): _*)
    val probes = state.sparkSession
      .createDataFrame(ps.map(Tuple1(_))).toDF("p")
    val width = (lit(hi) - lit(lo)) / lit(bins)
    cum.join(broadcast(probes),
        col("__before") < col("p") * col("__n") &&
          col("__before") + col("h_cnt") >= col("p") * col("__n"))
      .select(gcols ++ Seq(col("p"), col("__n").as("n"),
        round(lit(lo) + col("h_bin") * width +
          (col("p") * col("__n") - col("__before")) / col("h_cnt") * width,
          6).as("estimate")): _*)
  }
}
