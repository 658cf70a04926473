package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** 2-D Pareto frontier (skyline): the rows not dominated by any other
  * row, maximizing two numeric dimensions — "best price for its
  * recency" / "no strictly better trade-off exists". A row is dominated
  * iff some other row is ≥ on both dimensions and > on at least one.
  *
  * Shape: the naive formulation is a NOT EXISTS self-join (quadratic);
  * a single global sort-with-running-max is linear but serializes the
  * whole distinct-x domain into one partition. This implementation
  * two-levels the running max so every step is either map-combinable or
  * partition-parallel:
  *
  *  1. collapse to per-distinct-x max(y) (map-side combinable — equal-x
  *     rows with lower y are dominated by definition);
  *  2. coarse-bucket x; per-bucket max(y) is another combinable
  *     aggregate, and the cross-bucket running max over STRICTLY HIGHER
  *     buckets is a window over the DOMAIN-sized bucket table (every x
  *     in a higher bucket is strictly greater, so the strictness the
  *     dominance test needs is preserved by construction);
  *  3. the within-bucket running max over strictly higher x is a window
  *     PARTITIONED BY bucket — parallel across buckets, never a global
  *     sort.
  *
  * A candidate survives iff neither running max reaches its y
  * (`m >= y` would dominate: the dominator has strictly greater x).
  * Surviving (x, maxy) pairs — skyline-sized, tiny — broadcast-join
  * back to the input, so ties on both dimensions all surface.
  */
object Skyline {

  /** Frontier rows of `df` maximizing (`xCol`, `yCol`), both numeric.
    * `bucketWidth` is the coarse x-bucket size — pick so the bucket
    * count stays domain-sized (x-range / width ≲ 10⁵); correctness does
    * not depend on it.
    */
  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"need bucketWidth > 0, got $bucketWidth")
    val pd = df.groupBy(col(xCol).as("__x"))
      .agg(F.max(col(yCol)).as("__maxy"))
      .withColumn("__bucket", floor(col("__x") / lit(bucketWidth)))
    val bmax = pd.groupBy(col("__bucket"))
      .agg(F.max(col("__maxy")).as("__bmaxy"))
    val wB = Window.orderBy(col("__bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val brun = bmax.select(col("__bucket"),
      F.max(col("__bmaxy")).over(wB).as("__hmax"))
    val wX = Window.partitionBy(col("__bucket"))
      .orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val survivors = pd.join(broadcast(brun), Seq("__bucket"))
      .withColumn("__wmax", F.max(col("__maxy")).over(wX))
      .filter((col("__hmax").isNull || col("__hmax") < col("__maxy")) &&
        (col("__wmax").isNull || col("__wmax") < col("__maxy")))
      .select(col("__x"), col("__maxy"))
    df.join(broadcast(survivors),
        col(xCol) === col("__x") && col(yCol) === col("__maxy"))
      .drop("__x", "__maxy")
  }
}
