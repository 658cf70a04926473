package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each left row the payload of
  * the latest right row with the same key and `ts <= left.ts`.
  *
  * The classic formulations both fail at scale: a range-predicate
  * theta-join degenerates to a per-key cross product, and a windowed
  * "latest before" correlated subquery rescans the right side per left
  * row. This implementation is the union-tag forward-fill: tag both
  * sides, union, ONE hash shuffle on the key with an in-partition sort
  * by (ts, side), then `last(payload, ignoreNulls)` over the running
  * window forward-fills each left row with the most recent right
  * payload. Cost is sort-merge-like — no row ever meets more than its
  * own partition, and AQE handles key skew like any other shuffle.
  *
  * Semantics notes:
  *  - inclusive: a right row at exactly left.ts matches (right rows
  *    sort before left rows at equal ts);
  *  - left-outer: left rows with no preceding right row keep NULL
  *    payloads;
  *  - right rows are first reduced to one per (key, ts) by MAX of the
  *    payload struct (lexicographic by field order — lead with a
  *    unique id column for a deterministic tie-break), so the result
  *    is well-defined even with timestamp collisions.
  */
object AsofJoin {

  /** @param payloadCols right-side columns carried onto left rows
    *                    (returned as `prefix + name`, NULL when no
    *                    right row precedes).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val leftCols = left.columns.toSeq
    val r = right
      // equality-join semantics: a NULL key matches nothing, so NULL-
      // key right rows must not seed the forward fill (NULL-key left
      // rows share a window partition and would otherwise absorb them)
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("_k"), col(tsCol).as("_ts"))
      .agg(max(struct(payloadCols.map(col): _*)).as("_p"))
      .withColumn("_side", lit(0))
      .withColumn("_l", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          left.schema.fields.map(f => f.copy()))))
    val l = left
      .select(col(keyCol).as("_k"), col(tsCol).as("_ts"), lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_l"))
      .withColumn("_p", lit(null).cast(r.schema("_p").dataType))
      .select("_k", "_ts", "_p", "_side", "_l")

    val w = Window.partitionBy("_k").orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.select("_k", "_ts", "_p", "_side", "_l").union(l)
      .withColumn("_f", last("_p", ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        payloadCols.map(c => col(s"_f.$c").as(prefix + c)): _*)
  }
}
