package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pair every left row with the right rows of
  * the same key whose timestamp falls in a fixed-length window after
  * the left timestamp — the "events within N hours of the anchor"
  * shape (attribution windows, follow-up counting, co-occurrence).
  *
  * A key-equijoin with a range residual makes every left row meet every
  * same-key right row before filtering — per-key cross products that
  * melt down on hot keys. This implementation buckets time by the
  * window length W: a window (t0, t0+W] can only intersect buckets
  * ⌊t0/W⌋ and ⌊t0/W⌋+1, so the left side is exploded to exactly those
  * two bucket ids and the join becomes an equijoin on (key, bucket) —
  * each right row meets only the left rows anchored in its own or the
  * previous bucket, shrinking the join granularity from per-key to
  * per-(key × W-window). The exact range predicate then trims the
  * bucket-coarse candidates. One shuffle on (key, bucket); AQE treats
  * residual hot buckets like any other skewed key.
  */
object IntervalJoin {

  /** Inner join of `left` and `right` on `keyCol` with
    * `right.ts ∈ (left.ts, left.ts + lengthMicros]` (set
    * `inclusiveStart` for a closed start). Timestamp columns must be
    * TimestampType and distinctly named; non-key column names must not
    * collide across sides. Output: all left columns + all right
    * columns except its key.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTsCol: String, rightTsCol: String,
                   lengthMicros: Long,
                   inclusiveStart: Boolean = false): DataFrame = {
    require(lengthMicros > 0, s"window must be positive, got $lengthMicros")
    require(leftTsCol != rightTsCol,
      "timestamp columns must be distinctly named")
    require(!left.columns.contains("_b") && !right.columns.contains("_b"),
      "a '_b' column on either side would be overwritten by the bucket id")
    // Column./ is double division, but micros < 2^53 are exact doubles
    // and a non-multiple quotient sits >= 1/W from any integer, far
    // beyond one ulp — so floor() here can never round across a bucket
    // boundary (unlike the ns->us loader case, which divided ~1e18).
    val lUs = unix_micros(col(leftTsCol))
    val rUs = unix_micros(col(rightTsCol))
    val lb = left.withColumn("_b",
      explode(array(floor(lUs / lengthMicros),
        floor(lUs / lengthMicros) + 1)))
    val rb = right.withColumn("_b", floor(rUs / lengthMicros))
    val startCmp = if (inclusiveStart) rUs >= lUs else rUs > lUs
    lb.join(rb, Seq(keyCol, "_b"))
      .filter(startCmp && rUs <= lUs + lengthMicros)
      .drop("_b")
  }
}
