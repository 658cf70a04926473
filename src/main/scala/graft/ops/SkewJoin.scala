package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join: the standard skew-breaker when one join key is
  * hot enough to pin a whole shuffle partition on a single task (the
  * "one straggler executor for an hour" failure at 100 TB) and the
  * small side is too big to broadcast outright.
  *
  * The big (skewed) side tags every row with a deterministic salt in
  * [0, salts) derived from the full row (`xxhash64` over all columns —
  * row-varying, so a hot key's rows spread evenly; no RNG, so re-runs
  * and retries land identically). The small side replicates each row
  * once per salt. Joining on (key, salt) then splits every hot key's
  * work across `salts` tasks while preserving EXACT inner-equi-join
  * semantics: each big-side row carries one salt and meets each
  * matching small-side row in exactly one replica.
  *
  * Cost model: small side ×salts on the wire vs the hot partition
  * ÷salts — worth it when skew dominates, which is why `salts` is a
  * caller decision (AQE's skew-join handles moderate skew after the
  * fact; salting plans for it up front and composes with bucketing).
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `key`, salted `salts`
    * ways. Null keys never match, exactly as in the unsalted join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts >= 1, s"need salts >= 1, got $salts")
    val b = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts))
        .cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
