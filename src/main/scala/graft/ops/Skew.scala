package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling (on by default in
  * [[graft.Sessions]]) covers sort-merge joins; this explicit salting
  * covers the cases AQE can't re-plan — e.g. a skewed `groupBy` key or a
  * broadcast-ineligible dimension join where one key dominates.
  */
object Skew {

  /** Inner equi-join with salted keys: the big (skewed) side gets a
    * deterministic salt from its row content, the small side is exploded
    * into one replica per salt, and the join runs on (keys + salt) so a
    * hot key spreads over `numSalts` shuffle partitions. Result equals
    * the plain inner join (each big row matches exactly the replica
    * carrying its salt).
    */
  /** Row-position salt: content-derived hashing would give every copy of
    * a duplicated hot row the same salt — exactly the rows that need
    * spreading. The salt value itself never affects correctness (the
    * small side carries every salt), so per-execution position ids are
    * safe.
    */
  private def rowSalt(numSalts: Int) =
    pmod(monotonically_increasing_id(), lit(numSalts.toLong)).cast("int")

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 numSalts: Int): DataFrame = {
    require(numSalts > 0)
    val saltedBig = big.withColumn("__salt", rowSalt(numSalts))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", "inner").drop("__salt")
  }

  /** Two-phase aggregation for a skewed group key: partial aggregate on
    * (keys + salt), then final aggregate on the keys. `partial` and
    * `merge` must form the usual partial/final pair (e.g. count -> sum).
    */
  def saltedCount(df: DataFrame, keys: Seq[String], numSalts: Int): DataFrame = {
    require(numSalts > 0)
    df.withColumn("__salt", rowSalt(numSalts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("cnt"))
  }

  /** One-row skew audit of a prospective join/group key: key count,
    * max/avg/p99 per-key row counts, and the max/avg skew ratio — the
    * measurement that decides whether [[saltedJoin]]/[[saltedCount]] (or
    * AQE's skew split) is worth invoking, made BEFORE shipping a
    * shuffle that one hot key would serialize. Ratios round to 6dp
    * against exact integer counts; avg is exact (integer sum / count).
    *
    * Scale shape: one map-side-combinable count per key, then one
    * key-domain-sized aggregate — the same two-phase shape as
    * [[saltedCount]] itself, so the audit is never more expensive than
    * the aggregation it derisks. (Exact percentile sorts the per-key
    * counts inside one reduce; at extreme key cardinality swap in
    * `approx_percentile`.)
    */
  def keySkewAudit(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .agg(count(lit(1)).as("n_keys"),
        max(col("__cnt")).as("max_cnt"),
        round(avg(col("__cnt")), 6).as("avg_cnt"),
        round(percentile(col("__cnt"), lit(0.99)), 6).as("p99_cnt"),
        round(max(col("__cnt")) / avg(col("__cnt")), 6).as("skew_ratio"))
}
