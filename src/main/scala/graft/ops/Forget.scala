package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten deletion cascade: given a seed set of entity
  * keys, walk a foreign-key chain (customer → orders → line items; user
  * → events → derived docs) marking every dependent row for deletion,
  * and report per-table deletion/survivor counts — the audit artifact a
  * GDPR/CCPA erasure job must produce before anything is rewritten.
  *
  * Scale shape: each level is a LEFT SEMI join of the child table
  * against the previous level's deleted-key set — never a row-payload
  * join, and the key set is deduplicated before it propagates. The seed
  * (an erasure request list) is broadcast; downstream key sets flow
  * through AQE, which keeps them broadcast while they fit and falls
  * back to a shuffle semi-join when a cascade fans out past that. The
  * whole cascade is one Catalyst tree: counts come from one action, and
  * the deleted-key scans are shared between the count and any
  * subsequent rewrite via the same plan.
  */
object Forget {

  /** One cascade level: `df` is deleted where `fkCol` hits the previous
    * level's key set; `keyCol` seeds the next level.
    */
  final case class Level(name: String, df: DataFrame,
                         fkCol: String, keyCol: String)

  /** Per-level `(table, n_deleted, n_kept)` for deleting `seedKeys`
    * (a single-column DataFrame) from the head of the chain and
    * cascading through each level in order. Each level's deleted-key
    * set feeds two consumers (its count row and the next level's semi
    * join), so it is materialized through [[graft.data.ScopedCaches]] —
    * key sets are small by the nature of erasure requests, and without
    * the cache every downstream level would replay the whole upstream
    * join chain against full tables.
    */
  def cascadeCounts(seedKeys: DataFrame, levels: Seq[Level]): DataFrame = {
    require(levels.nonEmpty, "need at least one cascade level")
    val seed = broadcast(
      seedKeys.toDF("__fk").select(col("__fk").cast("long")).distinct())
    val (rows, _) = levels.foldLeft(
      (Vector.empty[DataFrame], seed)) { case ((acc, keys), lv) =>
      val deleted = lv.df.join(keys, lv.df(lv.fkCol) === keys("__fk"),
        "left_semi")
      val counts = lv.df.agg(count(lit(1)).as("n_total"))
        .crossJoin(broadcast(deleted.agg(count(lit(1)).as("n_deleted"))))
        .select(lit(lv.name).as("table"), col("n_deleted"),
          (col("n_total") - col("n_deleted")).as("n_kept"))
      val nextKeys = graft.data.ScopedCaches.materialize(
        deleted.select(col(lv.keyCol).cast("long").as("__fk")).distinct())
      (acc :+ counts, nextKeys)
    }
    rows.reduce(_.unionByName(_))
  }

  /** Subject-access report (the DSAR read counterpart of
    * [[cascadeCounts]]): for every seed subject, the per-table row
    * count along the same FK chain — "what do we hold about this
    * person", the manifest an access-request export is built from and
    * audited against. One row per (subject, table) actually holding
    * data; the seed table itself reports its (0 or 1) row, so a
    * requester absent everywhere still gets an explicit empty
    * manifest.
    *
    * Scale shape: the seed key set broadcasts (erasure/access request
    * lists are small); each level is one semi/inner join against it
    * plus a per-subject combinable count — the subject column rides
    * the join key, so no row payload travels. Levels must carry the
    * subject: tables keyed indirectly (lineitem) join through their
    * parent's (subject, childKey) projection, which is itself
    * count-aggregated before the child join when the fan-out warrants
    * it.
    */
  def subjectAccessReport(seedKeys: DataFrame, subjectTables:
      Seq[(String, DataFrame, String)]): DataFrame = {
    require(subjectTables.nonEmpty, "need at least one table")
    val seed = broadcast(
      seedKeys.toDF("__subj").select(col("__subj").cast("long")).distinct())
    subjectTables.map { case (name, df, subjCol) =>
      df.join(seed, df(subjCol) === col("__subj"))
        .groupBy(col("__subj").as("subject"))
        .agg(count(lit(1)).as("n_rows"))
        .select(col("subject"), lit(name).as("table"), col("n_rows"))
    }.reduce(_.unionByName(_))
  }

  /** ε-differentially-private histogram release (Dwork et al. 2006):
    * per-key counts plus Laplace(1/ε) noise — the count histogram has
    * global sensitivity 1 under add/remove-one-row adjacency, so
    * scale b = 1/ε gives ε-DP. The noise draw is PINNED: u is derived
    * from 52 md5 bits of the key (u = (h + 0.5)/2^52 ∈ (0,1), never
    * exactly ½), inverse-CDF'd to Laplace via
    * −b·sign(u−½)·ln(1−2|u−½|), so releases are reproducible across
    * engines and retries — the production pattern of a seeded DP
    * release, with the caveat (documented, deliberate) that a TRUE
    * privacy deployment must swap the keyed hash for a secret seed;
    * the mechanism, sensitivity math, and utility audit are the
    * operator. Output per key: true n, noisy release, |noise|, ε —
    * the utility-vs-ε audit table.
    *
    * Scale shape: ONE combinable count aggregate; the noise is a
    * scan-side expression on the key-domain result. Nothing changes at
    * 100 TB.
    */
  def dpLaplaceHistogram(df: DataFrame, keyCol: org.apache.spark.sql.Column,
                         epsilon: Double,
                         salt: String = "dpnoise"): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val counts = df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("n"))
    val h = conv(substring(md5(concat(lit(salt), lit(":"),
      col("key").cast("string"))), 1, 13), 16, 10).cast("long")
    val c = (h.cast("double") + 0.5) / lit(4503599627370496.0) - 0.5
    val noise = -lit(1.0 / epsilon) * signum(c) *
      log(lit(1.0) - lit(2.0) * abs(c))
    counts.select(col("key"), col("n"),
      round(col("n") + noise, 6).as("noisy_n"),
      round(abs(noise), 6).as("abs_noise"),
      lit(epsilon).as("epsilon"))
  }
}
