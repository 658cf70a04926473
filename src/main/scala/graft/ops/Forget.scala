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
}
