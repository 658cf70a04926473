package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group ranking/selection for training-data pipelines — "keep the
  * best k documents per language/domain/source" is the standard quota
  * step after quality scoring.
  */
object Ranking {

  /** Top `k` rows per key by `order` (include a unique tiebreaker column
    * in `order` for deterministic output). One shuffle on the key;
    * `row_number` + filter lets the sort stay partial (rank > k rows
    * never leave the window operator's buffer sorted — Spark's
    * WindowExec spills but never collects a group to the driver).
    *
    * Scale note: a single key heavier than one executor's spill budget
    * (the 100 TB "one domain is half the corpus" case) should be
    * pre-thinned with [[preTopK]] before this exact pass.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
                 k: Int): DataFrame =
    df.withColumn("rank",
        row_number().over(
          Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)))
      .filter(col("rank") <= k)

  /** Salted pre-pass for skewed keys: keep the top `k` per (key, salt)
    * over `salts` random-but-deterministic shards, shrinking a hot key's
    * row count to `salts * k` before the exact [[topKPerKey]] pass.
    * Global top-k per key is preserved: every true top-k row is top-k
    * within its shard. Composition `topKPerKey(preTopK(df), ...)` is
    * exactly equivalent to `topKPerKey(df, ...)` for any salts >= 1.
    */
  def preTopK(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
              k: Int, salts: Int = 64): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(salts)))
    salted.withColumn("__prank",
        row_number().over(
          Window.partitionBy((keyCols :+ "__salt").map(col): _*)
            .orderBy(order: _*)))
      .filter(col("__prank") <= k)
      .drop("__salt", "__prank")
  }

  /** Reciprocal-rank fusion of ranked lists (Cormack et al.'s standard
    * `1/(c + rank)` with c=60): each input carries (`idCol`, `rankCol`);
    * an id's fused score sums its reciprocal ranks over every list it
    * appears in (absence contributes 0 — no outer-join needed, union
    * does it). Returns the global top-`k` as (`idCol`, `rrf`, `rank`),
    * `rrf` rounded to 6dp before ranking, ties on the id. This is the
    * fusion step of hybrid lexical+vector search — it needs only ranks,
    * never the incomparable raw scores.
    *
    * Scale shape: inputs are already top-k lists (k rows each), so the
    * union, the sum aggregation, and the TakeOrdered all run on
    * |lists|*k rows — driver-safe at any corpus size.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contrib = rankings.map(r => r.select(col(idCol),
        (lit(1.0) / (lit(c) + col(rankCol))).as("__c")))
      .reduce(_.unionByName(_))
    contrib.groupBy(col(idCol)).agg(round(sum(col("__c")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc).limit(k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("rrf").desc, col(idCol).asc)).cast("int"))
  }

  /** Item-item collaborative filtering from co-occurrence (the
    * Sarwar et al. 2001 / Amazon item-to-item shape): for items that
    * share a basket, sim(i,j) = co(i,j) / √(n(i)·n(j)) — binary-vector
    * cosine over baskets — and each item keeps its top-k most similar
    * as recommendations. The workhorse "customers also bought" model:
    * no training, mergeable counts, interpretable scores.
    *
    * Scale shape: candidate pairs are generated per basket via the
    * basket-keyed self-join — fan-out bounded by basket size squared,
    * never items²; a pathological mega-basket should be capped
    * upstream (same argument as the dedup blockers). One shuffle
    * counts pairs, per-item totals ride a (domain-sized) broadcast
    * join, and the top-k is a window partitioned by item. Determinism:
    * counts are exact integers, the score is one √ and one divide on
    * exact integers (6dp-pinned), rank ties break to the smaller
    * neighbor id.
    */
  def itemItemCf(baskets: DataFrame, basketCol: String, itemCol: String,
                 k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val bi = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val biC = graft.data.ScopedCaches.track(bi)
    val n = biC.groupBy(col("i")).agg(count(lit(1)).as("n"))
    val co = biC.as("x").join(biC.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("i1"), col("y.i").as("i2"))
      .agg(count(lit(1)).as("co"))
    // symmetrize: each undirected pair recommends in both directions
    val directed = co.select(col("i1").as("item_id"), col("i2").as("rec_id"),
        col("co"))
      .unionByName(co.select(col("i2").as("item_id"),
        col("i1").as("rec_id"), col("co")))
    val scored = directed
      .join(broadcast(n.select(col("i").as("item_id"), col("n").as("ni"))),
        "item_id")
      .join(broadcast(n.select(col("i").as("rec_id"), col("n").as("nj"))),
        "rec_id")
      .select(col("item_id"), col("rec_id"), col("co"),
        round(col("co").cast("double") /
          sqrt((col("ni") * col("nj")).cast("double")), 6).as("score"))
    val w = Window.partitionBy(col("item_id"))
      .orderBy(col("score").desc, col("rec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("item_id", "rec_id", "rank", "co", "score")
  }
}
