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

  /** Per-depth weights p⁰..p^(k-1) and the tail p^k by REPEATED
    * multiplication — never an engine `pow()`: libm pow is not
    * guaranteed correctly rounded, repeated double multiplication is
    * deterministic and any engine parsing the same shortest-roundtrip
    * decimal literal lands on the same double.
    */
  def rboWeights(k: Int, p: Double): (Seq[Double], Double) = {
    val w = Seq.iterate(1.0, k + 1)(_ * p)
    (w.take(k), w(k))
  }

  /** Truncated+extrapolated Rank-Biased Overlap (Webber et al. 2010)
    * between two top-k rankings per query: RBO@k = (1−p)·Σ_{d≤k}
    * p^{d-1}·A_d + p^k·A_k, with A_d the prefix agreement |S∩T|_d / d.
    * THE ranking-similarity readout for search/ANN evaluation —
    * top-weighted where recall@k is flat (an ANN list that nails ranks
    * 1–3 but misses rank 5 scores far above one that only gets rank 5),
    * and well-defined on non-conjoint lists.
    *
    * Determinism: a pair matched at ranks (r₁, r₂) joins every depth
    * d ≥ max(r₁,r₂), so X_d is an exact integer; each depth term
    * p^{d-1}·X_d/d is one fixed-order double from [[rboWeights]]'
    * literals, ×10⁹-pinned before the cross-depth sum — exact integer
    * addition in any order. Queries in either list but with zero
    * matches emit RBO 0 (the spine is the union of query ids). All
    * joins are on (query, item) or the k-row depth spine — bounded by
    * queries × k², never corpus-sized.
    */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, k: Int,
                        p: Double = 0.9): DataFrame = {
    require(k >= 1 && p > 0 && p < 1, s"need k >= 1, 0 < p < 1; got $k, $p")
    val spark = a.sparkSession
    import spark.implicits._
    val (ws, tail) = rboWeights(k, p)
    val la = a.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("ra")).filter(col("ra") <= k)
    val lb = b.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("rb")).filter(col("rb") <= k)
    val m = la.join(lb, Seq("query_id", "neighbor_id"))
      .select(col("query_id"), greatest(col("ra"), col("rb")).as("mr"))
    val qs = la.select(col("query_id"))
      .union(lb.select(col("query_id"))).distinct()
    val depths = ws.zipWithIndex.map { case (w, i) => (i + 1, w) }
      .toDF("d", "w")
    val xd = qs.crossJoin(broadcast(depths))
      .join(m, Seq("query_id"), "left")
      .groupBy(col("query_id"), col("d"), col("w"))
      .agg(sum(when(col("mr") <= col("d"), 1L).otherwise(0L)).as("x"))
    val term9 = round(col("w") * col("x").cast("double") /
      col("d").cast("double") * 1e9).cast("long")
    val perQ = xd
      .withColumn("t9", term9)
      .groupBy(col("query_id"))
      .agg(sum(col("t9")).as("s9"),
        max(when(col("d") === k, col("x"))).as("xk"))
    perQ.select(col("query_id"),
      round((lit(1.0 - p) * (col("s9").cast("double") / 1e9) +
        lit(tail) * col("xk").cast("double") / k) * 1e6)
        .cast("long").as("rbo6"))
  }
}
