package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget packs (the
  * concat-then-chunk batching step that turns a filtered corpus into
  * training sequences).
  */
object Packing {

  /** Contiguous deterministic packing: docs in `idCol` order within each
    * shard, a doc joins the pack in which its running token total
    * starts (`pack_id = floor((cumsum - n) / budget)`). Equivalent to
    * concatenating the shard's docs in id order and cutting every
    * `budget` tokens, without materializing the concatenation. Fully
    * order-stable: the same corpus always packs identically, so packs
    * are reproducible across re-runs and engines.
    *
    * The window is partitioned by `shardCol` — each shard's prefix sum
    * runs independently, so parallelism at 100 TB is the shard count
    * (shard by source/domain/date, never a constant). A global
    * single-sequence pack order would funnel the corpus through one
    * task; that is the one shape this operator refuses.
    */
  def contiguousPack(df: DataFrame, idCol: String, nTokensCol: String,
                     shardCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.select(col(shardCol), col(idCol), col(nTokensCol),
        sum(col(nTokensCol)).over(w).as("__cum"))
      .select(col(shardCol), col(idCol), col(nTokensCol),
        floor((col("__cum") - col(nTokensCol)) * lit(1.0) / budget)
          .cast("long").as("pack_id"))
  }

  /** Packing-efficiency audit of [[contiguousPack]]'s concat-then-chunk
    * scheme — the readout a pipeline checks before committing a shard
    * key and budget. Concat-then-chunk wastes nothing EXCEPT each
    * shard's tail, but it pays a different cost: every document whose
    * token run crosses a pack boundary is SPLIT across training
    * sequences (cross-document attention truncation). Per shard:
    *
    *  - `n_docs`, `total_tokens`, `n_packs` (= ceil(total/budget));
    *  - `n_boundary_docs` / `boundary_frac`: docs whose first and last
    *    token land in different packs (zero-token docs never count);
    *  - `tail_fill_tokens`: the last pack's occupancy (= budget when
    *    the shard divides exactly);
    *  - `mean_fill`: total/(n_packs·budget), 6dp — 1.0 minus tail
    *    waste.
    *
    * A high `boundary_frac` says the budget is small relative to doc
    * length (split almost everything); a low `mean_fill` with many
    * shards says the shard key is too fine (every shard pays a tail).
    * Same scale shape as the packer: the prefix sum is partitioned by
    * shard, then ONE per-shard combinable aggregate — parallelism is
    * the shard count, nothing global.
    */
  def packEfficiency(df: DataFrame, idCol: String, nTokensCol: String,
                     shardCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val n = col(nTokensCol)
    val cum = df.select(col(shardCol), col(idCol), n,
      sum(n).over(w).as("__cum"))
    val startPack = floor((col("__cum") - n) * lit(1.0) / budget)
    val endPack = floor((col("__cum") - 1L) * lit(1.0) / budget)
    val boundary = n > 0L && startPack =!= endPack
    val totals = cum.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(n).cast("long").as("total_tokens"),
        sum(when(boundary, 1L).otherwise(0L)).as("n_boundary_docs"))
    val nPacks = floor((col("total_tokens") + (budget - 1L)) * lit(1.0) /
      budget).cast("long")
    val tailRem = col("total_tokens") % budget
    totals.select(col(shardCol), col("n_docs"), col("total_tokens"),
      nPacks.as("n_packs"), col("n_boundary_docs"),
      round(col("n_boundary_docs").cast("double") /
        col("n_docs").cast("double"), 6).as("boundary_frac"),
      when(col("total_tokens") > 0L && tailRem === 0L, lit(budget))
        .otherwise(tailRem).cast("long").as("tail_fill_tokens"),
      when(col("total_tokens") > 0L,
        round(col("total_tokens").cast("double") /
          (nPacks * lit(budget)).cast("double"), 6))
        .otherwise(lit(0.0)).as("mean_fill"))
  }
}
