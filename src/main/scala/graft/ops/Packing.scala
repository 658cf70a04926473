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
}
