package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Output-side sharding: write a relation as `numShards` range-partitioned,
  * internally-sorted parquet shards — the layout training loaders want
  * (disjoint key ranges per file, deterministic order within each, no
  * one-file global sort bottleneck).
  *
  * `repartitionByRange` samples the key distribution to pick balanced
  * split points (skew-robust without manual bounds) and shuffles once;
  * `sortWithinPartitions` sorts each shard independently — the global
  * ordering guarantee (every row in shard i sorts before every row in
  * shard i+1) comes from the range partitioning, never from a global
  * sort. At 100 TB this is the only shape that both bounds file count
  * and keeps each file internally ordered.
  */
object ShardWriter {

  def writeShards(df: DataFrame, sortCol: String, numShards: Int,
                  path: String): Unit = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    df.repartitionByRange(numShards, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
  }
}
