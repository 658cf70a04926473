package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance: the batch CDC upsert (MERGE INTO's
  * read-side). A corpus snapshot and an update batch merge to the
  * next snapshot by last-writer-wins per key — the operation every
  * incrementally-maintained training corpus runs between crawls.
  */
object Merge {

  /** Last-writer-wins merge: one row per `keyCol` from `base ∪
    * updates`, the winner having the highest `versionCol`; on a
    * version TIE the update side wins (the natural CDC semantic — a
    * re-delivered same-version record must supersede, not flap).
    * Deterministic total order: (version desc, side desc).
    *
    * Scale shape: one union (no shuffle) + one hash-shuffle on the key
    * for the per-key window — the same single-shuffle cost as the
    * groupBy it replaces, but keeping WHOLE ROWS without an arg_max
    * struct-packing trick per column. Update batches are typically a
    * tiny fraction of the snapshot; the shuffle is dominated by the
    * base scan either way, and compaction-style periodic merges
    * amortize it.
    */
  def upsertMerge(base: DataFrame, updates: DataFrame, keyCol: String,
                  versionCol: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      "base and updates must share a schema")
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** SCD Type-2 dimension build from a change log: per key, collapse
    * consecutive duplicate attribute values (a re-stated unchanged
    * value is not a new version) and emit one validity interval per
    * surviving change — `valid_from` = its timestamp, `valid_to` = the
    * next change's timestamp (null = current row). The (`tsCol`,
    * `tieCol`) order pins simultaneous changes so the version chain is
    * deterministic. This is the read-side of every warehouse's
    * `dim_*_history` table and the point-in-time lookup's data model
    * ([[graft.ops.AsofJoin]] queries it).
    *
    * Scale shape: both window passes (the change-collapse `lag` and the
    * interval `lead`) share the same partitioning and sort order, so
    * Catalyst plans ONE shuffle + ONE sort; everything else is
    * scan-side. No self-join, no global order.
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val changes = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      // first row per key: __prev is null but is a real version;
      // null-safe inequality keeps it and drops only true repeats
      .filter(!(col(attrCol) <=> col("__prev")))
      .drop("__prev")
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
