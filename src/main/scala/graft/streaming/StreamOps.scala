package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming shapes of the engine's event-table operators:
  * the same tumbling-window aggregation the batch query `ev_hourly_window`
  * computes, expressed over a stream with a watermark so state is bounded
  * on an unbounded 100 TB-scale feed. The batch and streaming plans share
  * this one definition — parity between them is tested by running the
  * stream over the same parquet input with `processAllAvailable`.
  */
object StreamOps {

  /** Tumbling-window counts/sums per event type. Works on a batch OR
    * streaming DataFrame with columns (ts: timestamp, event_type, value).
    */
  def hourlyAgg(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("cnt"), col("sum_value"))
  }
}
