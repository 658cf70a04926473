package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-data-layout operators: computing multi-dimensional
  * clustering keys so a 100 TB table can be written in an order that
  * lets min/max zone maps prune on EVERY clustered column, not just the
  * first sort key. Z-order (bit-interleaved) keys are the standard
  * technique (Delta/Iceberg `OPTIMIZE ZORDER BY`); here the key is a
  * plain Catalyst integer expression, so the write path is just
  * `repartitionByRange($"z") .sortWithinPartitions($"z") .write`.
  */
object Layout {

  /** Bit-interleaved z-value of two per-row codes already scaled to
    * `bits`-bit unsigned range: x occupies the odd bit positions, y the
    * even. Pure unrolled shift/mask/or arithmetic — scan-side, codegen,
    * replayable in any engine with integer ops.
    */
  def interleaveBits(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order layout audit for a two-column clustering key: scales each
    * dimension to a `bits`-bit code by min/max integer arithmetic
    * (exact — no doubles anywhere), interleaves to a z-value, and
    * reports per z-bucket (top `bucketBits` bits) the row count and the
    * min/max of both raw dimensions — the zone-map ranges a writer
    * clustered on this key would give every file. Degenerate dimensions
    * (min == max) code to 0.
    *
    * Scale shape: min/max is one combinable aggregate broadcast back;
    * coding + interleaving is scan-side integer codegen; the bucket
    * report is one combinable aggregate over at most 2^bucketBits
    * groups. The actual rewrite at scale is
    * `repartitionByRange(col("z"))` + sortWithinPartitions — range
    * partitioning on z IS the cluster order, no global sort.
    */
  def zorderBuckets(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
                    bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      s"need 1 <= bucketBits <= ${2 * bits}, got $bucketBits")
    val b = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
    val mm = b.agg(min(col("x")).as("__xlo"), max(col("x")).as("__xhi"),
      min(col("y")).as("__ylo"), max(col("y")).as("__yhi"))
    val maxCode = (1L << bits) - 1
    // `div` (exact BIGINT division) — Column./ is double division and
    // a rounded code would disagree with an integer-arithmetic oracle.
    val coded = b.crossJoin(broadcast(mm))
      .withColumn("xs", when(col("__xhi") === col("__xlo"), lit(0L))
        .otherwise(expr(s"((x - __xlo) * ${maxCode}L) div (__xhi - __xlo)")))
      .withColumn("ys", when(col("__yhi") === col("__ylo"), lit(0L))
        .otherwise(expr(s"((y - __ylo) * ${maxCode}L) div (__yhi - __ylo)")))
      .select(col("x"), col("y"),
        interleaveBits(col("xs"), col("ys"), bits).as("z"))
    coded.groupBy(shiftrightunsigned(col("z"), 2 * bits - bucketBits)
        .as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  /** A rectangular probe predicate: scan bucket iff its x zone map
    * intersects [xLo, xHi] AND its y zone map intersects [yLo, yHi].
    */
  final case class Probe(name: String, xLo: Long, xHi: Long,
                         yLo: Long, yHi: Long)

  /** Zone-map pruning audit: for each probe, how many z-order buckets
    * (files, after a clustered rewrite) and rows a min/max-pruning
    * reader would actually touch — the measurement that justifies (or
    * refutes) a layout rewrite BEFORE burning the 100 TB write. Input
    * is [[zorderBuckets]] output; the audit itself is a broadcast
    * cross-join of the bucket-domain table with a literal probe list —
    * nothing rescans the data.
    */
  def pruneAudit(buckets: DataFrame, probes: Seq[Probe]): DataFrame = {
    require(probes.nonEmpty, "need at least one probe")
    val spark = buckets.sparkSession
    import spark.implicits._
    val hit = col("x_min") <= col("xHi") && col("x_max") >= col("xLo") &&
      col("y_min") <= col("yHi") && col("y_max") >= col("yLo")
    buckets.crossJoin(broadcast(probes.toDF()))
      .groupBy(col("name"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("cnt")).as("rows_total"),
        sum(when(hit, 1L).otherwise(0L)).as("scanned_buckets"),
        sum(when(hit, col("cnt")).otherwise(0L)).as("scanned_rows"))
      .select(col("name"), col("n_buckets"), col("scanned_buckets"),
        col("rows_total"), col("scanned_rows"),
        // pinned ×10⁶ BIGINT (not round(DOUBLE,6)) so the oracle hash is
        // engine-version-independent
        round(col("scanned_rows").cast("double") / col("rows_total") * 1e6)
          .cast("long").as("scan_ppm"))
  }
}
