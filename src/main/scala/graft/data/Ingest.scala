package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest: turn an arbitrary input (CSV file or an existing DataFrame's
  * column subset) into the engine's canonical *encoded relation* — columns
  * `att0..att{n-1}`, each dictionary-encoded to a dense Int.
  *
  * Reference semantics reproduced (see SURVEY.md §2.1, /root/reference
  * `entropy/NewSmallDBInMemory.java:189-281`, `entropy/CompressedDB.java:139-161`):
  *   - values are trimmed strings; missing fields become the sentinel
  *     `"EMPTY"`;
  *   - every column dictionary-encodes to dense ints (we use 0-based,
  *     assigned in value order so the encoding is deterministic across
  *     runs and cluster layouts — the reference assigns in file order,
  *     which is only deterministic single-threaded; entropies and counts
  *     are invariant to the choice of bijection);
  *   - raw row count and distinct row count are both meaningful: entropy
  *     paths count raw rows, decomposition paths dedup first.
  *
  * Scale notes: the per-column dictionary is built with
  * `distinct -> row_number over a value-ordered window`. The window is a
  * single partition *over distinct values only* — fine for the
  * low-cardinality categorical columns this engine targets; the join back
  * to the fact table is broadcast when the dictionary is small. At 100 TB
  * the fact-table side never shuffles: encoding is a map-side broadcast
  * join per column.
  */
object Ingest {

  val MissingSentinel = "EMPTY"

  /** Read a CSV as the reference does: all-string columns, trimmed,
    * missing -> "EMPTY", positional names att0..att{n-1}.
    *
    * `naiveSplit = true` mirrors the reference's quote-blind
    * `line.split(",")` path (`entropy/ExternalFileDataSet.java:44-89`);
    * false uses Spark's quote-aware CSV reader (the opencsv path,
    * `entropy/NewSmallDBInMemory.java:208-238`).
    */
  def readCsv(spark: SparkSession, path: String, hasHeader: Boolean,
              naiveSplit: Boolean = false): DataFrame = {
    val raw =
      if (naiveSplit) {
        val lines = spark.read.text(path)
        // one first-line collect serves both arity inference and the
        // header skip (reference skips first line only; for a
        // multi-partition file we drop all lines equal to it — identical
        // for well-formed inputs)
        val first = lines.limit(1).collect().head.getString(0)
        val n = first.split(",", -1).length
        val body =
          if (hasHeader) lines.filter(col("value") =!= lit(first))
          else lines
        val parts = split(col("value"), ",", -1)
        body.select((0 until n).map(i =>
          element_at(parts, i + 1).as(s"att$i")): _*)
      } else {
        val df = spark.read
          .option("header", hasHeader.toString)
          .option("inferSchema", "false")
          .csv(path)
        df.select(df.columns.zipWithIndex.map { case (c, i) =>
          col(c).as(s"att$i")
        }.toSeq: _*)
      }
    normalize(raw)
  }

  /** Treat a column subset of an arbitrary DataFrame as a relation:
    * stringify, trim, EMPTY-fill, rename to att0..att{k-1}.
    */
  def relationOf(df: DataFrame, cols: Seq[String]): DataFrame =
    normalize(df.select(cols.zipWithIndex.map { case (c, i) =>
      col(c).cast("string").as(s"att$i")
    }: _*))

  private def normalize(df: DataFrame): DataFrame =
    df.select(df.columns.map { c =>
      coalesce(nullif(trim(col(c).cast("string")), lit("")), lit(MissingSentinel)).as(c)
    }.toSeq: _*)

  /** Per-column dictionary: distinct values with dense 0-based codes in
    * value order. Distributed end-to-end: a global `row_number` window
    * would funnel every distinct value through one task, which breaks on
    * high-cardinality columns at scale — instead the sorted distinct
    * values are indexed with `zipWithIndex` (one extra count job over the
    * range-partitioned sort, no single-task stage; one of the rare
    * justified RDD drops, there being no codegen'd global-index
    * operator). Deterministic across runs and cluster layouts because
    * codes follow value order.
    */
  def dictionary(df: DataFrame, column: String): DataFrame = {
    val spark = df.sparkSession
    val distinct = df.select(col(column).as("value")).distinct().sort("value")
    val valueType = distinct.schema("value").dataType
    val indexed = distinct.rdd.zipWithIndex().map { case (r, i) =>
      // Int codes suit categorical columns; fail loudly rather than
      // wrap if a column is too high-cardinality to dictionary-encode
      require(i <= Int.MaxValue, s"column $column exceeds 2^31 distinct values")
      org.apache.spark.sql.Row(r.get(0), i.toInt)
    }
    spark.createDataFrame(indexed,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value", valueType, nullable = true),
        org.apache.spark.sql.types.StructField("code",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
  }

  /** Dictionary-encode every column of a normalized relation to dense
    * ints. Returns the encoded DataFrame (same column names, IntegerType)
    * — a map-side broadcast join per column, no fact-table shuffle.
    */
  def encode(df: DataFrame): DataFrame =
    df.columns.foldLeft(df) { (acc, c) =>
      val dict = dictionary(df, c)
        .withColumnRenamed("value", s"__v_$c").withColumnRenamed("code", s"__c_$c")
      acc.join(broadcast(dict), acc(c) === col(s"__v_$c"), "left")
        .drop(c, s"__v_$c")
        .withColumnRenamed(s"__c_$c", c)
    }.select(df.columns.map(col).toSeq: _*)

  /** Raw row count (entropy-path semantics). */
  def rawCount(df: DataFrame): Long = df.count()

  /** Distinct row count (decomposition-path semantics,
    * `entropy/NewSmallDBInMemory.java:271-281`).
    */
  def distinctCount(df: DataFrame): Long = df.distinct().count()
}
