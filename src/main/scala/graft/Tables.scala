package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations and TIMESTAMP(MICROS) in others — load schema-adaptively
    * so either works.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Must be set before the scan: with it, a NANOS column loads as
    // LongType instead of the vectorized reader rejecting the file. A
    // MICROS column is unaffected by the flag.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    df.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long path. `div`, not `/`: Column./ is DOUBLE
        // division, and 2024-era int64 nanos exceed double's 2^53
        // mantissa — the rounded quotient is off by ±1 µs, which an
        // exact-µs oracle (epoch_us arithmetic) catches.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // TIMESTAMP / TIMESTAMP_NTZ: session timezone is pinned to UTC
        // (Sessions.builder), so NTZ→LTZ cast is value-stable.
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
