package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: pre-shuffle a fact table once by its join
  * key so every subsequent equi-join or aggregation on that key runs
  * shuffle-free (Catalyst recognizes the bucketing as a satisfied
  * distribution requirement). At 100 TB this converts the dominant
  * repeated shuffle of a hot join key into a one-time layout cost —
  * the Spark-native analogue of co-located storage.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (sorted within buckets for
    * sort-merge-ready reads). Overwrites any prior table of that name.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a fresh session's in-memory catalog forgets the table but its files
    // survive; clear them so CTAS can recreate the location
    val path = new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/$table")
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(path, true)
    df.write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", s"${spark.conf.get("spark.sql.warehouse.dir")}/$table")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketing is meant to buy. (Broadcast exchanges are
    * fine: they move the tiny side, not the bucketed data.)
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("ShuffleExchange")
}
