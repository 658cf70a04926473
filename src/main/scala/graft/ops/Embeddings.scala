package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column pipeline operators beyond similarity search:
  * per-class centroids (corpus analysis / nearest-class-mean
  * classification) and int8 quantization (the standard 4x storage
  * compression for embedding tables at corpus scale).
  */
object Embeddings {

  /** Per-label centroid, one output row per (label, dimension):
    * (`labelCol`, `pos`, `n`, `c`) with `c` the mean of dimension `pos`
    * over the label's vectors, rounded to 6dp. Row-per-dimension output
    * (not a reassembled array) keeps both the aggregation and the
    * oracle plain.
    *
    * Scale shape: `posexplode` blows each vector into dim rows, but the
    * `groupBy(label, pos)` aggregate is map-side combinable, so each
    * task ships only labels x dim partial sums into the single shuffle —
    * the explode never hits the wire. No driver-side collection, no
    * vector-length assumptions.
    */
  def labelCentroids(df: DataFrame, idCol: String, vecCol: String,
                     labelCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(labelCol), col("pos"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("x").cast("double")), 6).as("c"))

  /** Per-vector symmetric int8 quantization: scale = max |x_i| (so
    * codes span the full [-127, 127] range), code_i = round(x_i / scale
    * * 127). Returns (`idCol`, `scale` rounded 6dp, `codes`
    * array<int>). Zero-shuffle — pure scan-side `transform`; the codes
    * column is the 4x-smaller representation an embedding store ships
    * to disk, with `scale` the per-vector dequantization factor.
    * All-zero vectors quantize to all-zero codes (scale 0 guarded).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.select(col(idCol),
      round(scale, 6).as("scale"),
      transform(col(vecCol), x =>
        when(scale === 0d, lit(0))
          .otherwise(round(x.cast("double") / scale * 127, 0).cast("int")))
        .as("codes"))
  }
}
