package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs
  * per-partition in batches over the binary payloads.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * container): [[FakeCodec]] derives deterministic pseudo-features from
  * the bytes. The Spark-side contract — schema, encoders, partition-wise
  * batched iteration, feature array shape — is real and tested; swapping
  * `FakeCodec.decode` for a JNI/library decoder changes nothing else.
  */
object Multimodal {

  /** A media row: opaque payload + declared content type. */
  final case class MediaRow(media_id: Long, content_type: String, payload: Array[Byte])

  /** Extracted features: fixed-shape metadata + an embedding-like
    * feature vector, the shape downstream ANN/dedup operators expect.
    */
  final case class MediaFeatures(media_id: Long, content_type: String,
                                 byte_len: Int, width: Int, height: Int,
                                 channels: Int, features: Array[Float])

  /** STUB decoder: a real implementation would hand `payload` to an
    * image/audio codec here. This one is a deterministic fake (splitmix
    * over the bytes) so the pipeline is testable end-to-end.
    */
  object FakeCodec {
    val FeatureDim = 16

    def decode(r: MediaRow): MediaFeatures = {
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < r.payload.length) { h = (h ^ r.payload(i)) * 0x100000001B3L; i += 1 }
      def mix(salt: Long): Long = {
        var z = h + salt * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      }
      val feats = Array.tabulate(FeatureDim)(j =>
        ((mix(j) >>> 11).toDouble / (1L << 53).toDouble).toFloat)
      MediaFeatures(r.media_id, r.content_type, r.payload.length,
        width = 1 + math.floorMod(mix(101), 640L).toInt,
        height = 1 + math.floorMod(mix(102), 480L).toInt,
        channels = 1 + math.floorMod(mix(103), 4L).toInt,
        features = feats)
    }
  }

  /** Batched per-partition decode: the executor-side loop a real codec
    * would amortize native-init costs over. Pure map, no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(FakeCodec.decode))
  }

  /** Wrap a text table as a fake media table (binary payload = utf8
    * bytes) — stands in for real image/audio columns in tests and the
    * driver harness.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        lit("application/octet-stream").as("content_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
