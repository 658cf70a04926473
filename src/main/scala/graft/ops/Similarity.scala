package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity operators over an embedding column
  * (`array<float>`): cosine near-duplicate pairs, brute-force cosine
  * top-k (the exact baseline), and an LSH-bucketed approximate top-k
  * (the scale path — buckets bound the candidate set so no n^2 shuffle).
  * Dot products are `zip_with` + `aggregate` column expressions —
  * codegen'd, no UDFs.
  */
object Similarity {

  /** Cosine similarity of two array<float/double> columns (double math),
    * via the codegen'd native expression ([[graft.functions.CosineSimilarity]],
    * registered by [[graft.GraftExtensions]]): one tight primitive loop
    * instead of interpreted zip_with/aggregate lambdas.
    */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** All pairs with cosine >= tau. Exact; the self-join is a broadcast
    * of the smaller side when feasible. For corpora where n^2 is
    * prohibitive use [[lshCosinePairs]].
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  tau: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    v.toDF("id1", "v1").join(v.toDF("id2", "v2"), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 6).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Exact brute-force cosine top-k for a query set (ids in the same
    * table): rank by cosine rounded to 6dp with id tie-break, so results
    * are engine-stable.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     queryIds: Seq[Long], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Unit-normalize an array vector (double math) so euclidean
    * clustering aligns with cosine geometry.
    */
  def normalized(vec: Column): Column = {
    val norm = sqrt(call_function("vec_dot", vec, vec))
    transform(vec, x => x.cast("double") / norm)
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * over the unit-normalized vectors partitions the corpus into
    * `numCells` cells; each query scores only the `nProbe` cells nearest
    * its own vector (centroid ranking is driver-side — the centroid
    * table is tiny), then exact cosine ranks within the probed cells.
    * The scale path pairs with [[lshTopK]]: IVF adapts cells to the data
    * distribution, LSH needs no training pass.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int, numCells: Int = 16,
              nProbe: Int = 4, maxTrainRows: Long = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      array_to_vector(normalized(col(vecCol))).as("features")).cache()
    // a coarse quantizer only needs a sample: fitting on the full corpus
    // would make the training pass dominate at scale (the iterative
    // KMeans re-scans its input per iteration — unacceptable over 100 TB)
    val corpusN = v.count()
    val train =
      if (corpusN <= maxTrainRows) v
      else v.sample(withReplacement = false,
        maxTrainRows.toDouble / corpusN, seed = 42)
    val model = new KMeans().setK(numCells).setSeed(42).setMaxIter(10)
      .fit(train.select("features"))
    val assigned = model.transform(v)
      .select(col("id"), col("v"), col("prediction").as("cell"))
    val centroids = model.clusterCenters.map(_.toArray).zipWithIndex
    // per query: nearest nProbe centroids, computed on the driver from
    // the collected (tiny) query vectors
    val queryVecs = v.filter(col("id").isin(queryIds: _*))
      .select(col("id"), col("features")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector]("features").toArray)
    val probeRows = queryVecs.flatMap { case (qid, qv) =>
      centroids.map { case (c, cell) =>
        val d = c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        (qid, cell, d)
      }.sortBy(_._3).take(nProbe).map { case (q, cell, _) => (q, cell) }
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val probes = probeRows.toDF("query_id", "cell")
    val q = assigned.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .join(broadcast(q), Seq("query_id"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Deterministic pseudo-random hyperplanes (+-1 components) from a
    * splitmix-style hash — no RNG state, reproducible across runs and
    * cluster layouts.
    */
  private def hyperplane(planeIdx: Int, dim: Int): Seq[Double] =
    (0 until dim).map { j =>
      var z = planeIdx.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
    }

  /** Sign-random-projection bucket id over `numPlanes` hyperplanes.
    * `planeOffset` selects an independent plane family — distinct offsets
    * give the independent hash tables of the OR-construction.
    */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int,
                planeOffset: Int = 0): Column =
    (0 until numPlanes).map { p =>
      val proj = call_function("vec_dot", vec,
        typedLit(hyperplane(planeOffset + p, dim)))
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** All pairs with cosine >= tau at scale — the LSH path [[cosinePairs]]
    * defers to when n^2 is prohibitive (the near-dup dedup workload,
    * where tau is high). Standard OR-construction: every vector posts
    * into one bucket per independent hash table (`tables` families of
    * `numPlanes` sign-random-projection bits) plus `probes` Hamming-1
    * probe buckets per table; two vectors sharing any posted (table,
    * bucket) become a candidate pair, verified by exact cosine — so
    * false positives are impossible and recall is
    * `1 - (1 - p^b)^tables` per pair (p = 1 - angle/pi), tightened
    * further by the probes. Only (id, table, bucket) postings ride the
    * self-join — vector payloads join back after the pair list is
    * deduped, so embeddings never multiply through the explode. Each
    * table's candidate lists are bounded by ~n/2^numPlanes per bucket;
    * no n^2 shuffle ever forms.
    */
  def lshCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                     tau: Double, dim: Int, numPlanes: Int = 8,
                     tables: Int = 4, probes: Int = 0): DataFrame = {
    require(tables >= 1 && probes >= 0 && probes <= numPlanes)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val own = v.select(col("id"), explode(array((0 until tables).map { t =>
      struct(lit(t).as("t"),
        lshBucket(col("v"), dim, numPlanes, t * numPlanes).as("own"))
    }: _*)).as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.own").as("own"))
    val probeBuckets = array((lit(0) +:
      (0 until probes).map(p => lit(1 << p))).map(col("own").bitwiseXOR): _*)
    val posts = own.select(col("id"), col("t"),
      explode(probeBuckets).as("bucket"))
    val cand = posts.toDF("id1", "t", "bucket")
      .join(posts.toDF("id2", "t", "bucket"), Seq("t", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct() // pairs can share several buckets
    cand
      .join(v.toDF("id1", "v1"), Seq("id1"))
      .join(v.toDF("id2", "v2"), Seq("id2"))
      .select(col("id1"), col("id2"),
        round(cosine(col("v1"), col("v2")), 6).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * plus its `probes` Hamming-1 neighbor buckets (multi-probe — near
    * misses on one hyperplane sign are the dominant recall loss), then
    * exact cosine ranking within them. Bucket count 2^numPlanes bounds
    * each candidate list to ~(1+probes)*n/2^numPlanes — the 100 TB path
    * where the brute-force cross join is impossible.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int, dim: Int,
              numPlanes: Int = 8, probes: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(probes >= 0 && probes <= numPlanes)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), dim, numPlanes).as("bucket"))
    val qBase = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"), col("bucket"))
    // probe buckets: the query's own, plus flips of the first `probes` bits
    val probeBuckets = array((lit(0) +:
      (0 until probes).map(p => lit(1 << p))).map(col("bucket").bitwiseXOR): _*)
    val q = qBase.select(col("query_id"), col("qv"),
      explode(probeBuckets).as("bucket"))
    val scored = v.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
      .distinct() // a candidate can surface through several probe buckets
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
