package graft.tools

import graft.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: blow the sf0.1 testdata up `--factor`x by unioning
  * key-shifted copies of the fact-sized tables, so per-query scaling
  * behavior (linear vs super-linear) can be measured beyond the largest
  * driver-provided SF. Copies shift only entity keys — orderkeys, user
  * ids, doc/vec ids — so join semantics, group cardinalities per key,
  * and per-entity distributions stay exactly those of the source
  * (more orders/users/docs, not fatter ones). Dimension tables pass
  * through unchanged; every shifted fact still joins copy-0 dimensions.
  *
  * Content columns must NOT be replicated verbatim: identical text /
  * embeddings across copies give every row `factor-1` exact near-dup
  * twins, so pair-emitting queries (LSH cosine, MinHash) blow up
  * quadratically in the copy count — measuring output inflation, not
  * plan scaling. Each copy is therefore content-decorrelated by a
  * structure-preserving transform: embeddings get a per-copy cyclic
  * dimension rotation (orthogonal, so within-copy cosines are exactly
  * preserved while cross-copy cosines look random), and document text
  * gets a per-copy lowercase-alphabet rotation cipher (bijective on
  * shingles, so within-copy Jaccard is exactly preserved while
  * cross-copy shingle overlap is negligible). Per-copy dedup/ANN pair
  * structure is thus exactly the source's. Text-dedup totals then scale
  * linearly; embedding-pair totals do NOT, and that is a property of
  * the workload, not the replication: the synthetic embeddings are
  * isotropic unit vectors, so at any fixed tau within a few sigma of
  * the cosine distribution (tau=0.45 is ~3.6 sigma at dim 64) the
  * qualifying-pair count itself is Theta(n^2) x tail-mass — measured
  * 144 pairs at n=2k vs 16,786 at n=20k, ~15k of them genuine
  * cross-copy random near-misses. Scaling analyses of pair-emitting
  * queries over this table must normalize by output rows.
  *
  * Usage:
  *   runMain graft.tools.ScaleUp [--src /root/testdata/sf0.1]
  *     [--out target/testdata-sf1] [--factor 10]
  */
object ScaleUp {

  private def arg(args: Array[String], key: String, default: String): String =
    args.sliding(2).collectFirst { case Array(`key`, v) => v }.getOrElse(default)

  /** Union `factor` copies with `keyCol` shifted by a stride past the
    * source's max key; `perCopy` decorrelates content columns per copy
    * (copy 0 is always the untouched source).
    */
  private def replicate(df: DataFrame, keyCol: String, factor: Int,
      perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
    val stride = df.agg(max(col(keyCol))).head().getLong(0) + 1L
    (0 until factor).map { i =>
      perCopy(df, i).withColumn(keyCol, (col(keyCol) + lit(i * stride)).cast("long"))
    }.reduce(_ unionAll _)
  }

  private val az = "abcdefghijklmnopqrstuvwxyz"

  /** Deterministic per-copy alphabet permutation (Fisher-Yates over a
    * splitmix64 stream seeded by the copy index). A rotation cipher
    * collides past 26 copies (copy 26 = copy 0's text verbatim ->
    * spurious cross-copy exact dups); distinct random permutations stay
    * injective at any factor. Still bijective on characters, so
    * within-copy shingle/Jaccard/MinHash structure is exactly the
    * source's; a cross-copy 8-char shingle match needs 8 simultaneous
    * fixed points of a permutation pair — negligible.
    */
  private def permuted(i: Int): String = {
    val arr = az.toCharArray
    var s = i.toLong * 0x9E3779B97F4A7C15L + 0xD1B54A32D192ED03L
    def next(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    var j = arr.length - 1
    while (j >= 1) {
      val k = math.floorMod(next(), (j + 1).toLong).toInt
      val t = arr(j); arr(j) = arr(k); arr(k) = t
      j -= 1
    }
    new String(arr)
  }

  private def cipher(df: DataFrame, i: Int): DataFrame =
    if (i == 0) df
    else df.withColumn("text", translate(col("text"), az, permuted(i)))

  /** Cyclically rotate embedding dimensions by `i` and apply a per-copy
    * diagonal +-1 sign pattern — both orthogonal, so within-copy
    * cosines are exactly the source's. The sign pattern keeps copies
    * decorrelated even when the rotation index wraps past the dimension
    * (copy i and copy i+dim share a rotation).
    */
  private def rotateDims(df: DataFrame, i: Int): DataFrame = {
    if (i == 0) df else {
      val n = size(col("embedding"))
      val k = (lit(i) % n) + 1
      val rotated = concat(
        slice(col("embedding"), k, n), slice(col("embedding"), lit(1), k - 1))
      df.withColumn("embedding", transform(rotated, (x, idx) =>
        when(pmod(hash(lit(i), idx), lit(2)) === 0, x).otherwise(-x)))
    }
  }

  def main(args: Array[String]): Unit = {
    val src = arg(args, "--src", "/root/testdata/sf0.1")
    val out = arg(args, "--out", "target/testdata-sf1")
    val factor = arg(args, "--factor", "10").toInt
    // restrict to a table subset (e.g. "documents,embeddings" for a
    // dedup/similarity-family rehearsal at factors where the TPC-H side
    // would be wasted IO)
    val only = arg(args, "--tables", "").split(",").map(_.trim).filter(_.nonEmpty).toSet
    def wanted(t: String): Boolean = only.isEmpty || only(t)
    val spark = Sessions.builder(
      graft.Env.cpus(default = 16)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, table: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$table.parquet")

    // dimensions: pass through
    for (t <- Seq("region", "nation", "customer", "supplier", "part")
         if wanted(t))
      write(spark.read.parquet(s"$src/$t.parquet"), t)

    // facts: key-shifted copies. orders/lineitem share the orderkey
    // shift so the join lineage stays intact across copies.
    if (wanted("orders") || wanted("lineitem")) {
      val orders = spark.read.parquet(s"$src/orders.parquet")
      val orderStride = orders.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
      if (wanted("orders"))
        write((0 until factor).map(i => orders.withColumn("o_orderkey",
          (col("o_orderkey") + lit(i * orderStride)).cast("long")))
          .reduce(_ unionAll _), "orders")
      if (wanted("lineitem")) {
        val li = spark.read.parquet(s"$src/lineitem.parquet")
        write((0 until factor).map(i => li.withColumn("l_orderkey",
          (col("l_orderkey") + lit(i * orderStride)).cast("long")))
          .reduce(_ unionAll _), "lineitem")
      }
    }

    // events: preserve whatever ts layout the source fixture has —
    // graft.Tables.events loads schema-adaptively (nanos-as-long under
    // the legacy flag, or native micros); shift user ids so state size
    // per key is unchanged — scale adds users, not session length
    if (wanted("events")) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      write(replicate(spark.read.parquet(s"$src/events.parquet"),
        "user_id", factor), "events")
    }

    if (wanted("documents"))
      write(replicate(spark.read.parquet(s"$src/documents.parquet"),
        "doc_id", factor, cipher), "documents")
    if (wanted("embeddings"))
      write(replicate(spark.read.parquet(s"$src/embeddings.parquet"),
        "vec_id", factor, rotateDims), "embeddings")

    println(s"[scaleup] wrote ${factor}x $src -> $out")
    spark.stop()
  }
}
