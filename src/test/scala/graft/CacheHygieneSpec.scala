package graft

import graft.data.ScopedCaches
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The cache→use→release contract: every operator-scoped cache is
  * registered with [[ScopedCaches]] and actually unpersisted by
  * `releaseAll()` — a registry sweep leaves no net cache growth (the
  * round-4 verdict's hygiene gap).
  */
class CacheHygieneSpec extends AnyFunSuite {
  import SparkSuite._

  private def docs(rows: Seq[(Long, String)]) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*),
    StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false))))

  private def vecs(n: Int) = {
    val rng = new Lcg(5)
    val rows = (0L until n.toLong).map { i =>
      i -> Array.tabulate(8)(_ => rng.nextInt(200) / 100.0f - 1.0f).toSeq
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(v => Row(v._1, v._2)): _*),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = false)))))
  }

  test("scoped operator caches are tracked and fully released") {
    ScopedCaches.releaseAll() // baseline: empty registry
    val rng = new Lcg(17)
    val d = docs((0L until 40L).map { i =>
      i -> (0 until 30).map(_ => s"w${rng.nextInt(12)}").mkString(" ")
    })
    val v = vecs(60)

    // every operator family with a scoped cache, driven to its action
    Dedup.jaccardPairs(d, "doc_id", "text").count()
    Dedup.minhashLshPairs(d, "doc_id", "text", numHashes = 16, bands = 4).count()
    Dedup.simhashPairs(d, "doc_id", "text", maxDist = 6).count()
    Similarity.lshCosinePairs(v, "vec_id", "embedding", tau = 0.5,
      dim = 8, numPlanes = 4, tables = 4).count() // manual mode now caches too
    Similarity.ivfTopK(v, "vec_id", "embedding", Seq(0L), k = 3,
      numCells = 4, nProbe = 2).count()
    Similarity.pqTopK(v, "vec_id", "embedding", Seq(0L), k = 3,
      dim = 8, m = 4, ksub = 4, rerank = 10).count()
    Similarity.ivfPqTopK(v, "vec_id", "embedding", Seq(0L), k = 3,
      dim = 8, numCells = 4, nProbe = 2, m = 4, ksub = 4, rerank = 10).count()
    // the composed registry pipeline (exercises the e2e exDocs cache)
    SparkEntry.queries("pipeline_e2e_prep")(spark, "/root/testdata/sf0.001").count()

    val tracked = ScopedCaches.snapshot
    assert(tracked.size >= 10, s"only ${tracked.size} scoped caches registered")
    // all tracked datasets are live cache entries right now
    assert(tracked.forall(_.storageLevel != StorageLevel.NONE))

    ScopedCaches.releaseAll()
    assert(ScopedCaches.size == 0)
    // ...and none survives the release: no net growth after a sweep
    for (t <- tracked)
      assert(t.storageLevel == StorageLevel.NONE, "cache entry leaked")
  }

  test("released operators still produce correct results on re-run") {
    ScopedCaches.releaseAll()
    val d = docs(Seq(0L -> "a b c d e f g h i j", 1L -> "a b c d e f g h i j",
      2L -> "z y x w v u t s r q"))
    val r1 = Dedup.jaccardPairs(d, "doc_id", "text", k = 4, tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    ScopedCaches.releaseAll()
    val r2 = Dedup.jaccardPairs(d, "doc_id", "text", k = 4, tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r1 == r2 && r1.contains((0L, 1L)))
    ScopedCaches.releaseAll()
  }
}
