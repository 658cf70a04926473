package graft

import graft.ops.{AnnCertify, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The ANN self-consistency certificates: a healthy KMeans-adaptive
  * pipeline certifies every slot ok=1 (the driver gate's expectation),
  * and each invariant's verdict actually flips to 0 under the failure
  * it exists to catch — a mis-assigned cell, a wrong probe, an
  * out-of-range PQ code, a top-k row that is not the best candidate.
  */
class AnnCertifySpec extends AnyFunSuite {
  private val spark = SparkSuite.spark
  import spark.implicits._

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def nextInt(n: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % n + n) % n).toInt
    }
  }

  private def embDf(n: Int, dim: Int, seed: Long) = {
    val rng = new Lcg(seed)
    val rows = (0L until n.toLong).map { i =>
      Row(i, Array.tabulate(dim)(_ => rng.nextInt(200) / 100.0f - 1.0f).toSeq)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = false)))))
  }

  private def collectCerts(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("pq_code_dist: per-subspace distance of given codes; out-of-range -> +Inf") {
    val dim = 8; val m = 2; val ksub = 2; val sub = dim / m
    // codebook layout (i*ksub + c)*sub + j
    val cb = Array.tabulate(m * ksub * sub)(x => (x % 7).toDouble / 7.0)
    val v = Array.tabulate(dim)(j => (j + 1).toDouble / 10.0)
    def model(i: Int, c: Int): Double =
      (0 until sub).map { j =>
        val d = v(i * sub + j) - cb((i * ksub + c) * sub + j); d * d
      }.sum
    val got = spark.range(1).select(
        call_function("pq_code_dist", typedLit(v.toSeq), typedLit(cb.toSeq),
          typedLit(Seq(1, 0)), lit(ksub)).as("d"),
        call_function("pq_code_dist", typedLit(v.toSeq), typedLit(cb.toSeq),
          typedLit(Seq(5, -1)), lit(ksub)).as("bad"))
      .collect().head
    val d = got.getSeq[Double](0)
    assert(math.abs(d(0) - model(0, 1)) < 1e-12 &&
      math.abs(d(1) - model(1, 0)) < 1e-12, s"$d")
    assert(got.getSeq[Double](1).forall(_.isPosInfinity))
    // and it agrees with pq_encode's own argmin distances
    val enc = spark.range(1).select(
        call_function("pq_encode", typedLit(v.toSeq), typedLit(cb.toSeq),
          lit(m), lit(ksub)).as("c")).collect().head.getSeq[Int](0)
    val encD = spark.range(1).select(
        call_function("pq_code_dist", typedLit(v.toSeq), typedLit(cb.toSeq),
          typedLit(enc), lit(ksub)).as("d")).collect().head.getSeq[Double](0)
    for (i <- 0 until m)
      assert(encD(i) == (0 until ksub).map(model(i, _)).min, s"subspace $i")
  }

  test("IVF certificate: the trained pipeline certifies every slot ok=1") {
    val df = embDf(60, 8, seed = 5)
    val q = Seq(0L, 1L)
    val cert = AnnCertify.ivfCertificate(
      Similarity.ivfParts(df, "vec_id", "embedding", queryIds = q, k = 3,
        numCells = 4, nProbe = 2, maxTrainRows = 100000, labelCol = None),
      numCells = 4, nProbe = 2)
    val rows = collectCerts(cert)
    assert(rows.forall(_._4 == 1L), rows.filter(_._4 != 1L).take(5).toString)
    val byCert = rows.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byCert == Map("centroid_count" -> 1, "assign_argmin" -> 60,
      "probe_nearest" -> q.size * 2, "topk_valid" -> q.size * 3), byCert)
  }

  test("IVF-PQ certificate: coarse + codebook + shortlist + topk all ok=1") {
    val df = embDf(60, 8, seed = 9)
    val q = Seq(0L, 1L)
    val cert = AnnCertify.pqCertificate(
      Similarity.ivfPqParts(df, "vec_id", "embedding", queryIds = q, k = 3,
        dim = 8, numCells = 4, nProbe = 2, m = 2, ksub = 4, rerank = 10,
        maxTrainRows = 100000),
      m = 2, ksub = 4, nProbe = 2, numCells = Some(4))
    val rows = collectCerts(cert)
    assert(rows.forall(_._4 == 1L), rows.filter(_._4 != 1L).take(5).toString)
    val byCert = rows.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byCert == Map("centroid_count" -> 1, "assign_argmin" -> 60,
      "probe_nearest" -> q.size * 2, "codebook_shape" -> 2,
      "code_argmin" -> 60 * 2, "adc_shortlist_valid" -> q.size * 10,
      "topk_valid" -> q.size * 3), byCert)
  }

  test("IVF certificate flips on a mis-assigned cell, wrong probe, and bogus rank") {
    // two orthogonal unit centroids; unit rows so normalization is a
    // no-op and geometry is by construction
    val e = (i: Int) => Array.tabulate(4)(j => if (j == i) 1.0f else 0.0f)
    val centroids = Seq(
      0 -> Array(1.0, 0.0, 0.0, 0.0), 1 -> Array(0.0, 1.0, 0.0, 0.0))
    val assigned = Seq(
      (0L, e(0).toSeq, 0), // query row, correct
      (1L, e(0).toSeq, 0), // correct
      (2L, e(0).toSeq, 1)  // near centroid 0 but assigned cell 1: WRONG
    ).toDF("id", "v", "cell")
    val qv = Seq(0L -> Array(1.0, 0.0, 0.0, 0.0))
    // query 0 sits on centroid 0; with nProbe=1 the probed cell 1 is
    // NOT the nearest -> probe_nearest must flip
    val probeRows = Seq((0L, 1))
    // candidate 1 scores 0.9 > candidate 2's 0.5, but the claimed topk
    // puts 2 at rank 1 -> better-count 1 != 0 -> topk_valid flips
    val scored = Seq((0L, 1L, 0.9), (0L, 2L, 0.5))
      .toDF("query_id", "neighbor_id", "cosine")
    val topk = Seq((0L, 2L, 1, 0.5))
      .toDF("query_id", "neighbor_id", "rank", "cosine")
    val parts = Similarity.IvfParts(assigned, centroids, probeRows, qv,
      scored, topk)
    val rows = collectCerts(
      AnnCertify.ivfCertificate(parts, numCells = 2, nProbe = 1))
    val bad = rows.filter(_._4 == 0L).map(r => (r._1, r._2, r._3)).toSet
    assert(bad == Set(("assign_argmin", 2L, 0L), ("probe_nearest", 0L, 1L),
      ("topk_valid", 0L, 1L)), rows.toString)
    // the healthy rows still certify
    assert(rows.filter(_._4 == 1L).map(_._1).toSet ==
      Set("centroid_count", "assign_argmin"))
  }

  test("PQ certificate flips on an out-of-range code and a bogus shortlist") {
    // m=1, ksub=2, dim=2: codebook rows are unit axes
    val codebooks = IndexedSeq(IndexedSeq(Array(1.0, 0.0), Array(0.0, 1.0)))
    val coded = Seq(
      (0L, Seq(1.0f, 0.0f), Seq(0)),  // argmin codeword 0: correct
      (1L, Seq(1.0f, 0.0f), Seq(1)),  // nearer codeword 0: WRONG code
      (2L, Seq(0.0f, 1.0f), Seq(7))   // out of range -> +Inf -> flips
    ).toDF("id", "v", "codes")
    // shortlist claims arank 1 for the WORSE approx candidate
    val approxScored = Seq((0L, 1L, 0.9), (0L, 2L, 0.4))
      .toDF("query_id", "id", "approx")
    val shortlist = Seq((0L, 2L, 0.4, 1))
      .toDF("query_id", "neighbor_id", "approx", "arank")
    val exactScored = Seq((0L, 2L, 0.7)).toDF("query_id", "neighbor_id", "cosine")
    val topk = Seq((0L, 2L, 1, 0.7)).toDF("query_id", "neighbor_id", "rank", "cosine")
    val parts = Similarity.PqParts(coded, codebooks, coarse = None,
      queryVecs = Seq(0L -> Array(1.0, 0.0)), approxScored = approxScored,
      shortlist = shortlist, exactScored = exactScored, topk = topk)
    val rows = collectCerts(
      AnnCertify.pqCertificate(parts, m = 1, ksub = 2, nProbe = 0))
    val bad = rows.filter(_._4 == 0L).map(r => (r._1, r._2, r._3)).toSet
    assert(bad == Set(("code_argmin", 1L, 0L), ("code_argmin", 2L, 0L),
      ("adc_shortlist_valid", 0L, 1L)), rows.toString)
    // topk row 2 is the only exact candidate, so its rank 1 certifies
    assert(rows.contains(("topk_valid", 0L, 1L, 1L)))
    // and a malformed codebook shape is loud, not silent
    val badShape = collectCerts(AnnCertify.pqCertificate(
      parts.copy(codebooks = IndexedSeq(IndexedSeq(Array(1.0, 0.0)))),
      m = 1, ksub = 2, nProbe = 0))
    assert(badShape.contains(("codebook_shape", 0L, 1L, 0L)), badShape.toString)
  }
}
