package graft

import graft.ops.{Embeddings, Layout}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  import SparkSuite._

  test("interleaveBits matches hand-interleaved values") {
    import spark.implicits._
    // x=0b101 (odd positions), y=0b011 (even): z = 1_0_1 interleaved
    // with 0_1_1 -> bits (x2<<5)(y2<<4)(x1<<3)(y1<<2)(x0<<1)(y0) =
    // 1 0 0 1 1 1 = 0b100111 = 39
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.interleaveBits(col("x"), col("y"), 3).as("z"))
      .head().getLong(0)
    assert(got == 39L)
    // full-width sanity: interleave(max, 0) sets exactly the odd bits
    val odd = Seq(((1L << 16) - 1, 0L)).toDF("x", "y")
      .select(Layout.interleaveBits(col("x"), col("y"), 16).as("z"))
      .head().getLong(0)
    assert(odd == 0xAAAAAAAAL)
  }

  test("zorderBuckets: buckets partition rows, ranges nest, degenerate dim codes 0") {
    import spark.implicits._
    val df = (0 until 256).map(i => (i.toLong, (i * 7 % 64).toLong))
      .toDF("a", "b")
    val got = Layout.zorderBuckets(df, col("a"), col("b"),
      bits = 16, bucketBits = 4).collect()
    assert(got.map(_.getLong(1)).sum == 256L)
    // z-locality: each bucket's x-range spans at most half the domain
    // (top bucket bits pin the two leading x bits and two leading y bits)
    got.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 128,
        s"bucket ${r.getLong(0)} x-range too wide")
    }
    // constant y: codes to 0, so z = interleave(xs, 0) still buckets by x
    val const = Layout.zorderBuckets(df.withColumn("b", lit(9L)),
      col("a"), col("b"), bits = 16, bucketBits = 4).collect()
    assert(const.map(_.getLong(1)).sum == 256L)
    assert(const.forall(r => r.getLong(4) == 9L && r.getLong(5) == 9L))
  }

  test("pruneAudit: intersect semantics, full-domain probe scans everything") {
    import spark.implicits._
    val buckets = Seq(
      (0L, 10L, 0L, 4L, 0L, 4L),   // x 0-4,  y 0-4
      (1L, 20L, 5L, 9L, 0L, 4L),   // x 5-9,  y 0-4
      (2L, 30L, 0L, 4L, 5L, 9L),   // x 0-4,  y 5-9
      (3L, 40L, 5L, 9L, 5L, 9L))   // x 5-9,  y 5-9
      .toDF("bucket", "cnt", "x_min", "x_max", "y_min", "y_max")
    val got = Layout.pruneAudit(buckets, Seq(
        Layout.Probe("all", 0, 9, 0, 9),
        Layout.Probe("x_low", 0, 4, 0, 9),
        Layout.Probe("corner", 6, 7, 6, 7),
        Layout.Probe("miss", 50, 60, 50, 60)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    assert(got("all") == ((4L, 100L, 1000000L)))
    assert(got("x_low") == ((2L, 40L, 400000L)))  // buckets 0 and 2
    assert(got("corner") == ((1L, 40L, 400000L))) // only bucket 3
    assert(got("miss") == ((0L, 0L, 0L)))
  }

  test("pcaTopComponent recovers an axis-aligned component exactly") {
    import spark.implicits._
    // variance only along dim 0: top component (1, 0), eigval 10/4
    val df = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(-1f, 0f)),
      (3L, Seq(2f, 0f)), (4L, Seq(-2f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Embeddings.pcaTopComponent(df, "vec_id", "embedding", iters = 3)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((0, 1.0, 2.5), (1, 0.0, 2.5)))
  }

  test("int8Snr: reference-loop equality, exact vectors and zeros null") {
    import spark.implicits._
    def refSnr(xs: Seq[Double]): Option[Double] = {
      val s = xs.map(math.abs).max
      if (s == 0) return None
      val errs = xs.map { e =>
        val c = BigDecimal(e / s * 127)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
        e - c * s / 127
      }
      val noise = errs.map(e => e * e).sum
      if (noise == 0) None
      else Some(BigDecimal(10 * math.log10(xs.map(e => e * e).sum / noise))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val vecs = Seq(
      (1L, Seq(1.0f, 0.5f, -0.25f)),
      (2L, Seq(1.0f, -1.0f)),   // codes ±127 dequantize exactly -> null
      (3L, Seq(0.0f, 0.0f)))    // zero vector -> null
    val got = Embeddings.int8Snr(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1) == refSnr(vecs.head._2.map(_.toDouble)))
    assert(got(1).exists(v => v > 30 && v < 80)) // sane dB range
    assert(got(2).isEmpty && got(3).isEmpty)
  }

  test("pcaTopComponent plan: no row-table join in the iteration") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, Seq(i.toFloat, (i % 7).toFloat)))
      .toDF("vec_id", "embedding")
    val plan = Embeddings.pcaTopComponent(df, "vec_id", "embedding", 3)
      .queryExecution.executedPlan.toString
    // the 115s->10s lesson pinned: projections fold scan-side against a
    // broadcast direction; nothing may shuffle-join the corpus on vid
    assert(!plan.contains("SortMergeJoin"),
      "iteration re-joined the row table:\n" + plan.take(2000))
  }

  test("pcaTopComponent on a zero-variance corpus yields null loadings") {
    import spark.implicits._
    val df = Seq((1L, Seq(3f, 4f)), (2L, Seq(3f, 4f)))
      .toDF("vec_id", "embedding")
    val got = Embeddings.pcaTopComponent(df, "vec_id", "embedding", iters = 2)
      .collect()
    assert(got.length == 2 && got.forall(_.isNullAt(1)))
  }
}
