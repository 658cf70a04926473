package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Shared local SparkSession for ScalaTest suites (one per JVM). */
object SparkSuite {
  lazy val spark: SparkSession = {
    val s = graft.Sessions.builder(4).appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Build an all-int relation att0..att{n-1} from tuples. */
  def relation(rows: Seq[Seq[Int]]): DataFrame = {
    val n = rows.head.length
    val schema = StructType((0 until n).map(i =>
      StructField(s"att$i", IntegerType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 4), schema)
  }

  /** Naive driver-side subset entropy (the tests' oracle). */
  def naiveEntropy(rows: Seq[Seq[Int]], attrs: Seq[Int]): Double = {
    if (attrs.isEmpty) return 0.0
    val nTotal = rows.size.toDouble
    rows.groupBy(r => attrs.map(r)).values.map { g =>
      val p = g.size / nTotal
      -p * (math.log(p) / math.log(2.0))
    }.sum
  }

  /** Deterministic LCG so fixtures are stable across runs. */
  final class Lcg(seed: Long) {
    private var s = seed
    def nextInt(bound: Int): Int = {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      (((s >>> 33) % bound).toInt + bound) % bound
    }
  }

  /** Exact-MVD fixture: R(att0, att1, att2) where att1 ->> att0 | att2
    * holds exactly (cross product within each att1 group), plus
    * `noise` extra rows that break it approximately.
    */
  def mvdFixture(noise: Int): Seq[Seq[Int]] = {
    val base = for {
      b <- 0 until 3
      a <- 0 until 3
      c <- 0 until 4
    } yield Seq(a + 3 * b, b, c + (b % 2))
    val rng = new Lcg(42)
    val extra = (0 until noise).map { _ =>
      Seq(rng.nextInt(9), rng.nextInt(3), rng.nextInt(5))
    }
    base ++ extra
  }

  /** 5-attribute path fixture A-B-C-D-E: each column's value depends
    * only on its predecessor plus a free bit, so every middle singleton
    * separates its two sides exactly.
    */
  def pathFixture5(noise: Int): Seq[Seq[Int]] = {
    val base = for {
      b <- 0 until 3
      a <- 0 until 2
      c <- 0 until 2
      d <- 0 until 2
      e <- 0 until 2
    } yield {
      val colC = c + 2 * (b % 2)
      val colD = d + 2 * (colC % 2)
      val colE = e + 2 * (colD % 2)
      Seq(a + 2 * b, b, colC, colD, colE)
    }
    val rng = new Lcg(13)
    val extra = (0 until noise).map { _ =>
      Seq(rng.nextInt(6), rng.nextInt(3), rng.nextInt(4), rng.nextInt(4), rng.nextInt(4))
    }
    base ++ extra
  }

  /** 4-attribute fixture: join of (att0,att1), (att1,att2), (att2,att3)
    * chains — a path join tree with separators {att1} and {att2}.
    */
  def chainFixture(noise: Int): Seq[Seq[Int]] = {
    val base = for {
      b <- 0 until 3
      a <- 0 until 2
      c <- 0 until 2
      d <- 0 until 2
    } yield Seq(a + 2 * b, b, c + 2 * (b % 2), d + 2 * (c % 2))
    val rng = new Lcg(7)
    val extra = (0 until noise).map { _ =>
      Seq(rng.nextInt(6), rng.nextInt(3), rng.nextInt(4), rng.nextInt(4))
    }
    base ++ extra
  }
}
