package graft

import graft.core.{AttrSet, Jd, Measure}
import graft.cli.SepFiles
import graft.mine.Transversals
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

class PropertySpec extends AnyFunSuite {

  /** Raw-ScalaCheck bridge (no scalatestplus in the offline cache):
    * assertions inside the property surface as exception failures.
    */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(g) { a => f(a); true })

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    check(Prop.forAll(g1, g2) { (a, b) => f(a, b); true })

  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])
                             (f: (A, B, C) => Unit): Unit =
    check(Prop.forAll(g1, g2, g3) { (a, b, c) => f(a, b, c); true })

  private val genSet: Gen[Set[Int]] =
    Gen.listOf(Gen.choose(0, 15)).map(_.toSet)

  test("AttrSet algebra matches the Set[Int] model") {
    forAll(genSet, genSet) { (a: Set[Int], b: Set[Int]) =>
      val (x, y) = (AttrSet.of(a), AttrSet.of(b))
      assert(x.union(y).bits.toSet == (a | b))
      assert(x.intersect(y).bits.toSet == (a & b))
      assert(x.minus(y).bits.toSet == (a -- b))
      assert(x.subsetOf(y) == a.subsetOf(b))
      assert(x.intersects(y) == (a & b).nonEmpty)
      assert(x.complement(16).bits.toSet == ((0 until 16).toSet -- a))
      assert(x.size == a.size)
    }
  }

  test("AttrSet ordering is a consistent total order") {
    forAll(genSet, genSet, genSet) { (a: Set[Int], b: Set[Int], c: Set[Int]) =>
      val (x, y, z) = (AttrSet.of(a), AttrSet.of(b), AttrSet.of(c))
      assert(math.signum(x.compare(y)) == -math.signum(y.compare(x)))
      if (x.compare(y) <= 0 && y.compare(z) <= 0) assert(x.compare(z) <= 0)
      assert((x.compare(y) == 0) == (x == y))
    }
  }

  private val genHypergraph: Gen[List[Set[Int]]] =
    Gen.choose(1, 5).flatMap(k =>
      Gen.listOfN(k, Gen.nonEmptyListOf(Gen.choose(0, 6)).map(_.toSet)))

  test("incremental transversals equal brute-force minimal hitting sets") {
    forAll(genHypergraph) { (edges: List[Set[Int]]) =>
      val tr = new Transversals(AttrSet.full(7))
      edges.foreach(e => tr.addHyperedge(AttrSet.of(e)))
      val all = AttrSet.allNonEmptySubsets(7) :+ AttrSet.empty
      val hitting = all.filter(s => edges.forall(e => e.exists(s.contains)))
      val minimal = hitting.filter(s => !hitting.exists(t => t.properSubsetOf(s)))
      assert(tr.minimalTransversals.toSet == minimal.toSet)
    }
  }

  private val genJd: Gen[(Int, Jd)] = for {
    n <- Gen.choose(3, 12)
    lhsSize <- Gen.choose(0, n - 2)
    lhs = (0 until lhsSize).toSet
    rest = (lhsSize until n).toVector
    k <- Gen.choose(2, math.max(2, rest.size))
    assignment <- Gen.listOfN(rest.size, Gen.choose(0, k - 1))
    measure <- Gen.oneOf(Gen.const(0.0), Gen.choose(0.0, 3.0),
      Gen.const(8.881784197001252e-16))
  } yield {
    val comps = rest.zip(assignment).groupBy(_._2).values
      .map(g => AttrSet.of(g.map(_._1))).toVector
    (n, Jd(AttrSet.of(lhs), comps, Measure.exact(measure)))
  }

  test(".sep format round-trips arbitrary JDs") {
    forAll(genJd) { (t: (Int, Jd)) =>
      val (n, jd) = t
      val line = SepFiles.formatLine(n, jd)
      val (n2, jd2) = SepFiles.parseLine(line)
      assert(n2 == n)
      assert(jd2.lhs == jd.lhs)
      assert(jd2.components.toSet == jd.components.toSet)
      assert(jd2.measure.value == jd.measure.value)
    }
  }

  test("merging JD components preserves the partition") {
    forAll(genJd) { (t: (Int, Jd)) =>
      val (_, jd) = t
      if (jd.numComponents >= 2) {
        val merged = jd.mergeComponents(0, jd.numComponents - 1)
        assert(merged.numComponents == jd.numComponents - 1)
        assert(merged.attrs == jd.attrs)
        assert(merged.components.forall(_.disjoint(merged.lhs)))
        // components stay pairwise disjoint
        for (i <- merged.components.indices; j <- i + 1 until merged.numComponents) {
          assert(merged.components(i).disjoint(merged.components(j)))
        }
      }
    }
  }

  test("measure interval tightening respects slack invariants") {
    forAll(Gen.choose(0.0, 5.0), Gen.choose(0.0, 5.0)) { (a: Double, b: Double) =>
      val m = Measure.unknown.withLower(math.min(a, b)).withUpper(math.max(a, b))
      assert(m.lower <= m.upper + Measure.Slack)
      val tightened = m.withUpper(m.lower)
      assert(tightened.isExactlyKnown)
    }
  }

  // ---- Spark-backed properties: one job per case, so fewer cases ----

  private def checkSpark(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  // tight alphabets/time ranges force key collisions, equal timestamps,
  // empty keys, and boundary hits — the as-of/interval edge cases
  private val genTemporal: Gen[(List[(Long, String, Long)],
      List[(Long, String, Long)])] = for {
    nl <- Gen.choose(1, 25)
    nr <- Gen.choose(0, 15)
    l <- Gen.listOfN(nl, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 20L)))
    r <- Gen.listOfN(nr, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 20L)))
  } yield (
    l.zipWithIndex.map { case ((k, t), i) => (i.toLong, s"k$k", t) },
    r.zipWithIndex.map { case ((k, t), i) => (1000L + i, s"k$k", t) })

  private def tsDf(rows: Seq[(Long, String, Long)], idName: String,
                   tsName: String) = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    SparkSuite.spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3)): _*),
      StructType(Seq(StructField(idName, LongType, false),
        StructField("k", StringType, false),
        StructField("t0", LongType, false))))
      .select(org.apache.spark.sql.functions.col(idName),
        org.apache.spark.sql.functions.col("k"),
        timestamp_micros(org.apache.spark.sql.functions.col("t0")).as(tsName))
  }

  test("asofJoin equals the naive latest-at-or-before model on random data") {
    checkSpark(Prop.forAll(genTemporal) { case (left, right) =>
      val got = graft.ops.AsofJoin.asofJoin(
        tsDf(left, "id", "lts").repartition(3),
        tsDf(right, "rid", "rts").withColumnRenamed("rts", "lts"),
        "k", "lts", Seq("rid"))
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
        .toMap
      val naive = left.map { case (id, k, t) =>
        val cand = right.filter(r => r._2 == k && r._3 <= t)
        id -> (if (cand.isEmpty) None
               else Some(cand.maxBy(r => (r._3, r._1))._1))
      }.toMap
      got == naive
    })
  }

  private val genSnapshots: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    for {
      // tight key range forces collisions; versions collide too, so the
      // tie-break path is exercised constantly
      base <- Gen.listOf(Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 3L)))
      upd <- Gen.listOf(Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 3L)))
    } yield (
      base.zipWithIndex.map { case ((k, v), i) => (k, v, 100L + i) }
        .groupBy(_._1).values.map(_.head).toList, // one row per key per side
      upd.zipWithIndex.map { case ((k, v), i) => (k, v, 200L + i) }
        .groupBy(_._1).values.map(_.head).toList)

  private def snapDf(rows: Seq[(Long, Long, Long)]) = {
    import org.apache.spark.sql.types._
    SparkSuite.spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3)): _*),
      StructType(Seq(StructField("k", LongType, false),
        StructField("v", LongType, false),
        StructField("payload", LongType, false))))
  }

  test("upsertMerge equals the per-key max-(version, side) model; idempotent") {
    checkSpark(Prop.forAll(genSnapshots) { case (base, upd) =>
      if (base.isEmpty || upd.isEmpty) true
      else {
        val merged = graft.ops.Merge.upsertMerge(
          snapDf(base).repartition(3), snapDf(upd), "k", "v")
        val got = merged.collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        val naive = (base.map(r => (r, 0)) ++ upd.map(r => (r, 1)))
          .groupBy(_._1._1)
          .map { case (k, rows) =>
            val (r, _) = rows.maxBy { case ((_, v, _), side) => (v, side) }
            k -> (r._2, r._3)
          }
        // re-applying the same update batch must be a no-op
        val again = graft.ops.Merge.upsertMerge(merged
          .select("k", "v", "payload"), snapDf(upd), "k", "v")
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        got == naive && again == got
      }
    })
  }

  private val genScores: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.choose(0, 100).map(_ / 10.0))

  test("quantileBins is monotone in score with bins in range, no row lost") {
    checkSpark(Prop.forAll(genScores, Gen.oneOf(2, 3, 5)) { (scores, k) =>
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.functions.col
      val rows = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = SparkSuite.spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2)): _*),
        StructType(Seq(StructField("id", LongType, false),
          StructField("s", DoubleType, false))))
      val got = graft.ops.Analytics.quantileBins(df, col("s"), k, Seq("id"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      val byId = got.map(r => r._1 -> r).toMap
      got.length == rows.length &&
        got.forall { case (_, _, b) => b >= 0 && b < k } &&
        // equal scores -> equal bins; higher score -> bin at least as high
        got.forall { case (i, s, b) =>
          got.forall { case (_, s2, b2) =>
            (s2 != s || b2 == b) && (s2 <= s || b2 >= b)
          } && byId(i)._2 == math.rint(rows(i.toInt)._2 * 1e6) / 1e6
        }
    })
  }

  test("intervalJoin equals the naive range-predicate model on random data") {
    checkSpark(Prop.forAll(genTemporal, Gen.oneOf(1L, 3L, 7L)) {
      case ((left, right), len) =>
        val got = graft.ops.IntervalJoin.intervalJoin(
          tsDf(left, "id", "lts").repartition(3),
          tsDf(right, "rid", "rts"), "k", "lts", "rts", len)
          .select("id", "rid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val naive = (for {
          (id, lk, lt) <- left
          (rid, rk, rt) <- right
          if lk == rk && rt > lt && rt <= lt + len
        } yield (id, rid)).toSet
        got == naive
    })
  }

  // tiny vocab + few sources force shared tokens, source-exclusive
  // tokens, and single-source corpora (where jsd must be exactly 0)
  private val genSrcDocs: Gen[List[(String, String)]] = {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val text = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val row = Gen.zip(Gen.oneOf("s1", "s2", "s3"), text)
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, row))
  }

  test("corpusDriftJsd equals the union-support model and stays in [0,1]") {
    checkSpark(Prop.forAll(genSrcDocs) { rows =>
      import org.apache.spark.sql.types._
      val df = SparkSuite.spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2)): _*),
        StructType(Seq(StructField("source", StringType, false),
          StructField("text", StringType, false))))
      val got = graft.ops.TextAnalysis.corpusDriftJsd(
          df.repartition(3), "source", "text")
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      // naive model: sum over the FULL union support, 0·log0 = 0 —
      // the operator must agree despite never materializing the union
      val toks = rows.flatMap { case (s, t) =>
        t.split("\\s+").filter(_.nonEmpty).map(s -> _) }
      val corpusCnt = toks.groupBy(_._2).map { case (w, g) => w -> g.size.toDouble }
      val bigN = toks.size.toDouble
      val naive = toks.groupBy(_._1).map { case (s, l) =>
        val n = l.size.toDouble
        val cnt = l.groupBy(_._2).map { case (w, g) => w -> g.size.toDouble }
        // iterator, not .keys.map: a Set of per-token terms would
        // deduplicate equal contributions before the sum
        val jsd = corpusCnt.keysIterator.map { w =>
          val p = cnt.getOrElse(w, 0.0) / n
          val q = corpusCnt(w) / bigN
          val m = (p + q) / 2
          def term(x: Double) =
            if (x == 0.0) 0.0 else 0.5 * x * (math.log(x / m) / math.log(2))
          term(p) + term(q)
        }.sum
        s -> jsd
      }
      got.keySet == naive.keySet &&
        got.forall { case (s, v) =>
          v >= 0.0 && v <= 1.0 && math.abs(v - naive(s)) <= 1e-6 } &&
        // a lone source IS the corpus: drift must be exactly zero
        (naive.size != 1 || got.values.forall(_ == 0.0))
    })
  }
}
