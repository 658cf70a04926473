package graft

import graft.core._
import graft.entropy.EntropyEngine
import graft.mine.{FdMiner, JdMiner, MvdMiner}
import org.scalatest.funsuite.AnyFunSuite

class MinerSpec extends AnyFunSuite {
  import SparkSuite._

  private def mvdKey(m: Mvd) = (m.lhs, m.rhs)

  test("FD miner equals brute force (minimal FDs) across thresholds") {
    val eng = new EntropyEngine(relation(mvdFixture(noise = 8)).cache())
    for (t <- Seq(0.0, 0.1, 0.5, 1.0)) {
      val fast = new FdMiner(eng, t).mineMinimal().map(f => (f.lhs, f.rhs)).toSet
      val brute = new FdMiner(eng, t).bruteForceMinimal().map(f => (f.lhs, f.rhs)).toSet
      assert(fast == brute, s"threshold $t")
    }
  }

  test("MVD miner equals brute force across thresholds (3 attrs + noise)") {
    val eng = new EntropyEngine(relation(mvdFixture(noise = 8)).cache())
    for (t <- Seq(0.0, 0.1, 0.5, 1.5)) {
      val brute = new MvdMiner(eng, t).bruteForce().map(mvdKey).toSet
      val fast = new MvdMiner(eng, t).mine().map(mvdKey).toSet
      assert(fast == brute, s"threshold $t")
    }
  }

  test("MVD miner equals brute force on the 4-attr chain fixture") {
    val eng = new EntropyEngine(relation(chainFixture(noise = 6)).cache())
    for (t <- Seq(0.0, 0.2, 1.0)) {
      val brute = new MvdMiner(eng, t).bruteForce().map(mvdKey).toSet
      val fast = new MvdMiner(eng, t).mine().map(mvdKey).toSet
      assert(fast == brute, s"threshold $t")
    }
  }

  test("MVD miner equals brute force on the 5-attr path fixture") {
    val eng = new EntropyEngine(relation(pathFixture5(noise = 5)).cache())
    for (t <- Seq(0.0, 0.3)) {
      val brute = new MvdMiner(eng, t).bruteForce().map(mvdKey).toSet
      val fast = new MvdMiner(eng, t).mine().map(mvdKey).toSet
      assert(fast == brute, s"threshold $t: " +
        s"missing=${(brute -- fast).take(3)} extra=${(fast -- brute).take(3)}")
    }
  }

  test("min-seps on the 5-attr path: middle singletons separate the ends") {
    val eng = new EntropyEngine(relation(pathFixture5(noise = 0)).cache())
    val miner = new JdMiner(eng, 0.0)
    val seps04 = miner.minimalSeparators(0, 4).toSet
    // each interior vertex of the path is a minimal (A,E)-separator
    assert(seps04 == Set(AttrSet(1), AttrSet(2), AttrSet(3)), s"got $seps04")
    // end-to-end: mined JDs reassemble losslessly
    val jds = miner.mineAllFullJds(limit = 3).toVector
    val schemas = new graft.schema.SchemaEnumerator(5, jds).schemas(limit = 2).toSeq
    val dec = new graft.decompose.Decomposer(relation(pathFixture5(0)))
    for (schema <- schemas) {
      assert(dec.evaluate(schema.tree).isLossless, s"${schema.clusters}")
    }
  }

  test("inference saves entropy queries on the exact fixture") {
    val engBrute = new EntropyEngine(relation(chainFixture(noise = 0)).cache())
    new MvdMiner(engBrute, 0.0).bruteForce()
    val engFast = new EntropyEngine(relation(chainFixture(noise = 0)).cache())
    new MvdMiner(engFast, 0.0).mine()
    assert(engFast.numQueriesIssued <= engBrute.numQueriesIssued)
  }

  test("exact chain fixture yields the path separators") {
    val eng = new EntropyEngine(relation(chainFixture(noise = 0)).cache())
    val miner = new JdMiner(eng, 0.0)
    // att0 and att3 are separated by {1}, {2} (both minimal)
    val seps03 = miner.minimalSeparators(0, 3).toSet
    assert(seps03.contains(AttrSet(1)) || seps03.contains(AttrSet(2)),
      s"got $seps03")
    assert(seps03.forall(s => !s.contains(0) && !s.contains(3)))
    // every returned separator is truly minimal: no proper subset works
    for (s <- seps03; sub <- s.toSeq.map(s - _)) {
      assert(new JdMiner(eng, 0.0).consistentJd(sub, 0, 3).isEmpty ||
        seps03.contains(sub) || sub.isEmpty && seps03.contains(AttrSet.empty),
        s"separator $s not minimal: $sub also separates")
    }
  }

  test("min-seps match MVD-derived ground truth on small fixtures") {
    // ground truth: minimal LHSs X (a,b not in X) admitting a brute-forced
    // MVD X ->> Y with a in Y xor b in Y
    val rows = mvdFixture(noise = 0)
    val eng = new EntropyEngine(relation(rows).cache())
    val t = 0.0
    val mvds = new MvdMiner(eng, t).bruteForce()
    val n = 3
    for (a <- 0 until n; b <- a + 1 until n) {
      val separating = mvds.filter { m =>
        !m.lhs.contains(a) && !m.lhs.contains(b) && {
          val rest = AttrSet.full(n).minus(m.lhs)
          val y = m.rhs
          val other = rest.minus(y)
          (y.contains(a) && other.contains(b)) || (y.contains(b) && other.contains(a))
        }
      }.map(_.lhs).distinct
      val gt = separating.filter(x => !separating.exists(z => z.properSubsetOf(x))).toSet
      val mined = new JdMiner(eng, t).minimalSeparators(a, b).toSet
      assert(mined == gt, s"pair ($a,$b): mined $mined vs gt $gt")
    }
  }

  test("JD enumeration for a separator returns valid measured JDs") {
    val eng = new EntropyEngine(relation(chainFixture(noise = 0)).cache())
    val miner = new JdMiner(eng, 0.0)
    val jds = miner.mineJdsWithLhs(AttrSet(1), 0, 2, limit = 10)
    assert(jds.nonEmpty)
    for (jd <- jds) {
      assert(jd.lhs == AttrSet(1))
      assert(jd.componentOf(0) != jd.componentOf(2))
      assert(jd.measure.value <= (jd.numComponents - 1) * 0.0 + Measure.ThresholdSlack)
    }
  }

  test("graph-CC consistent-JD equals pairwise and issues fewer entropy jobs") {
    val fixtures = Seq(
      (mvdFixture(noise = 8), 3),
      (chainFixture(noise = 6), 4),
      (pathFixture5(noise = 5), 5))
    for ((rows, n) <- fixtures) {
      // separate engines so the job-count comparison is uncontaminated;
      // each accumulates its memo across thresholds, like real mining
      val engCC = new EntropyEngine(relation(rows).cache())
      val engPW = new EntropyEngine(relation(rows).cache())
      for (t <- Seq(0.0, 0.5, 1.0)) {
        val cc = new JdMiner(engCC, t)
        val pw = new JdMiner(engPW, t)
        for {
          a <- 0 until n; b <- a + 1 until n
          lhs <- AttrSet.empty +: AttrSet.allNonEmptySubsets(n)
          if !lhs.contains(a) && !lhs.contains(b)
        } {
          val viaCC = cc.consistentJd(lhs, a, b).map(_.canonical)
          val viaPW = pw.consistentJdPairwise(lhs, a, b).map(_.canonical)
          assert(viaCC == viaPW, s"n=$n t=$t lhs=$lhs pair=($a,$b)")
        }
      }
      assert(engCC.numQueriesIssued <= engPW.numQueriesIssued,
        s"n=$n: CC issued ${engCC.numQueriesIssued} jobs, " +
          s"pairwise ${engPW.numQueriesIssued}")
    }
  }
}
