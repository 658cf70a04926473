package graft

import graft.core._
import graft.mine.Transversals
import org.scalatest.funsuite.AnyFunSuite

class CoreSpec extends AnyFunSuite {

  test("AttrSet algebra") {
    val x = AttrSet(0, 2, 5)
    val y = AttrSet(2, 3)
    assert(x.union(y) == AttrSet(0, 2, 3, 5))
    assert(x.intersect(y) == AttrSet(2))
    assert(x.minus(y) == AttrSet(0, 5))
    assert(x.complement(6) == AttrSet(1, 3, 4))
    assert(AttrSet(0, 2).subsetOf(x) && !x.subsetOf(y))
    assert(x.toString == "{0, 2, 5}")
    assert(AttrSet.allNonEmptySubsets(3).size == 7)
  }

  test("Jd merge and implied MVDs") {
    val jd = Jd(AttrSet(0), Vector(AttrSet(1), AttrSet(2), AttrSet(3)))
    val merged = jd.mergeComponents(0, 2)
    assert(merged.components.toSet == Set(AttrSet(1, 3), AttrSet(2)))
    assert(jd.impliedMvds.map(_.rhs).toSet ==
      Set(AttrSet(1), AttrSet(2), AttrSet(1, 2)))
    assert(jd.clusters.toSet ==
      Set(AttrSet(0, 1), AttrSet(0, 2), AttrSet(0, 3)))
  }

  test("Measure threshold slack semantics") {
    assert(Measure.exact(0.1).belowThreshold(0.1))
    assert(Measure.exact(0.1 + 5e-6).belowThreshold(0.1))
    assert(!Measure.exact(0.1 + 2e-5).belowThreshold(0.1))
  }

  test("Transversals vs brute force on a small hypergraph") {
    val vertices = AttrSet.full(6)
    val edges = Seq(AttrSet(0, 1), AttrSet(1, 2, 3), AttrSet(3, 4), AttrSet(0, 5))
    val tr = new Transversals(vertices)
    edges.foreach(tr.addHyperedge)
    // brute force: minimal subsets hitting every edge
    val all = AttrSet.allNonEmptySubsets(6)
    val hitting = all.filter(s => edges.forall(_.intersects(s)))
    val minimal = hitting.filter(s => !hitting.exists(t => t.properSubsetOf(s)))
    assert(tr.minimalTransversals.toSet == minimal.toSet)
  }

  test("DependencySet indexes by lhs/rhs") {
    val ds = new DependencySet[Mvd](m => (m.lhs, m.rhs))
    ds.add(Mvd(AttrSet(0), AttrSet(1)))
    ds.add(Mvd(AttrSet(0), AttrSet(2)))
    ds.add(Mvd(AttrSet(0), AttrSet(1))) // overwrite, not double count
    assert(ds.size == 2)
    assert(ds.contains(AttrSet(0), AttrSet(1)))
    assert(ds.withLhs(AttrSet(0)).size == 2)
  }
}
