package graft.mine

import graft.core.AttrSet

/** Incremental minimal-transversal (hitting set) maintenance for a
  * hypergraph, Berge-style (SURVEY.md §2.5 D12; reference
  * `common/Transversals.java:11-134` in /root/reference).
  *
  * Used by the minimal-separator fixpoint: hyperedges are the known
  * minimal separators of a pair; complements of minimal transversals are
  * the candidate LHSs that avoid containing any known separator.
  */
final class Transversals private (
    val vertices: AttrSet,
    private var edges: List[AttrSet],
    private var trans: List[AttrSet]) {

  def this(vertices: AttrSet) =
    // no edges: the empty set is the unique minimal transversal
    this(vertices, Nil, List(AttrSet.empty))

  def hyperedges: Seq[AttrSet] = edges
  def minimalTransversals: Seq[AttrSet] = trans

  /** Add a hyperedge and update the minimal transversals incrementally:
    * every old transversal already hitting `e` survives; every other one
    * extends by each vertex of `e`, then non-minimal results are pruned.
    */
  def addHyperedge(e: AttrSet): Unit = {
    require(e.nonEmpty && e.subsetOf(vertices), s"bad hyperedge $e")
    edges ::= e
    val (hit, miss) = trans.partition(_.intersects(e))
    val extended = for (t <- miss; v <- e.toSeq) yield t + v
    val candidates = (hit ++ extended).distinct
    trans = candidates.filterNot(t =>
      candidates.exists(u => u != t && u.subsetOf(t)))
  }
}
