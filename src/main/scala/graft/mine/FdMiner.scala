package graft.mine

import graft.core.{AttrSet, Fd, Measure}
import graft.entropy.EntropyEngine
import graft.inference.LatticeOrderingInference

import scala.collection.mutable

/** Top-down level-wise search for minimal approximate FDs
  * (SURVEY.md §2.5 D1/D2; reference `search/TopDownInductiveSearch.java:60-175`
  * in /root/reference).
  *
  * Per RHS attribute `a`, BFS the determinant lattice from the most
  * general seed (empty LHS) upward; a determinant whose FD measure
  * `H(X u a) - H(X)` is within the threshold is a *minimal* discovered FD
  * and is not specialized further. Entropies for a whole level are
  * prefetched in one shared-scan batch before measuring.
  */
final class FdMiner(eng: EntropyEngine, threshold: Double) {
  private val n = eng.numAttrs
  private val full = eng.fullSet

  /** All minimal approximate FDs X -> a with measure <= threshold. */
  def mineMinimal(): Seq[Fd] = {
    val out = mutable.ArrayBuffer.empty[Fd]
    val inference = new LatticeOrderingInference
    for (a <- 0 until n) {
      val rhs = AttrSet.single(a)
      val discovered = mutable.ArrayBuffer.empty[AttrSet]
      var frontier: Seq[AttrSet] = Seq(AttrSet.empty)
      val seen = mutable.HashSet.empty[AttrSet]
      while (frontier.nonEmpty) {
        // one shared-scan batch for the level's H(X) and H(X u a)
        eng.prefetch(frontier.flatMap(x => Seq(x, x.union(rhs))))
        val next = mutable.ArrayBuffer.empty[AttrSet]
        for (x <- frontier) {
          val m = inference.upperBound(x, rhs) match {
            case Some(b) if Measure(0, b).belowThreshold(threshold) => b
            case _ => eng.fdMeasure(x, rhs)
          }
          if (Measure.exact(m).belowThreshold(threshold)) {
            discovered += x
            inference.add(x, rhs, m)
            out += Fd(x, rhs, Measure.exact(m))
          } else {
            // specialize: add one attribute not in X u {a}
            for (b <- 0 until n if b != a && !x.contains(b)) {
              val x2 = x + b
              if (!seen(x2) && !discovered.exists(_.subsetOf(x2))) {
                seen += x2
                next += x2
              }
            }
          }
        }
        // a superset may have been enqueued before its subset was
        // discovered in the same level — drop those now
        frontier = next.filterNot(x => discovered.exists(_.subsetOf(x))).toSeq
      }
    }
    out.toSeq
  }

  /** Exhaustive oracle: every (X, a) with measure <= threshold, reduced
    * to minimal determinants — for differential tests.
    */
  def bruteForceMinimal(): Seq[Fd] = {
    val out = mutable.ArrayBuffer.empty[Fd]
    for (a <- 0 until n) {
      val rhs = AttrSet.single(a)
      val candidates = AttrSet.allNonEmptySubsets(n)
        .filterNot(_.contains(a)) :+ AttrSet.empty
      eng.prefetch(candidates.flatMap(x => Seq(x, x.union(rhs))))
      val holding = candidates.filter(x =>
        Measure.exact(eng.fdMeasure(x, rhs)).belowThreshold(threshold))
      val minimal = holding.filter(x =>
        !holding.exists(y => y.properSubsetOf(x)))
      minimal.foreach(x => out += Fd(x, rhs, Measure.exact(eng.fdMeasure(x, rhs))))
    }
    out.toSeq
  }
}
